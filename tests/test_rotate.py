"""Physics-aware rotation: algebraic properties + host/device agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet4d_tpu.ops.rotate import (
    rotate_vector_field,
    rotate_scalar_field,
    batched_rotate_sample,
    rotation_case,
)
from flownet4d_tpu.data.patch_loader import rotate_patch_host


def _field(seed=0, n=6):
    return np.random.default_rng(seed).standard_normal((n, n, n, 3)).astype(np.float32)


@pytest.mark.parametrize("plane", [1, 2, 3])
def test_rot90_twice_equals_rot180(plane):
    f = jnp.asarray(_field(plane))
    c90 = rotation_case(1, plane, 1)
    c180 = rotation_case(1, plane, 2)
    once = rotate_vector_field(rotate_vector_field(f, jnp.int32(c90)), jnp.int32(c90))
    direct = rotate_vector_field(f, jnp.int32(c180))
    np.testing.assert_allclose(np.asarray(once), np.asarray(direct), atol=1e-6)


@pytest.mark.parametrize("plane", [1, 2, 3])
def test_rot90_then_rot270_is_identity(plane):
    f = jnp.asarray(_field(plane + 10))
    c90 = rotation_case(1, plane, 1)
    c270 = rotation_case(1, plane, 3)
    round_trip = rotate_vector_field(rotate_vector_field(f, jnp.int32(c90)), jnp.int32(c270))
    np.testing.assert_allclose(np.asarray(round_trip), np.asarray(f), atol=1e-6)


@pytest.mark.parametrize("plane", [1, 2, 3])
def test_rot180_twice_is_identity(plane):
    f = jnp.asarray(_field(plane + 20))
    c = rotation_case(1, plane, 2)
    twice = rotate_vector_field(rotate_vector_field(f, jnp.int32(c)), jnp.int32(c))
    np.testing.assert_allclose(np.asarray(twice), np.asarray(f), atol=1e-6)


@pytest.mark.parametrize("case", list(range(10)))
def test_device_matches_host_tables(case):
    f = _field(case + 30)
    mask = np.abs(_field(case + 40)[..., 0])

    for kind, is_phase in [("phase", True), ("mag", False)]:
        host = rotate_patch_host(f, case, kind)
        dev = np.asarray(rotate_vector_field(jnp.asarray(f), jnp.int32(case), is_phase))
        np.testing.assert_allclose(dev, host, atol=1e-6, err_msg=f"case={case} kind={kind}")

    host_mask = rotate_patch_host(mask, case, "mask")
    dev_mask = np.asarray(rotate_scalar_field(jnp.asarray(mask), jnp.int32(case)))
    np.testing.assert_allclose(dev_mask, host_mask, atol=1e-6)


def test_speed_invariance():
    """Rotation of a vector field must preserve the speed magnitude field
    up to voxel permutation (it's an isometry)."""
    f = _field(50)
    speed = np.sort(np.linalg.norm(f, axis=-1).ravel())
    for case in range(10):
        rot = np.asarray(rotate_vector_field(jnp.asarray(f), jnp.int32(case)))
        rot_speed = np.sort(np.linalg.norm(rot, axis=-1).ravel())
        np.testing.assert_allclose(rot_speed, speed, atol=1e-5)


def test_batched_rotation_vmaps_distinct_cases():
    lr = np.stack([_field(i) for i in range(4)])
    hr = np.stack([_field(i + 100, n=12) for i in range(4)])
    mag = np.stack([np.abs(_field(i + 200)) for i in range(4)])
    mask = np.stack([np.abs(_field(i + 300, n=12)[..., 0]) for i in range(4)])
    cases = np.array([0, 1, 5, 9], np.int32)

    rl, rh, rm, rmask = jax.jit(batched_rotate_sample)(
        jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(mag), jnp.asarray(mask), jnp.asarray(cases)
    )
    for i, c in enumerate(cases):
        np.testing.assert_allclose(np.asarray(rl[i]), rotate_patch_host(lr[i], int(c), "phase"), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rh[i]), rotate_patch_host(hr[i], int(c), "phase"), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rm[i]), rotate_patch_host(mag[i], int(c), "mag"), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rmask[i]), rotate_patch_host(mask[i], int(c), "mask"), atol=1e-6)


@pytest.mark.golden
def test_matches_reference_numpy_rotation():
    """Golden parity with the reference's host rotation routines."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    try:
        from Network.PatchHandler3D import PatchHandler3D
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")

    ph = PatchHandler3D("/tmp", 8, 2, 4)
    f = _field(60)
    u, v, w = f[..., 0], f[..., 1], f[..., 2]

    for plane in (1, 2, 3):
        for k in (1, 2, 3):
            ru, rv, rw = ph.apply_rotation(u.copy(), v.copy(), w.copy(), k, plane, True)
            golden = np.stack([ru, rv, rw], -1)
            case = rotation_case(1, plane, k)
            ours = np.asarray(rotate_vector_field(jnp.asarray(f), jnp.int32(case), True))
            np.testing.assert_allclose(ours, golden, atol=1e-6, err_msg=f"plane={plane} k={k}")

            mu, mv, mw = ph.apply_rotation(u.copy(), v.copy(), w.copy(), k, plane, False)
            golden_mag = np.stack([mu, mv, mw], -1)
            ours_mag = np.asarray(rotate_vector_field(jnp.asarray(f), jnp.int32(case), False))
            np.testing.assert_allclose(ours_mag, golden_mag, atol=1e-6)

            golden_mask = ph.rotate_object(u.copy(), k, plane)
            ours_mask = np.asarray(rotate_scalar_field(jnp.asarray(u), jnp.int32(case)))
            np.testing.assert_allclose(ours_mask, golden_mask, atol=1e-6)
