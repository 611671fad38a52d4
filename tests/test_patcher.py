"""Patchify/stitch geometry: pad arithmetic, round-trip identity, golden parity."""

import numpy as np
import pytest

from flownet4d_tpu.inference.patcher import PatchGenerator


class _FakeDataset:
    def __init__(self, shape, seed=0):
        rng = np.random.default_rng(seed)
        self.u, self.v, self.w = (rng.standard_normal(shape).astype(np.float32) for _ in range(3))
        self.mag_u, self.mag_v, self.mag_w = (
            rng.uniform(size=shape).astype(np.float32) for _ in range(3)
        )


@pytest.mark.parametrize("shape", [(42, 38, 36), (24, 24, 24), (30, 31, 17)])
@pytest.mark.parametrize("patch_size", [12, 16, 24])
def test_roundtrip_identity_res1(shape, patch_size):
    """With res_increase=1, stitching the raw patches must reproduce the volume."""
    pgen = PatchGenerator(patch_size, 1)
    ds = _FakeDataset(shape)
    vel, _ = pgen.patchify_stacked(ds)
    # identity 'network': output = input patches
    out = pgen.unpatchify(vel)
    for got, want in zip(out, (ds.u, ds.v, ds.w)):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_roundtrip_res2_against_nearest_ground_truth():
    """With res_increase=2, feed the true HR patches and check stitching."""
    shape = (20, 18, 16)
    r = 2
    patch_size = 12
    rng = np.random.default_rng(1)
    hr = rng.standard_normal(tuple(s * r for s in shape)).astype(np.float32)

    pgen = PatchGenerator(patch_size, r)
    ds = _FakeDataset(shape)
    pgen.patchify_stacked(ds)  # sets grid bookkeeping from the LR volume

    # Build the HR patch stack the same way the network would produce it:
    # pad the HR volume with the scaled pad amounts and slide at scaled stride.
    side = 2 * r
    hr_pad = np.pad(hr, [(side, side)] * 3, "constant")
    hr_pad = np.pad(hr_pad, [(0, p) for p in pgen.padding], "constant")
    P = patch_size * r
    eff = (patch_size - 4) * r
    stacks = []
    for i in range(pgen.nr_x):
        for j in range(pgen.nr_y):
            for k in range(pgen.nr_z):
                stacks.append(
                    hr_pad[i * eff : i * eff + P, j * eff : j * eff + P, k * eff : k * eff + P]
                )
    patches = np.stack(stacks)

    got = pgen._patchup_with_overlap(patches, pgen.nr_x, pgen.nr_y, pgen.nr_z)
    np.testing.assert_allclose(got, hr, atol=1e-6)


@pytest.mark.golden
def test_pad_and_grid_match_reference():
    """Same pad amounts, grid dims and patch contents as the reference class."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    try:
        from Network.PatchGenerator import PatchGenerator as RefPG
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")

    for shape in [(42, 38, 36), (30, 31, 17), (24, 24, 24)]:
        for patch_size in (12, 16, 24):
            ds = _FakeDataset(shape, seed=patch_size)
            ours = PatchGenerator(patch_size, 2)
            ref = RefPG(patch_size, 2)

            (u_o, *_), _ = ours.patchify(ds)
            (u_r, *_), _ = ref.patchify(ds)

            assert (ours.nr_x, ours.nr_y, ours.nr_z) == (ref.nr_x, ref.nr_y, ref.nr_z)
            assert ours.padding == ref.padding
            np.testing.assert_allclose(u_o, u_r, atol=0)

            # stitch golden parity on random "predictions"
            rng = np.random.default_rng(0)
            P = patch_size * 2
            n = len(u_o)
            preds = rng.standard_normal((n, P, P, P)).astype(np.float32)
            got = ours._patchup_with_overlap(preds.copy(), ours.nr_x, ours.nr_y, ours.nr_z)
            want = ref._patchup_with_overlap(preds.copy(), ref.nr_x, ref.nr_y, ref.nr_z)
            np.testing.assert_allclose(got, want, atol=0)
