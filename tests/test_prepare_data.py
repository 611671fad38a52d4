"""K-space downsampling physics + patch generation properties."""

import csv
import sys

import numpy as np
import pytest

from flownet4d_tpu.prepare_data.fft_downsampling import (
    rectangular_crop3d,
    add_complex_signal_noise,
    downsample_phase_img,
)
from flownet4d_tpu.prepare_data.patch_data import generate_random_patches
from flownet4d_tpu.prepare_data.lowres import select_vencs, VENC_VALUES
from flownet4d_tpu.data.patch_index import write_header, load_indexes


def test_crop_halves_each_axis():
    x = np.random.default_rng(0).standard_normal((16, 12, 8)) + 0j
    out = rectangular_crop3d(np.fft.fftn(x), 0.5)
    assert out.shape == (8, 6, 4)


def test_noise_hits_target_snr():
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal((32, 32, 32)) + 1j * rng.standard_normal((32, 32, 32))) * 10
    target_db = 15.0
    noisy = add_complex_signal_noise(sig.copy(), target_db, rng)
    noise = noisy - sig
    snr_db = 10 * np.log10(np.mean(np.abs(sig) ** 2) / np.var(noise.real))
    assert abs(snr_db - target_db) < 0.5


def test_downsample_preserves_velocity_at_high_snr():
    """A smooth velocity field inside a full-mask magnitude survives
    k-space halving nearly unchanged (interior voxels, no noise)."""
    n = 32
    coords = np.linspace(-1, 1, n)
    vel = 0.4 * np.sin(np.pi * coords)[:, None, None] * np.ones((n, n, n))
    mag = np.full((n, n, n), 100.0)
    venc = 1.0

    lr_vel, lr_mag = downsample_phase_img(vel, mag, venc, 0.5, 300.0)  # ~no noise
    assert lr_vel.shape == (16, 16, 16)
    # compare to the analytic field sampled at the LR grid centre region
    interior = lr_vel[4:12, 4:12, 4:12]
    coarse = 0.4 * np.sin(np.pi * np.linspace(-1, 1, n)[::2])[:, None, None] * np.ones((16, 16, 16))
    np.testing.assert_allclose(interior, coarse[4:12, 4:12, 4:12], atol=0.02)
    # magnitude rescaling by voxel ratio (1/8) keeps values finite and positive
    assert lr_mag.min() > 0


@pytest.mark.golden
def test_downsample_matches_reference_noiseless():
    sys.path.insert(0, "/root/reference/src/prepare_data")
    try:
        import fft_downsampling as ref_fft
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")

    rng = np.random.default_rng(3)
    vel = rng.uniform(-0.5, 0.5, (20, 18, 16))
    mag = rng.uniform(50, 200, (20, 18, 16))
    venc = 1.5
    # SNR 400 dB -> sigma ~ 1e-20 x signal: noise is numerically irrelevant,
    # so the RNG draws cannot cause a visible difference.
    ours_v, ours_m = downsample_phase_img(vel, mag, venc, 0.5, 400.0)
    ref_v, ref_m = ref_fft.downsample_phase_img(vel, mag, venc, 0.5, 400.0)
    np.testing.assert_allclose(ours_v, ref_v, atol=1e-8)
    np.testing.assert_allclose(ours_m, ref_m, atol=1e-8)


def test_select_vencs_above_vmax_and_floor():
    rng = np.random.default_rng(4)
    for _ in range(200):
        mu, mv, mw = rng.uniform(0.1, 3.0, 3)
        vu, vv, vw = select_vencs(mu, mv, mw, rng)
        for venc in (vu, vv, vw):
            assert venc in VENC_VALUES or venc == 1.5
        # the dominant component must not alias
        main = int(np.argmax([mu, mv, mw]))
        assert [vu, vv, vw][main] >= min(1.5, max([mu, mv, mw]))


def test_generate_random_patches_csv(tmp_path):
    rng = np.random.default_rng(5)
    mask = np.zeros((40, 40, 40), np.int32)
    mask[10:30, 10:30, 10:30] = 1  # a fluid cube

    out = str(tmp_path / "patches.csv")
    write_header(out)
    n = generate_random_patches(
        "lr.h5", "hr.h5", out, index=0, n_patch=5, binary_mask=mask,
        patch_size=8, minimum_coverage=0.2, empty_patch_allowed=0,
        apply_all_rotation=True, rng=rng,
    )
    assert n == 5 * 10  # 1 original + 9 rotations each

    rows = load_indexes(out)
    assert len(rows) == 50
    for r in rows:
        assert r.coverage >= 0.2
        assert 0 <= r.start_x <= 32 and 0 <= r.start_y <= 32 and 0 <= r.start_z <= 32
        if r.rotate:
            assert 1 <= r.rotation_plane <= 3 and 1 <= r.rotation_degree_idx <= 3


def test_generate_random_patches_gives_up_gracefully(tmp_path):
    mask = np.zeros((20, 20, 20), np.int32)  # no fluid anywhere
    out = str(tmp_path / "empty.csv")
    write_header(out)
    n = generate_random_patches(
        "lr.h5", "hr.h5", out, 0, 5, mask, 8, 0.2, 0,
        rng=np.random.default_rng(0),
    )
    assert n == 0  # gave up after 100 misses without hanging
