"""PatchLoader on the bundled reference data + golden parity with the
reference PatchHandler3D's per-sample loading."""

import numpy as np
import pytest

from conftest import REFERENCE_DATA_DIR
from flownet4d_tpu.data import PatchLoader, load_indexes

TRAIN_CSV = f"{REFERENCE_DATA_DIR}/train.csv"


def test_load_indexes_schema():
    rows = load_indexes(TRAIN_CSV)
    assert len(rows) == 50
    assert rows[0].source == "example_data.h5"
    assert rows[0].target == "example_data_HR.h5"
    assert rows[0].rotation_case == 0
    assert rows[1].rotate == 1 and rows[1].rotation_case == 1


def test_batch_shapes_and_normalization():
    rows = load_indexes(TRAIN_CSV)
    loader = PatchLoader(REFERENCE_DATA_DIR, 12, 2, 6)
    ds = loader.initialize_dataset(rows[:12], shuffle=False)
    batches = list(ds)
    assert len(batches) == 2
    b = batches[0]
    assert b.lr.shape == (6, 12, 12, 12, 3)
    assert b.hr.shape == (6, 24, 24, 24, 3)
    assert b.mag.shape == (6, 12, 12, 12, 3)
    assert b.mask.shape == (6, 24, 24, 24)
    assert set(np.unique(b.mask)) <= {0.0, 1.0}
    assert np.abs(b.lr).max() <= 1.0 + 1e-5  # velocity normalised by venc
    assert b.mag.min() >= 0.0
    assert (b.weight == 1.0).all()


def test_partial_batch_padded_with_zero_weight():
    rows = load_indexes(TRAIN_CSV)[:7]
    loader = PatchLoader(REFERENCE_DATA_DIR, 12, 2, 4)
    batches = list(loader.initialize_dataset(rows, shuffle=False))
    assert len(batches) == 2
    last = batches[-1]
    assert last.lr.shape[0] == 4
    np.testing.assert_array_equal(last.weight, [1, 1, 1, 0])
    assert (last.lr[3] == 0).all()


def test_shuffle_reshuffles_between_epochs():
    rows = load_indexes(TRAIN_CSV)
    loader = PatchLoader(REFERENCE_DATA_DIR, 12, 2, 50, rotate_on_device=True)
    ds = loader.initialize_dataset(rows, shuffle=True, seed=0)
    first = next(iter(ds)).rot_case.copy()
    second = next(iter(ds)).rot_case.copy()
    assert not np.array_equal(first, second)


def test_host_and_device_rotation_modes_agree():
    import jax.numpy as jnp
    from flownet4d_tpu.ops.rotate import batched_rotate_sample

    rows = [r for r in load_indexes(TRAIN_CSV) if r.rotate][:6]
    on_host = PatchLoader(REFERENCE_DATA_DIR, 12, 2, 6, rotate_on_device=False)
    on_dev = PatchLoader(REFERENCE_DATA_DIR, 12, 2, 6, rotate_on_device=True)

    bh = next(iter(on_host.initialize_dataset(rows, shuffle=False)))
    bd = next(iter(on_dev.initialize_dataset(rows, shuffle=False)))
    assert (bh.rot_case == 0).all() and (bd.rot_case > 0).all()

    lr, hr, mag, mask = batched_rotate_sample(
        jnp.asarray(bd.lr), jnp.asarray(bd.hr), jnp.asarray(bd.mag),
        jnp.asarray(bd.mask), jnp.asarray(bd.rot_case),
    )
    np.testing.assert_allclose(np.asarray(lr), bh.lr, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hr), bh.hr, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mag), bh.mag, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mask), bh.mask, atol=1e-6)


@pytest.mark.golden
def test_sample_matches_reference_patchhandler():
    """Byte-level agreement with the reference's per-sample HDF5 loading,
    normalisation and host rotation."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    tf = pytest.importorskip("tensorflow")
    try:
        from Network.PatchHandler3D import PatchHandler3D
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")

    rows = load_indexes(TRAIN_CSV)
    ph = PatchHandler3D(REFERENCE_DATA_DIR, 12, 2, 4, mask_threshold=0.6)
    loader = PatchLoader(REFERENCE_DATA_DIR, 12, 2, 4, rotate_on_device=False)

    for row_idx in [0, 1, 5, 13, 27, 49]:  # mix of unrotated + all planes
        r = rows[row_idx]
        csv_fields = [
            r.source, r.target, str(r.index), str(r.start_x), str(r.start_y),
            str(r.start_z), str(r.rotate), str(r.rotation_plane),
            str(r.rotation_degree_idx), str(r.coverage),
        ]
        golden = ph.load_patches_from_index_file(tf.constant(csv_fields))
        g_u, g_v, g_w = (np.asarray(golden[i])[..., 0] for i in (0, 1, 2))
        g_mu, g_mv, g_mw = (np.asarray(golden[i])[..., 0] for i in (3, 4, 5))
        g_uh, g_vh, g_wh = (np.asarray(golden[i])[..., 0] for i in (6, 7, 8))
        g_venc, g_mask = float(golden[9]), np.asarray(golden[10])

        lr, mag, hr, venc, mask, rot = loader.load_sample(r)
        assert rot == 0
        np.testing.assert_allclose(lr[..., 0], g_u, atol=1e-6)
        np.testing.assert_allclose(lr[..., 1], g_v, atol=1e-6)
        np.testing.assert_allclose(lr[..., 2], g_w, atol=1e-6)
        np.testing.assert_allclose(mag[..., 0], g_mu, atol=1e-6)
        np.testing.assert_allclose(mag[..., 1], g_mv, atol=1e-6)
        np.testing.assert_allclose(mag[..., 2], g_mw, atol=1e-6)
        np.testing.assert_allclose(hr[..., 0], g_uh, atol=1e-6)
        np.testing.assert_allclose(hr[..., 1], g_vh, atol=1e-6)
        np.testing.assert_allclose(hr[..., 2], g_wh, atol=1e-6)
        assert venc == pytest.approx(g_venc)
        np.testing.assert_allclose(mask, g_mask, atol=1e-6)


def _write_cohort(tmp_path, n_pairs=6, n_frames=3, lr_dim=16, res=2):
    """Synthetic multi-file cohort; returns (rows, expected fn, total bytes)."""
    import h5py
    from flownet4d_tpu.data.patch_index import PatchIndexRow

    rng = np.random.default_rng(7)
    hr_dim = lr_dim * res
    rows, total = [], 0
    for i in range(n_pairs):
        lr_name, hr_name = f"lr_{i}.h5", f"hr_{i}.h5"
        with h5py.File(tmp_path / lr_name, "w") as hf:
            for c in ["u", "v", "w"]:
                a = rng.uniform(-1, 1, (n_frames, lr_dim, lr_dim, lr_dim)).astype("f4")
                hf[c] = a
                total += a.nbytes
            for c in ["mag_u", "mag_v", "mag_w"]:
                a = rng.uniform(0, 4095, (n_frames, lr_dim, lr_dim, lr_dim)).astype("f4")
                hf[c] = a
                total += a.nbytes
            for c in ["venc_u", "venc_v", "venc_w"]:
                hf[c] = rng.uniform(1.0, 3.0, (n_frames,)).astype("f4")
        with h5py.File(tmp_path / hr_name, "w") as hf:
            for c in ["u", "v", "w"]:
                a = rng.uniform(-1, 1, (n_frames, hr_dim, hr_dim, hr_dim)).astype("f4")
                hf[c] = a
                total += a.nbytes
            m = (rng.uniform(size=(1, hr_dim, hr_dim, hr_dim)) > 0.4).astype("f4")
            hf["mask"] = m
            total += m.nbytes
        for frame in range(n_frames):
            for (x, y, z) in [(0, 0, 0), (4, 4, 4), (8, 8, 8)]:
                rows.append(PatchIndexRow(lr_name, hr_name, frame, x, y, z, 0, 0, 0, 1.0))
    return rows, total


def test_cohort_larger_than_cache_stays_bounded(tmp_path):
    """Frame-granular cache: a cohort ~10x the byte budget streams with
    bounded resident memory and per-frame (not per-column) re-reads —
    the round-2 whole-column design re-read an entire 4D column per miss."""
    rows, total_bytes = _write_cohort(tmp_path)
    budget = total_bytes // 10
    loader = PatchLoader(str(tmp_path), 8, 2, 6, cache_bytes=budget)

    ds = loader.initialize_dataset(rows, shuffle=True, seed=0)
    n_epochs = 2
    seen = 0
    for _ in range(n_epochs):
        for b in ds:
            seen += int(b.weight.sum())
    assert seen == n_epochs * len(rows)

    st = loader.cache_stats()
    assert st["resident_bytes"] <= budget, st
    assert st["evictions"] > 0, "cohort must overflow the budget"
    assert st["hits"] > 0
    # Re-read unit is one frame: even under total thrash, IO is bounded by
    # (accesses x per-sample frame footprint). Whole-column caching (the
    # round-2 design) would re-read n_frames x as much per miss — assert
    # we stay strictly below that regime's floor.
    lr_f = 16 ** 3 * 4
    hr_f = 32 ** 3 * 4
    per_sample_frames = 6 * lr_f + 4 * hr_f  # 6 LR/mag + 3 HR vel + mask
    per_sample_columns = 6 * 3 * lr_f + 3 * 3 * hr_f + hr_f  # whole columns
    n_accesses = n_epochs * len(rows)
    assert st["bytes_read"] <= 1.05 * n_accesses * per_sample_frames, st
    assert st["bytes_read"] <= 0.6 * n_accesses * per_sample_columns, st

    # Values must match a direct HDF5 read despite all the eviction churn.
    import h5py
    r = rows[-1]
    lr, mag, hr, venc, mask, rot = loader.load_sample(r)
    with h5py.File(tmp_path / r.source) as hf:
        u = np.asarray(hf["u"][r.index, r.start_x:r.start_x + 8,
                               r.start_y:r.start_y + 8, r.start_z:r.start_z + 8])
        ve = max(float(np.asarray(hf[c])[r.index]) for c in ["venc_u", "venc_v", "venc_w"])
    np.testing.assert_allclose(lr[..., 0], (u / ve).astype("f4"), atol=1e-7)
    assert venc == pytest.approx(ve)


def test_cache_stats_counters(tmp_path):
    rows, _ = _write_cohort(tmp_path, n_pairs=1, n_frames=2)
    loader = PatchLoader(str(tmp_path), 8, 2, 4)
    loader.load_sample(rows[0])
    st1 = loader.cache_stats()
    assert st1["misses"] > 0 and st1["hits"] >= 0
    loader.load_sample(rows[1])  # same frame, different origin: all hits
    st2 = loader.cache_stats()
    assert st2["misses"] == st1["misses"]
    assert st2["hits"] > st1["hits"]
