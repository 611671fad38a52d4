"""Synthetic LR dataset generation end-to-end + DICOM header parsing."""

import numpy as np
import h5py
import pytest

from flownet4d_tpu.prepare_data.lowres import generate_lowres_dataset
from flownet4d_tpu.prepare_data.dicom import (
    parse_venc_and_direction,
    phase_to_velocity,
    DicomData,
)
from flownet4d_tpu.io.h5 import append_to_h5


def _make_hr(path, n_frames=2, size=16):
    rng = np.random.default_rng(0)
    mask = np.zeros((size,) * 3, np.float32)
    mask[4:12, 4:12, 4:12] = 1.0
    append_to_h5(path, "mask", mask, expand_dims=True)
    for _ in range(n_frames):
        for comp in "uvw":
            vel = rng.uniform(-0.8, 0.8, (size,) * 3).astype(np.float32) * mask
            append_to_h5(path, comp, vel, expand_dims=True)
            append_to_h5(path, f"{comp}_max", float(np.abs(vel).max()), expand_dims=True)


def test_generate_lowres_dataset_schema(tmp_path):
    hr = str(tmp_path / "hr.h5")
    lr = str(tmp_path / "lr.h5")
    _make_hr(hr)

    n = generate_lowres_dataset(hr, lr, downsample=2, seed=3, verbose=False)
    assert n == 2

    with h5py.File(lr) as h:
        # same schema as the bundled example_data.h5
        for col in ["u", "v", "w", "mag_u", "mag_v", "mag_w",
                    "venc_u", "venc_v", "venc_w", "SNRdb"]:
            assert h[col].shape[0] == 2, col
        assert h["u"].shape[1:] == (8, 8, 8)  # halved each axis
        assert h["mask"].shape == (1, 8, 8, 8)  # saved once, zoomed
        # vencs come from the allowed set (or the 1.5 floor)
        vencs = np.concatenate([h["venc_u"][:], h["venc_v"][:], h["venc_w"][:]])
        allowed = {0.3, 0.6, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5}
        assert set(np.round(vencs, 3)).issubset(allowed)
        # velocities bounded by their venc (phase wrap limit)
        for comp, venc_col in [("u", "venc_u"), ("v", "venc_v"), ("w", "venc_w")]:
            assert np.abs(h[comp][:]).max() <= h[venc_col][:].max() + 1e-6


def test_lowres_mask_matches_velocity_grid_at_odd_factors(tmp_path):
    """When dims don't divide by the factor, the k-space crop keeps
    2*int(half*ratio) bins; the saved mask must follow the *actual* LR
    shape (ratio-zoom would disagree: 21 @ 4x -> vel 4, ratio-zoom 5)."""
    hr = str(tmp_path / "hr.h5")
    lr = str(tmp_path / "lr.h5")
    _make_hr(hr, n_frames=1, size=21)

    generate_lowres_dataset(hr, lr, downsample=4, seed=2, verbose=False)
    with h5py.File(lr) as h:
        assert h["u"].shape[1:] == (4, 4, 4)
        assert h["mask"].shape[1:] == h["u"].shape[1:]


def test_lowres_output_trains(tmp_path):
    """The generated LR pairs feed the training pipeline unchanged."""
    import shutil

    hr = str(tmp_path / "hr.h5")
    lr = str(tmp_path / "lr.h5")
    _make_hr(hr)
    generate_lowres_dataset(hr, lr, downsample=2, seed=4, verbose=False)

    from flownet4d_tpu.data.patch_index import write_header
    from flownet4d_tpu.prepare_data.patch_data import generate_random_patches
    from flownet4d_tpu.data import PatchLoader, load_indexes

    with h5py.File(lr) as h:
        mask = (np.asarray(h["mask"][0]) >= 0.4).astype(np.int32)
    csv = str(tmp_path / "train.csv")
    write_header(csv)
    generate_random_patches("lr.h5", "hr.h5", csv, 0, 4, mask, 6, 0.1, 1,
                            apply_all_rotation=False, rng=np.random.default_rng(5))

    loader = PatchLoader(str(tmp_path), 6, 2, 4)
    batch = next(iter(loader.initialize_dataset(load_indexes(csv), shuffle=False)))
    assert batch.lr.shape == (4, 6, 6, 6, 3)
    assert batch.hr.shape == (4, 12, 12, 12, 3)
    assert np.isfinite(batch.lr).all() and np.isfinite(batch.hr).all()


def _dcm_element(group, elem, vr, value):
    """Encode one explicit-VR-LE data element."""
    import struct

    if vr in (b"OB", b"OW", b"UN", b"UT", b"SQ"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _pad_even(s):
    b = s.encode("ascii")
    return b + b" " if len(b) % 2 else b


def write_dicom_fixture(path, pixels, sequence_name, spacing=(1.5, 1.5, 2.5),
                        implicit=False):
    """Write a minimal valid DICOM file (preamble + meta + dataset)."""
    import struct

    pixels = np.ascontiguousarray(pixels, dtype="<u2")
    rows, cols = pixels.shape
    ts = ("1.2.840.10008.1.2" if implicit else "1.2.840.10008.1.2.1")
    meta = _dcm_element(0x0002, 0x0010, b"UI", _pad_even(ts))

    def element(group, elem, vr, value):
        if implicit:
            return struct.pack("<HHI", group, elem, len(value)) + value
        return _dcm_element(group, elem, vr, value)

    ds = b"".join([
        element(0x0018, 0x0024, b"SH", _pad_even(sequence_name)),
        element(0x0018, 0x0050, b"DS", _pad_even(str(spacing[2]))),
        element(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        element(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        element(0x0028, 0x0030, b"DS", _pad_even(f"{spacing[0]}\\{spacing[1]}")),
        element(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        element(0x0028, 0x0103, b"US", struct.pack("<H", 0)),
        element(0x7FE0, 0x0010, b"OW", pixels.tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + ds)


def _make_case_tree(case_dir, rng, n_slices=3, size=8, trigger_times=("0", "40.5")):
    """[case]/[series]/[triggerTime]/[slices] tree: 3 phase + 3 mag series."""
    import os

    directions = [("in", 150), ("fh", 150), ("rl", 80)]
    phase_px = {}
    for i, (direction, venc) in enumerate(directions):
        pdir = case_dir / f"ser{i}_P_{direction}"
        mdir = case_dir / f"ser{i}_M_{direction}"
        for tt in trigger_times:
            os.makedirs(pdir / tt)
            os.makedirs(mdir / tt)
            for s in range(n_slices):
                px = rng.integers(0, 4096, (size, size)).astype(np.uint16)
                phase_px[(direction, tt, s)] = px
                write_dicom_fixture(pdir / tt / f"{s:03d}.dcm", px,
                                    f"fl3d1_v{venc}{direction}",
                                    implicit=(s == n_slices - 1))
                write_dicom_fixture(mdir / tt / f"{s:03d}.dcm",
                                    rng.integers(0, 1000, (size, size)).astype(np.uint16),
                                    f"fl3d1_v{venc}{direction}")
    return phase_px, directions


def test_dicom_lite_reader_roundtrip(tmp_path):
    """Vendored reader recovers pixels + the 4 header tags, both VR forms."""
    from flownet4d_tpu.prepare_data import dicom_lite

    px = np.arange(64, dtype=np.uint16).reshape(8, 8) * 13 % 4096
    for implicit in (False, True):
        p = str(tmp_path / f"s_{implicit}.dcm")
        write_dicom_fixture(p, px, "fl3d1_v150fh", spacing=(1.25, 1.75, 3.0),
                            implicit=implicit)
        ds = dicom_lite.dcmread(p)
        np.testing.assert_array_equal(ds.pixel_array, px)
        assert ds.SequenceName == "fl3d1_v150fh"
        assert list(ds.PixelSpacing) == [1.25, 1.75]
        assert ds.SliceThickness == 3.0


def test_ingest_case_end_to_end(tmp_path):
    """Full ingest walk without pydicom: HDF5 schema + velocity golden.

    Mirrors the reference walk prepare_mri_data.py:8-50 writing the schema
    of prepare_mri_data.py:75-92 (triggerTimes/u/v/w/mag_*/venc_*/dx).
    """
    from flownet4d_tpu.prepare_data.dicom import ingest_case

    case = tmp_path / "case1"
    rng = np.random.default_rng(7)
    phase_px, directions = _make_case_tree(case, rng)
    out = str(tmp_path / "mri.h5")

    n = ingest_case(str(case), out, verbose=False)
    assert n == 2

    with h5py.File(out) as h:
        assert set(h.keys()) == {
            "triggerTimes", "u", "v", "w", "mag_u", "mag_v", "mag_w",
            "venc_u", "venc_v", "venc_w", "dx",
        }
        # trigger frames sorted numerically, one row per frame
        np.testing.assert_allclose(np.ravel(h["triggerTimes"][:]), [0.0, 40.5])
        assert h["u"].shape == (2, 3, 8, 8)
        np.testing.assert_allclose(h["dx"][0], [1.5, 1.5, 2.5])
        # direction mapping + phase->velocity golden (in->u, fh->v*-1, rl->w)
        for comp, (direction, venc), mult in zip(
            "uvw", [directions[0], directions[1], directions[2]], [1, -1, 1]
        ):
            for ti, tt in enumerate(("0", "40.5")):
                expected = np.stack([
                    (phase_px[(direction, tt, s)].astype(np.float64) - 2048.0)
                    / 2048.0 * venc / 100.0 * mult
                    for s in range(3)
                ])
                np.testing.assert_allclose(h[comp][ti], expected, atol=1e-9)
            assert float(h[f"venc_{comp}"][0]) == pytest.approx(venc / 100.0)


def test_parse_venc_and_direction():
    assert parse_venc_and_direction("fl3d1_v150fh") == (150, "fh")
    assert parse_venc_and_direction("xyz_v80in") == (80, "in")
    with pytest.raises(ValueError):
        parse_venc_and_direction("no_venc_here")


def test_phase_to_velocity_midpoint_and_range():
    assert phase_to_velocity(np.float64(2048.0), 150) == 0.0
    # full-scale phase 4096 -> +venc in m/s
    assert phase_to_velocity(np.float64(4096.0), 150) == pytest.approx(1.5)
    assert phase_to_velocity(np.float64(0.0), 150) == pytest.approx(-1.5)


def test_dicom_data_direction_mapping(tmp_path):
    d = DicomData()
    phase = np.full((4, 4, 4), 3072.0)  # -> +0.5 * venc
    mag = np.ones((4, 4, 4))
    spacing = np.asarray([1.0, 1.0, 2.0])
    d.add_series(phase, mag, "fl3d1_v100in", spacing)
    d.add_series(phase, mag, "fl3d1_v100fh", spacing)
    d.add_series(phase, mag, "fl3d1_v100rl", spacing)
    d.determine_velocity_components(in_multiplier=1, fh_multiplier=-1, rl_multiplier=1)

    np.testing.assert_allclose(d.u, 0.5)   # in -> u
    np.testing.assert_allclose(d.v, -0.5)  # fh -> v with -1 multiplier
    np.testing.assert_allclose(d.w, 0.5)   # rl -> w
    assert d.u_venc == d.v_venc == d.w_venc == 1.0

    out = str(tmp_path / "mri.h5")
    d.save_dataset(out, trigger_time="12.5")
    with h5py.File(out) as h:
        assert set(h.keys()) == {
            "triggerTimes", "u", "v", "w", "mag_u", "mag_v", "mag_w",
            "venc_u", "venc_v", "venc_w", "dx",
        }
        assert float(h["triggerTimes"][0]) == 12.5
