"""DICOM -> HDF5 ingestion for 4D flow MRI cases.

Reference workflow (/root/reference/src/prepare_data/prepare_mri_data.py +
DicomData.py): walk a ``[case]/[series]/[triggerTime]`` tree with exactly 3
phase and 3 magnitude series; per trigger time read the pixel volumes,
parse venc + flow-encoding direction from the Siemens SequenceName (e.g.
``fl3d1_v150fh`` -> venc 150 cm/s, direction fh) via the regex
``.*?_v(\\d+)(\\w+)`` (DicomData.py:47-55); convert phase to velocity with
v = (p - 2048)/2048 * venc/100 m/s (:31-35); map in->u, rl/ap->w, fh->v
with per-axis sign multipliers (:60-73); append everything (plus voxel
spacing) to HDF5 (:75-92).

pydicom is optional: when absent, the vendored minimal reader
(:mod:`.dicom_lite`, uncompressed little-endian only) is used instead, so
the ingest walk runs in pydicom-less environments.
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..io.h5 import append_to_h5

_VENC_PATTERN = re.compile(r".*?_v(\d+)(\w+)")


def _dicom_reader():
    """Prefer pydicom (full format coverage); fall back to the vendored
    :mod:`.dicom_lite` parser, which exposes the same ``dcmread`` subset."""
    try:
        import pydicom

        return pydicom
    except ImportError:
        from . import dicom_lite

        return dicom_lite


def parse_venc_and_direction(sequence_name: str) -> tuple[int, str]:
    """('fl3d1_v150fh') -> (150, 'fh'). Raises on unrecognised headers."""
    found = _VENC_PATTERN.search(sequence_name)
    if not found:
        raise ValueError(
            f"Venc pattern not found in SequenceName {sequence_name!r}; "
            "please check your DICOM header."
        )
    return int(found.group(1)), found.group(2)


def phase_to_velocity(phase_image: np.ndarray, venc_cm_s: int) -> np.ndarray:
    """Phase px (0..4096, 2048 = zero) -> velocity in m/s (DicomData.py:31-35)."""
    return (phase_image - 2048.0) / 2048.0 * venc_cm_s / 100.0


def load_dicom_volume(vol_dir: str):
    """Read all DICOM slices under a directory -> (volume, spacing, sequence_name)."""
    reader = _dicom_reader()
    volume, spacing, sequence_name = [], None, None
    files = sorted(
        os.path.join(root, f) for root, _, fs in os.walk(vol_dir) for f in fs
    )
    for slice_nr, path in enumerate(files):
        ds = reader.dcmread(path)
        if slice_nr == 0:
            spacing = np.asarray(list(ds.PixelSpacing) + [ds.SliceThickness], dtype=float)
            sequence_name = ds.SequenceName
        volume.append(ds.pixel_array)
    return np.asarray(volume), spacing, sequence_name


class DicomData:
    """Accumulates one trigger-time's 3 phase + 3 magnitude volumes."""

    def __init__(self):
        self.sequence_names: list[str] = []
        self.spacing = None
        self._phase_images: list[np.ndarray] = []
        self._mag_images: list[np.ndarray] = []
        self.u = self.v = self.w = None
        self.u_mag = self.v_mag = self.w_mag = None
        self.u_venc = self.v_venc = self.w_venc = None

    def add_series(self, phase_images, mag_images, sequence_name, spacing) -> None:
        self._phase_images.append(phase_images)
        self._mag_images.append(mag_images)
        self.sequence_names.append(sequence_name)
        self.spacing = spacing

    def determine_velocity_components(
        self, in_multiplier: int = 1, fh_multiplier: int = -1, rl_multiplier: int = 1
    ) -> None:
        """Direction mapping: in->u, rl/ap->w, fh->v (DicomData.py:60-73)."""
        for seq_name, phase, mag in zip(
            self.sequence_names, self._phase_images, self._mag_images
        ):
            venc, direction = parse_venc_and_direction(seq_name)
            velocity = phase_to_velocity(phase, venc)

            if direction == "in":
                self.u, self.u_mag, self.u_venc = velocity * in_multiplier, mag, venc / 100
            elif direction in ("rl", "ap"):
                self.w, self.w_mag, self.w_venc = velocity * rl_multiplier, mag, venc / 100
            else:  # "fh"
                self.v, self.v_mag, self.v_venc = velocity * fh_multiplier, mag, venc / 100

    def save_dataset(self, output_filepath: str, trigger_time) -> None:
        assert self.u is not None, "Please calculate velocity components first"
        append_to_h5(output_filepath, "triggerTimes", float(trigger_time), expand_dims=True)
        for name, data in [
            ("u", self.u), ("v", self.v), ("w", self.w),
            ("mag_u", self.u_mag), ("mag_v", self.v_mag), ("mag_w", self.w_mag),
            ("venc_u", self.u_venc), ("venc_v", self.v_venc), ("venc_w", self.w_venc),
            ("dx", self.spacing),
        ]:
            append_to_h5(output_filepath, name, data, expand_dims=True)


def ingest_case(
    case_dir: str,
    output_filepath: str,
    phase_pattern: str = "_P_",
    mag_pattern: str = "_M_",
    in_multiplier: int = 1,
    fh_multiplier: int = -1,
    rl_multiplier: int = 1,
    verbose: bool = True,
) -> int:
    """Walk one case directory and append every trigger time to HDF5.

    Returns the number of time frames ingested.
    """
    directories = os.listdir(case_dir)
    phase_dirs = [d for d in directories if phase_pattern in d]
    mag_dirs = [d for d in directories if mag_pattern in d]
    assert len(phase_dirs) == 3, f"There must be exactly 3 Phase directories matching {phase_pattern}"
    assert len(mag_dirs) == 3, f"There must be exactly 3 Magnitude directories matching {mag_pattern}"

    time_frames = sorted(os.listdir(os.path.join(case_dir, phase_dirs[0])), key=float)
    os.makedirs(os.path.dirname(os.path.abspath(output_filepath)), exist_ok=True)

    for j, trigger_time in enumerate(time_frames):
        if verbose:
            print(f"\rProcessing {j+1}/{len(time_frames)} (frame {trigger_time})", end="")
        data = DicomData()
        for mag_dir, p_dir in zip(mag_dirs, phase_dirs):
            mag_images, _, _ = load_dicom_volume(os.path.join(case_dir, mag_dir, trigger_time))
            phase_images, spacing, sequence = load_dicom_volume(
                os.path.join(case_dir, p_dir, trigger_time)
            )
            data.add_series(phase_images, mag_images, sequence, spacing)
        data.determine_velocity_components(in_multiplier, fh_multiplier, rl_multiplier)
        data.save_dataset(output_filepath, trigger_time)
    if verbose:
        print(f"\nDone! saved at {output_filepath}")
    return len(time_frames)
