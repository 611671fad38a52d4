"""Synthetic low-res dataset generation from high-res CFD volumes.

Reference workflow (/root/reference/src/prepare_data/prepare_lowres_dataset.py):
per HR frame, build a synthetic magnitude (mask x a cycling pixel value from
{60,80,120,180,240}, :32,46-48), draw a target SNR ~ U{14.0..16.9} dB (:42),
select vencs (68% chance all three components share one, :9-14,66-81) from
{0.3,0.6,1.0,1.5,2.0,2.5,3.0,3.5} above 1.1 x vmax with a 1.5 m/s floor and
main-component forcing (:29-33,59-104), k-space-downsample each component,
and append u/v/w, mag_*, venc_*, SNRdb (+ once, a linearly zoomed mask) to
the output HDF5 (:108-132).
"""

from __future__ import annotations

import numpy as np
import h5py
import scipy.ndimage as ndimage

from . import fft_downsampling as fft
from ..io.h5 import append_to_h5

MAG_VALUES = np.asarray([60, 80, 120, 180, 240])  # px values in [0, 4095]
VENC_VALUES = np.asarray([0.3, 0.6, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5])  # m/s
BASE_VENC_MULTIPLIER = 1.1  # default venc is 10% above vmax (ref :29)


def choose_venc_mode(rng) -> str:
    """68% 'same' venc on all 3 components, else 'diff' (ref :9-14)."""
    return "same" if rng.random() < 0.68 else "diff"


def _pick_venc(vmax: float, rng) -> float:
    """One of the two smallest venc candidates above vmax (ref :75-78)."""
    candidates = VENC_VALUES[VENC_VALUES > vmax]
    if len(candidates) == 0:
        return float(VENC_VALUES[-1])
    idx = int(rng.integers(0, 2))
    return float(candidates[min(idx, len(candidates) - 1)])


def select_vencs(max_u: float, max_v: float, max_w: float, rng):
    """Reference venc-selection policy (prepare_lowres_dataset.py:63-104)."""
    all_max = np.asarray([max_u, max_v, max_w])
    if choose_venc_mode(rng) == "same":
        max_vel = float(np.max(all_max))
        if max_vel < 1.5:
            venc = 1.5
        else:
            venc = _pick_venc(max_vel, rng)
        return venc, venc, venc

    vencs = [_pick_venc(m, rng) for m in all_max]
    main = int(np.argmax(all_max))
    if vencs[main] < 1.5:  # 1.5 m/s is the common clinical venc
        vencs[main] = 1.5
    return tuple(vencs)


def generate_lowres_dataset(
    input_filepath: str,
    output_filepath: str,
    downsample: int = 2,
    seed: int | None = None,
    verbose: bool = True,
) -> int:
    """HR CFD HDF5 -> synthetic LR HDF5. Returns the number of frames written."""
    rng = np.random.default_rng(seed)
    crop_ratio = 1.0 / downsample

    with h5py.File(input_filepath, "r") as hf:
        data_count = len(hf["u"])

    mask_saved = False
    for idx in range(data_count):
        target_snr_db = float(rng.integers(140, 170)) / 10.0

        with h5py.File(input_filepath, "r") as hf:
            mask = np.asarray(hf["mask"][0])
            hr_u = np.asarray(hf["u"][idx])
            hr_v = np.asarray(hf["v"][idx])
            hr_w = np.asarray(hf["w"][idx])
            max_u = float(hf["u_max"][idx]) * BASE_VENC_MULTIPLIER
            max_v = float(hf["v_max"][idx]) * BASE_VENC_MULTIPLIER
            max_w = float(hf["w_max"][idx]) * BASE_VENC_MULTIPLIER

        mag_image = mask * MAG_VALUES[idx % len(MAG_VALUES)]
        venc_u, venc_v, venc_w = select_vencs(max_u, max_v, max_w, rng)
        if verbose:
            print(f"frame {idx}: SNR {target_snr_db} dB, vencs {venc_u}/{venc_v}/{venc_w}")

        lr_u, mag_u = fft.downsample_phase_img(hr_u, mag_image, venc_u, crop_ratio, target_snr_db, rng)
        lr_v, mag_v = fft.downsample_phase_img(hr_v, mag_image, venc_v, crop_ratio, target_snr_db, rng)
        lr_w, mag_w = fft.downsample_phase_img(hr_w, mag_image, venc_w, crop_ratio, target_snr_db, rng)

        for name, data in [
            ("u", lr_u), ("v", lr_v), ("w", lr_w),
            ("mag_u", mag_u), ("mag_v", mag_v), ("mag_w", mag_w),
            ("venc_u", venc_u), ("venc_v", venc_v), ("venc_w", venc_w),
            ("SNRdb", target_snr_db),
        ]:
            append_to_h5(output_filepath, name, data, expand_dims=True)

        if not mask_saved:
            # Zoom to the *actual* LR velocity shape, not by crop_ratio: the
            # k-space crop keeps 2*int(half*ratio) bins per axis, so for
            # dims not divisible by the factor (e.g. 84 at 4x -> 20, not 21)
            # a ratio-zoomed mask would disagree with the velocity grids
            # (the reference zooms by ratio, prepare_lowres_dataset.py, and
            # inherits that mismatch; identical output whenever the dims
            # divide evenly — the golden-tested 2x case).
            factors = tuple(l / h for l, h in zip(lr_u.shape, mask.shape))
            new_mask = ndimage.zoom(mask, factors, order=1)
            append_to_h5(output_filepath, "mask", new_mask, expand_dims=True)
            mask_saved = True

    return data_count
