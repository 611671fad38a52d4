"""Whole-volume inference I/O (reference ImageDataset equivalent).

Loads one time frame of u/v/w velocities, mag_u/v/w magnitudes and the
per-component vencs from HDF5, normalises identically to training, and
keeps venc / velocity_per_px for post-processing
(/root/reference/src/utils/ImageDataset.py:4-85).
"""

from __future__ import annotations

import numpy as np
import h5py


class VolumeDataset:
    def __init__(self):
        self.velocity_colnames = ["u", "v", "w"]
        self.venc_colnames = ["venc_u", "venc_v", "venc_w"]
        self.mag_colnames = ["mag_u", "mag_v", "mag_w"]
        self.dx_colname = "dx"

        self.u = self.v = self.w = None
        self.mag_u = self.mag_v = self.mag_w = None
        self.venc = None
        self.velocity_per_px = None
        self.dx = None

    def get_dataset_len(self, filepath: str) -> int:
        with h5py.File(filepath, "r") as hf:
            return hf[self.velocity_colnames[0]].shape[0]

    def load_vectorfield(self, filepath: str, idx: int) -> None:
        """Load + normalise frame ``idx`` (ImageDataset.py:52-85)."""
        vel, mag, vencs = [], [], []
        dx = None
        with h5py.File(filepath, "r") as hf:
            if self.dx_colname in hf:
                dx = np.asarray(hf[self.dx_colname][idx])
            for v_col, m_col, ve_col in zip(
                self.velocity_colnames, self.mag_colnames, self.venc_colnames
            ):
                vel.append(np.asarray(hf[v_col][idx]))
                mag.append(np.asarray(hf[m_col][idx]))
                vencs.append(np.asarray(hf[ve_col][idx]))

        venc = np.max(np.asarray(vencs))
        vel = np.asarray(vel) / venc  # [-1, 1]
        mag = np.asarray(mag) / 4095.0  # [0, 1]

        self.u, self.v, self.w = (c.astype(np.float32) for c in vel)
        self.mag_u, self.mag_v, self.mag_w = (c.astype(np.float32) for c in mag)
        self.venc = venc.astype(np.float32)
        # Pixel sensitivity used to zero out small predictions (ImageDataset.py:31)
        self.velocity_per_px = self.venc / 2048.0
        self.dx = dx

    def velocity_stack(self) -> np.ndarray:
        """(D, H, W, 3) stacked normalized velocity."""
        return np.stack([self.u, self.v, self.w], axis=-1)

    def magnitude_stack(self) -> np.ndarray:
        return np.stack([self.mag_u, self.mag_v, self.mag_w], axis=-1)

    def postprocess_result(self, results: np.ndarray, zerofy: bool = True) -> np.ndarray:
        """Denormalise and zero |v| below one pixel's phase sensitivity
        (ImageDataset.py:37-45)."""
        results = results * self.venc
        if zerofy:
            results = np.where(np.abs(results) < self.velocity_per_px, 0.0, results)
        return results
