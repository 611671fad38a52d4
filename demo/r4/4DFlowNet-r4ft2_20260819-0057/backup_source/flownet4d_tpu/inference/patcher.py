"""Overlapping sliding-window patchify / halo-crop stitch.

Exact geometric contract of the reference PatchGenerator
(/root/reference/src/Network/PatchGenerator.py:5-154):

- stride = ``patch_size - 4`` on LR (2-voxel halo on each face, :8)
- mandatory symmetric zero pre-pad of ``side_pad = 2`` (:57-60)
- far-side pad-to-fit rule per axis (:62-80), remembered in HR units for
  the final crop (:83)
- at stitch time, a ``2 * res_increase`` HR halo is discarded from every
  patch face, cores are assembled on the grid, trailing padding cropped
  (:116-154)

Implementation is fully vectorised: extraction is a strided view (zero
copies until the final reshape) and stitching is one transpose+reshape —
the reference's triple Python loop and per-patch ``np.concatenate`` are
gone. This keeps the host side far from the critical path so the TPU
forward pass dominates inference time.
"""

from __future__ import annotations

import numpy as np


class PatchGenerator:
    def __init__(self, patch_size: int, res_increase: int):
        self.patch_size = patch_size
        self.effective_patch_size = patch_size - 4  # LR stride (ref :8)
        self.res_increase = res_increase
        self.padding = (0, 0, 0)  # HR-units trailing pad, set by patchify
        self.nr_x = self.nr_y = self.nr_z = 0

    # ------------------------------------------------------------------ #

    def _pad_to_patch_size_with_overlap(self, img: np.ndarray) -> np.ndarray:
        """Reference pad rule (PatchGenerator.py:53-86)."""
        side_pad = (self.patch_size - self.effective_patch_size) // 2
        img = np.pad(img, [(side_pad, side_pad)] * 3, "constant")

        pads = []
        for axis in range(3):
            res = img.shape[axis] % self.effective_patch_size
            if res > 2 * side_pad:
                pads.append(self.patch_size - res)
            else:
                pads.append(2 * side_pad - res)

        img = np.pad(img, [(0, p) for p in pads], "constant")
        self.padding = tuple(p * self.res_increase for p in pads)
        return img

    def _generate_overlapping_patches(self, img: np.ndarray):
        p = self.patch_size
        eff = self.effective_patch_size
        img = self._pad_to_patch_size_with_overlap(img)
        all_pads = p - eff

        nr = [(s - all_pads) // eff for s in img.shape]

        windows = np.lib.stride_tricks.sliding_window_view(img, (p, p, p))
        windows = windows[::eff, ::eff, ::eff]
        assert windows.shape[:3] == tuple(nr), (windows.shape, nr)
        patches = windows.reshape(-1, p, p, p)
        return patches, nr[0], nr[1], nr[2]

    # ------------------------------------------------------------------ #

    def patchify(self, dataset):
        """Six patch stacks from a VolumeDataset (PatchGenerator.py:13-40).

        Returns ((u, v, w), (mag_u, mag_v, mag_w)) with trailing channel dim.
        """
        u, i, j, k = self._generate_overlapping_patches(dataset.u)
        v, _, _, _ = self._generate_overlapping_patches(dataset.v)
        w, _, _, _ = self._generate_overlapping_patches(dataset.w)
        mu, _, _, _ = self._generate_overlapping_patches(dataset.mag_u)
        mv, _, _, _ = self._generate_overlapping_patches(dataset.mag_v)
        mw, _, _, _ = self._generate_overlapping_patches(dataset.mag_w)

        self.nr_x, self.nr_y, self.nr_z = i, j, k

        expand = lambda x: np.expand_dims(x, -1)
        return (expand(u), expand(v), expand(w)), (expand(mu), expand(mv), expand(mw))

    def patchify_stacked(self, dataset):
        """(N, p, p, p, 3) velocity and magnitude stacks (TPU-native entry)."""
        (u, v, w), (mu, mv, mw) = self.patchify(dataset)
        vel = np.concatenate([u, v, w], axis=-1)
        mag = np.concatenate([mu, mv, mw], axis=-1)
        return vel, mag

    # ------------------------------------------------------------------ #

    def _patchup_with_overlap(self, patches: np.ndarray, x: int, y: int, z: int):
        """Stitch (N, P, P, P) HR patches back to a volume (ref :116-154).

        Also accepts pre-cropped (N, n, n, n) cores — the predictor crops
        the 2*res halo on device so only core bytes cross the wire.
        """
        side_pad = (self.patch_size - self.effective_patch_size) // 2
        s = side_pad * self.res_increase
        p_hr = patches.shape[1]
        full_hr = self.patch_size * self.res_increase

        if p_hr == full_hr - 2 * s:  # already cropped on device
            n = p_hr
            core = patches
        else:
            n = p_hr - 2 * s
            core = patches[:, s : s + n, s : s + n, s : s + n]
        core = core.reshape(x, y, z, n, n, n)
        vol = core.transpose(0, 3, 1, 4, 2, 5).reshape(x * n, y * n, z * n)

        px, py, pz = self.padding
        if px > 0:
            vol = vol[:-px]
        if py > 0:
            vol = vol[:, :-py]
        if pz > 0:
            vol = vol[:, :, :-pz]
        return vol

    def unpatchify(self, results: np.ndarray):
        """(N, P, P, P, 3) predictions -> three stitched component volumes."""
        return tuple(
            self._patchup_with_overlap(results[..., i], self.nr_x, self.nr_y, self.nr_z)
            for i in range(3)
        )
