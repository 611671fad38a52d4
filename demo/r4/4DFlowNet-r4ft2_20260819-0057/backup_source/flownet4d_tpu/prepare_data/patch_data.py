"""Random patch sampling with fluid-coverage criteria -> patch-index CSV.

Behaviour contract (reference: /root/reference/src/prepare_data/PatchData.py
and prepare_patches.py): per time frame, draw random cube origins until
``n_patch`` patches with mask coverage >= ``minimum_coverage`` are found;
allow up to ``empty_patch_allowed`` below-threshold exceptions; give up
after 100 consecutive misses (PatchData.py:18-21). Each accepted patch is
written unrotated plus either all 9 plane/angle rotations
(``apply_all_rotation=True``) or one random rotation (prepare_patches
generate_random_patches, PatchData.py:12-68).
"""

from __future__ import annotations

import csv
import dataclasses

import numpy as np

from ..data.patch_index import CSV_FIELDS, write_header  # noqa: F401 (re-export)


@dataclasses.dataclass
class PatchData:
    source_file: str
    target_file: str
    patch_size: int
    idx: int | None = None
    start_x: int | None = None
    start_y: int | None = None
    start_z: int | None = None
    rotate: int = 0
    rotation_plane: int = 0
    rotation_degree_idx: int = 0
    coverage: float = 0.0

    def create_random_patch(self, mask: np.ndarray, index: int, rng) -> None:
        """Uniform origin such that the cube stays in bounds (PatchData.py:85-89)."""
        self.idx = int(index)
        self.start_x = int(rng.integers(0, mask.shape[0] - self.patch_size + 1))
        self.start_y = int(rng.integers(0, mask.shape[1] - self.patch_size + 1))
        self.start_z = int(rng.integers(0, mask.shape[2] - self.patch_size + 1))

    def set_patch(self, index: int, x: int, y: int, z: int) -> None:
        self.idx, self.start_x, self.start_y, self.start_z = index, x, y, z

    def calculate_patch_coverage(self, binary_mask: np.ndarray) -> None:
        """Fraction of nonzero mask voxels, rounded to 3 decimals (:97-102)."""
        p = self.patch_size
        region = binary_mask[
            self.start_x : self.start_x + p,
            self.start_y : self.start_y + p,
            self.start_z : self.start_z + p,
        ]
        self.coverage = round(float(np.count_nonzero(region)) / p**3, 3)

    def write_to_csv(self, output_filename: str) -> None:
        with open(output_filename, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
            writer.writerow(
                {
                    "source": self.source_file,
                    "target": self.target_file,
                    "index": self.idx,
                    "start_x": self.start_x,
                    "start_y": self.start_y,
                    "start_z": self.start_z,
                    "rotate": self.rotate,
                    "rotation_plane": self.rotation_plane,
                    "rotation_degree_idx": self.rotation_degree_idx,
                    "coverage": self.coverage,
                }
            )


def generate_random_patches(
    input_filename: str,
    target_filename: str,
    output_filename: str,
    index: int,
    n_patch: int,
    binary_mask: np.ndarray,
    patch_size: int,
    minimum_coverage: float,
    empty_patch_allowed: int,
    apply_all_rotation: bool = True,
    rng=None,
) -> int:
    """Sample and write patches for one frame; returns patches written."""
    if rng is None:
        rng = np.random.default_rng()

    written = 0
    empty_taken = 0
    misses = 0
    accepted = 0
    while accepted < n_patch:
        if misses > 100:
            print(
                f"Cannot find enough patches above {minimum_coverage} coverage, "
                "please lower the minimum_coverage"
            )
            break

        patch = PatchData(input_filename, target_filename, patch_size)
        patch.create_random_patch(binary_mask, index, rng)
        patch.calculate_patch_coverage(binary_mask)

        if patch.coverage < minimum_coverage:
            if empty_taken < empty_patch_allowed:
                empty_taken += 1
            else:
                misses += 1
                continue

        patch.write_to_csv(output_filename)
        written += 1

        patch.rotate = 1
        if apply_all_rotation:
            for plane_nr in range(1, 4):
                patch.rotation_plane = plane_nr
                for rotation_idx in range(1, 4):
                    patch.rotation_degree_idx = rotation_idx
                    patch.write_to_csv(output_filename)
                    written += 1
        else:
            patch.rotation_plane = int(rng.integers(1, 4))
            patch.rotation_degree_idx = int(rng.integers(1, 4))
            patch.write_to_csv(output_filename)
            written += 1

        accepted += 1
    return written
