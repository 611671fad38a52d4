"""Patch-index CSV schema.

The reference indexes training patches in CSV files with the 10-column
schema ``source,target,index,start_x,start_y,start_z,rotate,
rotation_plane,rotation_degree_idx,coverage``
(/root/reference/src/prepare_data/PatchData.py:6, consumed by
PatchHandler3D.load_patches_from_index_file at PatchHandler3D.py:49-59).
"""

from __future__ import annotations

import csv
import dataclasses

CSV_FIELDS = [
    "source",
    "target",
    "index",
    "start_x",
    "start_y",
    "start_z",
    "rotate",
    "rotation_plane",
    "rotation_degree_idx",
    "coverage",
]


@dataclasses.dataclass(frozen=True)
class PatchIndexRow:
    source: str  # low-res HDF5 filename (relative to the data dir)
    target: str  # high-res HDF5 filename
    index: int  # time-frame row
    start_x: int
    start_y: int
    start_z: int
    rotate: int
    rotation_plane: int
    rotation_degree_idx: int
    coverage: float

    @property
    def rotation_case(self) -> int:
        """Flat rotation code in [0, 9] (see ops.rotate)."""
        if not self.rotate or not (1 <= self.rotation_plane <= 3) or not (
            1 <= self.rotation_degree_idx <= 3
        ):
            return 0
        return (self.rotation_plane - 1) * 3 + self.rotation_degree_idx


def load_indexes(index_file: str) -> list[PatchIndexRow]:
    """Parse a patch-index CSV (reference trainer.py:5-10 uses genfromtxt)."""
    rows = []
    with open(index_file, newline="") as f:
        reader = csv.DictReader(f)
        for rec in reader:
            rows.append(
                PatchIndexRow(
                    source=rec["source"],
                    target=rec["target"],
                    index=int(rec["index"]),
                    start_x=int(rec["start_x"]),
                    start_y=int(rec["start_y"]),
                    start_z=int(rec["start_z"]),
                    rotate=int(rec["rotate"]),
                    rotation_plane=int(rec["rotation_plane"]),
                    rotation_degree_idx=int(rec["rotation_degree_idx"]),
                    coverage=float(rec["coverage"]),
                )
            )
    return rows


def write_header(filename: str) -> None:
    """Start a new patch-index CSV with the canonical header."""
    with open(filename, "w", newline="") as f:
        csv.DictWriter(f, fieldnames=CSV_FIELDS).writeheader()
