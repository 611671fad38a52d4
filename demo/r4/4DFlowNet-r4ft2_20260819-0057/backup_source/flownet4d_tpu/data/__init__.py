from .patch_index import PatchIndexRow, load_indexes
from .patch_loader import PatchLoader, TrainingBatch
from .volume import VolumeDataset

__all__ = [
    "PatchIndexRow",
    "load_indexes",
    "PatchLoader",
    "TrainingBatch",
    "VolumeDataset",
]
