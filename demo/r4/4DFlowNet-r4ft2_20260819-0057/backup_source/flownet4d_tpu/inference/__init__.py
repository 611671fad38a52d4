from .patcher import PatchGenerator
from .predictor import VolumePredictor

__all__ = ["PatchGenerator", "VolumePredictor"]
