from .trainer import TrainerController, TrainState
from .metrics import MeanMetric, MetricSet

__all__ = ["TrainerController", "TrainState", "MeanMetric", "MetricSet"]
