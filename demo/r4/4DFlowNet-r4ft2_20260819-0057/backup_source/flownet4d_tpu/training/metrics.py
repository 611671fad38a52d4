"""Running-mean metrics.

The reference keeps 9 ``tf.keras.metrics.Mean`` running means
(/root/reference/src/Network/TrainerController.py:52-63): train/val x
{loss, accuracy, mse, div} plus l2_reg_loss. ``Mean.update_state`` on a
vector averages its elements, so an epoch metric is the mean over all
*samples*. We reproduce that with weighted (sum, count) accumulators —
the weights also exclude zero-weight padding samples.
"""

from __future__ import annotations


class MeanMetric:
    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0.0

    def update(self, value_sum: float, count: float = 1.0) -> None:
        self.total += float(value_sum)
        self.count += float(count)

    def result(self) -> float:
        if self.count == 0:
            return 0.0
        return self.total / self.count

    def reset(self) -> None:
        self.total = 0.0
        self.count = 0.0


METRIC_NAMES = [
    "train_loss",
    "val_loss",
    "train_accuracy",
    "val_accuracy",
    "train_mse",
    "val_mse",
    "train_div",
    "val_div",
    "l2_reg_loss",
]


class MetricSet:
    """The reference's metric dictionary (order preserved for loss.csv)."""

    def __init__(self):
        self.metrics = {name: MeanMetric(name) for name in METRIC_NAMES}

    def __getitem__(self, name: str) -> MeanMetric:
        return self.metrics[name]

    def reset(self) -> None:
        for m in self.metrics.values():
            m.reset()

    def keys(self):
        return self.metrics.keys()

    def results(self) -> dict:
        return {k: m.result() for k, m in self.metrics.items()}
