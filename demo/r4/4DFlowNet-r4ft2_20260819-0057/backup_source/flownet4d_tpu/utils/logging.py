"""Logging helpers (reference: /root/reference/src/Network/utility.py:9-26)
plus an optional TensorBoard summary writer (gated on tensorboardX)."""

from __future__ import annotations

import time


def log_to_file(filepath: str, msg: str) -> None:
    with open(filepath, "a") as f:
        f.write(msg)


def calculate_time_elapsed(start: float):
    """Elapsed (hrs, mins, secs) split, matching utility.py:9-21."""
    end = time.time()
    hrs = (end - start) // 60 // 60
    mins = ((end - start) - hrs * 60 * 60) // 60
    secs = int((end - start) - mins * 60 - hrs * 60 * 60)
    return hrs, mins, secs


class SummaryLogger:
    """TensorBoard scalar writer; silently no-ops if tensorboardX is absent.

    Mirrors the reference's per-epoch train/validate writers
    (TrainerController.py:181-182, 396-412).
    """

    def __init__(self, logdir: str):
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception:
            self._writer = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
