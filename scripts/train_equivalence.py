"""Training-equivalence experiment: our trainer vs the TF reference.

Drives the REFERENCE TrainerController.train_step
(/root/reference/src/Network/TrainerController.py:209-225) and our
TrainerController.train_step on byte-identical batches (our PatchLoader
with host rotation is byte-level golden vs PatchHandler3D —
tests/test_loader.py), starting from transplanted initial weights, and
compares the per-epoch mean train-loss trajectories. This is the missing
link between "every op matches" and "training matches" (VERDICT r2 item 3).

Config follows the VERDICT prescription: patch 12, 2/1 resblocks,
fixed data order (no shuffle), host-side rotation (identical inputs),
packed transfer off (bit-exact f32 inputs), f32/HIGHEST compute.

Run: python scripts/train_equivalence.py [--epochs 10] [--batch 5]
Used by tests/test_train_equivalence.py with a short epoch budget.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = "/root/reference/data"
PATCH, RES, LOW_RB, HI_RB = 12, 2, 2, 1


def _reference_controller(lr):
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    sys.path.insert(0, "/root/reference/src")
    from Network.TrainerController import TrainerController as RefTC

    tc = RefTC(PATCH, RES, lr, False, "equiv", LOW_RB, HI_RB)
    # tf-keras (the legacy-Keras build the reference requires here)
    # silently DROPS the deprecated ``lr=`` kwarg the reference passes
    # (TrainerController.py:73) and runs Adam at its default 1e-3:
    # measured — Adam(lr=1e-4).learning_rate == 0.001, and the ref's
    # first optimizer step moves ||dparams|| 10x the requested-lr
    # prediction (lr*sqrt(n_params)). Pin the actual rate so the
    # equivalence experiment compares the same optimizer.
    tc.optimizer.learning_rate.assign(lr)
    # f32 storage: compare with a relative tolerance.
    assert abs(float(tc.optimizer.learning_rate.numpy()) - lr) < 1e-6 * lr
    return tc


def _to_reference_tuple(batch):
    """TrainingBatch -> the reference 11-tuple (PatchHandler3D.py:78-81)."""
    import tensorflow as tf

    t = lambda a: tf.constant(np.asarray(a, np.float32))
    lr, mag, hr = batch.lr, batch.mag, batch.hr
    return (
        t(lr[..., 0:1]), t(lr[..., 1:2]), t(lr[..., 2:3]),
        t(mag[..., 0:1]), t(mag[..., 1:2]), t(mag[..., 2:3]),
        t(hr[..., 0:1]), t(hr[..., 1:2]), t(hr[..., 2:3]),
        t(batch.venc), t(batch.mask),
    )


def run_equivalence(n_epochs: int = 10, batch_size: int = 5, lr: float = 1e-4,
                    verbose: bool = True):
    """Returns (ref_losses, our_losses): per-epoch mean train loss arrays."""
    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.training.checkpoint import import_keras_weights
    import jax

    rows = load_indexes(f"{DATA_DIR}/train.csv")
    # Whole batches only (no zero-weight padding) so both frameworks see
    # identical sample sets; 50 bundled rows -> e.g. 10x5 or 6x8.
    rows = rows[: (len(rows) // batch_size) * batch_size]
    loader = PatchLoader(DATA_DIR, PATCH, RES, batch_size, rotate_on_device=False)
    batches = list(loader.initialize_dataset(rows, shuffle=False))
    assert all((b.weight == 1).all() for b in batches), "no padding wanted here"

    ref = _reference_controller(lr)

    ours = TrainerController(
        PATCH, RES, lr, False, "equiv", LOW_RB, HI_RB,
        packed_transfer=False, remat=False,  # f32 default -> HIGHEST precision
    )

    # Transplant the reference's initial weights into our param tree.
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        wpath = os.path.join(td, "init.h5")
        ref.model.save(wpath)
        params = import_keras_weights(
            wpath, jax.device_get(ours.state.params), LOW_RB, HI_RB
        )
    from flownet4d_tpu.parallel.mesh import replicated_sharding, put_with_sharding
    from flownet4d_tpu.training.trainer import TrainState

    state = jax.device_get(ours.state)
    ours.state = put_with_sharding(
        TrainState(params, ours.optimizer.init(params), state.step),
        replicated_sharding(ours.mesh),
    )

    ref_tuples = [_to_reference_tuple(b) for b in batches]

    ref_losses, our_losses = [], []
    for epoch in range(n_epochs):
        for m in ref.loss_metrics.values():
            m.reset_states()
        ours.loss_metrics.reset()
        for rb, ob in zip(ref_tuples, batches):
            ref.train_step(rb)
            ours.train_step(ob)
        ref_losses.append(float(ref.loss_metrics["train_loss"].result()))
        our_losses.append(float(ours.loss_metrics["train_loss"].result()))
        if verbose:
            d = abs(ref_losses[-1] - our_losses[-1]) / ref_losses[-1]
            print(f"epoch {epoch+1}: ref {ref_losses[-1]:.6f}  "
                  f"ours {our_losses[-1]:.6f}  rel delta {d:.2e}")
    return np.asarray(ref_losses), np.asarray(our_losses)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()
    ref_l, our_l = run_equivalence(args.epochs, args.batch, args.lr)
    rel = np.abs(ref_l - our_l) / ref_l
    print(f"\nmax rel delta over {args.epochs} epochs: {rel.max():.3e}")
