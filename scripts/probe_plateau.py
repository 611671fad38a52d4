"""One-batch overfit probe for the residual-skip trilinear plateau.

The round-5 release run at lr=1e-4 sat at the trilinear-identity plateau
(train MSE pinned at 0.26076 for 26 epochs). Before burning TPU budget on
the lr=1e-3 retry, this probe answers on CPU in minutes: *can the exact
production loss/step path descend from the zero-init residual head at all,
and at which lr?* It fixes ONE real batch from the augmented cohort and
runs N Adam steps per candidate lr, printing the loss trajectory.

Usage: python scripts/probe_plateau.py [--steps 40] [--lrs 1e-4,1e-3,3e-3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/aug_data")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lrs", default="1e-4,1e-3,3e-3")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--low-resblock", type=int, default=8)
    ap.add_argument("--hi-resblock", type=int, default=4)
    args = ap.parse_args()

    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.parallel import make_mesh

    rows = load_indexes(os.path.join(args.data_dir, "train_aug.csv"))
    loader = PatchLoader(args.data_dir, 16, 2, batch_size=args.batch)
    batch = next(iter(loader.initialize_dataset(rows[: args.batch], shuffle=False)))

    for lr in [float(s) for s in args.lrs.split(",")]:
        tc = TrainerController(
            16, 2, lr, False, f"probe{lr:g}",
            low_resblock=args.low_resblock, hi_resblock=args.hi_resblock,
            models_dir="/tmp/probe_models", mesh=make_mesh(jax.devices()[:1]),
            channels=args.channels, residual_skip=True,
            rel_loss_weight=1.0, rel_loss_eps=0.05, clip_norm=1.0,
        )
        traj = []
        for i in range(args.steps):
            tc.loss_metrics.reset()
            tc.train_step(batch)
            traj.append(float(tc.loss_metrics["train_loss"].result()))
        print(f"lr={lr:g}: start {traj[0]:.5f} "
              f"step10 {traj[min(9, len(traj)-1)]:.5f} "
              f"end {traj[-1]:.5f}  "
              f"({'MOVED' if traj[-1] < traj[0] - 1e-3 else 'PARKED'})",
              flush=True)
        print("   traj:", " ".join(f"{v:.4f}" for v in traj), flush=True)


if __name__ == "__main__":
    main()
