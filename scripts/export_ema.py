"""Export portable .h5 weights from a full train-state checkpoint.

The trainer's ``-best.h5`` is written at the best-*validation* epoch; on
the edge-of-stability landscape (docs/training.md) val loss can plateau
early while the cosine anneal keeps improving the iterate, so the *final*
EMA weights in ``-latest.ckpt`` are a second release candidate. This tool
pulls either subtree (``ema`` by default, ``params`` with --raw) out of
an Orbax train-state checkpoint and writes the same portable HDF5 layout
``save_weights_h5`` produces, so ``evaluate_model.py`` / ``predictor.py``
can score it directly.

Usage:
  python scripts/export_ema.py --ckpt <run>/<name>-latest.ckpt --out ema.h5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="train-state .ckpt dir")
    ap.add_argument("--out", required=True, help="output .h5 path")
    ap.add_argument("--raw", action="store_true",
                    help="export raw params instead of the EMA subtree")
    args = ap.parse_args()

    # Pure host work — never claim the TPU (one-process rule, CLAUDE.md).
    # sitecustomize stomps JAX_PLATFORMS, so pin via jax.config.
    import jax

    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from flownet4d_tpu.training.checkpoint import save_weights_h5

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    # TrainState is a NamedTuple; depending on orbax version it round-trips
    # as a field-name dict or a positional list (params, opt_state, step, ema).
    if isinstance(raw, dict):
        params, ema = raw.get("params"), raw.get("ema")
    else:
        params = raw[0]
        ema = raw[3] if len(raw) > 3 else None

    tree = params if args.raw else ema
    which = "params" if args.raw else "ema"
    if tree is None:
        if args.raw or params is None:
            raise SystemExit(f"checkpoint has no '{which}' subtree")
        print("no EMA in checkpoint; falling back to raw params",
              file=sys.stderr)
        tree, which = params, "params"

    save_weights_h5(args.out, tree)
    print(f"wrote {which} subtree of {args.ckpt} -> {args.out}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
