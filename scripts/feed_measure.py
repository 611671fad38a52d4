"""Measure the multi-chip input feed on the virtual 8-device CPU mesh.

`scripts/feed_analysis.py` MODELS three feed ceilings (docs/architecture.md
"Multi-chip input-feed ledger"); this script MEASURES one point of it
(VERDICT r4 item 7): the real `PatchLoader` + `pack_batch` + sharded
`shard_batch` path delivering batches onto an N-device
`jax.sharding.Mesh`, with a trivial jitted consumer (per-shard reduction)
so host feed — not CPU conv FLOPs — is the timed quantity. This is the
exact producer path `TrainerController.train_network` runs in multi-chip
DP (`trainer.py::_device_batches/_put`); only the compute inside the jit
is stubbed.

Usage: python scripts/feed_measure.py [--devices 8] [--epochs 3]
Prints one JSON line: delivered patches/s total and per device, for the
ledger row next to the modeled 112 p/s/core loader ceiling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--patch", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8, help="per-device batch")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n-parallel", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp
    import numpy as np
    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.data.packed import pack_batch, unpack_batch
    from flownet4d_tpu.parallel import make_mesh, shard_batch

    devs = jax.devices()[: args.devices]
    mesh = make_mesh(devs)
    csv = args.csv or os.path.join(args.data_dir, "train.csv")
    rows = load_indexes(csv)
    # Global batch = per-device batch x devices (DP semantics).
    global_batch = args.batch * len(devs)
    loader = PatchLoader(args.data_dir, args.patch, 2, batch_size=global_batch)

    @jax.jit
    def consume(pb):
        # Trivial per-shard reduction: forces the unpack + transfer to
        # complete on every device without meaningful FLOPs.
        b = unpack_batch(pb, args.patch, 2)
        return (jnp.sum(b.lr.astype(jnp.float32))
                + jnp.sum(b.hr.astype(jnp.float32))
                + jnp.sum(b.mask.astype(jnp.float32))
                + jnp.sum(b.weight))

    # Warm epoch (frame-LRU fill + compile), then timed epochs.
    total_patches = 0
    t0 = None
    for ep in range(args.epochs + 1):
        for batch in loader.initialize_dataset(rows, shuffle=True,
                                               n_parallel=args.n_parallel):
            dev = shard_batch(pack_batch(batch), mesh)
            float(consume(dev))  # host readback fences the feed
            if t0 is not None:
                total_patches += int(np.sum(batch.weight))
        if ep == 0:
            t0 = time.perf_counter()
    elapsed = time.perf_counter() - t0

    pps = total_patches / elapsed
    print(json.dumps({
        "devices": len(devs),
        "global_batch": global_batch,
        "patch": args.patch,
        "epochs_timed": args.epochs,
        "patches": total_patches,
        "elapsed_s": round(elapsed, 2),
        "delivered_patches_per_sec": round(pps, 1),
        "delivered_per_device": round(pps / len(devs), 2),
    }))


if __name__ == "__main__":
    main()
