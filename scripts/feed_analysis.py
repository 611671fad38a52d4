"""Multi-chip input-feed analysis: can the host input path keep N devices fed?

The DP train step is correct at mesh>1 (8-device equivalence test, driver
dryrun); this script answers the *throughput* question the correctness
tests don't: where does the host-side input path top out, and how many
chips' worth of demand can one host supply? Three independent ceilings:

1. **Loader assembly** — patches/s the threaded PatchLoader (HDF5 read +
   normalise + frame-LRU cache + batch assembly) sustains, measured here
   by draining the real PatchDataset iterator and pack_batch-ing every
   batch (the actual hot-loop consumer work in train_network).
2. **Wire transfer** — bytes/patch of the packed f16/u8 format vs the
   measured relay link rate (docs/performance.md: ~33 MB/s, 45 ms/leaf;
   a directly-attached host does ~1-10 GB/s and is never the binding
   ceiling).
3. **Device demand** — the best verified device-side step at the paper
   config: 186 ms / 8 patches = 43 patches/s/chip (round-2 profile).

chips_fed = min(loader, wire) / demand. Everything host-side is
platform-independent numpy/threads, so this runs on CPU without touching
the TPU. Reference context: the reference's practical bottleneck was its
own input pipeline (src/Network/PatchHandler3D.py:32,40-47 — per-patch
h5py reads under tf.py_function, no cache, no threading).

Usage: python scripts/feed_analysis.py [--patch 24] [--batch 8]
Prints one JSON line to stdout; diagnostics to stderr.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEVICE_PPS = 43.0  # best verified device-side step (round-2 profile, paper config)
RELAY_MBPS = 33.0  # measured relay link rate (docs/performance.md)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_index(data_dir, patch, tmpdir, n_patch=32):
    """Patch-`patch` index over the bundled example volumes (the shipped
    CSVs were built for patch <= 16) — same recipe as bench.py e2e."""
    import h5py

    from flownet4d_tpu.data.patch_index import write_header
    from flownet4d_tpu.prepare_data.patch_data import generate_random_patches

    csv_path = os.path.join(tmpdir, "feed_train.csv")
    write_header(csv_path)
    with h5py.File(os.path.join(data_dir, "example_data.h5"), "r") as hf:
        mask = np.asarray(hf["mask"][0])
    generate_random_patches(
        "example_data.h5", "example_data_HR.h5", csv_path, 0,
        n_patch=n_patch, binary_mask=(mask >= 0.4).astype(np.float32),
        patch_size=patch, minimum_coverage=0.2, empty_patch_allowed=0,
        apply_all_rotation=True, rng=np.random.default_rng(0),
    )
    return csv_path


def measure_loader(data_dir, csv_path, patch, res, batch, n_parallel, epochs=3):
    """Drain the real iterator + pack_batch (the train_network consumer
    side). First epoch is the cold-cache epoch; steady state is the rest."""
    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.data.packed import pack_batch

    rows = load_indexes(csv_path)
    loader = PatchLoader(data_dir, patch, res, batch)
    ds = loader.initialize_dataset(rows, shuffle=True,
                                   n_parallel=n_parallel, seed=0)
    rates, wire_bytes = [], None
    for epoch in range(epochs):
        t0 = time.time()
        n = 0
        for b in ds:
            pb = pack_batch(b)
            if wire_bytes is None:
                wire_bytes = sum(x.nbytes for x in pb)
            n += b.lr.shape[0]
        rates.append(n / (time.time() - t0))
        log(f"  n_parallel={n_parallel} epoch {epoch+1}: {rates[-1]:.1f} patches/s"
            f"{' (cold cache)' if epoch == 0 else ''}")
    return {
        "cold_pps": round(rates[0], 1),
        "warm_pps": round(float(np.median(rates[1:])), 1),
        "wire_bytes_per_batch": int(wire_bytes),
        "cache": loader.cache_stats(),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--patch", type=int, default=24)
    p.add_argument("--res", type=int, default=2)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n-parallel", type=int, nargs="+", default=[1, 4, 8])
    args = p.parse_args()

    tmpdir = tempfile.mkdtemp(prefix="feed_analysis_")
    csv_path = build_index(args.data_dir, args.patch, tmpdir)

    results = {}
    for npar in args.n_parallel:
        log(f"loader sweep: n_parallel={npar}")
        results[npar] = measure_loader(
            args.data_dir, csv_path, args.patch, args.res, args.batch, npar)

    best_npar = max(results, key=lambda k: results[k]["warm_pps"])
    best = results[best_npar]
    wire_bytes_per_patch = best["wire_bytes_per_batch"] / args.batch
    wire_ceiling_pps = RELAY_MBPS * 1e6 / wire_bytes_per_patch
    supply = min(best["warm_pps"], wire_ceiling_pps)
    out = {
        "config": {"patch": args.patch, "batch": args.batch,
                   "best_n_parallel": best_npar},
        "loader_pps": {str(k): {"cold": v["cold_pps"], "warm": v["warm_pps"]}
                       for k, v in results.items()},
        "wire_bytes_per_patch": round(wire_bytes_per_patch),
        "wire_ceiling_pps_at_relay": round(wire_ceiling_pps, 1),
        "device_demand_pps_per_chip": DEVICE_PPS,
        "chips_fed_per_host_loader_only": round(best["warm_pps"] / DEVICE_PPS, 2),
        "chips_fed_per_host_via_relay": round(supply / DEVICE_PPS, 2),
        "cache": best["cache"],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
