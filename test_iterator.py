"""Input-pipeline smoke benchmark (reference: src/test_iterator.py:14-46).

Iterates the training loader for a few epochs printing per-batch latency.
Useful for checking host-side throughput without touching the TPU.
"""

import argparse
import time

from flownet4d_tpu.data import PatchLoader, load_indexes


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--training-file", default=None)
    p.add_argument("--patch-size", type=int, default=12)
    p.add_argument("--res-increase", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n-parallel", type=int, default=2)
    args = p.parse_args()

    training_file = args.training_file or f"{args.data_dir}/train.csv"
    indexes = load_indexes(training_file)

    loader = PatchLoader(args.data_dir, args.patch_size, args.res_increase, args.batch_size)
    dataset = loader.initialize_dataset(indexes, shuffle=True, n_parallel=args.n_parallel)

    for epoch in range(args.epochs):
        start = time.time()
        n_samples = 0
        for i, batch in enumerate(dataset):
            n_samples += int(batch.weight.sum())
            print(f"\repoch {epoch+1} batch {i+1}/{len(dataset)} "
                  f"({time.time()-start:.3f} s)", end="")
        elapsed = time.time() - start
        print(f"\nepoch {epoch+1}: {n_samples} samples in {elapsed:.3f} s "
              f"= {n_samples/elapsed:.1f} patches/s (host pipeline only)")


if __name__ == "__main__":
    main()
