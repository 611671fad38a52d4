"""Build the augmented demo training cohort from the bundled single frame.

The reference trains on large multi-case CFD cohorts where each HR case is
FFT-downsampled several times with fresh k-space noise (its
prepare_lowres_dataset workflow, /root/reference/src/prepare_data/
prepare_lowres_dataset.py). The repo only bundles ONE frame
(data/example_data*.h5), so this script reproduces that augmentation
strategy at demo scale:

  1. N noise realizations of the HR volume -> lr_aug{i}.h5 (random SNR in
     [snr_low, snr_high] dB, fresh seed each)
  2. a patch-index CSV per source (including the real LR file), sampled on
     the LR fluid mask with --all-rotation (10 rows per origin)
  3. train CSV = all aug realizations + half of the real-file origins;
     val CSV = held-out real-file origins (val patches never share an
     origin with real-file train patches; aug realizations share the
     volume but differ in noise + origin sampling)

Run: python scripts/make_demo_cohort.py --out /tmp/aug_data [--n-realizations 6]
Then: python trainer.py --data-dir /tmp/aug_data --training-file train_aug.csv ...
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import h5py

from flownet4d_tpu.data.patch_index import write_header
from flownet4d_tpu.prepare_data.lowres import generate_lowres_dataset
from flownet4d_tpu.prepare_data.patch_data import generate_random_patches

REF_DATA = "/root/reference/data"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--hr-file", default=f"{REF_DATA}/example_data_HR.h5")
    p.add_argument("--lr-file", default=f"{REF_DATA}/example_data.h5")
    p.add_argument("--n-realizations", type=int, default=6)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--n-patch", type=int, default=40, help="origins per frame")
    p.add_argument("--n-empty-patch-allowed", type=int, default=1)
    p.add_argument("--mask-threshold", type=float, default=0.4)
    p.add_argument("--minimum-coverage", type=float, default=0.2)
    p.add_argument("--val-fraction", type=float, default=0.5,
                   help="fraction of real-file origins held out for val")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    # Symlink the bundled files in so CSV `source` columns stay relative.
    for src in (args.lr_file, args.hr_file):
        dst = os.path.join(args.out, os.path.basename(src))
        if not os.path.exists(dst):
            os.symlink(src, dst)
    hr_name = os.path.basename(args.hr_file)
    lr_name = os.path.basename(args.lr_file)

    rng = np.random.default_rng(args.seed)
    sources = []
    for i in range(args.n_realizations):
        fname = f"lr_aug{i}.h5"
        path = os.path.join(args.out, fname)
        if not os.path.exists(path):
            n = generate_lowres_dataset(
                args.hr_file, path, downsample=2, seed=int(rng.integers(2**31))
            )
            print(f"{fname}: {n} frames")
        sources.append(fname)

    with h5py.File(os.path.join(args.out, lr_name), "r") as hf:
        n_frames = len(hf["u"])
        mask = np.asarray(hf["mask"][0])
    binary_mask = (mask >= args.mask_threshold).astype(np.int32)

    def build_csv(out_csv, lr_source, n_patch):
        write_header(out_csv)
        total = 0
        for index in range(n_frames):
            total += generate_random_patches(
                lr_source, hr_name, out_csv, index, n_patch,
                binary_mask, args.patch_size, args.minimum_coverage,
                args.n_empty_patch_allowed, True, rng,
            )
        return total

    train_csv = os.path.join(args.out, "train_aug.csv")
    val_csv = os.path.join(args.out, "val_aug.csv")
    write_header(train_csv)
    write_header(val_csv)

    tmp = os.path.join(args.out, "_tmp.csv")
    train_rows, val_rows = 0, 0
    for s in sources + [lr_name]:
        n = build_csv(tmp, s, args.n_patch)
        with open(tmp) as f:
            rows = list(csv.reader(f))[1:]
        if s == lr_name:
            # Split the real file's rows by patch ORIGIN so every rotation
            # variant of an origin lands on the same side.
            origins = sorted({tuple(r[2:6]) for r in rows})
            rng.shuffle(origins)
            n_val = int(len(origins) * args.val_fraction)
            val_set = set(origins[:n_val])
            tr = [r for r in rows if tuple(r[2:6]) not in val_set]
            va = [r for r in rows if tuple(r[2:6]) in val_set]
        else:
            tr, va = rows, []
        for path, chunk in ((train_csv, tr), (val_csv, va)):
            with open(path, "a", newline="") as f:
                csv.writer(f).writerows(chunk)
        train_rows += len(tr)
        val_rows += len(va)
        print(f"{s}: {len(tr)} train / {len(va)} val rows")
    os.remove(tmp)
    print(f"cohort: {train_rows} train, {val_rows} val rows in {args.out}")


if __name__ == "__main__":
    main()
