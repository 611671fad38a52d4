"""Build a patch-index CSV from an LR/HR dataset pair.

Reference entry point: /root/reference/src/prepare_data/prepare_patches.py
(defaults at :15-25). The patch origins are sampled on the LR mask.
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import h5py

from flownet4d_tpu.data.patch_index import write_header
from flownet4d_tpu.prepare_data.patch_data import generate_random_patches


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base-path", default="data")
    p.add_argument("--lr-file", default="example_data.h5")
    p.add_argument("--hr-file", default="example_data_HR.h5")
    p.add_argument("--output-filename", default=None,
                   help="default: <base-path>/test<patch_size>.csv")
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--n-patch", type=int, default=10, help="patches per time frame")
    p.add_argument("--n-empty-patch-allowed", type=int, default=0)
    p.add_argument("--all-rotation", action="store_true",
                   help="write all 9 rotations per patch instead of 1 random one")
    p.add_argument("--mask-threshold", type=float, default=0.4)
    p.add_argument("--minimum-coverage", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args()

    output = args.output_filename or f"{args.base_path}/test{args.patch_size}.csv"
    input_filepath = os.path.join(args.base_path, args.lr_file)

    with h5py.File(input_filepath, "r") as hf:
        n_frames = len(hf["u"])
        mask = np.asarray(hf["mask"][0])
    print(f"Dataset: {n_frames} rows, mask shape {mask.shape}")

    binary_mask = (mask >= args.mask_threshold).astype(np.int32)
    write_header(output)

    rng = np.random.default_rng(args.seed)
    total = 0
    for index in range(n_frames):
        print("Generating patches for row", index)
        total += generate_random_patches(
            args.lr_file, args.hr_file, output, index, args.n_patch,
            binary_mask, args.patch_size, args.minimum_coverage,
            args.n_empty_patch_allowed, args.all_rotation, rng,
        )
    print(f"Done. {total} rows saved in {output}")


if __name__ == "__main__":
    main()
