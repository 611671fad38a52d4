"""Generate a synthetic low-res dataset from a high-res CFD HDF5.

Reference entry point: /root/reference/src/prepare_data/prepare_lowres_dataset.py
(defaults at :17-23). Same workflow, exposed as a CLI.
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flownet4d_tpu.prepare_data.lowres import generate_lowres_dataset


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-filepath", default="data/example_data_HR.h5")
    p.add_argument("--output-filename", default="data/example_data_LR.h5")
    p.add_argument("--downsample", type=int, default=2)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args()

    n = generate_lowres_dataset(
        args.input_filepath, args.output_filename, args.downsample, args.seed
    )
    print(f"Done! {n} frames written to {args.output_filename}")


if __name__ == "__main__":
    main()
