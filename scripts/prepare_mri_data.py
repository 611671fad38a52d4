"""DICOM -> HDF5 ingestion CLI for 4D flow MRI cases.

Reference entry point: /root/reference/src/prepare_data/prepare_mri_data.py
(argparse CLI at :54-63). Uses pydicom when installed; otherwise the
vendored minimal reader (flownet4d_tpu/prepare_data/dicom_lite.py,
uncompressed little-endian DICOM).
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flownet4d_tpu.prepare_data.dicom import ingest_case


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-dir", type=str, required=True,
                   help="Case directory with [Phase/Magnitude series]/[triggerTime] structure")
    p.add_argument("--output-dir", type=str, default="Dataset")
    p.add_argument("--output-filename", type=str, default="mri_data.h5")
    p.add_argument("--phase-pattern", type=str, default="_P_")
    p.add_argument("--mag-pattern", type=str, default="_M_")
    p.add_argument("--fh-mul", type=int, default=-1, help="Foot-Head velocity multiplier")
    p.add_argument("--rl-mul", type=int, default=1, help="Right-Left velocity multiplier")
    p.add_argument("--in-mul", type=int, default=1, help="Inplane velocity multiplier")
    args = p.parse_args()

    output_filepath = os.path.join(args.output_dir, args.output_filename)
    ingest_case(
        args.input_dir,
        output_filepath,
        phase_pattern=args.phase_pattern,
        mag_pattern=args.mag_pattern,
        in_multiplier=args.in_mul,
        fh_multiplier=args.fh_mul,
        rl_multiplier=args.rl_mul,
    )


if __name__ == "__main__":
    main()
