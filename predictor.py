"""Inference entry point: whole-volume super-resolution of a 4D flow HDF5.

Mirrors the reference predictor workflow and defaults
(/root/reference/src/predictor.py:31-117): per time frame, overlapping
patchify, batched network forward, halo-crop stitch, denormalise by venc,
zero sub-sensitivity values, append u/v/w (+ halved dx) to the output.
"""

import argparse
import os

import numpy as np

import jax.numpy as jnp

from flownet4d_tpu.inference import VolumePredictor


def main():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # ---- Reference defaults (predictor.py:32-47) ----
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--filename", default="example_data.h5")
    p.add_argument("--output-dir", default="result")
    p.add_argument("--output-filename", default="example_result.h5")
    p.add_argument("--model-path", default="models/4DFlowNet/4DFlowNet-best.h5",
                   help=".h5 weight file, orbax .ckpt dir, or legacy Keras .h5 (--keras)")
    p.add_argument("--keras", action="store_true",
                   help="interpret --model-path as a legacy Keras weight file")
    p.add_argument("--patch-size", type=int, default=24)
    p.add_argument("--res-increase", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-round-small-values", action="store_true")
    p.add_argument("--low-resblock", type=int, default=8)
    p.add_argument("--hi-resblock", type=int, default=4)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (throughput mode)")
    p.add_argument("--allow-random-init", action="store_true",
                   help="proceed with randomly initialised weights when "
                        "--model-path does not exist (bench/test use only)")
    p.add_argument("--f16-transfer", action="store_true",
                   help="ship inputs/outputs over the wire as float16 "
                        "(halves transfer bytes; ~5e-4 rel quantisation)")
    args = p.parse_args()

    input_filepath = os.path.join(args.data_dir, args.filename)
    output_filepath = os.path.join(args.output_dir, args.output_filename)

    # Validate the weight path BEFORE any backend/model init: the
    # reference crashes on a missing weight file
    # (/root/reference/src/predictor.py:60-61); a typo'd path must not
    # silently produce a garbage output volume.
    have_weights = bool(args.model_path) and os.path.exists(args.model_path)
    if not have_weights and not args.allow_random_init:
        p.error(f"model path {args.model_path!r} not found "
                "(pass --allow-random-init to run with random weights)")

    print(f"Loading 4DFlowNet: {args.res_increase}x upsample")
    predictor = VolumePredictor(
        args.patch_size,
        args.res_increase,
        args.batch_size,
        args.low_resblock,
        args.hi_resblock,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        transfer_dtype=np.float16 if args.f16_transfer else np.float32,
    )
    if have_weights:
        predictor.load_weights(args.model_path, keras=args.keras)
    else:
        print(f"WARNING: model path {args.model_path!r} not found — "
              "running with randomly initialised weights (--allow-random-init).")

    predictor.predict_file(
        input_filepath,
        output_filepath,
        round_small_values=not args.no_round_small_values,
    )
    print("Done!")


if __name__ == "__main__":
    main()
