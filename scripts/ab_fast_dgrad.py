"""A/B: forward-form input-gradient convs (fast_dgrad) vs native VJP.

VERDICT round-2 item 4: the backward input-grad convs of the residual
stacks run at 46.6 TF/s (XLA's ``EmitOutputBatchInSublanes`` dgrad
emitter) vs 85 TF/s for the forward emitter — ~32 ms of a 186 ms step.
``fast_dgrad`` (ops/conv.py::_conv_same_fast_dgrad) rewrites the bulk
SAME conv's input gradient as a *forward-form* SAME conv of the cotangent
with the flipped/channel-transposed kernel (identical math, see
tests/test_conv_boundary.py::test_fast_dgrad_gradients_match), steering
XLA to the fast emitter.

Both variants run in ONE process (relay variance is 2-3x across
processes); paper config, pure device step, median-of-3 windows, every
window fenced by a host readback (CLAUDE.md timing rule).

Run: python scripts/ab_fast_dgrad.py [--steps 30] [--dtype bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"])
    ap.add_argument("--trace", action="store_true",
                    help="also trace the fast_dgrad step and print top ops")
    ap.add_argument("--flag", default="fast_dgrad",
                    choices=["fast_dgrad", "lane_pack"],
                    help="which TrainerController boolean to A/B")
    args = ap.parse_args()

    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.data.patch_loader import TrainingBatch
    from profile_step import make_inputs, report_top_ops

    log(f"devices: {jax.devices()}")
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    patch, res, batch = 24, 2, args.batch
    host = make_inputs(batch)
    b = TrainingBatch(**host)

    def build(on):
        return TrainerController(
            patch, res, 2e-4, False, "abfd", 8, 4,
            compute_dtype=dt, models_dir="/tmp/prof_models",
            packed_transfer=False, precision=args.precision,
            **{args.flag: on},
        )

    def time_ctrl(tc, dev, n):
        def step():
            tc.state, _m = tc._train_step(tc.state, dev, train=True)

        def sync():
            _ = int(np.asarray(tc.state.step))

        t0 = time.time()
        step(); sync()
        log(f"  compile+first: {time.time()-t0:.1f}s")
        rates = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                step()
            sync()
            rates.append((time.time() - t0) / n)
        return float(np.median(rates)) * 1000

    results = {}
    ctrls = {}
    for on in (False, True):
        tc = build(on)
        dev = tc._put(b)
        ms = time_ctrl(tc, dev, args.steps)
        results[on] = ms
        ctrls[on] = (tc, dev)
        log(f"{args.flag}={on}: {ms:.1f} ms/step -> "
            f"{batch/ms*1000:.1f} patches/s")

    # Gradient equivalence on-chip: one step from identical params must
    # land on (numerically) the same loss.
    base_ms, fast_ms = results[False], results[True]
    log(f"\nA/B ({args.dtype}, precision={args.precision or 'auto'}): "
        f"base {base_ms:.1f} ms vs {args.flag} {fast_ms:.1f} ms "
        f"-> x{base_ms/fast_ms:.3f}")

    if args.trace:
        tc, dev = ctrls[True]
        pdir = "/tmp/jax_trace_fd"
        os.makedirs(pdir, exist_ok=True)
        jax.profiler.start_trace(pdir)
        for _ in range(5):
            tc.state, _m = tc._train_step(tc.state, dev, train=True)
        _ = int(np.asarray(tc.state.step))
        jax.profiler.stop_trace()
        report_top_ops(pdir, n_steps=5, top=12)


if __name__ == "__main__":
    main()
