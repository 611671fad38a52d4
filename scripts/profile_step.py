"""Profile the pure training step on the real TPU (VERDICT round-2 item 2).

Runs the paper-config train step (patch 24^3 -> 48^3, x2 SR, batch 8,
8/4 resblocks) and attributes device time three ways:

1. jax.profiler trace (if the relay-attached backend supports it) ->
   --profile-dir, inspect with tensorboard or xprof offline.
2. XLA compiled cost analysis: FLOPs / bytes accessed / peak memory for
   the whole step executable.
3. Ablation wall-clock A/B inside ONE process (relay variance is 2-3x
   across processes, so only same-process comparisons are meaningful):
   forward, forward+loss, full step; remat on/off; rotation on/off;
   f32 vs bf16.

Timing rule (CLAUDE.md): every window ends in a host readback.

Usage: python scripts/profile_step.py [--trace] [--ablate] [--steps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def report_top_ops(profile_dir: str, n_steps: int, top: int = 10) -> None:
    """Parse the freshest *.trace.json.gz and print per-op and per-category
    device-time tables (amortised over ``n_steps`` traced steps).

    The relay backend's traces carry ``hlo_category``, ``model_flops`` and
    ``bytes_accessed`` per device event, so no tensorboard is needed.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        log("no trace.json.gz produced")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    per_op = defaultdict(lambda: [0.0, 0, "", 0.0, 0.0])  # ms, count, cat, GF, GB
    per_cat = defaultdict(lambda: [0.0, 0.0, 0.0])  # ms, GF, GB
    total_ms = 0.0
    for e in data.get("traceEvents", []):
        a = e.get("args") or {}
        if e.get("ph") != "X" or "hlo_category" not in a:
            continue
        ms = e.get("dur", 0) / 1e3
        cat = a["hlo_category"]
        gf = float(a.get("model_flops", 0) or 0) / 1e9
        gb = float(a.get("bytes_accessed", 0) or 0) / 1e9
        rec = per_op[e["name"]]
        rec[0] += ms; rec[1] += 1; rec[2] = cat; rec[3] += gf; rec[4] += gb
        c = per_cat[cat]
        c[0] += ms; c[1] += gf; c[2] += gb
        total_ms += ms

    log(f"\n=== device time by category ({total_ms/n_steps:.1f} ms/step traced) ===")
    for cat, (ms, gf, gb) in sorted(per_cat.items(), key=lambda kv: -kv[1][0]):
        tfs = gf / ms if ms else 0.0  # GF/ms == TF/s
        log(f"  {cat:24s} {ms/n_steps:7.1f} ms/step ({100*ms/total_ms:4.1f}%)  "
            f"{tfs:6.1f} TF/s  {gb/n_steps:6.2f} GB/step")
    log(f"\n=== top {top} ops ===")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]
    for name, (ms, cnt, cat, gf, gb) in rows:
        tfs = gf / ms if ms else 0.0
        log(f"  {ms/n_steps:7.2f} ms/step ({100*ms/total_ms:4.1f}%) {cat:12s} "
            f"{tfs:6.1f} TF/s  x{cnt//n_steps:<3d} {name[:70]}")


def make_inputs(batch=8, patch=24, res=2, seed=0):
    rng = np.random.default_rng(seed)
    P = patch * res
    return dict(
        lr=rng.uniform(-1, 1, (batch, patch, patch, patch, 3)).astype("float32"),
        mag=rng.uniform(0, 1, (batch, patch, patch, patch, 3)).astype("float32"),
        hr=rng.uniform(-1, 1, (batch, P, P, P, 3)).astype("float32"),
        venc=np.full((batch,), 1.5, "float32"),
        mask=(rng.uniform(size=(batch, P, P, P)) > 0.5).astype("float32"),
        rot_case=(np.arange(batch) % 10).astype("int32"),
        weight=np.ones((batch,), "float32"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--profile-dir", default="/tmp/jax_trace")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="compute dtype for the traced/timed step (f32 = "
                    "strict parity mode, HIGHEST precision)")
    ap.add_argument("--remat-scope", default="all", choices=["all", "hi", "low"])
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"],
                    help="MXU precision override (None = auto per dtype)")
    args = ap.parse_args()

    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.data.patch_loader import TrainingBatch

    log(f"devices: {jax.devices()}")
    patch, res, batch = 24, 2, args.batch

    def build(compute_dtype, remat, precision=None, remat_scope="all"):
        return TrainerController(
            patch, res, 2e-4, False, "prof", 8, 4,
            compute_dtype=compute_dtype, models_dir="/tmp/prof_models",
            remat=remat, packed_transfer=False, precision=precision,
            remat_scope=remat_scope,
        )

    def time_fn(fn, n, sync):
        """Median-of-3 windows of n calls, each window fenced by sync()."""
        rates = []
        fn(); sync()  # warm
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                fn()
            sync()
            rates.append((time.time() - t0) / n)
        return float(np.median(rates)) * 1000  # ms

    main_dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    tc = build(main_dtype, remat=not args.no_remat, precision=args.precision,
               remat_scope=args.remat_scope)
    host = make_inputs(batch)
    b = TrainingBatch(**host)
    dev = tc._put(b)

    # compile
    t0 = time.time()
    tc.state, m = tc._train_step(tc.state, dev, train=True)
    _ = int(np.asarray(tc.state.step))
    log(f"compile+first: {time.time()-t0:.1f}s")

    # --- cost analysis --------------------------------------------------
    lowered = jax.jit(tc._step, static_argnames=("train",), donate_argnums=0
                      ).lower(tc.state, dev, train=True)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        log(f"cost_analysis: flops={flops/1e12:.3f} TF, "
            f"bytes={bytes_acc/1e9:.3f} GB, "
            f"arithmetic intensity={flops/max(bytes_acc,1):.1f} flops/byte")
        for k, v in sorted(ca.items()):
            if isinstance(v, float) and v > 0:
                log(f"  {k}: {v:.4g}")
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
    try:
        ma = compiled.memory_analysis()
        log(f"memory_analysis: {ma}")
    except Exception as e:
        log(f"memory_analysis unavailable: {e}")

    # --- steady-state step time (device-bound, input resident) ----------
    def step():
        tc.state, _m = tc._train_step(tc.state, dev, train=True)

    def sync():
        _ = int(np.asarray(tc.state.step))

    ms = time_fn(step, args.steps, sync)
    log(f"PURE STEP ({args.dtype}, precision={args.precision or 'auto'}, "
        f"remat={not args.no_remat}, resident input): {ms:.1f} ms/step "
        f"-> {batch/ms*1000:.1f} patches/s")

    # --- profiler trace --------------------------------------------------
    if args.trace:
        os.makedirs(args.profile_dir, exist_ok=True)
        try:
            jax.profiler.start_trace(args.profile_dir)
            for _ in range(5):
                step()
            sync()
            jax.profiler.stop_trace()
            report_top_ops(args.profile_dir, n_steps=5, top=args.top)
        except Exception as e:
            log(f"profiler trace FAILED on this backend: {type(e).__name__}: {e}")

    if not args.ablate:
        return

    # --- ablations (same process) ----------------------------------------
    results = {"full_bf16_remat": ms}

    # forward only
    fwd = jax.jit(lambda p, v, m: tc.model.apply({"params": p}, v, m))
    vel = jax.device_put(host["lr"])
    mag = jax.device_put(host["mag"])
    out = fwd(tc.state.params, vel, mag)
    _ = np.asarray(out[0, 0, 0, 0, 0])

    outbox = [out]
    def fstep():
        outbox[0] = fwd(tc.state.params, vel, mag)
    def fsync():
        _ = np.asarray(outbox[0][0, 0, 0, 0, 0])
    results["forward_bf16"] = time_fn(fstep, args.steps, fsync)

    # loss+grad without rotation: rot_case=0
    host0 = dict(host); host0["rot_case"] = np.zeros(batch, "int32")
    dev0 = tc._put(TrainingBatch(**host0))
    results["full_bf16_rot0"] = time_fn(
        lambda: setattr(tc, "state", tc._train_step(tc.state, dev0, train=True)[0]),
        args.steps, sync)

    # no remat
    tc2 = build(jnp.bfloat16, remat=False)
    dev2 = tc2._put(b)
    tc2.state, _ = tc2._train_step(tc2.state, dev2, train=True)
    _ = int(np.asarray(tc2.state.step))
    def step2():
        tc2.state, _m = tc2._train_step(tc2.state, dev2, train=True)
    def sync2():
        _ = int(np.asarray(tc2.state.step))
    results["full_bf16_noremat"] = time_fn(step2, args.steps, sync2)

    # f32
    tc3 = build(jnp.float32, remat=True)
    dev3 = tc3._put(b)
    tc3.state, _ = tc3._train_step(tc3.state, dev3, train=True)
    _ = int(np.asarray(tc3.state.step))
    def step3():
        tc3.state, _m = tc3._train_step(tc3.state, dev3, train=True)
    def sync3():
        _ = int(np.asarray(tc3.state.step))
    results["full_f32_remat"] = time_fn(step3, args.steps, sync3)

    log("\n=== ablation results (ms/step, median of 3 windows) ===")
    for k, v in results.items():
        log(f"  {k:24s} {v:8.1f} ms  ({batch/v*1000:6.1f} patches/s)")


if __name__ == "__main__":
    main()
