"""Same-process A/B of the fused-boundary (clamp) conv vs explicit pad,
and remat on/off, on the real chip at the paper config.

Timing rule: host readback fences (CLAUDE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.data.patch_loader import TrainingBatch

    log(f"devices: {jax.devices()}")
    patch, res, batch = 24, 2, 8
    rng = np.random.default_rng(0)
    P = patch * res
    b = TrainingBatch(
        lr=rng.uniform(-1, 1, (batch, patch, patch, patch, 3)).astype("float32"),
        mag=rng.uniform(0, 1, (batch, patch, patch, patch, 3)).astype("float32"),
        hr=rng.uniform(-1, 1, (batch, P, P, P, 3)).astype("float32"),
        venc=np.full((batch,), 1.5, "float32"),
        mask=(rng.uniform(size=(batch, P, P, P)) > 0.5).astype("float32"),
        rot_case=(np.arange(batch) % 10).astype("int32"),
        weight=np.ones((batch,), "float32"),
    )

    n = int(os.environ.get("AB_STEPS", "20"))
    results = {}
    variants = [
        ("fused+remat", dict(remat=True), True),
        ("fused+noremat", dict(remat=False), True),
        ("explicit+remat", dict(remat=True), False),
    ]
    import flownet4d_tpu.models.sr4dflownet as m

    for name, kw, fused in variants:
        tc = TrainerController(
            patch, res, 2e-4, False, "ab", 8, 4,
            compute_dtype=jnp.bfloat16, models_dir="/tmp/ab_models",
            packed_transfer=False, **kw,
        )
        if not fused:
            tc.config = m.SR4DFlowNetConfig(
                **{**dataclass_asdict(tc.config), "fused_boundary": False})
            tc.model = m.SR4DFlowNet(tc.config)
        dev = tc._put(b)
        t0 = time.time()
        tc.state, _ = tc._train_step(tc.state, dev, train=True)
        _ = int(np.asarray(tc.state.step))
        log(f"{name}: compile {time.time()-t0:.1f}s")
        # warm
        for _ in range(3):
            tc.state, _m = tc._train_step(tc.state, dev, train=True)
        _ = int(np.asarray(tc.state.step))
        rates = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                tc.state, _m = tc._train_step(tc.state, dev, train=True)
            _ = int(np.asarray(tc.state.step))
            rates.append((time.time() - t0) / n * 1000)
        ms = float(np.median(rates))
        results[name] = ms
        log(f"{name}: {['%.0f' % r for r in rates]} -> {ms:.1f} ms/step "
            f"({batch/ms*1000:.1f} patches/s)")
        del tc, dev

    log("\n=== A/B summary ===")
    for k, v in results.items():
        log(f"  {k:18s} {v:7.1f} ms/step  {batch/v*1000:6.1f} patches/s")


def dataclass_asdict(cfg):
    import dataclasses

    return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}


if __name__ == "__main__":
    main()
