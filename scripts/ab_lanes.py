"""A/B: MXU lane occupancy for the 64-channel resblock convs (VERDICT r2
item 5 / TODO round-3).

The model's convs are 64->64; TPU MXU lanes are 128-wide, so the implicit
GEMM's N dimension fills half the lanes. Candidate mitigations, measured
here forward and forward+backward on the real chip, same process:

  a) baseline      : (B, 48^3, 64)  dense conv 64->64
  b) grouped       : (B/2, 48^3, 128) feature_group_count=2 conv, the two
                     batch elements ride side-by-side in the channel dim —
                     identical math per element, N=128 lanes filled
  c) blockdiag     : (B/2, 48^3, 128) dense conv with block-diagonal
                     [[K,0],[0,K]] kernel — 2x FLOPs, but dense emitter
  d) doublechannel : (B, 48^3, 128) dense 128->128 — NOT equivalent math,
                     just the lane-occupancy ceiling for reference

Run: python scripts/ab_lanes.py [--steps 30] [--dim 48] [--batch 8]
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
    ap.add_argument("--dim", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    log(f"devices: {jax.devices()}")
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, D, C = args.batch, args.dim, 64
    rng = np.random.default_rng(0)

    x = jax.device_put(rng.uniform(-1, 1, (B, D, D, D, C)).astype(np.float32)).astype(dt)
    x2 = jax.device_put(
        np.concatenate(
            [np.asarray(jax.device_get(x))[0::2], np.asarray(jax.device_get(x))[1::2]], axis=-1
        )
    ).astype(dt)  # (B/2, D,D,D, 128): even samples in ch 0-63, odd in 64-127
    k = jax.device_put(rng.uniform(-0.1, 0.1, (3, 3, 3, C, C)).astype(np.float32)).astype(dt)
    kg = jnp.concatenate([k, k], axis=-1)  # (3,3,3,64,128) for groups=2
    z = jnp.zeros_like(k)
    kbd = jnp.concatenate(
        [jnp.concatenate([k, z], -1), jnp.concatenate([z, k], -1)], axis=3
    )  # (3,3,3,128,128) block-diagonal
    kd = jax.device_put(rng.uniform(-0.1, 0.1, (3, 3, 3, 2 * C, 2 * C)).astype(np.float32)).astype(dt)

    dn = ("NDHWC", "DHWIO", "NDHWC")

    def conv(inp, ker, groups=1):
        return lax.conv_general_dilated(
            inp, ker, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=dn, feature_group_count=groups,
        )

    # n_chained convs so the measurement isn't dominated by dispatch.
    N_CHAIN = 8

    def chain(inp, ker, groups=1):
        h = inp
        for _ in range(N_CHAIN):
            h = conv(h, ker, groups)
            h = jnp.where(h >= 0, h, 0.2 * h)
        return h

    cases = {
        "a_base_64": (lambda: None, x, k, 1),
        "b_grouped_128": (lambda: None, x2, kg, 2),
        "c_blockdiag_128": (lambda: None, x2, kbd, 1),
        "d_dense_128_ceiling": (lambda: None, x2, kd, 1),
    }

    # Correctness: grouped/blockdiag must reproduce the dense-64 math.
    ya = np.asarray(conv(x, k).astype(jnp.float32))
    yb = np.asarray(conv(x2, kg, 2).astype(jnp.float32))
    yc = np.asarray(conv(x2, kbd).astype(jnp.float32))
    yb_un = np.concatenate([yb[..., :C], yb[..., C:]], axis=0)
    ya_re = np.concatenate([ya[0::2], ya[1::2]], axis=0)
    tol = 2e-2 if args.dtype == "bf16" else 1e-5
    np.testing.assert_allclose(yb_un, ya_re, atol=tol)
    np.testing.assert_allclose(
        np.concatenate([yc[..., :C], yc[..., C:]], axis=0), ya_re, atol=tol)
    log("correctness: grouped + blockdiag == dense64 ✓")

    def bench(name, inp, ker, groups):
        fwd = jax.jit(lambda i, w: chain(i, w, groups))
        vgf = jax.jit(jax.value_and_grad(
            lambda w, i: jnp.sum(chain(i, w, groups).astype(jnp.float32))))

        out = fwd(inp, ker); _ = np.asarray(out[0, 0, 0, 0, 0])
        results = {}
        for label, fn, sync in [
            ("fwd", lambda: fwd(inp, ker), None),
            ("fwd+bwd", lambda: vgf(ker, inp), None),
        ]:
            box = [fn()]
            if label == "fwd":
                _ = np.asarray(box[0][0, 0, 0, 0, 0])
                sync = lambda: np.asarray(box[0][0, 0, 0, 0, 0])
            else:
                _ = float(box[0][0])
                sync = lambda: float(box[0][0])
            windows = []
            for _w in range(3):
                t0 = time.time()
                for _ in range(args.steps):
                    box[0] = fn()
                sync()
                windows.append((time.time() - t0) / args.steps * 1000)
            results[label] = float(np.median(windows))
        # FLOPs of the *useful* math (dense-64 equivalent), per chain call.
        vox = B * D * D * D
        useful_gflops = 2 * vox * 27 * C * C * N_CHAIN / 1e9
        log(f"{name:22s} fwd {results['fwd']:7.2f} ms ({useful_gflops/results['fwd']:6.1f} "
            f"useful-TF/s)   fwd+bwd {results['fwd+bwd']:7.2f} ms "
            f"({3*useful_gflops/results['fwd+bwd']:6.1f} useful-TF/s)")
        return results

    all_res = {}
    for name, (_, inp, ker, groups) in cases.items():
        all_res[name] = bench(name, inp, ker, groups)

    base = all_res["a_base_64"]
    log("\nspeedups vs baseline (useful work):")
    for name, r in all_res.items():
        if name == "a_base_64" or name.startswith("d_"):
            continue
        log(f"  {name:20s} fwd x{base['fwd']/r['fwd']:.2f}  "
            f"fwd+bwd x{base['fwd+bwd']/r['fwd+bwd']:.2f}")


if __name__ == "__main__":
    main()
