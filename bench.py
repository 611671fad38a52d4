"""Headline benchmark: SR training throughput (patches/sec/chip) at the
paper-default config — patch 24^3 -> 48^3, x2 SR, 8 low/4 hi resblocks,
batch 8 (BASELINE.json configs[1]).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}
where vs_baseline is the speedup over the TF-CPU reference implementation
measured in this environment (BASELINE_MEASURED.json; see
scripts/measure_tf_baseline.py for the protocol). "extras" records the
strict-f32 parity-mode training throughput and full-volume inference
sec/frame from the same process, so every round's driver artifact captures
all three numbers (VERDICT round-1 item 4). Diagnostics go to stderr.

Env knobs: BENCH_MODE=inference (inference-only headline) or e2e
(real-loader training headline), BENCH_DTYPE, BENCH_BATCH, BENCH_STEPS,
BENCH_REMAT, BENCH_VOLUME, BENCH_EXTRAS=0 (skip the
e2e/f32/inference extras).
"""

import gc
import json
import os
import sys
import time

import numpy as np


_PROCESS_T0 = time.time()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _baseline(key):
    bp = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.isfile(bp):
        with open(bp) as f:
            return json.load(f).get(key)
    return None


def measure_inference(dtype_name: str, max_windows: int = 6) -> tuple[float, list]:
    """Full-volume sec/frame on data/example_data.h5 (predictor defaults:
    patch 24, res x2, batch 8, 8/4 resblocks). Median of 3 windows,
    adaptively extended to max_windows while the relay spread is >25% —
    the same variance discipline as measure_train (BENCH_r04's inference
    windows spread 0.518-0.982 with no way to tell spread from
    regression; VERDICT r4 item 6). Returns (median, windows).

    BENCH_VOLUME=N measures a synthetic N^3 frame instead (the clinical
    large-volume case — the reference's whole point is big volumes;
    round-2 measured 128^3 at 12.8-16.4 s/frame pre-writer-overlap)."""
    import jax.numpy as jnp
    from flownet4d_tpu.inference import VolumePredictor
    from flownet4d_tpu.data.volume import VolumeDataset

    predictor = VolumePredictor(
        24, 2, 8,
        compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        transfer_dtype=np.float16,
    )
    dataset = VolumeDataset()
    path = "/root/reference/data/example_data.h5"

    vol = int(os.environ.get("BENCH_VOLUME", "0"))
    if vol:
        import tempfile

        import h5py

        rng = np.random.default_rng(0)
        path = os.path.join(tempfile.mkdtemp(prefix="bench_vol_"),
                            f"synth_{vol}.h5")
        nframes = 2  # >1 so the cross-frame pipelining actually engages
        with h5py.File(path, "w") as hf:
            for c in ("u", "v", "w"):
                hf[c] = rng.uniform(
                    -1, 1, (nframes, vol, vol, vol)).astype("float32")
                hf[f"mag_{c}"] = rng.uniform(
                    0, 4095, (nframes, vol, vol, vol)).astype("float32")
                hf[f"venc_{c}"] = np.full((nframes,), 1.5, "float32")
            hf["dx"] = np.full((nframes, 3), 2.0, "float32")

    dataset.load_vectorfield(path, 0)
    comps = predictor.predict_volume(dataset)  # warmup/compile
    n = int(os.environ.get("BENCH_STEPS", "5"))
    rates = []
    def spread_settled(w):
        return w >= 3 and (max(rates) - min(rates)) / np.median(rates) <= 0.25

    if vol:
        # The clinical workflow: predict_file (frame-pipelined dispatch +
        # ordered writer thread). Also log one predict_volume window for
        # comparability with the round-2 per-frame protocol.
        out_path = os.path.join(os.path.dirname(path), "out.h5")
        for w in range(max_windows):
            if spread_settled(w):
                break
            if os.path.exists(out_path):
                os.remove(out_path)
            t0 = time.time()
            predictor.predict_file(path, out_path, verbose=False)
            rates.append((time.time() - t0) / nframes)
            log(f"predict_file window {w+1}: {rates[-1]:.2f} s/frame ({vol}^3)")
        t0 = time.time()
        comps = predictor.predict_volume(dataset)
        log(f"predict_volume (round-2 protocol): {time.time()-t0:.2f} s/frame")
    else:
        for w in range(max_windows):  # median windows (relay variance)
            if spread_settled(w):
                break
            t0 = time.time()
            for _ in range(n):
                dataset.load_vectorfield(path, 0)
                comps = predictor.predict_volume(dataset)
            rates.append((time.time() - t0) / n)
    spf = float(np.median(rates))
    log(f"inference windows {['%.3f' % r for r in rates]} s/frame ({dtype_name}), "
        f"out shape {comps[0].shape}")
    del predictor
    gc.collect()
    return spf, rates


def measure_train(dtype_name: str, max_windows: int = 3) -> tuple[float, list]:
    """Training patches/sec at the paper config. Median of 3 windows,
    adaptively extended to max_windows when the relay variance is wide
    (BENCH_r02 windows spanned 21.6->35.6; VERDICT r2 weak-item 7)."""
    import jax
    import jax.numpy as jnp

    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.data.patch_loader import TrainingBatch

    patch, res = 24, 2
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    low_rb, hi_rb = 8, 4
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    # Default: auto (remat off — fits and faster in both dtypes; see
    # TrainerController).
    remat_env = os.environ.get("BENCH_REMAT", "")
    remat = None if remat_env == "" else remat_env == "1"
    tc = TrainerController(
        patch, res, 2e-4, False, "bench", low_rb, hi_rb,
        compute_dtype=compute_dtype, models_dir="/tmp/bench_models",
        remat=remat,
    )

    rng = np.random.default_rng(0)
    P = patch * res

    def make_batch():
        return TrainingBatch(
            lr=rng.uniform(-1, 1, (batch, patch, patch, patch, 3)).astype("float32"),
            mag=rng.uniform(0, 1, (batch, patch, patch, patch, 3)).astype("float32"),
            hr=rng.uniform(-1, 1, (batch, P, P, P, 3)).astype("float32"),
            venc=np.full((batch,), 1.5, "float32"),
            mask=(rng.uniform(size=(batch, P, P, P)) > 0.5).astype("float32"),
            rot_case=(np.arange(batch) % 10).astype("int32"),
            weight=np.ones((batch,), "float32"),
        )

    # Warmup (compile) + true sync via host readback (block_until_ready does
    # not reliably fence on relay-attached TPUs).
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    def run_steps(batches):
        metrics = None
        for dev_batch in tc._device_batches(batches):
            tc.state, metrics = tc._train_step(tc.state, dev_batch, train=True)
        return metrics

    import jax

    t0 = time.time()
    run_steps([make_batch()])
    _ = int(np.asarray(tc.state.step))
    log(f"compile+first dispatch: {time.time()-t0:.1f}s ({dtype_name})")

    # Untimed warm-up. The relay runs slow (~3-5x) for the first ~110 s of
    # *process wall-clock* regardless of step count (measured across two
    # runs: steady state always arrived ~110 s after process start,
    # whether warm-up was 10 or 60 steps), then settles. So warm up on a
    # clock — until the process is >115 s old — and then until two
    # consecutive 10-step probes agree within 20%.
    prev_rate = 0.0
    for probe in range(30):
        t0 = time.time()
        run_steps([make_batch() for _ in range(10)])
        _ = int(np.asarray(tc.state.step))
        rate = batch * 10 / (time.time() - t0)
        age = time.time() - _PROCESS_T0
        log(f"warm-up probe {probe+1}: {rate:.2f} patches/s (process age {age:.0f}s)")
        if age > 115 and prev_rate > 0 and \
                abs(rate - prev_rate) / max(rate, prev_rate) < 0.10:
            break
        prev_rate = rate

    # Distinct numpy batches, pipelined upload — the train_network hot loop.
    # Relay-attached chips show 2-3x run-to-run variance; report the median
    # of 3 measurement windows.
    rates = []
    for window in range(max(max_windows, 3)):
        # Past 3 windows, keep extending only while the spread is wide —
        # a slow relay window shouldn't decide the headline.
        if window >= 3 and (max(rates) - min(rates)) / np.median(rates) <= 0.25:
            break
        batches = [make_batch() for _ in range(n_steps)]
        t0 = time.time()
        metrics = run_steps(batches)
        metrics = jax.device_get(metrics)  # forces the whole chain
        _ = int(np.asarray(tc.state.step))
        dt = time.time() - t0
        rates.append(batch * n_steps / dt)
        log(f"window {window+1}: {n_steps} steps in {dt:.2f}s -> {rates[-1]:.2f} "
            f"patches/s ({dt/n_steps*1000:.1f} ms/step), loss_sum {metrics['loss_sum']:.4f}")
    pps = float(np.median(rates))
    del tc
    gc.collect()
    return pps, rates


def measure_train_e2e(dtype_name: str) -> float:
    """Steady-state patches/s of the REAL training loop — PatchLoader over
    HDF5 + the actual TrainerController epoch loop (run_train_epoch), at
    the paper config. This is the number train_network delivers end to
    end, vs measure_train's synthetic in-memory upper bound (VERDICT r2
    item 2). A patch-24 index over the bundled example volumes is
    generated on the fly (the shipped CSVs were built for patch <= 16)."""
    import contextlib
    import tempfile

    import h5py
    import jax
    import jax.numpy as jnp

    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.data.patch_index import write_header
    from flownet4d_tpu.prepare_data.patch_data import generate_random_patches
    from flownet4d_tpu.training import TrainerController

    patch, res = 24, 2
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    data_dir = "/root/reference/data"

    tmpdir = tempfile.mkdtemp(prefix="bench_e2e_")
    csv_path = os.path.join(tmpdir, "e2e_train.csv")
    write_header(csv_path)
    with h5py.File(os.path.join(data_dir, "example_data.h5"), "r") as hf:
        mask = np.asarray(hf["mask"][0])
    # prepare_patches semantics: LR mask >= 0.4, coverage >= 0.2, all 9
    # rotations per accepted patch (reference prepare_patches.py:17-19).
    generate_random_patches(
        "example_data.h5", "example_data_HR.h5", csv_path, 0,
        n_patch=32, binary_mask=(mask >= 0.4).astype(np.float32),
        patch_size=patch, minimum_coverage=0.2, empty_patch_allowed=0,
        apply_all_rotation=True, rng=np.random.default_rng(0),
    )
    rows = load_indexes(csv_path)  # 32 x 10 = 320 rows = 40 steps at batch 8
    log(f"e2e: generated {len(rows)} patch-24 index rows")

    loader = PatchLoader(data_dir, patch, res, batch)
    trainset = loader.initialize_dataset(rows, shuffle=True, seed=0)
    tc = TrainerController(
        patch, res, 2e-4, False, "bench_e2e", 8, 4,
        compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        models_dir="/tmp/bench_models",
    )

    rates = []
    with contextlib.redirect_stdout(sys.stderr):
        tc.run_train_epoch(trainset)  # compile + cache warm epoch
        _ = int(np.asarray(tc.state.step))
        for window in range(3):
            t0 = time.time()
            n = tc.run_train_epoch(trainset)
            _ = int(np.asarray(tc.state.step))
            dt = time.time() - t0
            rates.append(n * batch / dt)
            log(f"\ne2e window {window+1}: {n} steps in {dt:.2f}s -> "
                f"{rates[-1]:.2f} patches/s")
    pps = float(np.median(rates))
    log(f"e2e loader stats: {loader.cache_stats()}")
    del tc
    gc.collect()
    return pps


def _init_backend_with_retry():
    """Initialize the JAX backend, retrying with backoff, under a watchdog.

    The relay-attached TPU has two observed failure modes: raising
    UNAVAILABLE (BENCH_r03 was rc=1 solely because `jax.devices()` raised
    at driver bench time) and *hanging* inside backend setup (observed
    round 4 — devices() blocked >10 min without raising). Retry raises
    for up to ~BENCH_INIT_RETRY_S seconds; the whole attempt runs in a
    daemon thread so a hang can't stop the process from emitting its one
    JSON line. Raises RuntimeError if the backend never comes up."""
    import threading

    retry_budget = float(os.environ.get("BENCH_INIT_RETRY_S", "600"))
    if os.environ.get("BENCH_FORCE_PLATFORM"):
        # Test hook: point JAX at a named platform (e.g. a bogus one to
        # exercise the error path — the container's sitecustomize stomps
        # JAX_PLATFORMS, so an env-var override can't do it).
        import jax

        jax.config.update("jax_platforms", os.environ["BENCH_FORCE_PLATFORM"])
    result = {}

    def _attempt():
        import jax

        deadline = time.time() + retry_budget
        delay = 10.0
        while True:
            try:
                result["devices"] = jax.devices()
                return
            except Exception as e:  # noqa: BLE001 — any init failure is retryable
                result["err"] = e
                if time.time() >= deadline:
                    return
                log(f"backend init failed ({e!r}); retrying in {delay:.0f}s "
                    f"({deadline - time.time():.0f}s left)")
                time.sleep(min(delay, max(0.0, deadline - time.time())))
                delay = min(delay * 2, 120.0)

    t = threading.Thread(target=_attempt, daemon=True)
    t.start()
    t.join(retry_budget + 60.0)
    if "devices" not in result:
        err = result.get("err")
        raise RuntimeError(
            f"backend init {'failed: ' + repr(err) if err else 'hung'} "
            f"after {retry_budget:.0f}s")
    log(f"devices: {result['devices']}")
    return result["devices"]


def main():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    _init_backend_with_retry()

    pps, _ = measure_train(dtype_name, max_windows=5)

    train_baseline = _baseline("tf_cpu_train_patches_per_sec")
    infer_baseline = _baseline("tf_cpu_inference_sec_per_frame")

    # Extras: the other train dtype + bf16 inference, one artifact per round
    # (VERDICT round-1 item 4). Failures are non-fatal: the headline line
    # must print regardless.
    extras = {}
    if os.environ.get("BENCH_EXTRAS", "1") == "1":
        other = "float32" if dtype_name == "bfloat16" else "bfloat16"
        try:
            pps_e2e = measure_train_e2e(dtype_name)
            extras["train_patches_per_sec_e2e"] = round(pps_e2e, 2)
        except Exception as e:  # noqa: BLE001
            log(f"extras: e2e train failed: {e!r}")
        try:
            pps_other, _ = measure_train(other)
            extras[f"train_patches_per_sec_{other}"] = round(pps_other, 2)
            if train_baseline:
                extras[f"vs_baseline_{other}"] = round(pps_other / train_baseline, 2)
        except Exception as e:  # noqa: BLE001
            log(f"extras: {other} train failed: {e!r}")
        try:
            spf, windows = measure_inference("bfloat16")
            extras["inference_sec_per_frame_bfloat16"] = round(spf, 3)
            extras["inference_windows"] = [round(r, 3) for r in windows]
            if infer_baseline:
                extras["inference_vs_baseline"] = round(infer_baseline / spf, 2)
        except Exception as e:  # noqa: BLE001
            log(f"extras: inference failed: {e!r}")

    result = {
        "metric": f"train patches/sec/chip (24^3->48^3 x2 SR, batch {batch}, 8/4 resblocks, {dtype_name})",
        "value": round(pps, 2),
        "unit": "patches/sec",
        "vs_baseline": round(pps / train_baseline, 2) if train_baseline else None,
    }
    if extras:
        result["extras"] = extras
    print(json.dumps(result), flush=True)


def main_inference():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    _init_backend_with_retry()
    spf, windows = measure_inference(dtype_name)
    baseline = _baseline("tf_cpu_inference_sec_per_frame")
    vol = int(os.environ.get("BENCH_VOLUME", "0"))
    geom = (f"{vol}^3 synthetic, predict_file" if vol
            else "42x38x36 -> 84x76x72")
    print(json.dumps({
        "metric": f"full-volume inference sec/frame ({geom}, {dtype_name})",
        "value": round(spf, 3),
        "unit": "sec/frame",
        "vs_baseline": round(baseline / spf, 2) if baseline else None,
        "extras": {"inference_windows": [round(r, 3) for r in windows]},
    }), flush=True)


def main_e2e():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    _init_backend_with_retry()
    pps = measure_train_e2e(dtype_name)
    baseline = _baseline("tf_cpu_train_patches_per_sec")
    print(json.dumps({
        "metric": f"e2e train patches/sec/chip (real PatchLoader + epoch loop, {dtype_name})",
        "value": round(pps, 2),
        "unit": "patches/sec",
        "vs_baseline": round(pps / baseline, 2) if baseline else None,
    }), flush=True)


if __name__ == "__main__":
    # Contract: exactly ONE JSON line on stdout, no matter what. On an
    # unrecoverable failure (e.g. the TPU relay stayed down past the
    # retry window) emit {"error": ...} instead of a stack trace so the
    # driver's artifact is always machine-readable (VERDICT r3 item 2).
    try:
        if os.environ.get("BENCH_MODE") == "inference":
            main_inference()
        elif os.environ.get("BENCH_MODE") == "e2e":
            main_e2e()
        else:
            main()
    except BaseException as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "train patches/sec/chip",
            "value": None,
            "unit": "patches/sec",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }), flush=True)
        sys.exit(1)
