"""Evaluate a trained model: the reference's published accuracy yardstick.

Produces the accuracy table VERDICT r2 item 1 asks for:

1. Patch-set metrics on the bundled validate/benchmark CSVs — mean
   relative speed error % (loss_utils.py:64-103, the metric the 4DFlowNet
   papers report) + fluid/non-fluid masked MSE (TrainerController.py:84-127).
2. Full-volume super-resolution accuracy: predict example_data.h5
   (42x38x36 LR) and score against example_data_HR.h5 (84x76x72 HR CFD
   ground truth) inside the fluid mask — with **trilinear interpolation of
   the LR volume as the null baseline** the network must beat.

Usage:
  python scripts/evaluate_model.py --model-path models/<run>/<name>-best.ckpt \
      [--low-resblock 8 --hi-resblock 4 --patch-size 16] [--keras]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA_DIR = "/root/reference/data"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def patchset_metrics(tc, loader, rows) -> dict:
    """val_loss / val_mse / val_accuracy means over one patch-index set."""
    tc.loss_metrics.reset()
    for batch in loader.initialize_dataset(rows, shuffle=False):
        tc.test_step(batch)
    res = tc.loss_metrics.results()
    return {
        "loss": round(res["val_loss"], 6),
        "fluid+nonfluid_mse": round(res["val_mse"], 6),
        "rel_speed_error_pct": round(res["val_accuracy"], 3),
    }


def volume_metrics(pred_uvw, hr_uvw, hr_mask) -> dict:
    """Full-volume metrics inside/outside the HR fluid mask.

    rel_speed_error follows loss_utils.calculate_relative_error semantics
    (clip [0,1], zero-speed -> abs diff, 1e-4 rounding, masked mean, x100).
    """
    diff = pred_uvw - hr_uvw
    mask = (hr_mask >= 0.6).astype(np.float64)

    # Relative speed error (the published metric).
    err_mag = np.sqrt(np.sum(diff**2, axis=-1))
    speed = np.sqrt(np.sum(hr_uvw**2, axis=-1))
    rel = np.where(speed == 0, err_mag - speed, err_mag / (speed + 1e-5))
    rel = np.clip(rel, 0.0, 1.0)
    rel = np.floor(rel / 1e-4) * 1e-4
    rel_err = 100.0 * np.sum(rel * mask) / (np.sum(mask) + 1.0)

    mse_vox = np.sum(diff**2, axis=-1)
    fluid_mse = np.sum(mse_vox * mask) / (np.sum(mask) + 1.0)
    nf = 1.0 - mask
    nonfluid_mse = np.sum(mse_vox * nf) / (np.sum(nf) + 1.0)
    fluid_rmse = float(np.sqrt(fluid_mse))
    return {
        "rel_speed_error_pct": round(float(rel_err), 3),
        "fluid_rmse_m_per_s": round(fluid_rmse, 5),
        "fluid_mse": round(float(fluid_mse), 6),
        "nonfluid_mse": round(float(nonfluid_mse), 6),
    }


def trilinear_baseline(lr_uvw: np.ndarray, out_shape) -> np.ndarray:
    """align_corners trilinear upsample of the raw LR velocities — the
    model-free null hypothesis (what upsample3d alone would give)."""
    import jax.numpy as jnp
    from flownet4d_tpu.ops.upsample import upsample3d

    x = jnp.asarray(lr_uvw[None].astype(np.float32))
    r = out_shape[0] // lr_uvw.shape[0]
    up = np.asarray(upsample3d(x, r))[0]
    return up[: out_shape[0], : out_shape[1], : out_shape[2]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--keras", action="store_true")
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--res-increase", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=20)
    ap.add_argument("--low-resblock", type=int, default=8)
    ap.add_argument("--hi-resblock", type=int, default=4)
    ap.add_argument("--infer-patch-size", type=int, default=24,
                    help="patch size for full-volume inference (predictor "
                    "default 24; the conv net is size-agnostic)")
    args = ap.parse_args()

    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import h5py
    import jax

    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.inference import VolumePredictor
    from flownet4d_tpu.data.volume import VolumeDataset

    report = {"model": args.model_path}

    # Architecture attrs stored in the .h5 (round 5+) override the CLI —
    # a residual_skip model scored as a plain one would be nonsense.
    from flownet4d_tpu.training import checkpoint as _ckpt

    attrs = {} if args.keras else _ckpt.read_h5_model_attrs(args.model_path)
    if attrs:
        log(f"model attrs from h5: {attrs}")
        args.res_increase = int(attrs.get("res_increase", args.res_increase))
        args.low_resblock = int(attrs.get("low_resblock", args.low_resblock))
        args.hi_resblock = int(attrs.get("hi_resblock", args.hi_resblock))
    residual_skip = bool(attrs.get("residual_skip", 0))

    # ---- 1. patch-set metrics -----------------------------------------
    tc = TrainerController(
        args.patch_size, args.res_increase, 1e-4, False, "eval",
        args.low_resblock, args.hi_resblock, models_dir="/tmp/eval_models",
        residual_skip=residual_skip,
    )
    mdir, mfile = os.path.split(args.model_path)
    tc.restore_model(mdir, mfile)
    loader = PatchLoader(DATA_DIR, args.patch_size, args.res_increase,
                         args.batch_size)
    for name in ["validate", "benchmark", "train"]:
        rows = load_indexes(f"{DATA_DIR}/{name}.csv")
        report[f"patchset_{name}"] = patchset_metrics(tc, loader, rows)
        log(f"{name}: {report[f'patchset_{name}']}")
    del tc

    # ---- 2. full-volume SR vs HR ground truth -------------------------
    predictor = VolumePredictor(
        args.infer_patch_size, args.res_increase, 8,
        args.low_resblock, args.hi_resblock,
    )
    predictor.load_weights(args.model_path, keras=args.keras)

    ds = VolumeDataset()
    ds.load_vectorfield(f"{DATA_DIR}/example_data.h5", 0)
    comps = predictor.predict_volume(ds, round_small_values=True)
    pred = np.stack(comps, axis=-1)

    with h5py.File(f"{DATA_DIR}/example_data_HR.h5") as hf:
        hr = np.stack([np.asarray(hf[c][0]) for c in ["u", "v", "w"]], -1)
        hr_mask = np.asarray(hf["mask"][0])
    with h5py.File(f"{DATA_DIR}/example_data.h5") as hf:
        lr_raw = np.stack([np.asarray(hf[c][0]) for c in ["u", "v", "w"]], -1)

    pred = pred[: hr.shape[0], : hr.shape[1], : hr.shape[2]]
    report["volume_model"] = volume_metrics(pred, hr, hr_mask)
    log(f"volume (model): {report['volume_model']}")

    base = trilinear_baseline(lr_raw, hr.shape[:3])
    report["volume_trilinear_baseline"] = volume_metrics(base, hr, hr_mask)
    log(f"volume (trilinear null): {report['volume_trilinear_baseline']}")

    report["sr_output_stats"] = {
        "shape": list(pred.shape),
        "speed_max_m_per_s": round(float(np.sqrt((pred**2).sum(-1)).max()), 4),
        "speed_mean_fluid": round(float(
            np.sqrt((pred**2).sum(-1))[hr_mask >= 0.6].mean()), 4),
    }

    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
