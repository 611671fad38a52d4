"""Render the SR comparison figure for a trained model.

The reference's README presents its end product as example images of the
super-resolved velocity field (/root/reference/README.md:30-47); this is
our equivalent: mid-slice speed heatmaps of LR input, the trilinear null
baseline, the model SR output, and the HR CFD ground truth, plus error
maps for baseline vs model — all on shared scales so the panels are
comparable (one sequential colormap per row, one colorbar per row).

Usage:
  python scripts/make_sr_figure.py --model-path <ckpt|h5> [--keras] \
      [--out demo/r3/sr_comparison.png] [--low-resblock 8 --hi-resblock 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA_DIR = "/root/reference/data"


def speed(uvw: np.ndarray) -> np.ndarray:
    return np.sqrt((uvw**2).sum(-1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--keras", action="store_true")
    ap.add_argument("--out", default="demo/r3/sr_comparison.png")
    ap.add_argument("--res-increase", type=int, default=2)
    ap.add_argument("--low-resblock", type=int, default=8)
    ap.add_argument("--hi-resblock", type=int, default=4)
    ap.add_argument("--patch-size", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="pin JAX to CPU (env vars are stomped by sitecustomize)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import h5py
    from flownet4d_tpu.data.volume import VolumeDataset
    from flownet4d_tpu.inference import VolumePredictor
    from evaluate_model import trilinear_baseline, volume_metrics

    predictor = VolumePredictor(
        args.patch_size, args.res_increase, 8,
        args.low_resblock, args.hi_resblock,
    )
    predictor.load_weights(args.model_path, keras=args.keras)
    ds = VolumeDataset()
    ds.load_vectorfield(f"{DATA_DIR}/example_data.h5", 0)
    pred = np.stack(predictor.predict_volume(ds, round_small_values=True), -1)

    with h5py.File(f"{DATA_DIR}/example_data_HR.h5") as hf:
        hr = np.stack([np.asarray(hf[c][0]) for c in ["u", "v", "w"]], -1)
        hr_mask = np.asarray(hf["mask"][0])
    with h5py.File(f"{DATA_DIR}/example_data.h5") as hf:
        lr = np.stack([np.asarray(hf[c][0]) for c in ["u", "v", "w"]], -1)

    pred = pred[: hr.shape[0], : hr.shape[1], : hr.shape[2]]
    base = trilinear_baseline(lr, hr.shape[:3])
    m_model = volume_metrics(pred, hr, hr_mask)
    m_base = volume_metrics(base, hr, hr_mask)

    # Mid slice along x (first axis); LR shown at its native grid via extent.
    k_hr = hr.shape[0] // 2
    k_lr = k_hr // args.res_increase
    s_lr, s_base = speed(lr[k_lr]), speed(base[k_hr])
    s_pred, s_hr = speed(pred[k_hr]), speed(hr[k_hr])
    e_base = speed(base[k_hr] - hr[k_hr])
    e_pred = speed(pred[k_hr] - hr[k_hr])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vmax = float(s_hr.max())
    emax = float(max(e_base.max(), e_pred.max()))
    ext = [0, hr.shape[2], 0, hr.shape[1]]  # common physical extent

    fig, axes = plt.subplots(2, 4, figsize=(13, 6.6), constrained_layout=True)
    top = [
        (s_lr, f"LR input ({lr.shape[0]}×{lr.shape[1]}×{lr.shape[2]})"),
        (s_base, f"Trilinear ×{args.res_increase} — "
                 f"rel err {m_base['rel_speed_error_pct']:.1f}%"),
        (s_pred, f"4DFlowNet SR — "
                 f"rel err {m_model['rel_speed_error_pct']:.1f}%"),
        (s_hr, f"HR ground truth ({hr.shape[0]}×{hr.shape[1]}×{hr.shape[2]})"),
    ]
    for ax, (img, title) in zip(axes[0], top):
        im0 = ax.imshow(img, cmap="viridis", vmin=0, vmax=vmax,
                        extent=ext, origin="lower", interpolation="nearest")
        ax.set_title(title, fontsize=10, color="#333333")
        ax.set_xticks([]), ax.set_yticks([])
    fig.colorbar(im0, ax=axes[0], shrink=0.85, label="speed (m/s)")

    axes[1][0].axis("off")
    axes[1][3].axis("off")
    bot = [
        (axes[1][1], e_base, "|error| trilinear"),
        (axes[1][2], e_pred, "|error| model"),
    ]
    for ax, img, title in bot:
        im1 = ax.imshow(img, cmap="magma", vmin=0, vmax=emax,
                        extent=ext, origin="lower", interpolation="nearest")
        ax.set_title(title, fontsize=10, color="#333333")
        ax.set_xticks([]), ax.set_yticks([])
    fig.colorbar(im1, ax=axes[1], shrink=0.85, label="|error| (m/s)")

    fig.suptitle(
        f"4D Flow SR, mid x-slice — fluid RMSE: trilinear "
        f"{m_base['fluid_rmse_m_per_s']:.3f} vs model "
        f"{m_model['fluid_rmse_m_per_s']:.3f} m/s",
        fontsize=11, color="#222222",
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")
    print(f"model:     {m_model}")
    print(f"trilinear: {m_base}")


if __name__ == "__main__":
    main()
