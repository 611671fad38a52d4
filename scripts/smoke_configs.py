"""End-to-end smoke runs at BASELINE.json configs[0] and configs[2] on the
real chip (VERDICT round-1 item 9).

- configs[0]: denoise geometry — res_increase=1 (identity upsample,
  reference SR4DFlowNet.py:72-74), patch 16, batch 4, 2 low/1 hi resblocks,
  bundled data.
- configs[2]: 4x upsample — res_increase=4 (repeated upsample3d). The
  bundled pair is 2x, so the 4x LR set is *generated* with the framework's
  own prepare_data pipeline (fft downsample 4x from example_data_HR.h5 +
  random patch indexes), which doubles as an end-to-end prepare->train->
  predict exercise.

Usage: python scripts/smoke_configs.py [--epochs 2]
Prints one summary line per config; paste into docs/performance.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "/root/reference/data"


def run_config0(epochs: int) -> dict:
    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.training import TrainerController

    rows = load_indexes(f"{DATA}/train.csv")
    loader = PatchLoader(DATA, 16, 1, 4)
    trainset = loader.initialize_dataset(rows, shuffle=True, seed=0)
    val = loader.initialize_dataset(load_indexes(f"{DATA}/validate.csv"), shuffle=False)

    tc = TrainerController(16, 1, 1e-3, False, "smoke0", low_resblock=2,
                           hi_resblock=1, models_dir="/tmp/smoke0_models")
    tc.init_model_dir()
    t0 = time.time()
    tc.train_network(trainset, val, n_epoch=epochs)
    dt = time.time() - t0
    return {
        "config": "configs[0] denoise res=1 patch16 batch4 2/1 resblocks",
        "epochs": epochs,
        "sec_per_epoch": round(dt / epochs, 1),
        "train_loss": round(float(tc.loss_metrics["train_loss"].result()), 5),
        "val_loss": round(float(tc.loss_metrics["val_loss"].result()), 5),
    }


def run_config2(epochs: int, workdir: str = "/tmp/smoke4x") -> dict:
    import h5py

    from flownet4d_tpu.prepare_data.lowres import generate_lowres_dataset
    from flownet4d_tpu.prepare_data.patch_data import generate_random_patches
    from flownet4d_tpu.data.patch_index import write_header
    from flownet4d_tpu.data import PatchLoader, load_indexes
    from flownet4d_tpu.training import TrainerController
    from flownet4d_tpu.inference import VolumePredictor
    from flownet4d_tpu.data.volume import VolumeDataset
    import jax

    os.makedirs(workdir, exist_ok=True)
    lr4 = os.path.join(workdir, "lr4.h5")
    hr = os.path.join(workdir, "hr.h5")
    csv = os.path.join(workdir, "train4x.csv")

    # The loader keys LR/HR files by basename within one data dir, so link
    # the bundled HR file into the workdir.
    if not os.path.exists(hr):
        os.symlink(f"{DATA}/example_data_HR.h5", hr)
    t_prep = time.time()
    if not os.path.exists(lr4):
        generate_lowres_dataset(f"{DATA}/example_data_HR.h5", lr4, downsample=4,
                                seed=11, verbose=False)
    if not os.path.exists(csv):
        with h5py.File(lr4) as h:
            lr_mask = np.asarray(h["mask"][0])
        write_header(csv)
        rng = np.random.default_rng(12)
        # The bundled HR file has a single frame.
        generate_random_patches("lr4.h5", "hr.h5", csv, 0, 40,
                                (lr_mask >= 0.4).astype(np.int32), 8, 0.05, 8,
                                apply_all_rotation=False, rng=rng)
    t_prep = time.time() - t_prep

    rows = load_indexes(csv)
    loader = PatchLoader(workdir, 8, 4, 4)
    trainset = loader.initialize_dataset(rows[:32], shuffle=True, seed=0)
    val = loader.initialize_dataset(rows[32:40], shuffle=False)

    tc = TrainerController(8, 4, 1e-3, False, "smoke4x", low_resblock=2,
                           hi_resblock=1, models_dir="/tmp/smoke4x_models")
    tc.init_model_dir()
    t0 = time.time()
    tc.train_network(trainset, val, n_epoch=epochs)
    dt = time.time() - t0

    # 4x predictor end-to-end: (20,18,18) LR -> (80,72,72) SR (the k-space
    # crop keeps 2*int(half/4) bins per axis, so 84x76x72 -> 20x18x18).
    pred = VolumePredictor(8, 4, 16, 2, 1, params=jax.device_get(tc.state.params))
    ds = VolumeDataset()
    ds.load_vectorfield(lr4, 0)
    t1 = time.time()
    u, v, w = pred.predict_volume(ds)
    t_pred = time.time() - t1
    assert u.shape == tuple(4 * s for s in ds.u.shape), (u.shape, ds.u.shape)
    return {
        "config": "configs[2] 4x SR patch8->32 batch4 2/1 resblocks (generated 4x set)",
        "prep_sec": round(t_prep, 1),
        "epochs": epochs,
        "sec_per_epoch": round(dt / epochs, 1),
        "train_loss": round(float(tc.loss_metrics["train_loss"].result()), 5),
        "val_loss": round(float(tc.loss_metrics["val_loss"].result()), 5),
        "predict_sec_per_frame": round(t_pred, 2),
        "out_shape": list(u.shape),
    }


def main():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--only", choices=["0", "2"], default=None)
    args = ap.parse_args()

    if args.only in (None, "0"):
        print(json.dumps(run_config0(args.epochs)), flush=True)
    if args.only in (None, "2"):
        print(json.dumps(run_config2(args.epochs)), flush=True)


if __name__ == "__main__":
    main()
