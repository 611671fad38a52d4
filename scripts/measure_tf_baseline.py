"""Measure the TF-CPU reference baseline (train patches/sec + inference sec/frame).

Runs the actual reference implementation from /root/reference/src on CPU
(legacy tf_keras), per BASELINE.md's measurement protocol, and writes
BASELINE_MEASURED.json consumed by bench.py.

Train metric: reference train_step throughput at the paper-default config
(patch 24, res x2, 8 low/4 hi resblocks, batch 8) with batches already in
memory — this excludes their (slow) py_function input pipeline, i.e. it is
a *conservative* baseline to beat.

Inference metric: reference predictor flow (patchify -> model.predict ->
stitch) on data/example_data.h5, sec/frame.
"""

import os
import sys
import json
import time

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "2"

sys.path.insert(0, "/root/reference/src")

import numpy as np
import tensorflow as tf

PATCH = 24
RES = 2
BATCH = 8
LOW_RB, HI_RB = 8, 4


def measure_train(n_steps=4):
    from Network.TrainerController import TrainerController

    os.makedirs("/tmp/tf_baseline_models", exist_ok=True)
    os.chdir("/root/reference/src")  # source backup paths are relative

    tc = TrainerController(PATCH, RES, 2e-4, False, "baseline", LOW_RB, HI_RB)

    rng = np.random.default_rng(0)
    P = PATCH * RES
    batch = (
        *(tf.constant(rng.uniform(-1, 1, (BATCH, PATCH, PATCH, PATCH, 1)).astype("float32")) for _ in range(6)),
        *(tf.constant(rng.uniform(-1, 1, (BATCH, P, P, P, 1)).astype("float32")) for _ in range(3)),
        tf.constant(np.full((BATCH,), 1.5, "float32")),
        tf.constant((rng.uniform(size=(BATCH, P, P, P)) > 0.5).astype("float32")),
    )

    tc.train_step(batch)  # trace + compile
    t0 = time.time()
    for _ in range(n_steps):
        tc.train_step(batch)
    dt = (time.time() - t0) / n_steps
    return BATCH / dt, dt


def measure_inference(n_frames=1):
    from Network.SR4DFlowNet import SR4DFlowNet
    from Network.PatchGenerator import PatchGenerator
    from utils.ImageDataset import ImageDataset

    inputs = [
        tf.keras.layers.Input(shape=(PATCH,) * 3 + (1,), name=n)
        for n in ["u", "v", "w", "u_mag", "v_mag", "w_mag"]
    ]
    pred = SR4DFlowNet(RES).build_network(*inputs, LOW_RB, HI_RB)
    model = tf.keras.Model(inputs, pred)

    pgen = PatchGenerator(PATCH, RES)
    dataset = ImageDataset()
    input_filepath = "/root/reference/data/example_data.h5"

    # warmup predict to exclude tracing
    dataset.load_vectorfield(input_filepath, 0)
    velocities, magnitudes = pgen.patchify(dataset)
    model.predict([v[:BATCH] for v in velocities] + [m[:BATCH] for m in magnitudes], verbose=0)

    t0 = time.time()
    for _ in range(n_frames):
        dataset.load_vectorfield(input_filepath, 0)
        velocities, magnitudes = pgen.patchify(dataset)
        n = len(velocities[0])
        results = np.zeros((0, PATCH * RES, PATCH * RES, PATCH * RES, 3))
        for i in range(0, n, BATCH):
            sl = np.index_exp[i : i + BATCH]
            sr = model.predict(
                [velocities[0][sl], velocities[1][sl], velocities[2][sl],
                 magnitudes[0][sl], magnitudes[1][sl], magnitudes[2][sl]],
                verbose=0,
            )
            results = np.append(results, sr, axis=0)
        for c in range(3):
            v = pgen._patchup_with_overlap(results[..., c], pgen.nr_x, pgen.nr_y, pgen.nr_z)
            v = v * dataset.venc
    return (time.time() - t0) / n_frames


if __name__ == "__main__":
    train_pps, step_s = measure_train()
    print(f"TF-CPU train: {train_pps:.3f} patches/s ({step_s:.2f} s/step)")
    infer_spf = measure_inference()
    print(f"TF-CPU inference: {infer_spf:.2f} s/frame")

    out = {
        "config": f"patch {PATCH}^3, res x{RES}, {LOW_RB} low/{HI_RB} hi resblocks, batch {BATCH}",
        "hardware": "CPU (reference implementation, legacy tf_keras, in-memory batches)",
        "tf_cpu_train_patches_per_sec": train_pps,
        "tf_cpu_train_sec_per_step": step_s,
        "tf_cpu_inference_sec_per_frame": infer_spf,
        "protocol": "BASELINE.md: reference train_step + predictor flow measured in this environment",
    }
    with open("/root/repo/BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote /root/repo/BASELINE_MEASURED.json")
