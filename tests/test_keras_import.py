"""Keras .h5 weight import + end-to-end predictor parity with the reference.

Covers the released-weights pathway (README.md:21-25 of the reference): a
legacy Keras ``model.save`` file maps onto our param tree by Conv3D
creation order, and the full inference stack (patchify -> forward ->
stitch -> denormalise) reproduces the reference predictor's output.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flownet4d_tpu.models import SR4DFlowNet, SR4DFlowNetConfig
from flownet4d_tpu.training.checkpoint import import_keras_weights

PATCH, RES, LOW_RB, HI_RB = 12, 2, 1, 1


def _reference_model():
    sys.path.insert(0, "/root/reference/src")
    import tensorflow as tf
    from Network.SR4DFlowNet import SR4DFlowNet as RefNet

    inputs = [
        tf.keras.layers.Input(shape=(PATCH,) * 3 + (1,), name=n)
        for n in ["u", "v", "w", "u_mag", "v_mag", "w_mag"]
    ]
    pred = RefNet(RES).build_network(*inputs, LOW_RB, HI_RB)
    return tf.keras.Model(inputs, pred)


@pytest.mark.golden
def test_keras_h5_weight_import(tmp_path):
    pytest.importorskip("tensorflow")
    tf_model = _reference_model()
    weights_path = str(tmp_path / "ref.h5")
    tf_model.save(weights_path)  # legacy keras full save

    cfg = SR4DFlowNetConfig(res_increase=RES, low_resblock=LOW_RB, hi_resblock=HI_RB)
    model = SR4DFlowNet(cfg)
    rng = np.random.default_rng(0)
    vel = rng.uniform(-1, 1, (1, PATCH, PATCH, PATCH, 3)).astype(np.float32)
    mag = rng.uniform(0, 1, (1, PATCH, PATCH, PATCH, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(vel), jnp.asarray(mag))["params"]

    params = import_keras_weights(weights_path, jax.device_get(params), LOW_RB, HI_RB)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(vel), jnp.asarray(mag)))
    golden = tf_model.predict(
        [vel[..., i : i + 1] for i in range(3)] + [mag[..., i : i + 1] for i in range(3)],
        verbose=0,
    )
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-4)


@pytest.mark.golden
def test_predictor_end_to_end_matches_reference(tmp_path):
    """Full-volume inference parity: same weights, same volume, same output."""
    tf = pytest.importorskip("tensorflow")
    sys.path.insert(0, "/root/reference/src")
    from Network.PatchGenerator import PatchGenerator as RefPG
    from utils.ImageDataset import ImageDataset as RefDS

    tf_model = _reference_model()
    weights_path = str(tmp_path / "ref.h5")
    tf_model.save(weights_path)

    from flownet4d_tpu.inference import VolumePredictor
    from flownet4d_tpu.data.volume import VolumeDataset

    predictor = VolumePredictor(PATCH, RES, batch_size=8, low_resblock=LOW_RB, hi_resblock=HI_RB)
    predictor.load_weights(weights_path, keras=True)

    path = "/root/reference/data/example_data.h5"
    ds = VolumeDataset()
    ds.load_vectorfield(path, 0)
    ours = predictor.predict_volume(ds, round_small_values=True)

    # Reference predictor flow (predictor.py:67-107)
    ref_ds = RefDS()
    ref_ds.load_vectorfield(path, 0)
    pgen = RefPG(PATCH, RES)
    velocities, magnitudes = pgen.patchify(ref_ds)
    n = len(velocities[0])
    results = np.zeros((0, PATCH * RES, PATCH * RES, PATCH * RES, 3))
    for i in range(0, n, 8):
        sl = np.index_exp[i : i + 8]
        sr = tf_model.predict(
            [velocities[0][sl], velocities[1][sl], velocities[2][sl],
             magnitudes[0][sl], magnitudes[1][sl], magnitudes[2][sl]],
            verbose=0,
        )
        results = np.append(results, sr, axis=0)
    for i, comp in enumerate(ours):
        golden = pgen._patchup_with_overlap(results[..., i], pgen.nr_x, pgen.nr_y, pgen.nr_z)
        golden = golden * ref_ds.venc
        golden[np.abs(golden) < ref_ds.velocity_per_px] = 0
        rms = np.sqrt(np.mean((comp - golden) ** 2))
        assert rms <= 1e-3, f"component {i}: RMS {rms}"  # BASELINE.md parity gate
        # Voxels straddling the small-value zeroing threshold flip the
        # cutoff on sub-1e-6 numeric differences; exclude that knife-edge.
        near_threshold = (
            np.abs(np.abs(golden) - ref_ds.velocity_per_px) < 2e-5
        ) | (np.abs(np.abs(comp) - ref_ds.velocity_per_px) < 2e-5)
        np.testing.assert_allclose(
            np.where(near_threshold, 0, comp), np.where(near_threshold, 0, golden), atol=5e-4
        )
