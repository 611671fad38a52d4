"""End-to-end numerical parity of the Flax model with the TF reference.

Builds the reference SR4DFlowNet (imported from /root/reference, executed
with legacy tf_keras), transplants its randomly initialised weights into
our param tree by Conv3D creation order, and compares forward outputs.
This is the strongest correctness gate: it covers symmetric padding,
branch feature construction, residual blocks, align_corners upsampling
and the linear heads in one shot.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flownet4d_tpu.models import SR4DFlowNet, SR4DFlowNetConfig
from flownet4d_tpu.training.checkpoint import conv_name_order


def _build_reference_model(patch_size, res_increase, low_rb, hi_rb):
    sys.path.insert(0, "/root/reference/src")
    import tensorflow as tf
    from Network.SR4DFlowNet import SR4DFlowNet as RefNet

    inputs = [
        tf.keras.layers.Input(shape=(patch_size,) * 3 + (1,), name=n)
        for n in ["u", "v", "w", "u_mag", "v_mag", "w_mag"]
    ]
    pred = RefNet(res_increase).build_network(*inputs, low_rb, hi_rb)
    return tf.keras.Model(inputs, pred)


def _transplant(tf_model, params, low_rb, hi_rb):
    """Copy TF conv weights into our param tree (both are DHWIO)."""
    convs = sorted(
        (l for l in tf_model.layers if l.__class__.__name__ == "Conv3D"),
        key=lambda l: 0 if l.name == "conv3d" else int(l.name.rsplit("_", 1)[1]),
    )
    order = conv_name_order(low_rb, hi_rb)
    assert len(convs) == len(order), (len(convs), len(order))

    params = jax.device_get(params)
    for layer, (name, has_bias) in zip(convs, order):
        weights = layer.get_weights()
        node = params
        *path, leafname = name.split("/")
        for key in path:
            node = node[key]
        assert node[leafname]["kernel"].shape == weights[0].shape
        node[leafname]["kernel"] = jnp.asarray(weights[0])
        if has_bias:
            node[leafname]["bias"] = jnp.asarray(weights[1])
    return params


@pytest.mark.golden
@pytest.mark.parametrize("res_increase", [1, 2])
def test_forward_parity_with_reference(res_increase):
    tf = pytest.importorskip("tensorflow")
    p, low_rb, hi_rb = 8, 2, 1

    tf_model = _build_reference_model(p, res_increase, low_rb, hi_rb)

    cfg = SR4DFlowNetConfig(res_increase=res_increase, low_resblock=low_rb, hi_resblock=hi_rb)
    model = SR4DFlowNet(cfg)
    rng = np.random.default_rng(0)
    vel = rng.standard_normal((2, p, p, p, 3)).astype(np.float32)
    mag = rng.uniform(size=(2, p, p, p, 3)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(vel), jnp.asarray(mag))["params"]
    params = _transplant(tf_model, params, low_rb, hi_rb)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(vel), jnp.asarray(mag)))

    tf_inputs = [vel[..., i : i + 1] for i in range(3)] + [mag[..., i : i + 1] for i in range(3)]
    golden = tf_model.predict(tf_inputs, verbose=0)

    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-4)


@pytest.mark.golden
def test_loss_parity_with_reference():
    """Masked fluid/non-fluid MSE and relative error vs the reference math."""
    sys.path.insert(0, "/root/reference/src")
    tf = pytest.importorskip("tensorflow")
    from Network import loss_utils as ref_loss

    from flownet4d_tpu.ops.losses import masked_fluid_mse, relative_speed_error

    rng = np.random.default_rng(1)
    hr = rng.standard_normal((3, 6, 6, 6, 3)).astype(np.float32)
    pred = rng.standard_normal((3, 6, 6, 6, 3)).astype(np.float32)
    mask = (rng.uniform(size=(3, 6, 6, 6)) > 0.4).astype(np.float32)

    # relative error golden
    golden_rel = ref_loss.calculate_relative_error(
        tf.constant(pred[..., 0]), tf.constant(pred[..., 1]), tf.constant(pred[..., 2]),
        tf.constant(hr[..., 0]), tf.constant(hr[..., 1]), tf.constant(hr[..., 2]),
        tf.constant(mask),
    ).numpy()
    ours_rel = np.asarray(relative_speed_error(jnp.asarray(pred), jnp.asarray(hr), jnp.asarray(mask)))
    np.testing.assert_allclose(ours_rel, golden_rel, atol=1e-3, rtol=1e-5)

    # fluid/non-fluid MSE golden (TrainerController.loss_function math)
    mse = tf.reduce_sum(tf.square(tf.constant(pred) - tf.constant(hr)), axis=-1)
    m = tf.constant(mask)
    nf = tf.cast(tf.less(m, 0.5), tf.float32)
    fluid = tf.reduce_sum(mse * m, axis=[1, 2, 3]) / (tf.reduce_sum(m, axis=[1, 2, 3]) + 1)
    nonf = tf.reduce_sum(mse * nf, axis=[1, 2, 3]) / (tf.reduce_sum(nf, axis=[1, 2, 3]) + 1)
    golden_mse = (fluid + nonf).numpy()

    ours_mse = np.asarray(masked_fluid_mse(jnp.asarray(hr), jnp.asarray(pred), jnp.asarray(mask)))
    np.testing.assert_allclose(ours_mse, golden_mse, rtol=1e-5)
