"""Trilinear align_corners upsample: matrix construction + TF golden parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from flownet4d_tpu.ops.upsample import upsample3d, _interp_matrix_np


def test_interp_matrix_rows_sum_to_one():
    for n, m in [(4, 8), (3, 12), (5, 10), (1, 4), (7, 7)]:
        w = _interp_matrix_np(n, m)
        assert w.shape == (m, n)
        np.testing.assert_allclose(w.sum(axis=1), np.ones(m), atol=1e-6)


def test_interp_matrix_align_corners_endpoints():
    # align_corners: first output = first input, last output = last input.
    w = _interp_matrix_np(5, 10)
    assert w[0, 0] == 1.0
    assert w[-1, -1] == 1.0


def test_res1_identity():
    x = jnp.asarray(np.random.randn(2, 4, 4, 4, 3).astype(np.float32))
    assert upsample3d(x, 1) is x


def test_upsample_constant_field():
    x = jnp.ones((1, 4, 5, 6, 2), jnp.float32) * 3.25
    y = upsample3d(x, 2)
    assert y.shape == (1, 8, 10, 12, 2)
    np.testing.assert_allclose(np.asarray(y), 3.25, atol=1e-6)


def test_upsample_linear_ramp_exact():
    # A linear ramp is reproduced exactly by linear interpolation with
    # align_corners: output[i] = ramp(i * (n-1)/(m-1)).
    n = 6
    ramp = np.arange(n, dtype=np.float32)
    x = jnp.asarray(np.broadcast_to(ramp[None, :, None, None, None], (1, n, 3, 3, 1)).copy())
    y = np.asarray(upsample3d(x, 2))
    m = 2 * n
    expected = np.arange(m) * (n - 1) / (m - 1)
    np.testing.assert_allclose(y[0, :, 0, 0, 0], expected, atol=1e-5)


def test_upsample_res4():
    """configs[2]: 4x upsampling — endpoints and shape contract."""
    n = 5
    ramp = np.arange(n, dtype=np.float32)
    x = jnp.asarray(np.broadcast_to(ramp[None, :, None, None, None], (1, n, 2, 2, 1)).copy())
    y = np.asarray(upsample3d(x, 4))
    assert y.shape == (1, 20, 8, 8, 1)
    m = 4 * n
    expected = np.arange(m) * (n - 1) / (m - 1)
    np.testing.assert_allclose(y[0, :, 0, 0, 0], expected, atol=1e-5)


@pytest.mark.golden
def test_upsample_matches_tf_resize_bilinear():
    """Golden parity with tf.compat.v1.image.resize_bilinear(align_corners=True)
    chained over the 3 axes as the reference does (SR4DFlowNet.py:53-90)."""
    tf = pytest.importorskip("tensorflow")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 6, 7, 3)).astype(np.float32)
    r = 2

    # TF separable resize: (y, z) first, then x — independent implementation
    # of the same separable trilinear interpolation.
    b, d, h, w, c = x.shape
    t = tf.reshape(tf.constant(x), [-1, h, w, c])
    t = tf.compat.v1.image.resize_bilinear(t, [h * r, w * r], align_corners=True)
    t = tf.reshape(t, [b, d, h * r, w * r, c])
    t = tf.transpose(t, [0, 3, 2, 1, 4])
    t = tf.reshape(t, [-1, h * r, d, c])
    t = tf.compat.v1.image.resize_bilinear(t, [h * r, d * r], align_corners=True)
    t = tf.reshape(t, [b, w * r, h * r, d * r, c])
    golden = np.asarray(tf.transpose(t, [0, 3, 2, 1, 4]))

    ours = np.asarray(upsample3d(jnp.asarray(x), r))
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-5)
