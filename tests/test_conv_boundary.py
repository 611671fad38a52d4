"""Fused-boundary (clamp) conv vs the explicit symmetric-pad path.

The fused path (ops/conv.py::_clamp_conv3d) computes zero-pad SAME conv
plus exact face fix-ups; it must agree with jnp.pad(mode='symmetric') +
VALID conv — the reference's semantics (SR4DFlowNet.py:101-103) — to
float rounding on every shape, including degenerate 2-voxel axes where
low/high faces touch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet4d_tpu.ops.conv import conv3d_symmetric_pad

HP = jax.lax.Precision.HIGHEST

SHAPES = [
    (2, 4, 5, 6, 3),
    (1, 2, 2, 2, 4),  # every voxel is a corner
    (2, 8, 8, 8, 7),
    (1, 2, 5, 8, 2),  # mixed: one degenerate axis
    (1, 3, 2, 4, 1),
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_explicit_pad(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    x = jnp.asarray(rng.normal(size=shape).astype("float32"))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)).astype("float32"))
    b = jnp.asarray(rng.normal(size=(5,)).astype("float32"))
    ref = conv3d_symmetric_pad(x, k, b, fused_boundary=False, precision=HP)
    new = conv3d_symmetric_pad(x, k, b, fused_boundary=True, precision=HP)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(ref - new))) / scale < 1e-5


@pytest.mark.parametrize("shape", [(2, 4, 5, 6, 3), (1, 2, 2, 2, 4)])
def test_gradients_match_explicit_pad(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype("float32"))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)).astype("float32"))

    def loss(fused):
        return lambda x, k: jnp.sum(
            jnp.sin(conv3d_symmetric_pad(x, k, None, fused_boundary=fused, precision=HP))
        )

    g_ref = jax.grad(loss(False), argnums=(0, 1))(x, k)
    g_new = jax.grad(loss(True), argnums=(0, 1))(x, k)
    for a, b in zip(g_ref, g_new):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5




def test_fallback_on_tiny_axis():
    # A 1-voxel axis cannot split into low/high faces; the wrapper must
    # fall back to the explicit-pad path rather than mis-correct.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 1, 4, 4, 2)).astype("float32"))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 3)).astype("float32"))
    ref = conv3d_symmetric_pad(x, k, None, fused_boundary=False, precision=HP)
    new = conv3d_symmetric_pad(x, k, None, fused_boundary=True, precision=HP)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(new), rtol=1e-5, atol=1e-5)


def test_non_k3_uses_explicit_pad():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype("float32"))
    k1 = jnp.asarray(rng.normal(size=(1, 1, 1, 2, 3)).astype("float32"))
    ref = conv3d_symmetric_pad(x, k1, None, fused_boundary=False, precision=HP)
    new = conv3d_symmetric_pad(x, k1, None, fused_boundary=True, precision=HP)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(new), rtol=1e-6, atol=1e-6)
