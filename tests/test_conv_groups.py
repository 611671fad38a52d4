"""Grouped convs: per-sample math identical to dense convs.

``conv3d_symmetric_pad(groups=2)`` with a tied per-group kernel and two
samples packed side-by-side in the channel dim must reproduce the dense
per-sample conv exactly — forward and gradients, fused-boundary and
explicit-pad. (The model-level lane_pack flag built on this lost its
on-chip A/B x0.502 and was deleted — docs/performance.md; the grouped
primitive itself stays, exercised here.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet4d_tpu.ops.conv import conv3d_symmetric_pad

HP = jax.lax.Precision.HIGHEST


def _pack(x):
    """(B, ..., C) -> (B/2, ..., 2C): even samples in ch 0..C-1, odd after."""
    return jnp.concatenate([x[0::2], x[1::2]], axis=-1)


def _unpack(y, c):
    return jnp.stack([y[..., :c], y[..., c:]], axis=1).reshape(
        (-1,) + y.shape[1:-1] + (c,))


def _mk(shape, cout, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape).astype("float32"))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], cout)).astype("float32"))
    return x, k


@pytest.mark.parametrize("fused", [True, False])
def test_grouped_tied_forward_matches_dense(fused):
    x, k = _mk((4, 4, 5, 6, 3), 5)
    dense = conv3d_symmetric_pad(x, k, fused_boundary=fused, precision=HP)
    kg = jnp.concatenate([k, k], axis=-1)  # tied groups -> (3,3,3,3,10)
    packed = conv3d_symmetric_pad(_pack(x), kg, fused_boundary=fused,
                                  precision=HP, groups=2)
    np.testing.assert_allclose(np.asarray(_unpack(packed, 5)),
                               np.asarray(dense), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fused", [True, False])
def test_grouped_gradients_match_unpacked(fused):
    """Packed grouped conv's gradients == the dense per-sample conv's."""
    x, k = _mk((2, 4, 5, 6, 4), 6, seed=1)
    xp, kg = _pack(x), jnp.concatenate([k, k], axis=-1)

    def dense_loss(xi, ki):
        y = conv3d_symmetric_pad(xi, ki, fused_boundary=fused, precision=HP)
        return jnp.sum(jnp.sin(y))

    def packed_loss(xi, ki):
        y = conv3d_symmetric_pad(xi, ki, fused_boundary=fused,
                                 precision=HP, groups=2)
        return jnp.sum(jnp.sin(y))

    gx_d, gk_d = jax.grad(dense_loss, argnums=(0, 1))(x, k)
    gx_p, gk_p = jax.grad(packed_loss, argnums=(0, 1))(xp, kg)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(_pack(gx_d)),
                               rtol=1e-5, atol=1e-5)
    # Tied kernel: each group slot's grad is that sample subset's dk.
    np.testing.assert_allclose(np.asarray(gk_p[..., :6] + gk_p[..., 6:]),
                               np.asarray(gk_d), rtol=1e-5, atol=1e-5)


def test_grouped_tied_kernel_grad_equals_dense():
    """With the tied kernel k used by both groups, dL/dk summed over the
    two group slots equals the dense batched conv's dL/dk."""
    x, k = _mk((4, 4, 4, 4, 3), 4, seed=2)
    xp = _pack(x)

    def dense_loss(ki):
        return jnp.sum(jnp.cos(conv3d_symmetric_pad(x, ki, precision=HP)))

    def packed_loss(ki):
        kg = jnp.concatenate([ki, ki], axis=-1)
        return jnp.sum(jnp.cos(conv3d_symmetric_pad(xp, kg, precision=HP,
                                                    groups=2)))

    gk_dense = jax.grad(dense_loss)(k)
    gk_packed = jax.grad(packed_loss)(k)
    np.testing.assert_allclose(np.asarray(gk_packed), np.asarray(gk_dense),
                               rtol=1e-5, atol=1e-5)
