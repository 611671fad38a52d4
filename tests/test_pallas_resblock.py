"""Fused Pallas residual block vs the XLA reference implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from flownet4d_tpu.ops.pallas_resblock import fused_resblock, resblock_reference


def _data(shape, c, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape + (c,)).astype(np.float32)
    k1 = (rng.standard_normal((3, 3, 3, c, c)) * 0.05).astype(np.float32)
    k2 = (rng.standard_normal((3, 3, 3, c, c)) * 0.05).astype(np.float32)
    return jnp.asarray(x[None]), jnp.asarray(k1), jnp.asarray(k2)


@pytest.mark.parametrize("shape,c", [((8, 16, 16), 8), ((16, 16, 8), 16), ((12, 12, 12), 8)])
def test_fused_matches_reference_interpret(shape, c):
    x, k1, k2 = _data(shape, c)
    want = np.asarray(resblock_reference(x, k1, k2))
    got = np.asarray(fused_resblock(x, k1, k2, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fallback_for_tiny_volumes():
    x, k1, k2 = _data((2, 2, 2), 8)
    got = np.asarray(fused_resblock(x, k1, k2, interpret=True))
    want = np.asarray(resblock_reference(x, k1, k2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_symmetric_padding_semantics_at_edges():
    # A field whose edge values dominate ensures wrong padding fails loudly.
    rng = np.random.default_rng(1)
    x = np.zeros((1, 8, 8, 8, 8), np.float32)
    x[:, 0] = 10.0
    x[:, -1] = -7.0
    x[:, :, 0] = 5.0
    k1 = (rng.standard_normal((3, 3, 3, 8, 8)) * 0.1).astype(np.float32)
    k2 = (rng.standard_normal((3, 3, 3, 8, 8)) * 0.1).astype(np.float32)
    want = np.asarray(resblock_reference(jnp.asarray(x), jnp.asarray(k1), jnp.asarray(k2)))
    got = np.asarray(fused_resblock(jnp.asarray(x), jnp.asarray(k1), jnp.asarray(k2), interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
