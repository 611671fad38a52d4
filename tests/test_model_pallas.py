"""Model-level checks for the fused Pallas residual-block path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from flownet4d_tpu.models import SR4DFlowNet, SR4DFlowNetConfig


def _models(**kw):
    base = dict(res_increase=2, low_resblock=2, hi_resblock=1, channels=8)
    base.update(kw)
    xla = SR4DFlowNet(SR4DFlowNetConfig(**base, use_pallas=False))
    fused = SR4DFlowNet(SR4DFlowNetConfig(**base, use_pallas=True))
    return xla, fused


def test_param_trees_identical():
    xla, fused = _models()
    vel = jnp.zeros((1, 8, 8, 8, 3))
    p_xla = xla.init(jax.random.PRNGKey(0), vel, vel)["params"]
    p_fused = fused.init(jax.random.PRNGKey(0), vel, vel)["params"]
    s_xla = jax.tree_util.tree_structure(p_xla)
    s_fused = jax.tree_util.tree_structure(p_fused)
    assert s_xla == s_fused
    for a, b in zip(jax.tree_util.tree_leaves(p_xla), jax.tree_util.tree_leaves(p_fused)):
        assert a.shape == b.shape


def test_forward_parity_interpret(monkeypatch):
    # Force the pallas path to run the interpreter on CPU.
    import flownet4d_tpu.ops.pallas_resblock as prb

    orig = prb._fused_resblock_impl

    def interp(x, k1, k2, alpha=0.2, interpret=False):
        return orig(x, k1, k2, alpha=alpha, interpret=True)

    monkeypatch.setattr(prb, "_fused_resblock_impl", interp)

    xla, fused = _models()
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 8, 3)).astype(np.float32))
    mag = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 8, 3)).astype(np.float32))
    params = xla.init(jax.random.PRNGKey(1), vel, mag)["params"]

    out_xla = np.asarray(xla.apply({"params": params}, vel, mag))
    out_fused = np.asarray(fused.apply({"params": params}, vel, mag))
    np.testing.assert_allclose(out_fused, out_xla, atol=2e-5, rtol=1e-4)


def test_gradients_flow_through_pallas_path(monkeypatch):
    import flownet4d_tpu.ops.pallas_resblock as prb

    orig = prb._fused_resblock_impl

    def interp(x, k1, k2, alpha=0.2, interpret=False):
        return orig(x, k1, k2, alpha=alpha, interpret=True)

    monkeypatch.setattr(prb, "_fused_resblock_impl", interp)

    xla, fused = _models()
    rng = np.random.default_rng(2)
    vel = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 8, 3)).astype(np.float32))
    mag = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 8, 3)).astype(np.float32))
    params = xla.init(jax.random.PRNGKey(3), vel, mag)["params"]

    def loss_xla(p):
        return jnp.sum(xla.apply({"params": p}, vel, mag) ** 2)

    def loss_fused(p):
        return jnp.sum(fused.apply({"params": p}, vel, mag) ** 2)

    g_xla = jax.grad(loss_xla)(params)
    g_fused = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla), jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3)
