"""lane_pack model equivalence: packed grouped-conv network == dense network.

The lane-packed model (SR4DFlowNetConfig.lane_pack) runs pairs of samples
side-by-side in the channel dim through grouped convs with tied kernels.
Same params, same inputs -> same outputs (and same parameter gradients),
for the scanned and unrolled stacks and both head formulations. Odd
batches must fall back to the dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet4d_tpu.models.sr4dflownet import SR4DFlowNet, SR4DFlowNetConfig

HP = jax.lax.Precision.HIGHEST


def _cfg(lane_pack, **kw):
    return SR4DFlowNetConfig(
        res_increase=2, low_resblock=2, hi_resblock=1, precision=HP,
        lane_pack=lane_pack, **kw)


def _inputs(batch=4, d=6, seed=0):
    rng = np.random.default_rng(seed)
    vel = jnp.asarray(rng.normal(size=(batch, d, d, d, 3)).astype("float32"))
    mag = jnp.asarray(abs(rng.normal(size=(batch, d, d, d, 3))).astype("float32"))
    return vel, mag


@pytest.mark.parametrize("scan_blocks", [True, False])
@pytest.mark.parametrize("merged_heads", [True, False])
def test_lane_pack_forward_matches_dense(scan_blocks, merged_heads):
    vel, mag = _inputs()
    dense = SR4DFlowNet(_cfg(False, scan_blocks=scan_blocks,
                             merged_heads=merged_heads))
    packed = SR4DFlowNet(_cfg(True, scan_blocks=scan_blocks,
                              merged_heads=merged_heads))
    params = dense.init(jax.random.PRNGKey(0), vel, mag)
    # Identical param tree: the packed model ties kernels at call time.
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, params,
        packed.init(jax.random.PRNGKey(0), vel, mag)))
    y0 = dense.apply(params, vel, mag)
    y1 = packed.apply(params, vel, mag)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)


def test_lane_pack_param_gradients_match_dense():
    vel, mag = _inputs(batch=2, d=5, seed=3)
    dense = SR4DFlowNet(_cfg(False))
    packed = SR4DFlowNet(_cfg(True))
    params = dense.init(jax.random.PRNGKey(1), vel, mag)

    def loss(model):
        return lambda p: jnp.mean(jnp.square(model.apply(p, vel, mag)))

    g0 = jax.grad(loss(dense))(params)
    g1 = jax.grad(loss(packed))(params)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(p0))


def test_lane_pack_odd_batch_falls_back():
    vel, mag = _inputs(batch=3, d=5, seed=5)
    dense = SR4DFlowNet(_cfg(False))
    packed = SR4DFlowNet(_cfg(True))
    params = dense.init(jax.random.PRNGKey(2), vel, mag)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, vel, mag)),
        np.asarray(dense.apply(params, vel, mag)), rtol=1e-6, atol=1e-6)
