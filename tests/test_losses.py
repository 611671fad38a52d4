"""Loss/metric math vs hand-computed numpy values."""

import numpy as np
import jax.numpy as jnp

from flownet4d_tpu.ops.losses import (
    voxelwise_mse,
    masked_fluid_mse,
    relative_speed_error,
    divergence,
    divergence_loss2,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_voxelwise_mse_hand():
    hr = np.zeros((1, 2, 2, 2, 3), np.float32)
    pred = np.ones((1, 2, 2, 2, 3), np.float32) * 2.0
    out = np.asarray(voxelwise_mse(jnp.asarray(hr), jnp.asarray(pred)))
    np.testing.assert_allclose(out, 12.0)  # 3 components * 2^2


def test_masked_fluid_mse_epsilon_and_split():
    hr = _rand((2, 4, 4, 4, 3), 1)
    pred = _rand((2, 4, 4, 4, 3), 2)
    mask = (np.random.default_rng(3).uniform(size=(2, 4, 4, 4)) > 0.5).astype(np.float32)

    mse = np.sum((pred - hr) ** 2, axis=-1)
    nf = (mask < 0.5).astype(np.float32)
    fluid = (mse * mask).sum(axis=(1, 2, 3)) / (mask.sum(axis=(1, 2, 3)) + 1.0)
    nonfluid = (mse * nf).sum(axis=(1, 2, 3)) / (nf.sum(axis=(1, 2, 3)) + 1.0)
    expected = fluid + nonfluid

    out = np.asarray(masked_fluid_mse(jnp.asarray(hr), jnp.asarray(pred), jnp.asarray(mask)))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_masked_fluid_mse_all_zero_mask():
    # epsilon=1 keeps it finite when a patch has no fluid at all
    hr = _rand((1, 4, 4, 4, 3))
    pred = _rand((1, 4, 4, 4, 3), 9)
    mask = np.zeros((1, 4, 4, 4), np.float32)
    out = np.asarray(masked_fluid_mse(jnp.asarray(hr), jnp.asarray(pred), jnp.asarray(mask)))
    assert np.isfinite(out).all()


def test_relative_speed_error_hand():
    # single voxel in mask: pred speed 1.0 vs actual 2.0 -> rel err 0.5
    hr = np.zeros((1, 2, 2, 2, 3), np.float32)
    pred = np.zeros((1, 2, 2, 2, 3), np.float32)
    hr[0, 0, 0, 0] = [2.0, 0, 0]
    pred[0, 0, 0, 0] = [1.0, 0, 0]
    mask = np.zeros((1, 2, 2, 2), np.float32)
    mask[0, 0, 0, 0] = 1.0

    out = float(relative_speed_error(jnp.asarray(pred), jnp.asarray(hr), jnp.asarray(mask))[0])
    # diff_speed=1, actual=2, rel=1/(2+1e-5)~0.5, mean = 0.5/(1+1) * 100 = 25%
    assert abs(out - 25.0) < 0.05


def test_relative_speed_error_zero_speed_correction():
    # where the true speed is 0, the absolute diff speed is used
    hr = np.zeros((1, 2, 2, 2, 3), np.float32)
    pred = np.zeros((1, 2, 2, 2, 3), np.float32)
    pred[0, 0, 0, 0] = [0.25, 0, 0]
    mask = np.ones((1, 2, 2, 2), np.float32)

    out = float(relative_speed_error(jnp.asarray(pred), jnp.asarray(hr), jnp.asarray(mask))[0])
    # sum of corrected errors = 0.25, / (8 + 1) * 100
    np.testing.assert_allclose(out, 0.25 / 9 * 100, rtol=1e-4)


def test_relative_speed_error_rounding():
    hr = np.zeros((1, 1, 1, 1, 3), np.float32)
    hr[..., 0] = 1.0
    pred = hr.copy()
    pred[..., 0] = 1.0 + 1e-6  # rel err ~1e-6 -> rounds to 0 at 1e-4 resolution
    mask = np.ones((1, 1, 1, 1), np.float32)
    out = float(relative_speed_error(jnp.asarray(pred), jnp.asarray(hr), jnp.asarray(mask))[0])
    assert out == 0.0


def test_divergence_central_difference_matches_conv_stencil():
    """Shift-based gradients == the reference's symmetric-pad conv stencil."""
    u = _rand((1, 5, 6, 7), 4)

    def golden_grad(x, axis):
        # symmetric pad by 1 then correlate with [1, 0, -1] along `axis`
        pad = [(0, 0)] * 4
        pad[axis] = (1, 1)
        xp = np.pad(x, pad, mode="symmetric")
        sl_prev = [slice(None)] * 4
        sl_next = [slice(None)] * 4
        sl_prev[axis] = slice(0, x.shape[axis])
        sl_next[axis] = slice(2, x.shape[axis] + 2)
        return xp[tuple(sl_prev)] - xp[tuple(sl_next)]

    du, dv, dw = divergence(jnp.asarray(u), jnp.asarray(u), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(du), golden_grad(u, 1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), golden_grad(u, 2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw), golden_grad(u, 3), atol=1e-6)


def test_divergence_loss2_zero_for_identical_fields():
    hr = _rand((1, 4, 4, 4, 3), 7)
    out = np.asarray(divergence_loss2(jnp.asarray(hr), jnp.asarray(hr)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
