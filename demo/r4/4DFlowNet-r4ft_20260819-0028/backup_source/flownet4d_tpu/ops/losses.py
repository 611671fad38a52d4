"""Loss and metric math for 4D flow super-resolution.

Faithful re-derivations of the reference's loss semantics:

- voxelwise MSE over the 3 velocity components
  (/root/reference/src/Network/TrainerController.py:152-156)
- fluid / non-fluid masked MSE split with epsilon=1 voxel
  (TrainerController.py:84-127)
- relative speed error metric with clipping, zero-speed correction,
  1e-4 rounding and mask averaging
  (/root/reference/src/Network/loss_utils.py:64-103)
- central-difference divergence loss (dormant in the reference,
  div_weight=0 at TrainerController.py:23; kernels at loss_utils.py:4-62)

All pure jnp, shape conventions: velocity fields are (B, D, H, W) per
component or (B, D, H, W, 3) stacked; masks are (B, D, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxelwise_mse(hires: jax.Array, pred: jax.Array) -> jax.Array:
    """Per-voxel sum of squared component errors.

    hires, pred: (B, D, H, W, 3) -> (B, D, H, W).
    """
    d = pred - hires
    return jnp.sum(d * d, axis=-1)


def masked_fluid_mse(
    hires: jax.Array,
    pred: jax.Array,
    mask: jax.Array,
    non_fluid_weight: float = 1.0,
) -> jax.Array:
    """Fluid + non-fluid masked MSE, per sample -> (B,).

    fluid      = sum(mse * mask) / (sum(mask) + 1)
    non_fluid  = sum(mse * (mask < 0.5)) / (sum(mask < 0.5) + 1)
    total      = fluid + non_fluid_weight * non_fluid

    epsilon=1 ("minimum 1 pixel") follows TrainerController.py:99.
    """
    mse = voxelwise_mse(hires, pred)
    non_fluid_mask = (mask < 0.5).astype(mse.dtype)

    eps = jnp.asarray(1.0, mse.dtype)
    axes = (1, 2, 3)

    fluid = jnp.sum(mse * mask, axis=axes) / (jnp.sum(mask, axis=axes) + eps)
    non_fluid = jnp.sum(mse * non_fluid_mask, axis=axes) / (
        jnp.sum(non_fluid_mask, axis=axes) + eps
    )
    return fluid + non_fluid_weight * non_fluid


def relative_speed_error(
    pred: jax.Array, hires: jax.Array, binary_mask: jax.Array
) -> jax.Array:
    """Relative speed error in percent, per sample -> (B,).

    Mirrors calculate_relative_error (loss_utils.py:64-103): epsilon=1e-5
    on the denominator, clip to [0,1], fall back to the absolute speed diff
    where the true speed is exactly zero, round to 1e-4, average over the
    mask==1 region with +1 in the denominator, scale to percent.
    """
    diff = pred - hires
    diff_speed = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    actual_speed = jnp.sqrt(jnp.sum(hires * hires, axis=-1))

    eps = jnp.asarray(1e-5, diff_speed.dtype)
    rel = diff_speed / (actual_speed + eps)
    rel = jnp.clip(rel, 0.0, 1.0)
    rel = jnp.where(actual_speed != 0.0, rel, diff_speed)

    multiplier = 1e4  # avoid infinitesimal numbers, loss_utils.py:85-86
    rel = jnp.round(rel * multiplier) / multiplier

    rel = jnp.where(binary_mask == 1.0, rel, jnp.zeros_like(rel))

    axes = (1, 2, 3)
    mean_err = jnp.sum(rel, axis=axes) / (jnp.sum(binary_mask, axis=axes) + 1.0)
    return mean_err * 100.0


def _central_diff(x: jax.Array, axis: int) -> jax.Array:
    """Central difference x[i-1] - x[i+1] with symmetric (edge) padding.

    Equivalent to the reference's fixed 3x3x3 conv stencils applied after a
    SYMMETRIC pad (loss_utils.py:10-45), but done with shifts on the VPU
    instead of a conv — there is no useful MXU work in a 2-tap stencil.
    """
    lead = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    tail = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    prev = jnp.concatenate(
        [lead, jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), tail], axis=axis
    )
    return prev - nxt


def divergence(u: jax.Array, v: jax.Array, w: jax.Array):
    """Per-axis central-difference gradients (du/dx, dv/dy, dw/dz).

    u, v, w: (B, D, H, W). Matches calculate_divergence (loss_utils.py:47-56)
    where axis 0/1/2 of the volume corresponds to x/y/z.
    """
    dudx = _central_diff(u, axis=1)
    dvdy = _central_diff(v, axis=2)
    dwdz = _central_diff(w, axis=3)
    return dudx, dvdy, dwdz


def divergence_loss2(hires: jax.Array, pred: jax.Array) -> jax.Array:
    """Squared divergence-difference loss (loss_utils.py:58-62) -> (B,D,H,W)."""
    du, dv, dw = divergence(hires[..., 0], hires[..., 1], hires[..., 2])
    dup, dvp, dwp = divergence(pred[..., 0], pred[..., 1], pred[..., 2])
    return (dup - du) ** 2 + (dvp - dv) ** 2 + (dwp - dw) ** 2
