"""3D convolution primitives for TPU.

Behavioural contract (reference: /root/reference/src/Network/SR4DFlowNet.py:93-108):
the reference pads the input with TF ``SYMMETRIC`` mode (edge-inclusive
reflection) of width (k-1)//2 and then applies a VALID Conv3D. We reproduce
that with ``jnp.pad(mode='symmetric')`` + ``lax.conv_general_dilated`` in
channels-last NDHWC layout, which XLA:TPU lowers onto the MXU.

All functions are pure and jit-safe (static shapes, no Python branching on
traced values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NDHWC activations, DHWIO kernels — the TPU-friendly channels-last layout.
CONV_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


def pad_symmetric(x: jax.Array, pad: int) -> jax.Array:
    """Symmetric (edge-inclusive reflect) padding of the 3 spatial dims.

    ``x`` is NDHWC. Equivalent to ``tf.pad(x, ..., 'SYMMETRIC')`` as used at
    SR4DFlowNet.py:101-103 of the reference.
    """
    if pad == 0:
        return x
    cfg = [(0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="symmetric")


def pad_reflect(x: jax.Array, pad: int) -> jax.Array:
    """Reflect (edge-exclusive) padding of the 3 spatial dims (TF 'REFLECT')."""
    if pad == 0:
        return x
    cfg = [(0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


def conv3d_symmetric_pad(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: str = "SYMMETRIC",
    precision=None,
) -> jax.Array:
    """3D convolution with reference-equivalent padding semantics.

    Parameters
    ----------
    x : (N, D, H, W, Cin) activations.
    kernel : (kd, kh, kw, Cin, Cout) filter (DHWIO).
    bias : optional (Cout,) bias.
    padding : 'SYMMETRIC' | 'REFLECT' | 'SAME' | 'VALID' — mirrors the
        reference conv3d options (SR4DFlowNet.py:101-107).
    """
    k = kernel.shape[0]
    p = (k - 1) // 2
    if padding == "SYMMETRIC":
        x = pad_symmetric(x, p)
        lax_padding = "VALID"
    elif padding == "REFLECT":
        x = pad_reflect(x, p)
        lax_padding = "VALID"
    elif padding in ("SAME", "VALID"):
        lax_padding = padding
    else:
        raise ValueError(f"unknown padding mode {padding!r}")

    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=lax_padding,
        dimension_numbers=CONV_DIMENSION_NUMBERS,
        precision=precision,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def leaky_relu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    """LeakyReLU with the reference's alpha=0.2 (SR4DFlowNet.py:113,118)."""
    return jnp.where(x >= 0, x, alpha * x)
