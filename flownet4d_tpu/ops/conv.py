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

from typing import Any

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


def _conv_same(x, kernel, precision, groups: int = 1):
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3,
        dimension_numbers=CONV_DIMENSION_NUMBERS,
        precision=precision,
        feature_group_count=groups,
    )


def _clamp_conv3d(x: jax.Array, kernel: jax.Array, precision,
                  groups: int = 1) -> jax.Array:
    """Symmetric-pad(1) + VALID k=3 conv without materialising the pad.

    For pad width 1, TF ``SYMMETRIC`` padding equals edge-replicate (clamp)
    padding. The clamp conv is computed as

      y = conv(x, k, zero SAME padding)    # padding fused into the conv op
    with the six boundary face planes fixed up exactly: the true value of
    an output face is itself a clamp conv of the thickness-2 input slab at
    that face, with the kernel *collapsed* along the face axis (the oob tap
    reads the clamped = edge plane, so its weight folds onto the edge tap:
    k0+k1 for the low face, k1+k2 for the high face). In-plane clamping —
    including edges and corners of the volume — is exact because the tiny
    slab is symmetric-padded in the remaining axes before the VALID conv.

    The fixes are applied additively, (face_true - face_zero) zero-padded
    to full shape, over *disjoint* boundary regions (z faces own the full
    planes; y faces exclude z-boundary rows; x faces exclude both), so no
    sequencing or inclusion-exclusion is needed. face_zero (what the SAME
    conv produced on the face) is recomputed from the same slab with the
    kernel truncated to its in-bounds taps rather than sliced out of y:
    keeping the corrections independent of y lets the backward chain
    between the big convs stay elementwise, which keeps XLA's layout
    assignment (and conv-emitter choice) in the fast batch-in-sublanes
    form — slicing y instead measured 243 vs 197 ms/step.

    Why: the reference pads explicitly before every conv
    (SR4DFlowNet.py:101-103). On TPU that materialises a (B,50,50,50,64)
    copy per conv forward and a per-axis slice+add chain per conv backward
    — measured 38% of the whole train step (44.8 GB/step of HBM traffic,
    docs/performance.md round 2). This formulation keeps all bulk convs on
    8-aligned 48^3/24^3 shapes with XLA-native fused padding, at ~8% extra
    conv FLOPs on O(surface) slabs.
    """
    assert kernel.shape[0] == 3, "clamp decomposition implemented for k=3 only"
    kernel = kernel.astype(x.dtype)

    def conv(inp, ker, padding):
        return lax.conv_general_dilated(
            inp,
            ker,
            window_strides=(1, 1, 1),
            padding=padding,
            dimension_numbers=CONV_DIMENSION_NUMBERS,
            precision=precision,
            feature_group_count=groups,
        )

    # Two emitter-steering rewrites of this bulk conv were A/B'd on chip
    # and rejected (docs/performance.md): a custom-VJP forward-form input
    # gradient ("fast_dgrad", x0.998 — a wash) and 2-sample MXU lane
    # packing via grouped convs ("lane_pack", x0.502 — a decisive loss).
    y = _conv_same(x, kernel, precision, groups)

    corrections = []
    for ax in range(3):  # spatial axis: 0=z(dim1), 1=y(dim2), 2=x(dim3)
        dim = ax + 1
        n = x.shape[dim]
        # Region for this axis excludes boundary planes of earlier axes
        # (owned by their faces); if an earlier axis is too short to have
        # an interior, this region is empty.
        inner = [x.shape[d + 1] - 2 for d in range(ax)]
        if any(m <= 0 for m in inner):
            continue
        for side in (0, 1):
            # Collapse the kernel along `ax`: fold the oob tap onto the edge.
            if side == 0:
                collapsed = jnp.concatenate(
                    [
                        lax.slice_in_dim(kernel, 0, 1, axis=ax)
                        + lax.slice_in_dim(kernel, 1, 2, axis=ax),
                        lax.slice_in_dim(kernel, 2, 3, axis=ax),
                    ],
                    axis=ax,
                )
                slab = lax.slice_in_dim(x, 0, 2, axis=dim)
            else:
                collapsed = jnp.concatenate(
                    [
                        lax.slice_in_dim(kernel, 0, 1, axis=ax),
                        lax.slice_in_dim(kernel, 1, 2, axis=ax)
                        + lax.slice_in_dim(kernel, 2, 3, axis=ax),
                    ],
                    axis=ax,
                )
                slab = lax.slice_in_dim(x, n - 2, n, axis=dim)
            # What the zero-padded SAME conv produced on this face: same
            # slab, kernel truncated to the in-bounds taps, zero pad on the
            # later in-plane axes. Computing it from the slab (instead of
            # slicing y) keeps the correction independent of y, so the
            # backward chain between the big convs stays elementwise and
            # layout assignment doesn't bounce tensors through relayouts.
            if side == 0:
                truncated = lax.slice_in_dim(kernel, 1, 3, axis=ax)
            else:
                truncated = lax.slice_in_dim(kernel, 0, 2, axis=ax)
            # Symmetric (=replicate at width 1) pad of the slab in the
            # *later* axes only; earlier axes run VALID (their boundary
            # rows belong to those axes' faces), `ax` itself runs VALID
            # over the 2-slab with the collapsed kernel.
            pad_cfg = [(0, 0), (0, 0), (0, 0), (0, 0), (0, 0)]
            conv_pad = [(0, 0), (0, 0), (0, 0)]
            zero_pad = [(0, 0), (0, 0), (0, 0)]
            for d in range(ax + 1, 3):
                pad_cfg[d + 1] = (1, 1)
                zero_pad[d] = (1, 1)
            slab_sym = jnp.pad(slab, pad_cfg, mode="symmetric")
            face_true = conv(slab_sym, collapsed, conv_pad)
            face_zero = conv(slab, truncated, zero_pad)
            # Pad the fix to full shape over this axis' disjoint region.
            out_pad = [(0, 0)] * 5
            for d in range(ax):
                out_pad[d + 1] = (1, 1)
            out_pad[dim] = (0, n - 1) if side == 0 else (n - 1, 0)
            corrections.append(jnp.pad(face_true - face_zero, out_pad))
    for c in corrections:
        y = y + c
    return y


def conv3d_symmetric_pad(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: str = "SYMMETRIC",
    precision=None,
    fused_boundary: bool = True,
    groups: int = 1,
) -> jax.Array:
    """3D convolution with reference-equivalent padding semantics.

    Parameters
    ----------
    x : (N, D, H, W, Cin) activations.
    kernel : (kd, kh, kw, Cin/groups, Cout) filter (DHWIO).
    bias : optional (Cout,) bias.
    padding : 'SYMMETRIC' | 'REFLECT' | 'SAME' | 'VALID' — mirrors the
        reference conv3d options (SR4DFlowNet.py:101-107).
    groups : feature_group_count (grouped convolution).
    """
    k = kernel.shape[0]
    p = (k - 1) // 2
    if padding == "SYMMETRIC":
        if (
            fused_boundary
            and k == 3
            and all(n >= 2 for n in x.shape[1:4])
        ):
            y = _clamp_conv3d(x, kernel, precision, groups)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
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
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def leaky_relu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    """LeakyReLU with the reference's alpha=0.2 (SR4DFlowNet.py:113,118)."""
    return jnp.where(x >= 0, x, alpha * x)
