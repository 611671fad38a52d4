"""Pallas TPU kernel: fully-fused SR4DFlowNet residual block.

One kernel evaluates

    out = LeakyReLU( x + conv3d_k3(LeakyReLU(conv3d_k3(x, k1)), k2), 0.2 )

with the reference's SYMMETRIC edge padding (resnet_block,
/root/reference/src/Network/SR4DFlowNet.py:111-120). Fusing the whole
block keeps the conv1 intermediate in VMEM — XLA materialises it (plus
two explicitly padded tensors) in HBM, so the fused kernel removes three
full HBM round trips of the activation tensor per block.

Strategy
--------
- The volume is symmetric-padded by 2 once (an XLA pad, fused upstream).
- Grid over (batch, D-tiles, H-tiles); W and C stay whole in the block.
- Each program DMAs its input window (TD+4, TH+4, W+4, C) from HBM into
  VMEM, computes conv1 on the (TD+2, TH+2, W+2) interior into an f32
  scratch (27 shifted ``dot_general``s on the MXU), applies LeakyReLU,
  computes conv2 on the (TD, TH, W) core, adds the residual read from the
  centre of the *same* window, applies LeakyReLU, and writes the output
  block.
- Accumulation is float32 (``preferred_element_type``); stored tensors are
  the model's compute dtype.

The kernel is shape-specialised at trace time; `fused_resblock` falls
back to plain XLA ops when no tiling fits (tiny test volumes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .conv import leaky_relu

try:  # pallas is TPU/Mosaic specific; keep import-safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _resolve_precision(dtype, precision=None):
    """Match the model's rule: f32 runs HIGHEST (multi-pass MXU; single-pass
    DEFAULT drifts ~1e-2 over 12 blocks), bf16 runs the native pass."""
    if precision is not None:
        return precision
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


def resblock_reference(x, k1, k2, alpha: float = 0.2, precision=None):
    """Plain-XLA reference implementation (also the fallback path)."""
    from .conv import conv3d_symmetric_pad

    precision = _resolve_precision(x.dtype, precision)
    tmp = conv3d_symmetric_pad(x, k1, None, padding="SYMMETRIC", precision=precision)
    tmp = leaky_relu(tmp, alpha)
    tmp = conv3d_symmetric_pad(tmp, k2, None, padding="SYMMETRIC", precision=precision)
    return leaky_relu(x + tmp, alpha)


def _roll_sublane(x, shift: int):
    """Shift x left by `shift` along axis 2 with a canonical result layout."""
    if shift == 0:
        return x
    if _HAS_PALLAS and jax.default_backend() == "tpu":
        try:
            return pltpu.roll(x, -shift, axis=2)
        except Exception:
            pass
    return jnp.roll(x, -shift, axis=2)


def _conv_tile(win, kernel, out_shape, precision=None):
    """3x3x3 VALID conv of a VMEM-resident window via 27 MXU dot_generals.

    win: (d+2, h+2, w+2, Cin), kernel: (3, 3, 3, Cin, Cout) ->
    (d, h, w, Cout) float32.

    Sequential fori_loop accumulation: an unrolled 27-way sum keeps all
    shifted-window temporaries live at once and blows the Mosaic VMEM
    stack (57 MB observed at 24^3 tiles); the loop bounds liveness to one
    patch.
    """
    d, h, w, cout = out_shape
    cin = win.shape[-1]
    wa = win.shape[2]

    # Hoist the sublane (w) shifts: roll the whole window once per dx
    # instead of once per (dy, dx) column — 2 rolls per conv, not 18.
    # pltpu.roll also canonicalises the layout offset, which Mosaic
    # requires for the channel-axis concat below ("offset mismatch on
    # non-concat dimension" otherwise).
    shifted_wins = [win, _roll_sublane(win, 1), _roll_sublane(win, 2)]

    def plane(dz):
        # im2col for one depth tap: 9 shifted (dy, dx) windows stacked on
        # the channel axis -> one MXU GEMM with K = 9 * Cin (1152 at Cin=128),
        # far fewer ops than 27 small dots (Mosaic compile cost + MXU util).
        cols = [
            lax.slice(shifted_wins[dx], (dz, dy, 0, 0), (dz + d, dy + h, w, cin))
            for dy in range(3)
            for dx in range(3)
        ]
        patch = jnp.concatenate(cols, axis=-1)  # (d, h, w, 9*cin)
        kmat = kernel[dz].reshape(9 * cin, cout)
        return lax.dot_general(
            patch,
            kmat,
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def body(acc_ref):
        # Sequential stores bound Mosaic stack liveness to one im2col patch
        # (a pure value-sum kept every temporary live and OOM'd at 57 MB).
        acc_ref[:] = plane(0)
        acc_ref[:] = acc_ref[:] + plane(1)
        acc_ref[:] = acc_ref[:] + plane(2)
        return acc_ref[:]

    return pl.run_scoped(body, pltpu.VMEM((d, h, w, cout), jnp.float32))


def _resblock_kernel(
    x_hbm, k1_ref, k2_ref, out_ref, win_ref, sem, *, td, th, w, c, alpha, precision
):
    b = pl.program_id(0)
    it = pl.program_id(1)
    ih = pl.program_id(2)
    nt = pl.num_programs(1)
    nh = pl.num_programs(2)

    # DMA the input window (double halo; W padded to the sublane multiple
    # by the caller) into VMEM.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(it * td, td + 4), pl.ds(ih * th, th + 4), :, :],
        win_ref,
        sem,
    )
    copy.start()
    copy.wait()

    win = win_ref[:]
    dtype = win.dtype

    # conv1 over the extended (td+2, th+2, w+2) range, then LeakyReLU.
    # Positions outside the volume use pad-2 source planes and yield garbage;
    # they are replaced below by the mirror duplication that reproduces the
    # reference's symmetric padding of conv1's *output* (resnet_block pads
    # before each conv, so conv2's halo is a mirror of conv1 outputs, not
    # conv1 evaluated outside the volume).
    mid = _conv_tile(win, k1_ref[:], (td + 2, th + 2, w + 2, c), precision)
    mid = jnp.where(mid >= 0, mid, alpha * mid).astype(dtype)

    # Mirror-duplicate boundary planes as value ops (sequential per-dim
    # duplication composes exactly like np.pad(mode='symmetric') width 1).
    top = jnp.where(it == 0, mid[1:2], mid[0:1])
    bot = jnp.where(it == nt - 1, mid[td:td + 1], mid[td + 1:td + 2])
    mid = jnp.concatenate([top, mid[1:td + 1], bot], axis=0)

    left = jnp.where(ih == 0, mid[:, 1:2], mid[:, 0:1])
    right = jnp.where(ih == nh - 1, mid[:, th:th + 1], mid[:, th + 1:th + 2])
    mid = jnp.concatenate([left, mid[:, 1:th + 1], right], axis=1)

    # W is untiled: both ends always mirror.
    mid = jnp.concatenate([mid[:, :, 1:2], mid[:, :, 1:w + 1], mid[:, :, w:w + 1]], axis=2)

    # conv2 on the (td, th, w) core.
    out = _conv_tile(mid, k2_ref[:], (td, th, w, c), precision)

    # residual from the centre of the already-loaded window.
    res = lax.slice(win, (2, 2, 2, 0), (2 + td, 2 + th, 2 + w, c)).astype(jnp.float32)
    out = out + res
    out_ref[0] = jnp.where(out >= 0, out, alpha * out).astype(dtype)


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    for t in range(min(target, n), 0, -1):
        if n % t == 0:
            return t
    return n


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _fused_resblock_impl(x, k1, k2, alpha: float = 0.2, interpret: bool = False):
    n, d, h, w, c = x.shape
    dtype = x.dtype
    # Mosaic constraints on strided HBM views (the halo-window DMA slices the
    # major dims): the sublane (second-minor) dim must be a multiple of 8 and
    # the lane (minor) dim a multiple of 128. Pad W+4 up to the sublane
    # multiple (far-side junk is never read) and zero-pad channels to 128 —
    # free on the 128-wide MXU, and zero channels stay zero through both
    # convs and LeakyReLU.
    wa = -(-(w + 4) // 8) * 8
    ca = -(-c // 128) * 128
    xp = jnp.pad(x, [(0, 0), (2, 2), (2, 2), (2, 2), (0, 0)], mode="symmetric")
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 0), (0, wa - (w + 4)), (0, ca - c)])
    kp = [(0, 0)] * 3 + [(0, ca - c), (0, ca - c)]
    k1 = jnp.pad(k1.astype(dtype), kp)
    k2 = jnp.pad(k2.astype(dtype), kp)

    td = _pick_tile(d, 4)
    th = _pick_tile(h, 8)

    grid = (n, d // td, h // th)
    precision = _resolve_precision(dtype)
    kernel = functools.partial(
        _resblock_kernel, td=td, th=th, w=w, c=ca, alpha=alpha, precision=precision
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded volume stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, ca),
            lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, h, w, ca), dtype),
        scratch_shapes=[
            pltpu.VMEM((td + 4, th + 4, wa, ca), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # Mosaic's conservative stack accounting sums the relayout
            # temporaries of the 27 shifted-window taps; the default 16M
            # scoped budget is too tight even though live usage is ~5M.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, k1, k2)
    return out[..., :c] if ca != c else out


def _fused_or_fallback(x, k1, k2, alpha, interpret):
    if not _HAS_PALLAS:
        return resblock_reference(x, k1, k2, alpha)
    n, d, h, w, c = x.shape
    if d < 4 or h < 4 or w < 4 or c % 8 != 0:
        return resblock_reference(x, k1, k2, alpha)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic only compiles for TPU; CPU runs interpreted
    return _fused_resblock_impl(x, k1, k2, alpha=alpha, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_resblock(x, k1, k2, alpha: float = 0.2, interpret: bool = False):
    """Fused residual block; falls back to XLA for shapes that don't tile.

    x: (N, D, H, W, C); k1, k2: (3, 3, 3, C, C).

    Differentiable: the backward pass recomputes through the XLA reference
    composition (saving only the block inputs) — i.e. the Pallas path is
    inherently rematerialised, so it needs no additional jax.checkpoint.
    """
    return _fused_or_fallback(x, k1, k2, alpha, interpret)


def _fused_fwd(x, k1, k2, alpha, interpret):
    return _fused_or_fallback(x, k1, k2, alpha, interpret), (x, k1, k2)


def _fused_bwd(alpha, interpret, residuals, g):
    x, k1, k2 = residuals
    # Recompute at the same MXU precision as the fused forward
    # (_resolve_precision inside resblock_reference): with f32 training the
    # gradients must also be HIGHEST or the stated f32 parity mode breaks.
    _, vjp = jax.vjp(lambda x, k1, k2: resblock_reference(x, k1, k2, alpha), x, k1, k2)
    return vjp(g)


fused_resblock.defvjp(_fused_fwd, _fused_bwd)
