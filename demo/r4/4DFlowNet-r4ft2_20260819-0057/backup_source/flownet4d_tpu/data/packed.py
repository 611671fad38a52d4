"""Compact wire format for host->device batch transfer.

Training on relay- or network-attached TPUs is transfer-bound: the paper
config moves 28 MB/step as 7 float32 leaves, but measured link bandwidth
is ~33 MB/s with ~45 ms per-leaf overhead. This module packs a
TrainingBatch into two batch-major buffers:

- ``fp``: float16, per-sample concatenation of (lr, mag, hr) — all are
  normalised to [-1, 1] / [0, 1], so the f16 quantisation step (~5e-4
  relative) sits far below the MR acquisition noise the data carries.
- ``u8``: uint8, per-sample concatenation of (binary mask **bit-packed to
  1 bit/voxel** via np.packbits, rotation code, padding weight) — all
  exactly representable. The HR mask is the entire u8 payload (P^3 voxels);
  at the paper config bit-packing it cuts the wire from 940 KB to 843 KB
  per patch — a direct ~10% headline win while the relay link (~33 MB/s)
  is the binding ceiling (docs/architecture.md feed ledger).
- ``venc``: float32 (B,), kept for quicksave bookkeeping.

~2.5x fewer bytes than raw float32 leaves and 2 puts instead of 7. Both
buffers keep the batch as the leading axis, so data-parallel NamedSharding
applies unchanged. Unpacking happens inside the jitted step (bit-shift +
slice + reshape + cast — fused by XLA, no extra HBM round trip).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .patch_loader import TrainingBatch


class PackedBatch(NamedTuple):
    fp: np.ndarray  # (B, 3*p^3 + 3*p^3 + 3*P^3) float16
    u8: np.ndarray  # (B, ceil(P^3/8) + 2) uint8 — bit-packed mask, rot, weight
    venc: np.ndarray  # (B,) float32


def pack_batch(b: TrainingBatch) -> PackedBatch:
    B = b.lr.shape[0]
    fp = np.concatenate(
        [
            b.lr.reshape(B, -1),
            b.mag.reshape(B, -1),
            b.hr.reshape(B, -1),
        ],
        axis=1,
    ).astype(np.float16)
    u8 = np.concatenate(
        [
            # packbits pads the last byte with zero bits when P^3 % 8 != 0;
            # unpack_batch slices the padding back off.
            np.packbits(b.mask.reshape(B, -1).astype(np.uint8), axis=1),
            b.rot_case.reshape(B, 1).astype(np.uint8),
            b.weight.reshape(B, 1).astype(np.uint8),
        ],
        axis=1,
    )
    return PackedBatch(fp, u8, b.venc.astype(np.float32))


def unpack_batch(pb: PackedBatch, patch_size: int, res_increase: int) -> TrainingBatch:
    """Device-side unpack (call inside jit). Returns float32 leaves."""
    B = pb.fp.shape[0]
    p = patch_size
    P = p * res_increase
    n_lr = 3 * p**3
    n_hr = 3 * P**3

    fp = pb.fp
    lr = fp[:, :n_lr].reshape(B, p, p, p, 3).astype(jnp.float32)
    mag = fp[:, n_lr : 2 * n_lr].reshape(B, p, p, p, 3).astype(jnp.float32)
    hr = fp[:, 2 * n_lr : 2 * n_lr + n_hr].reshape(B, P, P, P, 3).astype(jnp.float32)

    u8 = pb.u8
    n_mask_bytes = -(-(P**3) // 8)
    # np.packbits bit order: bit 0 of the source lands in the MSB.
    bits = (u8[:, :n_mask_bytes, None] >> jnp.arange(7, -1, -1, dtype=jnp.uint8)) & 1
    mask = bits.reshape(B, -1)[:, : P**3].reshape(B, P, P, P).astype(jnp.float32)
    rot = u8[:, n_mask_bytes].astype(jnp.int32)
    weight = u8[:, n_mask_bytes + 1].astype(jnp.float32)

    return TrainingBatch(lr, mag, hr, pb.venc, mask, rot, weight)
