"""SR4DFlowNet — the 4D flow super-resolution residual network, in Flax.

Architecture contract (reference: /root/reference/src/Network/SR4DFlowNet.py:3-51):

- two input branches: "phase" = (u, v, w) velocities and "pc" =
  (pcmr, mag, speed) where speed = |velocity|, mag = |magnitudes| and
  pcmr = mag * speed (SR4DFlowNet.py:10-15)
- each branch: 2x [conv3d k3 c64, symmetric pad, ReLU]
- concat -> conv3d k1 ReLU -> conv3d k3 ReLU
- ``low_resblock`` residual blocks at LR (default 8)
- trilinear upsample x res_increase (align_corners=True)
- ``hi_resblock`` residual blocks at HR (default 4)
- three separate heads (u/v/w): conv3d k3 c64 ReLU -> conv3d k3 c1 linear
  (the v2.0 "linear final activation" that permits phase aliasing)

TPU-native choices: the six (B,D,H,W,1) component volumes are carried as
two stacked (B,D,H,W,3) tensors, all convs run channels-last on the MXU,
and the upsampler is the matmul formulation in ``ops.upsample``. Compute
dtype is configurable (bfloat16 for throughput); parameters stay float32.

Residual-block rematerialisation (``remat_blocks``) trades FLOPs for HBM
via ``jax.checkpoint`` so deep HR stacks fit large batches.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import conv3d_symmetric_pad, leaky_relu
from ..ops.upsample import upsample3d


@dataclasses.dataclass(frozen=True)
class SR4DFlowNetConfig:
    """Hyperparameters, defaults mirroring the reference (trainer.py:35-39)."""

    res_increase: int = 2
    low_resblock: int = 8
    hi_resblock: int = 4
    channels: int = 64  # hard-pinned to 64 in the reference (SR4DFlowNet.py:8)
    dtype: Any = jnp.float32  # compute dtype; params are always float32
    # Residual-block rematerialisation: False/True, or a scope string —
    # 'hi' remats only the hi-res stack (which holds 8x the activation
    # bytes per block of the low-res one at res_increase=2), 'low' only
    # the low-res stack, 'all' == True. Selective remat trades less FLOPs
    # for most of the HBM relief (see docs/performance.md round 3).
    remat_blocks: bool | str = False
    # Round 1 shipped a fused Pallas residual block; it measured ~2x slower
    # than XLA's conv emitters on v5e in its best (forward-only) case and
    # was removed in round 2 — see docs/performance.md "Pallas verdict".
    # MXU precision: float32 compute uses HIGHEST (multi-pass, matches the
    # f32 reference); bfloat16 throughput mode uses the single-pass DEFAULT.
    precision: Any = None
    # Fused-boundary SYMMETRIC conv: zero-pad SAME conv + O(surface) edge
    # corrections instead of materialising the padded tensor per conv
    # (ops/conv.py::_clamp_conv3d). Numerically equivalent (exact tap set,
    # fp summation order differs); eliminates 38% of step time in HBM
    # pad traffic. False restores the explicit jnp.pad path.
    fused_boundary: bool = True
    # Compute the three u/v/w heads as one 64->192 conv + one block-diagonal
    # 192->3 conv (identical math/params; MXU-lane-friendly). False keeps
    # the reference-shaped per-component convs.
    merged_heads: bool = True
    # Run each residual stack as one lax.scan over stacked kernels: XLA
    # compiles the block body once per stack instead of once per block
    # (the fused-boundary body is 7 convs, so unrolled compiles took
    # 157-353s on TPU). Identical math and param tree; False unrolls.
    scan_blocks: bool = True
    # lax.scan unroll factor for the residual stacks: >1 copies the block
    # body N times per loop iteration, trading a little compile time for
    # less per-iteration loop overhead.
    scan_unroll: int = 1
    # Two further emitter-steering flags were built, A/B'd on chip and
    # deleted per the keep-or-delete rule (docs/performance.md round 4/5):
    # fast_dgrad (forward-form input-gradient convs, x0.998 — a wash) and
    # lane_pack (2-sample MXU lane packing via grouped convs, x0.502 — a
    # decisive loss). Recover either with `git log -S fast_dgrad`.
    # Residual-from-trilinear output (EXTENSION over the reference): the
    # heads predict a *correction* added to the align-corners trilinear
    # upsample of the input velocities, and the final head kernels are
    # zero-initialised so the untrained network reproduces trilinear
    # interpolation exactly. Training then starts at the interpolation
    # baseline and can only improve on it — the reference architecture
    # (SR4DFlowNet.py:39-51) has no input skip, so it must regenerate the
    # whole velocity field from scratch and can converge into
    # low-magnitude basins far below the trivial baseline
    # (docs/training.md round-4 post-mortem). Param tree is unchanged
    # (zero init, not extra params), so .h5 interop works both ways; the
    # flag is stored in the .h5 attrs and auto-detected at load.
    residual_skip: bool = False

    def resolved_precision(self):
        if self.precision is not None:
            return self.precision
        return jax.lax.Precision.HIGHEST if self.dtype == jnp.float32 else jax.lax.Precision.DEFAULT


class Conv3D(nn.Module):
    """Conv3D with reference padding semantics and Keras-compatible init.

    Keras Conv3D defaults: glorot_uniform kernel, zero bias
    (SR4DFlowNet.py:104 uses defaults). Kernel layout DHWIO.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    padding: str = "SYMMETRIC"
    dtype: Any = jnp.float32
    precision: Any = None
    fused_boundary: bool = True
    kernel_init: Any = None  # default glorot_uniform (Keras Conv3D default)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init or nn.initializers.glorot_uniform(),
            (k, k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return conv3d_symmetric_pad(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias,
            padding=self.padding,
            precision=self.precision,
            fused_boundary=self.fused_boundary,
        )


class _ConvParams(nn.Module):
    """Conv kernel+bias holder with Conv3D-identical param paths/init.

    Lets merged compute paths (e.g. the fused u/v/w heads) keep the exact
    per-head param tree, so Keras .h5 import and checkpoints are unchanged.
    """

    features: int
    in_features: int
    kernel_size: int = 3
    kernel_init: Any = None  # default glorot_uniform (Keras Conv3D default)

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init or nn.initializers.glorot_uniform(),
            (k, k, k, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ResBlock(nn.Module):
    """conv(k3, no bias) -> LeakyReLU(0.2) -> conv(k3, no bias) -> +x -> LeakyReLU.

    scale=1 as in resnet_block (SR4DFlowNet.py:111-120).
    """

    channels: int
    dtype: Any = jnp.float32
    precision: Any = None
    fused_boundary: bool = True

    @nn.compact
    def __call__(self, x):
        tmp = Conv3D(self.channels, 3, use_bias=False, dtype=self.dtype,
                     precision=self.precision,
                     fused_boundary=self.fused_boundary,
                     name="conv1")(x)
        tmp = leaky_relu(tmp, 0.2)
        tmp = Conv3D(self.channels, 3, use_bias=False, dtype=self.dtype,
                     precision=self.precision,
                     fused_boundary=self.fused_boundary,
                     name="conv2")(tmp)
        return leaky_relu(x + tmp, 0.2)


class _Kernel(nn.Module):
    """Bare conv-kernel holder (param path <name>/kernel)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.glorot_uniform(),
                          self.shape, jnp.float32)


class _ResBlockKernels(nn.Module):
    """Param holder matching ResBlock's tree exactly (<name>/conv1/kernel,
    <name>/conv2/kernel), so the scanned stack keeps checkpoints and Keras
    import byte-compatible with the unrolled path."""

    channels: int

    @nn.compact
    def __call__(self):
        c = self.channels
        k1 = _Kernel((3, 3, 3, c, c), name="conv1")()
        k2 = _Kernel((3, 3, 3, c, c), name="conv2")()
        return k1, k2


class SR4DFlowNet(nn.Module):
    config: SR4DFlowNetConfig = SR4DFlowNetConfig()

    @nn.compact
    def __call__(self, velocity: jax.Array, magnitude: jax.Array) -> jax.Array:
        """velocity, magnitude: (B, D, H, W, 3) -> SR velocity (B, rD, rH, rW, 3)."""
        cfg = self.config
        c = cfg.channels
        dt = cfg.dtype
        prec = cfg.resolved_precision()
        fb = cfg.fused_boundary
        # Zero-init the final (1-channel) head kernels under residual_skip
        # so the untrained output IS the trilinear baseline.
        head2_init = nn.initializers.zeros if cfg.residual_skip else None

        velocity_in = velocity  # pre-cast input, for the residual skip
        velocity = velocity.astype(dt)
        magnitude = magnitude.astype(dt)

        # Derived "pc" features (SR4DFlowNet.py:10-15).
        speed = jnp.sqrt(jnp.sum(velocity * velocity, axis=-1, keepdims=True))
        mag = jnp.sqrt(jnp.sum(magnitude * magnitude, axis=-1, keepdims=True))
        pcmr = mag * speed

        phase = velocity
        pc = jnp.concatenate([pcmr, mag, speed], axis=-1)

        pc = nn.relu(Conv3D(c, 3, dtype=dt, precision=prec, fused_boundary=fb, name="pc1")(pc))
        pc = nn.relu(Conv3D(c, 3, dtype=dt, precision=prec, fused_boundary=fb, name="pc2")(pc))

        phase = nn.relu(Conv3D(c, 3, dtype=dt, precision=prec, fused_boundary=fb, name="phase1")(phase))
        phase = nn.relu(Conv3D(c, 3, dtype=dt, precision=prec, fused_boundary=fb, name="phase2")(phase))

        x = jnp.concatenate([phase, pc], axis=-1)
        x = nn.relu(Conv3D(c, 1, dtype=dt, precision=prec, fused_boundary=fb, name="fuse1")(x))
        x = nn.relu(Conv3D(c, 3, dtype=dt, precision=prec, fused_boundary=fb, name="fuse2")(x))

        def stack_remat(prefix: str) -> bool:
            r = cfg.remat_blocks
            if r in (True, "all"):
                return True
            if isinstance(r, str):
                return prefix.startswith(r)
            return False

        def run_blocks(h, n, prefix):
            """N identical-shape residual blocks.

            ``scan_blocks`` runs them as one ``lax.scan`` over stacked
            kernels: XLA compiles the (7-conv fused-boundary) block body
            once per stack instead of once per block — measured 4-5x
            faster compiles at the paper config with identical math and
            an unchanged (per-block) param tree.
            """
            block = nn.remat(ResBlock) if stack_remat(prefix) else ResBlock
            if not cfg.scan_blocks or n <= 1:
                for i in range(n):
                    h = block(c, dtype=dt, precision=prec,
                              fused_boundary=fb,
                              name=f"{prefix}_{i}")(h)
                return h
            pairs = [_ResBlockKernels(c, name=f"{prefix}_{i}")() for i in range(n)]
            k1s = jnp.stack([p[0] for p in pairs]).astype(dt)
            k2s = jnp.stack([p[1] for p in pairs]).astype(dt)

            def body(carry, kk):
                k1, k2 = kk
                t = conv3d_symmetric_pad(carry, k1, None, precision=prec,
                                         fused_boundary=fb)
                t = leaky_relu(t, 0.2)
                t = conv3d_symmetric_pad(t, k2, None, precision=prec,
                                         fused_boundary=fb)
                return leaky_relu(carry + t, 0.2), None

            if stack_remat(prefix):
                body = jax.checkpoint(body)
            h, _ = jax.lax.scan(body, h, (k1s, k2s), unroll=cfg.scan_unroll)
            return h

        x = run_blocks(x, cfg.low_resblock, "low_res_block")

        x = upsample3d(x, cfg.res_increase, precision=jax.lax.Precision.HIGHEST)

        x = run_blocks(x, cfg.hi_resblock, "hi_res_block")

        if cfg.merged_heads:
            # One 64->3c conv for the three head1s (reads x once, fills MXU
            # lanes) and one block-diagonal 3c->3 conv for the head2s —
            # identical math and param tree to the per-component loop below;
            # separate 64->1 convs ran at 0.7 TF/s on v5e (1-channel outputs
            # tile to 128 lanes), 12 ms of a 270 ms step.
            k1s, b1s, k2s, b2s = [], [], [], []
            for comp in ("u", "v", "w"):
                k1, b1 = _ConvParams(c, c, name=f"{comp}_head1")()
                k2, b2 = _ConvParams(1, c, kernel_init=head2_init,
                                     name=f"{comp}_head2")()
                k1s.append(k1), b1s.append(b1), k2s.append(k2), b2s.append(b2)
            K1 = jnp.concatenate(k1s, axis=-1).astype(dt)  # (3,3,3,c,3c)
            B1 = jnp.concatenate(b1s)
            h = nn.relu(conv3d_symmetric_pad(
                x.astype(dt), K1, B1, precision=prec, fused_boundary=fb))
            z = jnp.zeros_like(k2s[0])
            K2 = jnp.concatenate(
                [
                    jnp.concatenate([k2s[0], z, z], axis=-1),
                    jnp.concatenate([z, k2s[1], z], axis=-1),
                    jnp.concatenate([z, z, k2s[2]], axis=-1),
                ],
                axis=3,
            ).astype(dt)  # (3,3,3,3c,3) block-diagonal
            B2 = jnp.concatenate(b2s)
            out = conv3d_symmetric_pad(
                h, K2, B2, precision=prec, fused_boundary=fb)  # linear output
        else:
            heads = []
            for comp in ("u", "v", "w"):
                h = nn.relu(Conv3D(c, 3, dtype=dt, precision=prec, fused_boundary=fb, name=f"{comp}_head1")(x))
                h = Conv3D(1, 3, dtype=dt, precision=prec, fused_boundary=fb, kernel_init=head2_init, name=f"{comp}_head2")(h)  # linear output
                heads.append(h)
            out = jnp.concatenate(heads, axis=-1)
        out = out.astype(jnp.float32)
        if cfg.residual_skip:
            # Heads predict a correction on top of the align-corners
            # trilinear upsample of the input velocities (f32, HIGHEST —
            # the baseline itself must not lose precision to the compute
            # dtype; same op as the feature-path upsample above).
            out = out + upsample3d(velocity_in.astype(jnp.float32),
                                   cfg.res_increase,
                                   precision=jax.lax.Precision.HIGHEST)
        return out

    def forward_components(self, u, v, w, u_mag, v_mag, w_mag):
        """Reference-shaped API: six (B,D,H,W,1) inputs (TrainerController.py:38-48)."""
        velocity = jnp.concatenate([u, v, w], axis=-1)
        magnitude = jnp.concatenate([u_mag, v_mag, w_mag], axis=-1)
        return self(velocity, magnitude)


def l2_regularization(params, weight: float = 5e-7) -> jax.Array:
    """L2 penalty over all conv kernels: weight * sum(kernel**2).

    Matches tf.keras.regularizers.l2(5e-7) attached to every Conv3D kernel
    (SR4DFlowNet.py:99) and summed by calculate_regularizer_loss
    (TrainerController.py:129-141). Biases carry no regularizer.
    """
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel":
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight * total
