"""TrainerController — jitted data-parallel training on a TPU mesh.

Behavioural parity target: /root/reference/src/Network/TrainerController.py
(epoch loop :263-345, train/test steps :209-239, loss :84-127, metric
bookkeeping :241-257, best-model save on val_loss :313-318, quicksave
benchmark :415-454, loss.csv + TensorBoard logging :176-206, 396-412).

TPU-native design decisions
---------------------------
- One jitted ``train_step`` (donated state) does: on-device rotation
  augmentation -> forward -> fluid/non-fluid masked MSE + L2 -> grads ->
  Adam update. Everything is traced once; there is no per-batch Python
  beyond feeding numpy arrays.
- Gradient semantics match TF exactly: ``tape.gradient`` of a vector loss
  differentiates its *sum*, and the scalar L2 term is broadcast-added to
  each sample (TrainerController.py:219-249). Our scalar objective is
  ``sum_b w_b * loss_b + (sum_b w_b) * l2`` with w the padding weights.
- Data parallelism: batches are sharded over the mesh's 'data' axis,
  params/optimizer state are replicated; XLA inserts the gradient psum
  over ICI. The same code runs on 1 chip or a slice.
- Partial final batches are padded to the static batch size with
  zero-weight samples, so jit compiles exactly one shape.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import time
import datetime
from functools import partial
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.sr4dflownet import SR4DFlowNet, SR4DFlowNetConfig, l2_regularization
from ..ops.losses import (
    masked_fluid_mse,
    relative_error_loss,
    relative_speed_error,
    divergence_loss2,
)
from ..ops.rotate import batched_rotate_sample
from ..parallel.mesh import make_mesh, shard_batch, replicated_sharding, put_with_sharding
from ..io.h5 import save_predictions
from ..utils.logging import log_to_file, calculate_time_elapsed, SummaryLogger
from ..data.packed import PackedBatch, pack_batch, unpack_batch
from ..utils.cache import XLA_COMPILER_OPTIONS
from .metrics import MetricSet
from . import checkpoint as ckpt


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array
    # Optional exponential moving average of params (None when disabled).
    # On the sharp unnormalized-resnet landscape the iterate oscillates at
    # the edge of stability (docs/training.md); the EMA averages across the
    # oscillation and is what val/best/export use when enabled.
    ema: Any = None
    # Optional runtime learning-rate multiplier (None unless
    # restart-on-spike is enabled). Lives in the (donated) state so a
    # restart can halve the lr WITHOUT retracing the jitted train step —
    # the schedule itself is baked into the compiled program.
    lr_scale: Any = None


class TrainerController:
    """Reference-compatible constructor (TrainerController.py:18)."""

    def __init__(
        self,
        patch_size: int,
        res_increase: int,
        initial_learning_rate: float = 1e-4,
        quicksave_enable: bool = True,
        network_name: str = "4DFlowNet",
        low_resblock: int = 8,
        hi_resblock: int = 4,
        *,
        compute_dtype=jnp.float32,
        mesh=None,
        models_dir: str = "models",
        seed: int = 0,
        l2_weight: float = 5e-7,
        channels: int = 64,  # the reference pins 64; overridable for tests/scaling
        remat: bool | None = None,  # rematerialise resblocks: ~1.3x FLOPs for
        #   ~10x less activation HBM. None = auto: off for both dtypes —
        #   after the fused-boundary conv removed the pad traffic, the
        #   paper config fits HBM without remat in bf16 AND f32, and
        #   no-remat measured faster in both (bf16: 269 vs 311 ms/step,
        #   round 2; f32 HIGHEST: 1132 vs 1288 ms/step, round 3). Pass
        #   remat=True (optionally remat_scope='hi') for bigger
        #   batch/patch configs that exceed HBM.
        remat_scope: str = "all",  # which residual stacks to remat when remat
        #   is on: 'all' | 'hi' (hi-res stack only — it holds 8x the
        #   activation bytes per block at res x2) | 'low'.
        fused_boundary: bool = True,  # boundary-corrected SAME convs instead
        #   of materialised symmetric pads (ops/conv.py::_clamp_conv3d)
        precision: str | None = None,  # MXU precision override: 'default'
        #   (1-pass bf16), 'high' (3-pass bf16x3), 'highest' (6-pass, the
        #   f32 parity mode). None = auto (highest for f32, default for
        #   bf16). 'high' is the middle ground: f32 params with ~2x the
        #   throughput of strict parity mode.
        packed_transfer: bool = True,  # f16/u8 wire format (see data/packed.py);
        #                                set False for bit-exact f32 input parity
        lr_schedule=None,  # optional optax schedule (step -> lr); the reference
        #                    keeps a fixed lr (adjust_learning_rate is commented
        #                    out at TrainerController.py:280)
        adam_b2: float = 0.999,  # Adam beta2 (reference value). 0.999 means
        #   v_hat reacts to a loss blow-up ~700 steps late, letting the
        #   explosion run; 0.9-0.95 makes v_hat spike with the gradient and
        #   self-damps the effective step (docs/training.md).
        adam_eps: float = 1e-7,  # Adam epsilon (reference value,
        #   TrainerController.py:73). On small/fixed cohorts the true
        #   gradient shrinks until sqrt(v_hat) ~ eps and Adam's effective
        #   per-param step lr/(sqrt(v_hat)+eps) blows up — the smooth
        #   descend-then-ascend pathology documented in docs/training.md.
        #   Raising eps (e.g. 1e-4) floors the effective step; the
        #   reference never hits this because large noisy cohorts keep
        #   v_hat alive.
        ema_decay: float | None = None,  # optional parameter EMA (e.g. 0.999).
        #   Validation, best-model selection, quicksave and the .h5 export
        #   then use the averaged params, which sit at the centre of the
        #   edge-of-stability oscillation instead of riding it
        #   (docs/training.md). Extension over the reference.
        clip_norm: float | None = None,  # optional global-norm gradient clip
        #   (optax.clip_by_global_norm) ahead of Adam. An extension over the
        #   reference (it never clips): the unnormalized 24-conv resnet's
        #   landscape sharpens as the loss falls, and fixed-batch probes show
        #   Adam entering edge-of-stability oscillation at lr as low as 2e-5
        #   (docs/training.md, round 3). Clipping bounds the blowups without
        #   changing well-behaved steps.
        profile_dir: str | None = None,  # jax.profiler trace output directory
        rel_loss_weight: float = 0.0,  # weight of the smooth relative-speed-
        #   error term (ops/losses.py::relative_error_loss). The reference
        #   reports this metric but never trains on it; masked MSE leaves
        #   low-speed voxels nearly unconstrained in *relative* terms. Off
        #   by default (pure reference objective).
        rel_loss_eps: float = 0.05,  # denominator floor for the rel term,
        #   in venc-normalized speed units
        div_weight: float = 0.0,  # divergence-loss weight (dormant in reference)
        non_fluid_weight: float = 1.0,
        latest_every: int = 10,  # -latest.ckpt cadence in epochs (ref
        #   defines save_model('latest') but never calls it; we do, and a
        #   SIGTERM forces an immediate save regardless of cadence)
        residual_skip: bool = False,  # heads predict a correction on top of
        #   the trilinear upsample of the input (zero-init final kernels ->
        #   the untrained net IS the interpolation baseline). Extension
        #   over the reference; see SR4DFlowNetConfig.residual_skip.
        metric_fetch_every: int = 8,  # train-loop metric readback cadence
        #   (batches). Metrics accumulate ON DEVICE between fetches; a
        #   per-batch device_get is a blocking relay round-trip that
        #   measured ~2x on delivered e2e throughput (BENCH_r04: 19.24
        #   e2e vs 39.2 pure). Epoch totals are exact for any cadence —
        #   only the in-epoch progress line lags by < K batches. 1
        #   restores the per-batch behaviour.
        spike_factor: float | None = None,  # restart-on-spike: if an
        #   epoch's mean train loss exceeds spike_factor * the best epoch
        #   mean seen (or goes non-finite), reload the best checkpoint and
        #   continue at half the learning rate. The round-4 release run
        #   was lost to exactly one such ejection (epoch-9 train mean
        #   10.08 vs ~0.06 typical) that monotone cosine decay then froze
        #   into a bad basin (docs/training.md). None disables.
        max_restarts: int = 3,  # cap on spike restarts per run (each one
        #   halves the lr; past the cap spikes are logged but not acted on)
    ):
        self.rel_loss_weight = rel_loss_weight
        self.rel_loss_eps = rel_loss_eps
        self.div_weight = div_weight  # disabled (0) in the reference v2.0 (ref :23)
        self.non_fluid_weight = non_fluid_weight  # ref :24
        self.res_increase = res_increase
        self.patch_size = patch_size
        self.QUICKSAVE_ENABLED = quicksave_enable
        self.network_name = network_name
        self.accuracy_metric = "val_loss"  # best-model criterion (ref :64)
        self.learning_rate = initial_learning_rate
        self.models_dir = models_dir
        self.l2_weight = l2_weight
        self.packed_transfer = packed_transfer
        if packed_transfer:
            # Deliberate deviation from the reference's f32 input path: the
            # relay-attached TPU is transfer-bound, so inputs ship as f16/u8
            # (data/packed.py). --no-packed-transfer restores bit-exact f32.
            print("Packed f16 wire transfer active (inputs quantized in "
                  "flight; use packed_transfer=False for bit-exact f32 inputs)")
        self._quicksave_batch = None
        self.latest_every = max(1, latest_every)
        self.start_epoch = 0  # set by resume_from()
        self._best_val = np.inf
        self._stop_requested = False
        self._epoch_stop = False  # consensus value captured at epoch exit
        self.metric_fetch_every = max(1, metric_fetch_every)
        self.spike_factor = spike_factor
        self.max_restarts = max_restarts
        self._best_train = np.inf  # best epoch-mean train loss (spike ref)
        self._restarts = 0
        self._has_best_ckpt = False

        if remat is None:
            remat = False
        if remat and remat_scope != "all":
            remat = remat_scope  # 'hi'/'low' selective remat (model config)
        prec = None
        if precision is not None:
            prec = {
                "default": jax.lax.Precision.DEFAULT,
                "high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST,
            }[precision]
        self.config = SR4DFlowNetConfig(
            res_increase=res_increase,
            low_resblock=low_resblock,
            hi_resblock=hi_resblock,
            channels=channels,
            dtype=compute_dtype,
            remat_blocks=remat,
            fused_boundary=fused_boundary,
            precision=prec,
            residual_skip=residual_skip,
        )
        self.model = SR4DFlowNet(self.config)

        self.mesh = mesh if mesh is not None else make_mesh()

        # TF keras Adam defaults: beta1 0.9, beta2 0.999, epsilon 1e-7.
        self.lr_schedule = lr_schedule
        self.profile_dir = profile_dir
        adam = optax.adam(
            lr_schedule if lr_schedule is not None else self.learning_rate,
            b1=0.9, b2=adam_b2, eps=adam_eps,
        )
        self.optimizer = (
            optax.chain(optax.clip_by_global_norm(clip_norm), adam)
            if clip_norm else adam
        )

        # Init params with a dummy LR-shaped batch.
        p = patch_size
        dummy_vel = jnp.zeros((1, p, p, p, 3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), dummy_vel, dummy_vel)
        params = variables["params"]
        opt_state = self.optimizer.init(params)
        self.ema_decay = ema_decay
        # Distinct buffers, not an alias: the donated train step would
        # otherwise donate the same buffer twice (params + ema leaves).
        ema = jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32), ema,
                           self._fresh_lr_scale())
        # Replicate state over the mesh.
        rep = replicated_sharding(self.mesh)
        self.state = put_with_sharding(state, rep)

        self.loss_metrics = MetricSet()

        self._train_step = jax.jit(self._step, static_argnames=("train",), donate_argnums=0,
                                   compiler_options=XLA_COMPILER_OPTIONS)
        self._eval_step = jax.jit(partial(self._step, train=False),
                                  compiler_options=XLA_COMPILER_OPTIONS)
        # Device-side metric accumulator add (donates the accumulator):
        # lets the train loop fetch metrics every metric_fetch_every
        # batches instead of per batch without holding K pending trees.
        self._metric_add = jax.jit(
            lambda acc, new: jax.tree_util.tree_map(jnp.add, acc, new),
            donate_argnums=0)

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"SR4DFlowNet: {n_params/1e6:.2f}M params, "
              f"{low_resblock} low / {hi_resblock} hi resblocks, "
              f"res x{res_increase}, {len(self.mesh.devices.flat)} device(s)")
        print(f"Divergence loss2 * {self.div_weight}")
        print(f"Accuracy metric: {self.accuracy_metric}")

    def _fresh_lr_scale(self):
        """Initial lr multiplier leaf: a scalar when restart-on-spike is
        enabled (so restarts can halve it in-state without retracing),
        None otherwise (keeps the TrainState/checkpoint layout of runs
        that never use the feature unchanged)."""
        return jnp.ones((), jnp.float32) if self.spike_factor else None

    # ------------------------------------------------------------------ #
    # Loss math

    def _losses(self, params, batch):
        """Returns per-sample (loss, mse, div, rel_err) and predictions."""
        lr, hr, mag, mask = batched_rotate_sample(
            batch.lr, batch.hr, batch.mag, batch.mask, batch.rot_case
        )
        pred = self.model.apply({"params": params}, lr, mag)

        mse = masked_fluid_mse(hr, pred, mask, self.non_fluid_weight)
        if self.div_weight > 0:
            div_vox = divergence_loss2(hr, pred) * self.div_weight
            nf = (mask < 0.5).astype(div_vox.dtype)
            axes = (1, 2, 3)
            div = jnp.sum(div_vox * mask, axes) / (jnp.sum(mask, axes) + 1.0)
            div = div + jnp.sum(div_vox * nf, axes) / (jnp.sum(nf, axes) + 1.0)
        else:
            div = jnp.zeros_like(mse)
        loss = mse + div
        if self.rel_loss_weight > 0:
            loss = loss + self.rel_loss_weight * relative_error_loss(
                pred, hr, mask, eps=self.rel_loss_eps
            )
        rel_err = relative_speed_error(pred, hr, mask)
        return loss, mse, div, rel_err, pred

    def _step(self, state: TrainState, batch, train: bool = True):
        if isinstance(batch, PackedBatch):
            batch = unpack_batch(batch, self.patch_size, self.res_increase)
        w = batch.weight
        n_real = jnp.sum(w)

        def objective(params):
            loss, mse, div, rel_err, pred = self._losses(params, batch)
            l2 = l2_regularization(params, self.l2_weight)
            scalar = jnp.sum(loss * w) + n_real * l2
            metrics = {
                # Mean-metric accumulators: (sum over real samples, count).
                "loss_sum": jnp.sum((loss + (l2 if train else 0.0)) * w),
                "mse_sum": jnp.sum(mse * w),
                "div_sum": jnp.sum(div * w),
                "acc_sum": jnp.sum(rel_err * w),
                # Zero-weight scan fillers must not skew the l2 mean: gate
                # both the numerator and the step count on real samples.
                "l2": l2 * (n_real > 0),
                "count": n_real,
                "steps": (n_real > 0).astype(jnp.float32),
            }
            return scalar, (metrics, pred)

        if train:
            grads, (metrics, _) = jax.grad(objective, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
            if state.lr_scale is not None:
                # Runtime lr multiplier (restart-on-spike halves it): the
                # schedule inside the optimizer is compiled in, so the
                # scale rides the state instead.
                updates = jax.tree_util.tree_map(
                    lambda u: u * state.lr_scale, updates)
            params = optax.apply_updates(state.params, updates)
            # All-padding batches (zero-weight scan fillers) must be inert:
            # zero grads still move Adam (momentum decay), so gate the update.
            is_real = n_real > 0
            sel = lambda a, b: jnp.where(is_real, a, b)
            params = jax.tree_util.tree_map(sel, params, state.params)
            opt_state = jax.tree_util.tree_map(sel, opt_state, state.opt_state)
            ema = state.ema
            if self.ema_decay and ema is not None:
                d = self.ema_decay
                ema = jax.tree_util.tree_map(
                    lambda e, p: sel(d * e + (1.0 - d) * p, e), ema, params)
            new_state = TrainState(params, opt_state,
                                   state.step + is_real.astype(jnp.int32), ema,
                                   state.lr_scale)
            return new_state, metrics
        else:
            _, (metrics, pred) = objective(state.params)
            return state, metrics, pred

    # ------------------------------------------------------------------ #
    # Public step API

    def _device_batches(self, dataset):
        """Upload batches with one-batch lookahead.

        The transfer for batch i+1 is enqueued before the consumer runs
        step i, letting async dispatch overlap traffic with compute.
        (A background upload thread deadlocks on relay-attached TPUs, so
        the lookahead stays on the main thread.)
        """
        it = iter(dataset)
        try:
            cur = self._put(next(it))
        except StopIteration:
            return
        for nxt in it:
            nxt_dev = self._put(nxt)
            yield cur
            cur = nxt_dev
        yield cur

    def _put(self, batch):
        """Host batch -> device, via the packed wire format when enabled."""
        if self.packed_transfer:
            batch = pack_batch(batch)
        return shard_batch(batch, self.mesh)

    def train_step(self, batch) -> None:
        self.state, metrics = self._train_step(self.state, self._put(batch), train=True)
        self._update_metrics(metrics, "train")

    def train_step_device(self, dev_batch):
        """Step on an already-uploaded batch; returns device metrics."""
        self.state, metrics = self._train_step(self.state, dev_batch, train=True)
        return metrics

    def _eval_view(self) -> TrainState:
        """The state evaluation should use: EMA params when enabled."""
        s = self.state
        if self.ema_decay and s.ema is not None:
            return TrainState(s.ema, s.opt_state, s.step, None, s.lr_scale)
        return s

    def test_step(self, batch):
        _, metrics, pred = self._eval_step(self._eval_view(), self._put(batch))
        self._update_metrics(metrics, "val")
        return pred

    def _update_metrics(self, metrics, metric_set: str) -> None:
        metrics = jax.device_get(metrics)
        count = float(metrics["count"])
        self.loss_metrics[f"{metric_set}_loss"].update(metrics["loss_sum"], count)
        self.loss_metrics[f"{metric_set}_mse"].update(metrics["mse_sum"], count)
        self.loss_metrics[f"{metric_set}_div"].update(metrics["div_sum"], count)
        self.loss_metrics[f"{metric_set}_accuracy"].update(metrics["acc_sum"], count)
        if metric_set == "train":
            # 'steps' is 0 for all-padding batches so they don't skew the mean.
            self.loss_metrics["l2_reg_loss"].update(metrics["l2"], float(metrics.get("steps", 1.0)))

    # ------------------------------------------------------------------ #
    # Model directory / logging (TrainerController.py:158-206)

    def init_model_dir(self) -> None:
        timestamp = datetime.datetime.now().strftime("%Y%m%d-%H%M")
        self.unique_model_name = f"{self.network_name}_{timestamp}"
        self.model_dir = os.path.join(self.models_dir, self.unique_model_name)
        self.model_path = os.path.join(self.model_dir, self.network_name)
        os.makedirs(self.model_dir, exist_ok=True)
        self._prepare_logfile_and_summary()

    def resume_from(self, model_dir: str) -> bool:
        """Elastic resume: reuse an interrupted run's directory.

        Restores ``<name>-latest.ckpt`` (falling back to ``-best.ckpt``)
        plus the epoch/best-loss metadata sidecar, re-attaches the loggers
        (loss.csv is appended, not rewritten), and arranges for
        ``train_network`` to continue from the next epoch. Returns True if
        a checkpoint was restored. Beyond-reference behaviour: the
        reference restart always begins a fresh run (TrainerController.py
        has no resume path).
        """
        self.unique_model_name = os.path.basename(os.path.normpath(model_dir))
        self.model_dir = model_dir
        self.model_path = os.path.join(self.model_dir, self.network_name)
        os.makedirs(self.model_dir, exist_ok=True)
        self._prepare_logfile_and_summary()

        meta = {}
        meta_path = f"{self.model_path}-latest.meta.json"
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.start_epoch = int(meta.get("epoch", 0))
            best = meta.get("best_loss")
            self._best_val = float(best) if best is not None else np.inf

        restored_path = None
        for suffix in ("-latest.ckpt", "-best.ckpt"):
            path = f"{self.model_path}{suffix}"
            if os.path.isdir(path):
                template = jax.device_get(self.state)
                try:
                    restored = ckpt.restore_train_state(path, template)
                except (ValueError, KeyError, TypeError):
                    # Layout drift (optimizer/EMA config changed between
                    # runs): keep the params, restart optimizer state. The
                    # step counter comes from the meta sidecar — a fresh
                    # template's step 0 would rewind a cosine lr schedule
                    # to lr-max mid-run.
                    params = ckpt.restore_params(path, template.params)
                    step = np.asarray(meta.get("step", 0)).astype(
                        np.asarray(template.step).dtype)
                    restored = TrainState(
                        params, self.optimizer.init(params), step,
                        jax.tree_util.tree_map(np.copy, params)
                        if self.ema_decay else None,
                        self._fresh_lr_scale())
                self.state = put_with_sharding(restored, replicated_sharding(self.mesh))
                restored_path = path
                break

        if restored_path:
            step = int(np.asarray(jax.device_get(self.state.step)))
            msg = (f"Resumed from {restored_path} at epoch {self.start_epoch}, "
                   f"step {step}, best {self.accuracy_metric} {self._best_val:.5f}")
            print(msg)
            log_to_file(self.logfile, msg + "\n")
        return restored_path is not None

    def _prepare_logfile_and_summary(self) -> None:
        self.train_writer = SummaryLogger(os.path.join(self.model_dir, "tensorboard", "train"))
        self.val_writer = SummaryLogger(os.path.join(self.model_dir, "tensorboard", "validate"))

        self.logfile = os.path.join(self.model_dir, "loss.csv")
        if os.path.isfile(self.logfile):
            return  # resuming: keep the existing header + history
        log_to_file(self.logfile, f"Network: {self.network_name}\n")
        log_to_file(self.logfile, f"Initial learning rate: {self.learning_rate}\n")
        log_to_file(self.logfile, f"Accuracy metric: {self.accuracy_metric}\n")
        log_to_file(self.logfile, f"Divergence weight: {self.div_weight}\n")
        stat_names = ",".join(self.loss_metrics.keys())
        log_to_file(
            self.logfile,
            f"epoch, {stat_names}, learning rate, elapsed (sec), best_model, "
            "benchmark_err, benchmark_rel_err, benchmark_mse, benchmark_divloss\n",
        )

        # Source backup into the model dir (TrainerController.py:196-206).
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dest_root = os.path.join(self.model_dir, "backup_source")
        for dirpath, _, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fname in files:
                if fname.endswith(".py"):
                    src = os.path.join(dirpath, fname)
                    rel = os.path.relpath(src, os.path.dirname(pkg_root))
                    dst = os.path.join(dest_root, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copy2(src, dst)

    # ------------------------------------------------------------------ #
    # Epoch loop (TrainerController.py:263-345)

    def train_network(self, trainset, valset, n_epoch: int, testset=None) -> None:
        print("==================== TRAINING =================")
        print(f"Learning rate {self.learning_rate:.7f}")
        print(f"Start training at {time.ctime()} - {self.unique_model_name}\n")
        start_time = time.time()

        previous_loss = self._best_val
        total_batch_train = len(trainset)
        total_batch_val = len(valset)

        # SIGTERM/SIGINT: finish the in-flight step, write -latest.ckpt,
        # then return cleanly (elastic preemption handling; main thread
        # only — signal.signal raises ValueError elsewhere).
        self._stop_requested = False
        old_handlers = {}

        def _on_signal(signum, frame):
            self._stop_requested = True
            print(f"\nSignal {signum}: checkpointing after the current batch...",
                  flush=True)

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:
            pass

        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)

        for epoch in range(self.start_epoch, n_epoch):
            self.loss_metrics.reset()
            start_loop = time.time()

            i = self.run_train_epoch(trainset, epoch, start_loop, total_batch_train)

            if self._epoch_stop:
                # Mid-epoch preemption: this epoch is incomplete, resume
                # restarts it (meta epoch = completed epochs). Branch on
                # the consensus value captured at the epoch's loop exit,
                # NOT the raw flag: a signal landing between that final
                # allgather and this line would otherwise stop only this
                # host (it is picked up at the next consensus point).
                self.save_latest_model(epoch, force=True, best_loss=previous_loss)
                break

            for i, batch in enumerate(valset):
                self.test_step(batch)
                msg = (
                    f"Epoch {epoch+1} Validation batch {i+1}/{total_batch_val} | "
                    f"loss: {self.loss_metrics['val_loss'].result():.5f} "
                    f"({self.loss_metrics['val_accuracy'].result():.1f} %) - "
                    f"{time.time()-start_loop:.1f} secs"
                )
                print(f"\r{msg}", end="")
                # Consensus cadence, same as the train loop: all hosts
                # poll at identical batch indices so none leaves the
                # validation collectives early on a host-local flag.
                if self._sync_stop_requested(i + 1):
                    break

            if self._stop_consensus():
                # Partial validation: don't let it drive the best-model
                # decision; checkpoint and resume re-runs this epoch.
                self.save_latest_model(epoch, force=True, best_loss=previous_loss)
                break

            message = (
                f"\rEpoch {epoch+1} "
                f"Train loss: {self.loss_metrics['train_loss'].result():.5f} "
                f"({self.loss_metrics['train_accuracy'].result():.1f} %), "
                f"Val loss: {self.loss_metrics['val_loss'].result():.5f} "
                f"({self.loss_metrics['val_accuracy'].result():.1f} %) - "
                f"{time.time()-start_loop:.1f} secs"
            )

            loss_str = ",".join(
                f"{m:.5f}" for m in self.loss_metrics.results().values()
            )
            log_line = f"{epoch+1},{loss_str},{self.current_lr():.6f},{time.time()-start_loop:.1f}"

            self._update_summary_logging(epoch)

            if self._spike_detected():
                # Edge-of-stability ejection: this epoch's iterate left the
                # basin (docs/training.md round-4 post-mortem). Reload the
                # best checkpoint, halve the lr, and do NOT let the spiked
                # epoch drive the best-model decision.
                note = self._restart_from_spike()
                message += f" {note}"
                log_line += f",{note}"
            elif self.loss_metrics[self.accuracy_metric].result() < previous_loss:
                self.save_best_model()
                previous_loss = self.loss_metrics[self.accuracy_metric].result()
                message += " **"
                log_line += ",**"

                if self.QUICKSAVE_ENABLED and testset is not None:
                    ql, qa, qm, qd = self.quicksave(testset, epoch + 1)
                    message += f" Benchmark loss: {ql:.5f} ({qa:.1f} %)"
                    log_line += f", {ql:.7f}, {qa:.2f}%, {qm:.7f}, {qd:.7f}"

            print(message)
            log_to_file(self.logfile, log_line + "\n")
            self.save_latest_model(epoch + 1, best_loss=previous_loss)

        if self.profile_dir:
            jax.profiler.stop_trace()

        self._best_val = previous_loss
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        if self._stop_requested:
            msg = f"\nTraining interrupted by signal; state saved to {self.model_path}-latest.ckpt"
            log_to_file(self.logfile, msg + "\n")
            print(msg)
            return

        hrs, mins, secs = calculate_time_elapsed(start_time)
        message = f"\nTraining {self.network_name} completed! - name: {self.unique_model_name}"
        message += f"\nTotal training time: {hrs} hrs {mins} mins {secs} secs."
        message += f"\nFinished at {time.ctime()}"
        message += "\n==================== END TRAINING ================="
        log_to_file(self.logfile, message)
        print(message)

    def run_train_epoch(self, trainset, epoch: int = 0, start_loop: float | None = None,
                        total_batches: int | None = None) -> int:
        """One pass of the training hot loop; returns batches stepped.

        Metrics accumulate ON DEVICE (a tiny donated tree-add dispatched
        per batch — async, no readback) and are fetched only every
        ``metric_fetch_every`` batches: a per-batch device_get is a
        blocking relay round-trip that serialises the pipeline and
        measured ~2x on delivered e2e throughput (BENCH_r04 19.24 e2e vs
        39.2 pure step). Epoch totals are exact for any cadence; the
        progress line lags by < metric_fetch_every batches. Shared by
        ``train_network`` and the e2e benchmark so the measured loop IS
        the production loop.
        """
        if start_loop is None:
            start_loop = time.time()
        if total_batches is None:
            total_batches = len(trainset) if hasattr(trainset, "__len__") else 0
        i = 0
        acc = None
        for dev_batch in self._device_batches(trainset):
            self.state, metrics = self._train_step(self.state, dev_batch, train=True)
            acc = metrics if acc is None else self._metric_add(acc, metrics)
            i += 1
            if i % self.metric_fetch_every == 0:
                self._update_metrics(acc, "train")
                acc = None
            msg = (
                f"Epoch {epoch+1} Train batch {i}/{total_batches} | "
                f"loss: {self.loss_metrics['train_loss'].result():.5f} "
                f"({self.loss_metrics['train_accuracy'].result():.1f} %) - "
                f"{time.time()-start_loop:.1f} secs"
            )
            print(f"\r{msg}", end="")
            if self._sync_stop_requested(i):
                break
        if acc is not None:
            self._update_metrics(acc, "train")
        # Unconditional consensus at the loop exit: a SIGTERM landing in
        # the tail batches (i % sync_every != 0), or in an epoch shorter
        # than the sync cadence, must still reach every host before the
        # caller branches on the flag — otherwise one host checkpoints
        # and stops while its peers enter validation/the next epoch and
        # the collective program deadlocks. The caller branches on the
        # captured value, not the (still signal-mutable) raw flag.
        self._epoch_stop = self._stop_consensus()
        return i

    # Multi-process stop consensus cadence (batches). The allgather is a
    # device program, so it executes after the preceding train step —
    # running it every batch would serialise the one-batch-lookahead
    # pipeline; every 16th batch bounds both the overhead (<1/16 of a
    # step) and the stop latency (~3 s at paper-config step times).
    _stop_sync_every = 16

    def _sync_stop_requested(self, i: int = 0) -> bool:
        """Multi-host-consistent preemption check.

        SIGTERM lands on each process independently (on a preempted pod
        slice possibly seconds apart, or on one host only); breaking the
        training loop on the host-local flag would desynchronise the
        collective program across processes and deadlock the mesh. When
        the run spans processes, every host calls this at the same loop
        points, and the local flags are max-reduced across the cluster so
        all hosts take the same branch at the same batch — consensus
        batches only, and *never* the local flag alone, even when it is
        already set. Single-process (the common case, incl. every
        bench): just the local flag — no device work, no overhead.
        """
        if jax.process_count() == 1:
            return self._stop_requested
        if i % self._stop_sync_every:
            return False
        return self._stop_consensus()

    def _stop_consensus(self) -> bool:
        """Unconditional cross-process max-reduce of the stop flag.

        Called at every loop exit (train epoch end, validation end) and
        on the periodic cadence by ``_sync_stop_requested``, so every
        branch on ``_stop_requested`` after a loop sees the same value on
        every host. Single-process: just the local flag."""
        if jax.process_count() == 1:
            return self._stop_requested
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(1 if self._stop_requested else 0))
        if int(np.max(flags)) > 0:
            self._stop_requested = True
        return self._stop_requested

    # ------------------------------------------------------------------ #
    # Restart-on-spike (extension; docs/training.md round-4 post-mortem)

    def _spike_detected(self) -> bool:
        """Epoch-mean train loss non-finite or > spike_factor * best seen.

        Tracks the best epoch mean as the reference level. Deterministic
        across hosts: the metric derives from replicated device values, so
        every process takes the same branch at the same epoch."""
        if not self.spike_factor:
            return False
        train_loss = self.loss_metrics["train_loss"].result()
        if not np.isfinite(train_loss):
            return True
        if np.isfinite(self._best_train) and \
                train_loss > self.spike_factor * self._best_train:
            return True
        self._best_train = min(self._best_train, train_loss)
        return False

    def _restart_from_spike(self) -> str:
        """Reload the best checkpoint (when one exists) and halve the lr
        via the in-state multiplier — no retrace. Returns a log note."""
        self._restarts += 1
        if self._restarts > self.max_restarts:
            note = f"spike({self.loss_metrics['train_loss'].result():.3g}):ignored(max_restarts)"
            print(f"\n{note}")
            return note
        template = jax.device_get(self.state)
        scale = float(np.asarray(template.lr_scale)) * 0.5
        best = f"{self.model_path}-best.ckpt"
        if self._has_best_ckpt and os.path.isdir(best):
            restored = ckpt.restore_train_state(best, template)
            what = "restored best"
        else:
            restored = template  # no best yet: keep going, just slower
            what = "no best ckpt"
        restored = restored._replace(lr_scale=jnp.asarray(scale, jnp.float32))
        self.state = put_with_sharding(restored, replicated_sharding(self.mesh))
        note = (f"spike({self.loss_metrics['train_loss'].result():.3g}"
                f">{self.spike_factor}x{self._best_train:.3g}):"
                f"{what};lr_scale={scale:g}")
        print(f"\nRestart-on-spike #{self._restarts}: {note}")
        return note

    def current_lr(self, step: int | None = None) -> float:
        scale = 1.0
        if self.spike_factor and self.state.lr_scale is not None:
            scale = float(np.asarray(jax.device_get(self.state.lr_scale)))
        if self.lr_schedule is None:
            return self.learning_rate * scale
        if step is None:
            step = int(np.asarray(jax.device_get(self.state.step)))
        return float(self.lr_schedule(step)) * scale

    def save_latest_model(self, epoch: int, force: bool = False,
                          best_loss: float = np.inf) -> None:
        """Every-``latest_every``-epochs checkpoint (reference defines this
        but never calls it, TrainerController.py:78-82; we call it from the
        epoch loop, and signal handling forces it). The Orbax write is
        atomic (tmp dir + rename), so a kill mid-save never corrupts the
        previous checkpoint; the meta sidecar is written after the state
        so resume metadata never refers to a missing checkpoint."""
        if not force and (epoch <= 0 or epoch % self.latest_every != 0):
            return
        ckpt.save_train_state(f"{self.model_path}-latest.ckpt", self.state)
        meta = {"epoch": int(epoch),
                "best_loss": float(best_loss) if np.isfinite(best_loss) else None,
                "step": int(np.asarray(jax.device_get(self.state.step)))}
        tmp = f"{self.model_path}-latest.meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, f"{self.model_path}-latest.meta.json")
        print(f"Saving current model - {time.ctime()}")

    # ------------------------------------------------------------------ #
    # Checkpointing (TrainerController.py:347-394)

    def save_best_model(self) -> None:
        ckpt.save_train_state(f"{self.model_path}-best.ckpt", self.state)
        # The portable .h5 is the released artifact: EMA params when
        # enabled, plus architecture attrs so loaders (predictor.py,
        # evaluate_model.py) reconstruct the right network unaided.
        ckpt.save_weights_h5(f"{self.model_path}-best.h5",
                             self._eval_view().params,
                             attrs=self.model_h5_attrs())
        self._has_best_ckpt = True

    def model_h5_attrs(self) -> dict:
        c = self.config
        return {
            "res_increase": int(c.res_increase),
            "low_resblock": int(c.low_resblock),
            "hi_resblock": int(c.hi_resblock),
            "channels": int(c.channels),
            "residual_skip": int(bool(c.residual_skip)),
        }

    def restore_model(self, old_model_dir: str, old_model_file: str | None = None) -> None:
        """Restore a full train state (preferred) or bare .h5 weights."""
        state = jax.device_get(self.state)
        ckpt_path = None
        if old_model_file and old_model_file.endswith(".ckpt"):
            ckpt_path = os.path.join(old_model_dir, old_model_file)
        else:
            cands = [f for f in os.listdir(old_model_dir) if f.endswith("-best.ckpt")]
            if cands:
                ckpt_path = os.path.join(old_model_dir, sorted(cands)[-1])
        def fresh_state(params):
            ema = (jax.tree_util.tree_map(np.copy, params)
                   if self.ema_decay else None)
            return TrainState(params, self.optimizer.init(params), state.step,
                              ema, self._fresh_lr_scale())

        if ckpt_path and os.path.isdir(ckpt_path):
            try:
                restored = ckpt.restore_train_state(ckpt_path, state)
            except (ValueError, KeyError, TypeError):
                # State-layout mismatch (e.g. the checkpoint was written by
                # a schedule-driven Adam or without EMA and this controller
                # differs): take the portable part — params — and start the
                # optimizer (and EMA) fresh.
                restored = fresh_state(ckpt.restore_params(ckpt_path, state.params))
        elif old_model_file:
            restored = fresh_state(ckpt.load_weights_h5(
                os.path.join(old_model_dir, old_model_file), state.params))
        else:
            raise FileNotFoundError(f"no checkpoint found under {old_model_dir}")
        self.state = put_with_sharding(restored, replicated_sharding(self.mesh))

    # ------------------------------------------------------------------ #

    def _update_summary_logging(self, epoch: int) -> None:
        res = self.loss_metrics.results()
        self.train_writer.scalar(f"{self.network_name}/learning_rate", self.current_lr(), epoch)
        for key, val in res.items():
            if key.startswith("train_"):
                self.train_writer.scalar(f"{self.network_name}/{key[6:]}", val, epoch)
            elif key.startswith("val_"):
                self.val_writer.scalar(f"{self.network_name}/{key[4:]}", val, epoch)
        self.train_writer.scalar(f"{self.network_name}/l2_reg_loss", res["l2_reg_loss"], epoch)
        self.train_writer.flush()
        self.val_writer.flush()

    def quicksave(self, testset, epoch_nr: int):
        """Benchmark-batch prediction snapshot (TrainerController.py:415-454)."""
        if self._quicksave_batch is None:
            # Cache the single benchmark batch (the reference's testset is
            # unshuffled, so the first batch is stable) and close the
            # iterator so its prefetch producer shuts down rather than
            # leaking a thread per best-model save.
            it = iter(testset)
            try:
                self._quicksave_batch = next(it)
            finally:
                if hasattr(it, "close"):
                    it.close()
        batch = self._quicksave_batch
        _, metrics, preds = self._eval_step(self._eval_view(), self._put(batch))
        metrics = jax.device_get(metrics)
        preds = np.asarray(jax.device_get(preds))

        real = batch.weight > 0
        preds = preds[real]

        # Predictions correspond to the *rotated* inputs (augmentation runs
        # on device); rotate the saved ground truth to match, as the
        # reference's host pipeline implicitly does (TrainerController.py:421-452
        # saves the already-rotated batch). Same vectorised device op as
        # the train step — not a per-sample host loop.
        from ..ops.rotate import batched_rotate_sample

        lr, hr, _, mask = jax.device_get(batched_rotate_sample(
            batch.lr[real], batch.hr[real], batch.mag[real],
            batch.mask[real], batch.rot_case[real]))
        lr, hr, mask = np.asarray(lr), np.asarray(hr), np.asarray(mask)
        batch = batch._replace(
            lr=lr, hr=hr, mask=mask,
            venc=batch.venc[real], weight=batch.weight[real],
            mag=batch.mag[real], rot_case=batch.rot_case[real],
        )
        real = slice(None)

        fname = f"quicksave_{self.network_name}.h5"
        save_predictions(self.model_dir, fname, "epoch", np.asarray([epoch_nr]), compression="gzip")
        save_predictions(self.model_dir, fname, "u", preds[None, ..., 0], compression="gzip")
        save_predictions(self.model_dir, fname, "v", preds[None, ..., 1], compression="gzip")
        save_predictions(self.model_dir, fname, "w", preds[None, ..., 2], compression="gzip")

        if epoch_nr == 1:
            # LR inputs keep their trailing singleton channel dim, matching
            # the reference quicksave layout (TrainerController.py:443-445);
            # hr_* are squeezed there (:447-449), matching the [..., i] below.
            save_predictions(self.model_dir, fname, "lr_u", batch.lr[real][..., 0:1], compression="gzip")
            save_predictions(self.model_dir, fname, "lr_v", batch.lr[real][..., 1:2], compression="gzip")
            save_predictions(self.model_dir, fname, "lr_w", batch.lr[real][..., 2:3], compression="gzip")
            save_predictions(self.model_dir, fname, "hr_u", batch.hr[real][..., 0], compression="gzip")
            save_predictions(self.model_dir, fname, "hr_v", batch.hr[real][..., 1], compression="gzip")
            save_predictions(self.model_dir, fname, "hr_w", batch.hr[real][..., 2], compression="gzip")
            save_predictions(self.model_dir, fname, "venc", batch.venc[real], compression="gzip")
            save_predictions(self.model_dir, fname, "mask", batch.mask[real], compression="gzip")

        count = max(float(metrics["count"]), 1.0)
        return (
            metrics["loss_sum"] / count,
            metrics["acc_sum"] / count,
            metrics["mse_sum"] / count,
            metrics["div_sum"] / count,
        )
