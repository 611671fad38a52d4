"""Whole-volume super-resolution inference.

Equivalent of the reference predictor loop
(/root/reference/src/predictor.py:31-117): per time frame, patchify with
overlap, run the network over patch batches, stitch with halo cropping,
denormalise by venc and zero sub-sensitivity velocities, append to the
output HDF5 (plus halved voxel spacing).

TPU-native design: one jitted forward at a fixed batch shape (the last
batch is padded, so jit compiles once), patch batches sharded across the
mesh's data axis — the patch grid is embarrassingly parallel, which is
this model's analogue of sequence parallelism (SURVEY.md §5.7). Host work
(patchify/stitch) is vectorised numpy overlapped against device compute
by simple pipelining of device_put.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sr4dflownet import SR4DFlowNet, SR4DFlowNetConfig
from ..utils.cache import XLA_COMPILER_OPTIONS
from ..parallel.mesh import make_mesh, batch_sharding, replicated_sharding, put_with_sharding
from ..data.volume import VolumeDataset
from ..io.h5 import append_to_h5
from .patcher import PatchGenerator


class VolumePredictor:
    def __init__(
        self,
        patch_size: int,
        res_increase: int,
        batch_size: int,
        low_resblock: int = 8,
        hi_resblock: int = 4,
        *,
        compute_dtype=jnp.float32,
        mesh=None,
        params=None,
        seed: int = 0,
        transfer_dtype=np.float32,  # np.float16 halves host->device bytes;
        #                             quantisation (~5e-4 rel) is below MR noise
        channels: int = 64,  # the reference pins 64; overridable for tests/scaling
        residual_skip: bool = False,  # trilinear-residual output heads
        #   (SR4DFlowNetConfig.residual_skip); auto-detected from .h5
        #   attrs at load_weights time
    ):
        self.patch_size = patch_size
        self.res_increase = res_increase
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = len(self.mesh.devices.flat)
        # Round the static batch up to a multiple of the mesh size.
        self.batch_size = max(batch_size, ((batch_size + n_dev - 1) // n_dev) * n_dev)

        self.transfer_dtype = transfer_dtype
        self._build_model(SR4DFlowNetConfig(
            res_increase=res_increase,
            low_resblock=low_resblock,
            hi_resblock=hi_resblock,
            channels=channels,
            dtype=compute_dtype,
            residual_skip=residual_skip,
        ), params, seed)

    def _build_model(self, config: SR4DFlowNetConfig, params=None, seed: int = 0):
        self.config = config
        self.res_increase = config.res_increase
        self.model = SR4DFlowNet(self.config)

        if params is None:
            p = self.patch_size
            dummy = jnp.zeros((1, p, p, p, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy, dummy)["params"]
        self.params = put_with_sharding(params, replicated_sharding(self.mesh))

        self._batch_sharding = batch_sharding(self.mesh)
        # Device-side halo crop: the stitch discards a 2*res halo from every
        # patch face (PatchGenerator.py:116-154), so only the (P-4r)^3 core
        # crosses the relay — 42% fewer readback bytes at patch 24. The
        # readback also travels in transfer_dtype (f16 halves it again in
        # throughput mode; ~5e-4 rel quantisation, below MR noise).
        res_increase = config.res_increase
        s = 2 * res_increase
        P = self.patch_size * res_increase
        out_dtype = (jnp.float16 if self.transfer_dtype == np.float16
                     else jnp.float32)

        def fwd(params, vel, mag):
            pred = self.model.apply({"params": params}, vel, mag)
            return pred[:, s:P - s, s:P - s, s:P - s, :].astype(out_dtype)

        self._forward = jax.jit(fwd, compiler_options=XLA_COMPILER_OPTIONS)

    # ------------------------------------------------------------------ #

    def load_weights(self, path: str, keras: bool = False) -> None:
        from ..training import checkpoint as ckpt

        # Architecture attrs written by save_weights_h5 (round 5+): if the
        # file says the network differs from how this predictor was
        # constructed (e.g. it was trained with residual_skip or other
        # resblock counts), rebuild to match — the file wins.
        attrs = ckpt.read_h5_model_attrs(path) if not keras else {}
        if attrs:
            cfg = dataclasses.replace(
                self.config,
                res_increase=int(attrs.get("res_increase",
                                           self.config.res_increase)),
                low_resblock=int(attrs.get("low_resblock",
                                           self.config.low_resblock)),
                hi_resblock=int(attrs.get("hi_resblock",
                                          self.config.hi_resblock)),
                channels=int(attrs.get("channels", self.config.channels)),
                residual_skip=bool(attrs.get("residual_skip",
                                             self.config.residual_skip)),
            )
            if cfg != self.config:
                print(f"load_weights: rebuilding model from {path} attrs "
                      f"({attrs})")
                self._build_model(cfg)

        host_params = jax.device_get(self.params)
        if keras:
            params = ckpt.import_keras_weights(
                path, host_params, self.config.low_resblock, self.config.hi_resblock
            )
        elif os.path.isdir(path):
            # Orbax train-state checkpoint: pull out params. Try a matching
            # template first; fall back to a raw restore so checkpoints
            # written with a different optimizer/schedule state still load.
            from ..training.trainer import TrainState
            import optax

            try:
                opt = optax.adam(1e-4)
                template = TrainState(host_params, opt.init(host_params), jnp.zeros((), jnp.int32))
                params = ckpt.restore_train_state(path, template).params
            except Exception as template_err:  # noqa: BLE001
                # Tree-structure mismatch (checkpoint written with a
                # different optimizer/schedule state) — which orbax may
                # surface as its own exception types, not just
                # ValueError/KeyError/TypeError — so catch broadly and
                # retry as a raw restore. A genuinely missing/corrupt
                # checkpoint fails the raw path too and raises the
                # combined error below with the original as context.
                import orbax.checkpoint as ocp

                try:
                    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
                    raw_params = raw["params"] if isinstance(raw, dict) and "params" in raw else raw[0]
                    params = jax.tree_util.tree_map(
                        lambda t, a: jnp.asarray(a, t.dtype), host_params, raw_params
                    )
                except Exception as raw_err:
                    raise ValueError(
                        f"checkpoint at {path!r} matches neither the "
                        f"TrainState template ({template_err}) nor a raw "
                        f"params tree ({raw_err})"
                    ) from template_err
        else:
            params = ckpt.load_weights_h5(path, host_params)
        self.params = put_with_sharding(params, replicated_sharding(self.mesh))

    # ------------------------------------------------------------------ #

    def predict_patches(self, velocity: np.ndarray, magnitude: np.ndarray) -> np.ndarray:
        """Run the network over (N, p, p, p, 3) patch stacks.

        Returns (N, n, n, n, 3) halo-cropped cores (see ``_forward``).
        Dispatch is pipelined: up to 4 batches are in flight (upload +
        forward enqueued) before the oldest result is read back, so relay
        transfer latency overlaps device compute instead of serialising
        upload -> forward -> readback per batch.
        """
        from collections import deque

        n = velocity.shape[0]
        b = self.batch_size
        core = self.patch_size * self.res_increase - 4 * self.res_increase
        out = np.empty((n, core, core, core, 3), np.float32)

        def drain(item):
            start, stop, pred = item
            out[start:stop] = np.asarray(jax.device_get(pred), np.float32)[: stop - start]

        inflight: deque = deque()
        for start in range(0, n, b):
            stop = min(start + b, n)
            vel = velocity[start:stop]
            mag = magnitude[start:stop]
            if stop - start < b:  # pad the final batch to the static shape
                pad = b - (stop - start)
                vel = np.concatenate([vel, np.zeros((pad,) + vel.shape[1:], vel.dtype)])
                mag = np.concatenate([mag, np.zeros((pad,) + mag.shape[1:], mag.dtype)])
            vel = jax.device_put(vel.astype(self.transfer_dtype), self._batch_sharding)
            mag = jax.device_put(mag.astype(self.transfer_dtype), self._batch_sharding)
            inflight.append((start, stop, self._forward(self.params, vel, mag)))
            if len(inflight) >= 4:
                drain(inflight.popleft())
        while inflight:
            drain(inflight.popleft())
        return out

    def predict_volume(self, dataset: VolumeDataset, round_small_values: bool = True):
        """One time frame -> three denormalised SR component volumes."""
        pgen = PatchGenerator(self.patch_size, self.res_increase)
        vel, mag = pgen.patchify_stacked(dataset)
        results = self.predict_patches(vel, mag)
        comps = []
        for i, comp in enumerate(pgen.unpatchify(results)):
            comp = comp * dataset.venc
            if round_small_values:
                comp = np.where(np.abs(comp) < dataset.velocity_per_px, 0.0, comp)
            comps.append(comp.astype(np.float32))
        return comps

    # ------------------------------------------------------------------ #

    def predict_file(
        self,
        input_filepath: str,
        output_filepath: str,
        round_small_values: bool = True,
        verbose: bool = True,
    ) -> None:
        """Full predictor.py workflow over every time frame (ref :67-115).

        Frames are pipelined: frame i+1's HDF5 load + patchify + device
        upload + forward dispatch are all enqueued before frame i's results
        are read back and stitched, so host IO and relay transfers overlap
        device compute across the whole time series (all dispatch stays on
        the main thread — background upload threads deadlock on
        relay-attached TPUs; readbacks stay there too for the same reason).
        Stitching + denormalisation + the gzip'd HDF5 appends run on a
        single writer thread consuming an ordered queue, so frame i's
        host-side output work overlaps frame i+1's transfers and compute
        instead of serialising against them. One writer thread keeps the
        appends in frame order (the output datasets grow along axis 0).
        """
        import queue
        import threading

        dataset = VolumeDataset()
        nr_rows = dataset.get_dataset_len(input_filepath)
        os.makedirs(os.path.dirname(os.path.abspath(output_filepath)), exist_ok=True)

        def dispatch(nrow):
            """Load + patchify + enqueue every batch of one frame."""
            ds = VolumeDataset()
            ds.load_vectorfield(input_filepath, nrow)
            pgen = PatchGenerator(self.patch_size, self.res_increase)
            vel, mag = pgen.patchify_stacked(ds)
            b = self.batch_size
            preds = []
            for start in range(0, vel.shape[0], b):
                stop = min(start + b, vel.shape[0])
                v, m = vel[start:stop], mag[start:stop]
                if stop - start < b:
                    pad = b - (stop - start)
                    v = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                    m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
                v = jax.device_put(v.astype(self.transfer_dtype), self._batch_sharding)
                m = jax.device_put(m.astype(self.transfer_dtype), self._batch_sharding)
                preds.append((start, stop, self._forward(self.params, v, m)))
            return ds, pgen, vel.shape[0], preds

        write_q: queue.Queue = queue.Queue(maxsize=2)
        write_err: list = []
        _SENTINEL = object()

        def writer():
            try:
                while True:
                    item = write_q.get()
                    if item is _SENTINEL:
                        return
                    ds, pgen, out = item
                    for name, comp in zip(ds.velocity_colnames, pgen.unpatchify(out)):
                        comp = comp * ds.venc
                        if round_small_values:
                            comp = np.where(np.abs(comp) < ds.velocity_per_px, 0.0, comp)
                        append_to_h5(output_filepath, name, comp[None].astype(np.float32),
                                     compression="gzip")
                    if ds.dx is not None:
                        new_spacing = ds.dx / self.res_increase
                        append_to_h5(output_filepath, ds.dx_colname, new_spacing[None],
                                     compression="gzip")
            except BaseException as e:  # surface to the main thread
                write_err.append(e)
                # Drain so the producer never blocks on a dead writer.
                try:
                    while write_q.get_nowait() is not _SENTINEL:
                        pass
                except queue.Empty:
                    pass

        def finish(item):
            """Read back one frame's patches (main thread) and hand the
            stitch + write to the writer thread."""
            ds, pgen, n, preds = item
            core = self.patch_size * self.res_increase - 4 * self.res_increase
            out = np.empty((n, core, core, core, 3), np.float32)
            for start, stop, pred in preds:
                out[start:stop] = np.asarray(jax.device_get(pred), np.float32)[: stop - start]
            if write_err:
                raise write_err[0]
            write_q.put((ds, pgen, out))

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()
        try:
            cur = None
            t0 = time.time()
            for nrow in range(nr_rows):
                nxt = dispatch(nrow)
                if cur is not None:
                    finish(cur)
                    if verbose:
                        print(f"frame {nrow}/{nr_rows} done in {time.time()-t0:.2f}s")
                    t0 = time.time()
                cur = nxt
            if cur is not None:
                finish(cur)
                if verbose:
                    print(f"frame {nr_rows}/{nr_rows} done in {time.time()-t0:.2f}s")
        finally:
            write_q.put(_SENTINEL)
            wt.join()
        if write_err:
            raise write_err[0]
