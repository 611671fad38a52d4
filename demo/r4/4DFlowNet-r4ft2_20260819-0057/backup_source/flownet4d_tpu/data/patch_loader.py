"""Training input pipeline: patch-index CSV -> prefetched device-ready batches.

Re-architected equivalent of the reference PatchHandler3D
(/root/reference/src/Network/PatchHandler3D.py:5-163). The reference maps a
``tf.py_function`` over a tf.data pipeline, re-opening both HDF5 files for
*every sample* (PatchHandler3D.py:122,133) — that host loop is its training
bottleneck. This loader instead:

- caches whole HDF5 columns in RAM (LRU by byte budget) so patch reads are
  numpy slices, not filesystem traffic;
- assembles samples in a thread pool and prefetches whole batches on a
  background thread (double buffering against the device step);
- by default ships *unrotated* patches plus an int rotation code so the
  physics-aware augmentation runs on-TPU inside the jitted train step
  (see ops.rotate); host-side numpy rotation is kept for parity testing;
- pads the final partial batch to ``batch_size`` with zero-weight samples
  so jit sees a single static shape.

Normalisation contract (PatchHandler3D.py:137-154): global venc = max of
the three per-component vencs; velocities /venc -> [-1, 1]; magnitudes
/4095 -> [0, 1]; HR mask thresholded ``>= mask_threshold`` -> {0, 1}.
The HR mask is always read from time-frame 0 (PatchHandler3D.py:67).
"""

from __future__ import annotations

import os
import queue
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple, Sequence

import numpy as np
import h5py

from .patch_index import PatchIndexRow
from ..ops.rotate import _PERMS, _SIGNS, _AXES, _KS


class TrainingBatch(NamedTuple):
    """One device-ready batch (channels-last, stacked components)."""

    lr: np.ndarray  # (B, p, p, p, 3) normalized LR velocity
    mag: np.ndarray  # (B, p, p, p, 3) normalized magnitudes
    hr: np.ndarray  # (B, P, P, P, 3) normalized HR velocity, P = p * res
    venc: np.ndarray  # (B,) global venc per sample
    mask: np.ndarray  # (B, P, P, P) binary HR fluid mask
    rot_case: np.ndarray  # (B,) int32 rotation code in [0, 9] (0 = none/applied)
    weight: np.ndarray  # (B,) float32, 0.0 marks padding samples


class _ArrayCache:
    """LRU *frame-granular* cache over HDF5 columns.

    Caching whole columns (the round-1/2 design) thrashes once a cohort
    outgrows the byte budget: one evicted file costs a full multi-frame 4D
    re-read per touching sample. Caching one time-frame at a time bounds
    both the unit of memory and the unit of re-read to a single 3D volume
    (a few MB), so cohorts far larger than ``max_bytes`` stream at a
    sustained rate instead of collapsing. 1-D columns (the per-frame venc
    scalars) are cached whole — they are bytes, not megabytes.

    Counters (``hits``/``misses``/``evictions``/``bytes_read``) are plain
    ints mutated under the lock; read them via ``stats()``.
    """

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._store: OrderedDict[tuple, np.ndarray] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        self.evictions = 0
        self.bytes_read = 0

    def stats(self) -> dict:
        with self._lock:
            return {
                "hits": self.hits,
                "misses": self.misses,
                "evictions": self.evictions,
                "bytes_read": self.bytes_read,
                "resident_bytes": self._bytes,
                "entries": len(self._store),
            }

    def _lookup(self, key):
        with self._lock:
            if key in self._store:
                self._store.move_to_end(key)
                self.hits += 1
                return self._store[key]
            self.misses += 1
        return None

    def _insert(self, key, arr: np.ndarray) -> None:
        with self._lock:
            self.bytes_read += arr.nbytes
            if key not in self._store:
                self._store[key] = arr
                self._bytes += arr.nbytes
                while self._bytes > self.max_bytes and len(self._store) > 1:
                    _, old = self._store.popitem(last=False)
                    self._bytes -= old.nbytes
                    self.evictions += 1

    def get_frame(self, path: str, col: str, idx: int) -> np.ndarray:
        """One time-frame ``column[idx]`` of a >=2-D column (3D volume)."""
        key = (path, col, int(idx))
        arr = self._lookup(key)
        if arr is None:
            with h5py.File(path, "r") as hf:
                arr = np.asarray(hf[col][int(idx)])
            self._insert(key, arr)
        return arr

    def get_column(self, path: str, col: str) -> np.ndarray:
        """A whole (small, e.g. 1-D venc) column."""
        key = (path, col, None)
        arr = self._lookup(key)
        if arr is None:
            with h5py.File(path, "r") as hf:
                arr = np.asarray(hf[col])
            self._insert(key, arr)
        return arr


def rotate_patch_host(patch: np.ndarray, case: int, kind: str) -> np.ndarray:
    """Numpy reference rotation for parity tests / host fallback.

    patch: (p, p, p, 3) for kind 'phase'/'mag', (P, P, P) for 'mask'.
    Uses the same swap/sign tables as the on-device op.
    """
    if case == 0:
        return patch
    axes, k = _AXES[case], _KS[case]
    if kind == "mask":
        return np.rot90(patch, k=k, axes=axes)
    perm, signs = _PERMS[case], _SIGNS[case]
    comps = [patch[..., p] for p in perm]
    if kind == "phase":
        comps = [c if s == 1 else -c for c, s in zip(comps, signs)]
    out = np.stack(comps, axis=-1)
    return np.rot90(out, k=k, axes=axes)


class PatchLoader:
    """Reference-compatible constructor signature (PatchHandler3D.py:7-18)."""

    def __init__(
        self,
        data_dir: str,
        patch_size: int,
        res_increase: int,
        batch_size: int,
        mask_threshold: float = 0.6,
        *,
        rotate_on_device: bool = True,
        pad_last_batch: bool = True,
        cache_bytes: int = 4 << 30,
    ):
        self.data_dir = data_dir
        self.patch_size = patch_size
        self.res_increase = res_increase
        self.batch_size = batch_size
        self.mask_threshold = mask_threshold
        self.rotate_on_device = rotate_on_device
        self.pad_last_batch = pad_last_batch
        self._cache = _ArrayCache(cache_bytes)

        self.hr_colnames = ["u", "v", "w"]
        self.lr_colnames = ["u", "v", "w"]
        self.venc_colnames = ["venc_u", "venc_v", "venc_w"]
        self.mag_colnames = ["mag_u", "mag_v", "mag_w"]
        self.mask_colname = "mask"

    # ------------------------------------------------------------------ #

    def initialize_dataset(
        self,
        indexes: Sequence[PatchIndexRow],
        shuffle: bool,
        n_parallel: int | None = None,
        seed: int | None = None,
    ) -> "PatchDataset":
        """Build an iterable dataset of TrainingBatch (PatchHandler3D.py:20-38)."""
        return PatchDataset(self, list(indexes), shuffle, n_parallel or 4, seed)

    def cache_stats(self) -> dict:
        """Hit/miss/eviction/IO counters of the frame cache."""
        return self._cache.stats()

    # ------------------------------------------------------------------ #

    def load_sample(self, row: PatchIndexRow):
        """Assemble one normalized sample from the cache."""
        p = self.patch_size
        r = self.res_increase
        P = p * r
        lr_path = os.path.join(self.data_dir, row.source)
        hr_path = os.path.join(self.data_dir, row.target)
        x, y, z, idx = row.start_x, row.start_y, row.start_z, row.index

        lr_sl = np.index_exp[x : x + p, y : y + p, z : z + p]
        hr_sl = np.index_exp[x * r : x * r + P, y * r : y * r + P, z * r : z * r + P]

        vol_shape = self._cache.get_frame(lr_path, self.lr_colnames[0], idx).shape
        if any(s + p > dim for s, dim in zip((x, y, z), vol_shape)):
            raise ValueError(
                f"patch [{x}:{x+p}, {y}:{y+p}, {z}:{z+p}] exceeds LR volume "
                f"{vol_shape} in {row.source} — was the patch-index CSV "
                f"generated for a smaller patch_size than {p}?"
            )

        lr = np.stack([self._cache.get_frame(lr_path, c, idx)[lr_sl] for c in self.lr_colnames], -1)
        mag = np.stack([self._cache.get_frame(lr_path, c, idx)[lr_sl] for c in self.mag_colnames], -1)
        hr = np.stack([self._cache.get_frame(hr_path, c, idx)[hr_sl] for c in self.hr_colnames], -1)
        # HR mask is always read from time-frame 0 (PatchHandler3D.py:67).
        mask = self._cache.get_frame(hr_path, self.mask_colname, 0)[hr_sl]
        mask = (mask >= self.mask_threshold).astype(np.float32)

        venc = max(float(self._cache.get_column(lr_path, c)[idx]) for c in self.venc_colnames)

        lr = (lr / venc).astype(np.float32)
        hr = (hr / venc).astype(np.float32)
        mag = (mag / 4095.0).astype(np.float32)

        case = row.rotation_case
        if case and not self.rotate_on_device:
            lr = rotate_patch_host(lr, case, "phase")
            hr = rotate_patch_host(hr, case, "phase")
            mag = rotate_patch_host(mag, case, "mag")
            mask = rotate_patch_host(mask, case, "mask")
            case = 0

        return lr, mag, hr, np.float32(venc), mask, np.int32(case)

    def assemble_batch(self, rows: Sequence[PatchIndexRow], pool: ThreadPoolExecutor | None):
        samples = list(pool.map(self.load_sample, rows)) if pool else [
            self.load_sample(r) for r in rows
        ]
        n = len(samples)
        b = self.batch_size if self.pad_last_batch else n
        lr0, mag0, hr0, _, mask0, _ = samples[0]

        lr = np.zeros((b,) + lr0.shape, np.float32)
        mag = np.zeros((b,) + mag0.shape, np.float32)
        hr = np.zeros((b,) + hr0.shape, np.float32)
        venc = np.zeros((b,), np.float32)
        mask = np.zeros((b,) + mask0.shape, np.float32)
        rot = np.zeros((b,), np.int32)
        weight = np.zeros((b,), np.float32)

        for i, (l, m, h, ve, mk, rc) in enumerate(samples):
            lr[i], mag[i], hr[i], venc[i], mask[i], rot[i] = l, m, h, ve, mk, rc
            weight[i] = 1.0
        return TrainingBatch(lr, mag, hr, venc, mask, rot, weight)


class PatchDataset:
    """Iterable over TrainingBatch with background prefetch.

    Each ``__iter__`` reshuffles (when enabled) and streams batches from a
    producer thread, mirroring tf.data shuffle->map->batch->prefetch
    (PatchHandler3D.py:25-36) without per-sample Python in the hot loop.
    """

    def __init__(self, loader, rows, shuffle, n_parallel, seed):
        self.loader = loader
        self.rows = rows
        self.shuffle = shuffle
        self.n_parallel = n_parallel
        self._rng = np.random.default_rng(seed)
        self.prefetch_batches = 4

    def __len__(self):
        b = self.loader.batch_size
        return (len(self.rows) + b - 1) // b

    def __iter__(self):
        order = np.arange(len(self.rows))
        if self.shuffle:
            self._rng.shuffle(order)
        rows = [self.rows[i] for i in order]
        b = self.loader.batch_size
        chunks = [rows[i : i + b] for i in range(0, len(rows), b)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        error_holder = []
        stop = threading.Event()

        def _put(item) -> bool:
            """Put with a stop check so an abandoned iterator (consumer
            gone, queue full) doesn't strand the producer on q.put forever
            — that leaked a thread + pool + buffered batches per abandoned
            iterator (e.g. quicksave's single-batch read)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.n_parallel) as pool:
                    for chunk in chunks:
                        if stop.is_set():
                            return
                        if not _put(self.loader.assemble_batch(chunk, pool)):
                            return
            except BaseException as e:  # surface worker errors to the consumer
                error_holder.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error_holder:
                        raise error_holder[0]
                    return
                yield item
        finally:
            # Runs on exhaustion AND on GeneratorExit (abandoned iterator,
            # generator.close()): release the producer and reap the thread.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
