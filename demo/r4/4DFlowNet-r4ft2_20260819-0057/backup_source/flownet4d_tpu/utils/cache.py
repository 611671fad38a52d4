"""Persistent XLA compilation cache.

The paper-config train step takes minutes to compile on remote-compile
TPU attachments; the persistent cache cuts warm starts to seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("FLOWNET4D_NO_COMPILE_CACHE") == "1":
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "FLOWNET4D_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# Workaround for an XLA:TPU compiler crash: the space-to-batch-converter
# pass CHECK-fails (space_to_batch_converter.cc:543, "halo_size -
# low_padding <= spatial_split_size") on the fused-boundary face-slab
# convolutions at small batch sizes (reproduced: batch 4 + patch 16
# crashes, batch 8 or patch 12 are fine — scripts/smoke_configs.py first
# hit it at BASELINE configs[0]). The pass only rewrites small-batch
# convolutions, so disabling it is a no-op for the batch>=8 hot path and
# unbreaks batch<=4 configs. Applied to every train/eval/forward jit.
XLA_COMPILER_OPTIONS = {
    "xla_disable_hlo_passes": "space-to-batch-converter",
}
