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
