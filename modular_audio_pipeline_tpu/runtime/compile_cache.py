"""Persistent XLA compilation cache.

First compiles on the TPU backend cost seconds-to-minutes per program;
with shape bucketing the program set is small and stable, so a persistent
cache makes every process after the first start warm. Safe to call
multiple times; honours ``MAP_TPU_CACHE_DIR``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["enable_persistent_cache"]

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    try:
        import jax

        path = cache_dir or os.environ.get(
            "MAP_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "map_tpu", "xla_cache"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
        logger.debug("Persistent compilation cache at %s", path)
    except Exception as exc:  # never fatal
        logger.debug("Compilation cache unavailable: %s", exc)
