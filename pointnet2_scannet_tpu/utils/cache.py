"""Persistent XLA compilation cache.

The flagship graphs take minutes to compile through the TPU tunnel; caching
compiled executables on disk makes second runs start in seconds. Enabled by
every CLI and the benchmark; harmless on CPU.
"""

from __future__ import annotations

import os
import pathlib

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/pointnet2_scannet_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = pathlib.Path(cache_dir or DEFAULT_CACHE_DIR)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
