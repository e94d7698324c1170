"""Persistent-compile-cache setup shared by bench/experiment entry points.

Through the TPU relay a cold compile of a production render is minutes
(CLAUDE.md); every benchmark process must therefore enable the on-disk
cache.  The dir must be PER-USER (a world-shared /tmp path collides on
ownership between users — advisor r4) and respect an explicit
JAX_COMPILATION_CACHE_DIR override.
"""

from __future__ import annotations

import os


def setup_compile_cache(tag: str = "bench") -> str:
    import jax

    path = jax.config.jax_compilation_cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "tpupt", f"jax_cache_{tag}"
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
