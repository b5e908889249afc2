"""Runtime configuration: persistent XLA compilation cache.

The reference pays 8-60ms per part for GLSL codegen + driver shader compile
(README.md:113,149). XLA compilation of a large CSG tree costs seconds, so
gsdf_tpu enables JAX's persistent compilation cache by default: each distinct
(tree hash, grid shape) compiles once per machine, ever. Disable by setting
GSDF_TPU_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("GSDF_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = path or os.environ.get(
        "GSDF_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/gsdf_tpu/jax_compile"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    except Exception:
        pass  # cache is an optimization; never fail import over it
