"""Process-level JAX runtime setup shared by the CLIs."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for this process.

    On TPU hosts that compile through a remote tunnel, the first compile of
    each training/eval graph costs minutes of wall clock (measured: the
    in-loop FID feature graph alone added ~10 min to a fresh `train.py`
    run at 256px). The persistent cache makes every graph a one-time cost
    per machine; `bench.py` always enabled it, and every CLI entry point
    now calls this first.

    No-op when a cache dir is already configured (via the
    JAX_COMPILATION_CACHE_DIR env var, which JAX reads natively, or a
    prior `jax.config.update`), so user configuration always wins.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "jax_tpu_cache")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return  # unwritable home (read-only container): run uncached
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold (>=2 min) would skip most of this model's graphs;
    # cache everything that took a real compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
