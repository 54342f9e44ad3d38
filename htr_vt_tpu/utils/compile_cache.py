"""Persistent XLA compilation cache, enabled explicitly by entry points.

First TPU compile of the full SAM step is ~20-40 s; the persistent cache
makes every subsequent process start instant. One helper so the (dir,
min-compile-time) pair has a single home — CLIs, bench.py, tools/* and the
test suite all call this instead of repeating jax.config.update pairs.
Library code (config parsing, model building) must NOT call this implicitly:
mutating process-global JAX config belongs to entry points.
"""

from __future__ import annotations


def enable_compile_cache(path: str = "/tmp/htrvt_jax_cache") -> None:
    """Idempotent; respects a cache dir already set via env/flags."""
    import jax
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
