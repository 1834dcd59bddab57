"""Persistent XLA compilation cache.

The reference has no compilation step at all (Chainer define-by-run); in
this framework every entry point jit-compiles one large XLA program, and
on remote-attached TPUs that compile dominates CLI latency. Enabling the
JAX persistent cache makes every CLI invocation after the first
near-instant for a given program shape.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PIVP_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pivp_tpu",
                     "xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
