"""Persistent XLA compilation cache (cold-start parity, VERDICT r2 #4).

The reference streams poses from frame 0 (liodom_node.cc:72-121) because its
compute is plain C++; a jitted TPU program instead pays one large XLA compile
per (shape, config) the first time it runs.  Enabling JAX's persistent
compilation cache makes that a once-per-machine cost: every app, bench, and
test entry point calls :func:`enable_persistent_cache` before the first jit,
so a warm container serves the first pose in milliseconds.

The cache lives inside the repo by default (``.jax_cache/``, gitignored) so
it survives process restarts; override with ``LIODOM_JAX_CACHE`` (set to
``off`` to disable — e.g. when measuring true compile cost).
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache; returns the
    cache dir (None when disabled).  Must run before the first jit to cover
    it, but is safe at any time."""
    global _enabled
    env = os.environ.get("LIODOM_JAX_CACHE")
    if env == "off":
        return None
    if path is None:
        path = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the pipeline is few, large programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
