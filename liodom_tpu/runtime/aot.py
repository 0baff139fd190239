"""AOT executable warm start — serialize the COMPILED step programs.

Cold-start problem (README cold-start row): on the tunneled TPU backend the
first execution of a jitted program pays a backend compile/load path with
huge variance — 15 s on a good day, 190+ s observed — even on a persistent
-compilation-cache hit (the cache stores XLA output, but the backend still
re-loads/uploads the program through its remote service).

``jax.experimental.serialize_executable`` sidesteps that path entirely: it
pickles the LOADED PJRT executable, and ``deserialize_and_load`` hands it
straight back to the runtime.  Measured (scripts/warm_start_probe.py, one
v5e chip, same session): persistent-cache first pose **190.6 s**; AOT blob
first pose **8.4 s** (0.1 s deserialize + 7.3 s first execution) — a 23x
cold-start cut, and the closest this backend gets to the reference's
frame-0 streaming (liodom_node.cc:72-121).

Contract: blobs are tied to (jax version, backend, config, arg shapes) via
the tag hash; any load failure falls back silently to the normal jit path
(the blob format is explicitly version-fragile).  Write blobs at deploy
time with ``scripts/warm_cache.py`` or lazily with ``get_or_compile``.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
from typing import Any, Callable, Optional

import jax

_LOG = logging.getLogger("liodom.aot")


def default_dir() -> str:
    """Blob directory — sibling of the persistent XLA cache, repo-local."""
    env = os.environ.get("LIODOM_AOT_CACHE")
    if env:
        return env
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache", "aot")


def _tag(name: str, example_args, extra: str = "") -> str:
    """Stable identity of a compiled program: name + jax version + backend +
    every argument's shape/dtype (pytree-flattened) + ``extra``.

    ``extra`` MUST carry any static configuration that changes the traced
    program without changing argument shapes (e.g. ``local_map_every``,
    the frozen config reprs) — otherwise two different programs would
    collide on one blob."""
    leaves = jax.tree.leaves(example_args)
    sig = ";".join(f"{getattr(x, 'shape', ())}/{getattr(x, 'dtype', type(x))}"
                   for x in leaves)
    h = hashlib.sha256(
        f"{name}|{jax.__version__}|{jax.default_backend()}|{sig}|{extra}"
        .encode()).hexdigest()[:16]
    return f"{name}-{h}"


def save_compiled(name: str, compiled, example_args,
                  directory: Optional[str] = None, extra: str = "") -> str:
    """Serialize a ``Compiled`` to ``<dir>/<tag>.pkl``; returns the path."""
    from jax.experimental import serialize_executable as SE
    d = directory or default_dir()
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, _tag(name, example_args, extra) + ".pkl")
    blob = SE.serialize(compiled)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)
    return path


def load_compiled(name: str, example_args,
                  directory: Optional[str] = None, extra: str = ""):
    """Load a previously-saved executable for this (name, shapes, backend);
    None when absent or unloadable (stale jax/backend — fall back to jit)."""
    from jax.experimental import serialize_executable as SE
    d = directory or default_dir()
    path = os.path.join(d, _tag(name, example_args, extra) + ".pkl")
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        # pin execution to device 0: the step programs are single-chip, and
        # deserialize_and_load otherwise assumes the executable spans ALL
        # local devices (breaks on multi-device hosts, e.g. the 8-virtual-
        # device CPU test backend)
        return SE.deserialize_and_load(
            *blob, execution_devices=jax.devices()[:1])
    except Exception as e:  # noqa: BLE001 — any stale-blob failure -> jit
        _LOG.warning("AOT blob %s unusable (%s); falling back to jit",
                     path, e)
        return None


def get_or_compile(name: str, fn: Callable, example_args,
                   directory: Optional[str] = None,
                   save: bool = True, extra: str = "") -> Callable[..., Any]:
    """The warm-start entry: return a callable for ``fn`` at
    ``example_args``'s shapes — the deserialized AOT executable when a blob
    exists, else ``jit(fn).lower(...).compile()`` (saving the blob for next
    time when ``save``).

    The returned callable takes exactly the example-args structure (an AOT
    executable is shape-specialised, like the reference's fixed-size
    pipeline)."""
    loaded = load_compiled(name, example_args, directory, extra)
    if loaded is not None:
        return loaded
    compiled = jax.jit(fn).lower(*example_args).compile()
    if save:
        try:
            save_compiled(name, compiled, example_args, directory, extra)
        except Exception as e:  # noqa: BLE001
            _LOG.warning("AOT save failed (%s); continuing uncached", e)
    return compiled
