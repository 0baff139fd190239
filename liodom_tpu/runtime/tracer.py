"""Tracing / profiling.

The reference's tracing is wall-clock stage timing via ``Clock``
(defs.h:39) around feature extraction (feature_extractor.cc:55-60) and
odometry (laser_odometry.cc:140,237), paired end-to-end frame latency
(stats.cc:55-71), all dumped as text (stats.cc:97-131).  Here:

* :class:`StageTimer` — the same per-stage host timers, feeding
  :class:`liodom_tpu.runtime.stats.Stats` so the five reference result files
  come out identical in shape;
* :class:`DeviceTrace` — structured device-level tracing via
  ``jax.profiler`` (TensorBoard-viewable), which the reference has no
  equivalent of;
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` pass-through for
  labelling host-side sections inside a device trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

from liodom_tpu.runtime.stats import Stats


class StageTimer:
    """Wall-clock stage timing routed into :class:`Stats`.

    Usage::

        timer = StageTimer(stats)
        with timer.stage("feature_extraction"):
            ...
    """

    _ROUTES = {
        "feature_extraction": "add_feature_extraction_time",
        "laser_odometry": "add_laser_odometry_time",
        "frame": "add_frame_time",
    }

    def __init__(self, stats: Optional[Stats] = None):
        self.stats = stats
        self.last_ms: dict = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            self.last_ms[name] = ms
            if self.stats is not None and name in self._ROUTES:
                getattr(self.stats, self._ROUTES[name])(ms)


class DeviceTrace:
    """``jax.profiler`` trace of the device program (XLA ops, fusion, HBM
    traffic), written as a TensorBoard profile under ``logdir``.

    Degrades to a no-op if the backend does not support profiling (e.g. the
    tunneled test TPU)."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self._active = False

    def __enter__(self):
        try:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        except Exception:
            self._active = False
        return self

    def __exit__(self, *exc):
        if self._active:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        return False


def annotate(name: str):
    """Label a host-side region inside a device trace."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
