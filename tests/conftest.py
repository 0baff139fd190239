"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective logic is
exercised without a pod — the standard JAX fake-backend pattern (SURVEY.md §4).

The container boots every interpreter with an `axon` TPU PJRT plugin already
registered (sitecustomize), which pins the backend before pytest can touch
anything.  The only reliable way to get the CPU backend is to re-exec pytest
with the plugin disabled — done exactly once, guarded by a marker env var.
Capture is suspended first so the re-exec'd process inherits the real
stdout/stderr instead of pytest's capture fds.
"""

import os
import sys

_MARKER = "LIODOM_TEST_REEXEC"


def pytest_configure(config):
    if os.environ.get(_MARKER) == "1":
        return
    env = dict(os.environ)
    env[_MARKER] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # prevents the axon plugin boot
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
