"""Backend availability helpers for the axon remote-TPU tunnel.

The tunnel has two failure modes (both observed across rounds):

* relay down -> ``jax.devices()`` raises ``RuntimeError: Unable to
  initialize backend 'axon'`` quickly, and jax CACHES the failed init
  for the life of the process;
* tunnel half-up -> ``jax.devices()`` BLOCKS forever.

Either one used to kill a bench run outright (round 3 lost its only
driver-verified artifact to a transient outage — BENCH_r03.json rc=1).
``wait_for_backend`` probes backend init in a SUBPROCESS (bounding the
blocking mode with a timeout and keeping the parent's jax uninitialized
until a probe succeeds) and polls until the deadline.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE = (
    "import os, jax\n"
    "jax.config.update('jax_compilation_cache_dir',\n"
    "                  os.path.expanduser('~/.cache/jax_comp'))\n"
    "print(jax.devices()[0].platform)\n"
)


def _probe_once(timeout_s: float) -> "str | None":
    """One subprocess probe; returns the platform name or None."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE], capture_output=True,
            text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    lines = out.stdout.strip().splitlines()
    return lines[-1] if lines else None


def wait_for_backend(retry_s: float = 600.0,
                     probe_timeout_s: float = 120.0,
                     interval_s: float = 20.0,
                     probe=None) -> str:
    """Poll jax backend init until it succeeds or ``retry_s`` elapses.

    Returns the platform name of device 0 (e.g. ``'tpu'`` under axon,
    ``'cpu'`` when the host platform is forced). Raises RuntimeError
    after the deadline. ``probe`` is injectable for tests.

    Env override: ``BENCH_BACKEND_RETRY_S`` (seconds).
    """
    retry_s = float(os.environ.get("BENCH_BACKEND_RETRY_S", retry_s))
    probe = probe or _probe_once
    deadline = time.monotonic() + retry_s
    attempt = 0
    while True:
        attempt += 1
        platform = probe(probe_timeout_s)
        if platform:
            if attempt > 1:
                print(f"# backend up after {attempt} probes", flush=True)
            return platform
        if time.monotonic() >= deadline:
            raise RuntimeError(
                f"jax backend unavailable after {retry_s:.0f}s of "
                f"polling ({attempt} probes)")
        print(f"# backend unavailable (probe {attempt}); retrying in "
              f"{interval_s:.0f}s", flush=True)
        time.sleep(interval_s)
