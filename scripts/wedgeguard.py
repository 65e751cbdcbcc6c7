"""Shared axon compile-wedge watchdog (the CLAUDE.md recovery protocol).

Usage, at the TOP of a job script (before the first jax compile —
gating on `jax.default_backend()` is wrong because reading the backend
itself goes through the tunnel and can hang with no guard armed):

    sys.path.insert(0, os.path.dirname(__file__))
    from wedgeguard import start_wedge_guard
    pet = start_wedge_guard()          # no-op on JAX_PLATFORMS=cpu
    ... pet() after every long device step ...

Exits 17 when no pet() lands within `timeout_s`, so scripts/tpu_run.sh
probes and retries (perturb a static shape to dodge a poisoned
program key). On CPU runs (JAX_PLATFORMS=cpu) the guard never arms —
a long training arm between pets is legitimate there.
"""

import os
import sys
import threading
import time


def start_wedge_guard(timeout_s: float = 420.0):
    """Returns pet(); arms the exit-17 watchdog unless the env forces
    the cpu backend. RSGS_WEDGE_S overrides the window (big programs —
    e.g. chunked 800^2 mesh rasters — can take >420 s to compile
    through the tunnel on a healthy service)."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return lambda: None
    timeout_s = float(os.environ.get("RSGS_WEDGE_S", timeout_s))

    last = {"t": time.time()}

    def pet():
        last["t"] = time.time()

    def watch():
        while True:
            time.sleep(30)
            if time.time() - last["t"] > timeout_s:
                print("WATCHDOG: compile wedged — retry (perturb a "
                      "static shape)", file=sys.stderr, flush=True)
                os._exit(17)

    threading.Thread(target=watch, daemon=True).start()
    return pet
