"""First-contact device-liveness watchdog for measurement probes.

A wedged axon tunnel hangs the FIRST device op forever (the backend
initializes lazily), which would stall a probe — and with it the whole
stage-gated measurement batch (``tools/round4_measure.sh``) — without
any signal.  ``bench.py`` carries its own copy of this pattern with a
JSON error contract; the probes share this helper.

A watchdog THREAD rather than SIGALRM: a Python signal handler only
runs between bytecodes, and the hang is inside a blocking C PJRT call
that never returns to the interpreter — ``os._exit`` works from any
thread.  The pattern was validated against the real 2026-08-17 wedge.
Only the first contact is watched: real programs compile after it, and
a slow remote compile is indistinguishable from a hang.
"""

from __future__ import annotations

import os
import sys
import threading

import numpy as np


def first_contact_watchdog(timeout_s: float = 600.0) -> None:
    """Run one trivial device op; exit 3 if it does not complete.

    A fail-fast backend error (UNAVAILABLE) propagates as the usual
    exception instead — callers exit nonzero and the measurement loop's
    per-stage liveness gate handles the retry.
    """
    import jax.numpy as jnp

    alive = threading.Event()

    def _watch():
        if not alive.wait(timeout_s):
            print(
                f"ERROR: device unresponsive: trivial op did not "
                f"complete in {timeout_s:.0f} s (wedged tunnel / stale "
                f"device claim?)",
                file=sys.stderr,
            )
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    np.asarray(jnp.sum(jnp.arange(8.0)))  # first device contact
    alive.set()
