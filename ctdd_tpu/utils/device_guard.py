"""Fail fast when accelerator device init wedges.

The axon TPU tunnel on this class of host can block forever at the claim
step (observed: ``jax.devices()`` hangs while the pool re-provisions after
a worker crash). A hung CLI burns its whole job timeout and records
nothing. ``guard_device_init()`` arms a daemon watchdog, performs the
first (potentially blocking) device query, and disarms; if the query does
not complete within ``CTDD_DEVICE_TIMEOUT`` seconds (default 900) the
process prints a diagnostic and exits with code 3.

No reference counterpart (the reference assumes a local CUDA device);
this is TPU-pool operational hardening.
"""

from __future__ import annotations

import os
import sys
import threading


def guard_device_init(timeout: float | None = None,
                      on_timeout=None) -> list:
    """Return ``jax.devices()``, aborting the process if it wedges.

    ``on_timeout`` (optional) runs just before exit — e.g. to emit a
    machine-readable error line (bench.py).
    """
    import jax

    seconds = float(
        timeout
        if timeout is not None
        else os.environ.get("CTDD_DEVICE_TIMEOUT", "900")
    )
    ok = threading.Event()

    def _watch():
        if not ok.wait(seconds):
            if on_timeout is not None:
                try:
                    on_timeout(seconds)
                except Exception:
                    pass
            print(
                f"device init exceeded {seconds:.0f}s — TPU tunnel wedged "
                "or pool unavailable; aborting (exit 3)",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    devices = jax.devices()
    ok.set()
    return devices
