"""Device-backend init guard for entry scripts.

Out-of-tree TPU plugins can fail in two ways at first device use: raise
(plugin present but init errors — recoverable by forcing the CPU
platform) or HANG (the device relay is up but wedged — ``jax.devices()``
blocks forever and, because backend init holds jax's backend lock, an
in-process CPU fallback after a hung probe can deadlock on that same
lock).  ``ensure_backend`` handles both so every example/CLI entry point
doesn't re-grow its own partial version:

* ``FDT_FORCE_CPU=1`` — force the CPU platform before any device query
  (the only switch the plugin can't override is ``jax.config``).
* init raises — fall back to the CPU platform (the old behavior).
* init hangs past the timeout — exit with a clear message recommending
  ``FDT_FORCE_CPU=1`` rather than stalling the terminal forever.
"""

from __future__ import annotations

import os
import sys
import threading

__all__ = ["ensure_backend", "backend_fallback_reason"]

#: Set when ensure_backend() silently swapped to the CPU platform because
#: accelerator init RAISED.  ``None`` otherwise (including the explicit
#: FDT_FORCE_CPU path — a requested CPU backend is not a failure).
#: `fdt-tpu doctor` uses this to FAIL the backend check on a broken TPU
#: deployment instead of reporting "ok device backend: cpu" (the exact
#: failure the self-check exists to catch).
_fallback_reason: str | None = None


def backend_fallback_reason() -> str | None:
    """Why the backend silently fell back to CPU, or None if it didn't."""
    return _fallback_reason


def ensure_backend(timeout_s: float | None = None) -> None:
    """Initializes jax's device backend or exits with a clear message.

    See module docstring.  ``timeout_s`` defaults to the
    ``FDT_DEVICE_TIMEOUT`` env var (300 s).
    """
    global _fallback_reason
    import jax

    if os.environ.get("FDT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("FDT_DEVICE_TIMEOUT", "300"))

    box: dict = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as e:  # any init failure -> CPU fallback
            box["error"] = e

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        print(f"FATAL: jax.devices() did not return within {timeout_s:.0f}s "
              "(TPU relay hung?).  Re-run with FDT_FORCE_CPU=1 to use the "
              "CPU backend, or FDT_DEVICE_TIMEOUT=<s> to wait longer.",
              file=sys.stderr, flush=True)
        os._exit(1)
    if "error" in box:
        _fallback_reason = repr(box["error"])
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
