"""Process-level runtime workarounds.

The tunneled single-chip TPU platform (``axon``) hangs the Python
interpreter at shutdown: its client teardown never returns, so even
``python -c "import jax; float(jax.numpy.zeros(()))"`` sleeps forever
after the last statement (main thread parked in a nanosleep poll loop,
tokio/axon worker threads alive).  Measured 2026-08-17: a trivial
program and a finished CLI training run both sat >10 min post-completion
until an external timeout killed them.

Every entry point that touches the device therefore calls
:func:`exit_now_if_tunneled` as its final statement — all device values
have been fetched and all files/streams flushed by then, so skipping
interpreter teardown is safe and the only way to return control to the
caller (driver, shell script, CI).
"""

import os
import sys


def exit_now_if_tunneled(code: int = 0) -> None:
    """``os._exit`` when a non-CPU JAX backend is live; no-op otherwise.

    CPU runs (tests, local tools) exit normally; anything on the tunneled
    TPU would hang in platform teardown instead.  Flushes stdout/stderr
    first — callers must have fetched every device value they need.
    """
    jax_mod = sys.modules.get("jax")
    if jax_mod is None:
        return
    try:
        backend = jax_mod.default_backend()
    except Exception:
        return
    if backend == "cpu":
        return
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
