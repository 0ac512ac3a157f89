"""Overlap the TPU pool claim with host-side render preparation.

The axon backend binds lazily: `jax.devices()` returns without claiming a
chip, remote COMPILES go through a separate compile service, and the chip
itself is only claimed from the shared pool at the first EXECUTION.  Under
pool contention that claim can take minutes (measured 10 s .. 460 s in one
day, r5), and it serializes in front of the first device-to-host transfer —
which is why a fresh process's first render used to look like one giant
"compile" stall (`np.asarray(film)` blocked on exec blocked on claim).

`warm_device_async()` dispatches a trivial execution from a daemon thread
as early as possible, so the claim proceeds concurrently with scene prep,
tracing, lowering, and remote compiles (verified concurrent: a fresh-shape
compile completed in ~1 s while a claim had ~5 more minutes to wait).
Renderers call it at the top of `render()`; total cold latency becomes
max(claim, prep + compiles) instead of their sum.

No-ops on CPU backends and when called twice.  `wait_device()` joins the
claim (used by benches that want to time pure compute).
"""
from __future__ import annotations

import threading

_LOCK = threading.Lock()
_THREAD: threading.Thread | None = None


def _claim() -> None:
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np
        if jax.default_backend() == "cpu":
            return
        # any execution + fetch completes the pool claim and warms the
        # device->host transfer path
        np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    except Exception:
        # claim failures surface on the render path with full context;
        # the warm-up must never take the process down
        pass


def warm_device_async() -> None:
    """Start claiming the TPU in the background (idempotent, non-blocking)."""
    global _THREAD
    with _LOCK:
        if _THREAD is None:
            _THREAD = threading.Thread(
                target=_claim, name="nr-device-warm", daemon=True)
            _THREAD.start()


def wait_device(timeout: float | None = None) -> None:
    """Block until the background claim (if any) finished."""
    warm_device_async()
    t = _THREAD
    if t is not None:
        t.join(timeout)
