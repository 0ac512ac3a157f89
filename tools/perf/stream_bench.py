"""TPU bench: Pallas streaming compactor vs the XLA log-shift pack.

Measures pack+unpack round trips standalone AND in a fused "bounce-like"
composition (pack -> cheap transform -> unpack inside one jit) at mesh-pipe
shapes.  Usage: python tools/perf/stream_bench.py [n_millions] [rate]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nrenderer_tpu.ops.compact import (shift_pack_channels,
                                       shift_unpack_channels)
from nrenderer_tpu.ops.stream_compact import (stream_pack_channels,
                                              stream_rows_needed,
                                              stream_unpack_channels)

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8 << 20
RATE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.16
CAP = max(128, (N // 4) // 128 * 128)

rng = np.random.default_rng(0)
# block-clustered mask like a real footprint: smooth in pixel order,
# thresholded at the requested live rate (must stay under cap/n or the
# overflow fallback paths diverge by design)
t = np.linspace(0, 60, N).astype(np.float32)
wave = np.sin(t) * 0.5 + 0.5
m = wave < np.quantile(wave, RATE)
print(f"n={N/1e6:.1f}M rate={m.mean():.3f} cap={CAP/1e6:.2f}M", flush=True)
tcap = np.where(m, 1.0 + rng.random(N, np.float32), 0.0).astype(np.float32)
chans = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
         for _ in range(6)] + [jnp.asarray(tcap)]
mj = jnp.asarray(m)


def timed(fn, *a, warmup=2, iters=10):
    """Per-call wall timing — includes ~25 ms/call of axon-relay dispatch
    overhead; use `timed_scan` for device-time comparisons."""
    for _ in range(warmup):
        r = fn(*a)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def timed_scan(body, *a, reps=10):
    """Time `body(carry, *a) -> arrays` REPS times inside ONE jitted
    lax.scan — dispatch overhead is paid once, so the per-iter time is
    the device cost (the trace-validated way to compare engines here)."""
    @jax.jit
    def f(c0, *args):
        def step(c, _):
            outs = body(c, *args)
            # fold a data dependency into the carry so iterations chain
            s = sum(jnp.sum(o[:8]) for o in outs)
            return c + s * 1e-30, None
        c, _ = jax.lax.scan(step, c0, None, length=reps)
        return c

    jax.block_until_ready(f(jnp.float32(0), *a))
    t0 = time.perf_counter()
    jax.block_until_ready(f(jnp.float32(1), *a))
    return (time.perf_counter() - t0) / reps * 1e3


@jax.jit
def stream_roundtrip(tc, *cs):
    sp = stream_pack_channels(cs + (tc,), CAP, mask_from=6)
    res = [p * 2.0 + 1.0 for p in sp.packed[:5]]
    return stream_unpack_channels(tc, res, [0.0] * 5, sp)


@jax.jit
def shift_roundtrip(mm, tc, *cs):
    packed, ridx, nh = shift_pack_channels(mm, cs + (tc,), CAP)
    res = [p * 2.0 + 1.0 for p in packed[:5]]
    return shift_unpack_channels(mm, res, [jnp.zeros_like(tc)] * 5,
                                 ridx=ridx)


# correctness cross-check first
a = jax.tree.map(np.asarray, stream_roundtrip(chans[6], *chans[:6]))
b = jax.tree.map(np.asarray, shift_roundtrip(mj, chans[6], *chans[:6]))
for i, (x, y) in enumerate(zip(a, b)):
    assert np.array_equal(x, y), f"channel {i} mismatch"
print("stream == shift roundtrip: OK")
rows = int(stream_rows_needed(mj))
print(f"rows needed {rows} ({rows*128/1e6:.2f}M lanes) vs "
      f"hits {m.sum()/1e6:.2f}M -> waste {rows*128/max(m.sum(),1)-1:+.1%}")

ms = timed(stream_roundtrip, chans[6], *chans[:6])
print(f"stream roundtrip (per-call, incl dispatch): {ms:7.2f} ms",
      flush=True)
ms = timed(shift_roundtrip, mj, chans[6], *chans[:6])
print(f"shift  roundtrip (per-call, incl dispatch): {ms:7.2f} ms",
      flush=True)


def stream_body(c, tc, *cs):
    sp = stream_pack_channels(((cs[0] + c),) + cs[1:] + (tc,), CAP,
                              mask_from=6)
    res = [p * 2.0 + 1.0 for p in sp.packed[:5]]
    return stream_unpack_channels(tc, res, [0.0] * 5, sp)


def shift_body(c, mm, tc, *cs):
    packed, ridx, nh = shift_pack_channels(mm, ((cs[0] + c),) + cs[1:]
                                           + (tc,), CAP)
    res = [p * 2.0 + 1.0 for p in packed[:5]]
    return shift_unpack_channels(mm, res, [jnp.zeros_like(tc)] * 5,
                                 ridx=ridx)


ms = timed_scan(stream_body, chans[6], *chans[:6])
print(f"stream roundtrip (scanned, device time)   : {ms:7.2f} ms/iter",
      flush=True)
ms = timed_scan(shift_body, mj, chans[6], *chans[:6])
print(f"shift  roundtrip (scanned, device time)   : {ms:7.2f} ms/iter",
      flush=True)
