"""Sweep NR_STREAM_ROWS / NR_STREAM_DYNROLL for the streaming compactor:
compile seconds + steady roundtrip ms at a mesh-pipe-like shape.

Usage: python -u tools/perf/stream_tune.py [n_millions] [rate] [rows ...]
Each config runs in-process sequentially (env is read at trace time by
the kernel builders; the lru_cache keys on rows, and dynroll changes the
traced program, so set env BEFORE each build).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8 << 20
RATE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.16
ROWS_LIST = [int(r) for r in sys.argv[3:]] or [128, 256, 512]
CAP = max(128, (N // 4) // 128 * 128)

rng = np.random.default_rng(0)
t = np.linspace(0, 60, N).astype(np.float32)
wave = np.sin(t) * 0.5 + 0.5
m = wave < np.quantile(wave, RATE)
tcap = np.where(m, 1.0 + rng.random(N).astype(np.float32), 0.0)
tcap = tcap.astype(np.float32)
chans = tuple(jnp.asarray(rng.standard_normal(N).astype(np.float32))
              for _ in range(6)) + (jnp.asarray(tcap),)
tcj = jnp.asarray(tcap)
print(f"n={N/1e6:.1f}M rate={m.mean():.3f} cap={CAP/1e6:.2f}M", flush=True)

want = None
for dynroll in ("0", "1"):
    for rows in ROWS_LIST:
        os.environ["NR_STREAM_ROWS"] = str(rows)
        os.environ["NR_STREAM_DYNROLL"] = dynroll
        from nrenderer_tpu.ops import stream_compact as sc
        sc._build_pack.cache_clear()
        sc._build_unpack.cache_clear()

        @jax.jit
        def roundtrip(tc, *cs):
            sp = sc.stream_pack_channels(cs + (tc,), CAP, mask_from=6)
            res = [p * 2.0 + 1.0 for p in sp.packed[:5]]
            return sc.stream_unpack_channels(tc, res, [0.0] * 5, sp)

        t0 = time.perf_counter()
        out = roundtrip(tcj, *chans[:6])
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        got = np.asarray(out[0])
        if want is None:
            want = got
        ok = np.array_equal(got, want)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = roundtrip(tcj, *chans[:6])
            jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"rows={rows:4d} dynroll={dynroll} compile={compile_s:7.1f}s"
              f" roundtrip={ms:7.2f} ms consistent={ok}", flush=True)
