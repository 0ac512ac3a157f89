"""Profiler-trace the streaming-compactor roundtrip and rank device ops.

Usage: trace_stream.py [n_million] [rate]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu.ops import stream_compact as sc

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8 << 20
RATE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.16
CAP = max(128, (N // 4) // 128 * 128)
REP = 5

rng = np.random.default_rng(0)
t = np.linspace(0, 60, N).astype(np.float32)
wave = np.sin(t) * 0.5 + 0.5
m = wave < np.quantile(wave, RATE)
tcap = np.where(m, 1.0 + rng.random(N).astype(np.float32), 0.0)
tcj = jnp.asarray(tcap.astype(np.float32))
chans = tuple(jnp.asarray(rng.standard_normal(N).astype(np.float32))
              for _ in range(6))
print(f"N={N/1e6:.1f}M rate={m.mean():.3f}", flush=True)


def body(c, tc, *cs):
    sp = sc.stream_pack_channels((cs[0] + c,) + cs[1:] + (tc,), CAP,
                                 mask_from=6)
    res = [p * 2.0 + 1.0 for p in sp.packed[:5]]
    outs = sc.stream_unpack_channels(tc, res, [0.0] * 5, sp)
    return c + outs[0][0] * 0 + outs[4][1] * 0


@jax.jit
def f(c0, tc, *cs):
    def step(c, _):
        return body(c, tc, *cs), None
    c, _ = jax.lax.scan(step, c0, None, length=REP)
    return c


r = jax.block_until_ready(f(jnp.float32(0), tcj, *chans))
t0 = time.perf_counter()
r = jax.block_until_ready(f(jnp.float32(1), tcj, *chans))
print(f"roundtrip: {(time.perf_counter()-t0)/REP*1e3:.2f} ms/iter",
      flush=True)

LOG = "/tmp/nr_trace_stream"
with jax.profiler.trace(LOG):
    jax.block_until_ready(f(jnp.float32(2), tcj, *chans))

files = sorted(glob.glob(f"{LOG}/plugins/profile/*/*.trace.json.gz"))
if not files:
    print("no trace files", flush=True)
    sys.exit(0)
with gzip.open(files[-1], "rt") as fh:
    tr = json.load(fh)
events = tr.get("traceEvents", [])
by_name = defaultdict(float)
cnt = defaultdict(int)
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, nm_ in pids.items()
            if "TPU" in nm_ or "/device" in nm_.lower() or "XLA" in nm_}
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    if dev_pids and e.get("pid") not in dev_pids:
        continue
    by_name[e["name"]] += e.get("dur", 0.0)
    cnt[e["name"]] += 1
    total += e.get("dur", 0.0)
print(f"total device event time: {total/1e3/REP:.1f} ms/iter", flush=True)
fam = defaultdict(float)
famc = defaultdict(int)
for name, dur in by_name.items():
    base = name.rstrip("0123456789.")
    fam[base] += dur
    famc[base] += cnt[name]
for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {dur/1e3/REP:8.2f} ms/iter x{famc[name]:5d}  {name}",
          flush=True)
