"""Profile ONE MLT mutation block on TPU and rank device ops — where do
the ~3.6 ms/step at 4096 chains go (path gen? combine? splat? scan fixed
cost)?  (Round 4, toward VERDICT #4's >1.5 Mmut/s.)"""
import glob
import gzip
import json
import time
from collections import defaultdict

import jax

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn
from nrenderer_tpu.renderers import mlt as M

CHAINS = 4096
scene = load_scn("/root/reference/resource/Metropolis.scn")
scene.render_option.width = 500
scene.render_option.height = 500

# build the block pipeline via render_mlt's own cache
img = M.render_mlt(scene, chains=CHAINS, mutations=128, n_init=4096, seed=0)
(estimate_b, init_chains, run_block, flush_film) = next(
    iter(M._MLT_FN_CACHE.values()))

import jax.numpy as jnp
wh = (jnp.float32(500), jnp.float32(500))
key = jax.random.PRNGKey(1)
carry = init_chains(key, wh)
jax.block_until_ready(carry)
b = 0.2

# warm + time
carry = run_block(key, b, carry, wh)
jax.block_until_ready(carry)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    carry = run_block(key, b, carry, wh)
    jax.block_until_ready(carry)
    best = min(best, time.perf_counter() - t0)
print(f"block (128 steps, {CHAINS} chains): {best*1e3:.1f} ms "
      f"({best/128*1e3:.2f} ms/step, {128*CHAINS/best/1e3:.0f} Kmut/s)",
      flush=True)

LOG = "/tmp/nr_trace_mlt"
with jax.profiler.trace(LOG):
    carry = run_block(key, b, carry, wh)
    jax.block_until_ready(carry)

files = sorted(glob.glob(f"{LOG}/plugins/profile/*/*.trace.json.gz"))
print(f"trace files: {files}", flush=True)
if files:
    with gzip.open(files[-1], "rt") as fh:
        tr = json.load(fh)
    events = tr.get("traceEvents", [])
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pids.items()
                if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        by_name[e["name"]] += e.get("dur", 0.0)
        cnt[e["name"]] += 1
    total = sum(by_name.values())
    print(f"total device event time: {total/1e3:.1f} ms (128 steps)\n")
    for nm, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{dur/1e3:8.2f} ms x{cnt[nm]:5d}  {nm[:110]}")
