"""Trace a REAL 20-bounce chain (state carried bounce to bounce, no
staging) and print per-occurrence durations of the Pallas ops — the
sweep-cost-vs-bounce-depth curve, which single-bounce microbenches with
coherent camera rays cannot show.

Usage: chain_trace.py [n_million] [depth]
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
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.camera import make_camera, shoot_v3
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.bvh import build_mesh_accel
from nrenderer_tpu.ops.pt_core import (
    make_mat_channels, scene_epsilon, bsdf_bounce)
from nrenderer_tpu.ops.soa import V3

nm = float(sys.argv[1]) if len(sys.argv) > 1 else 16
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 20

RES = "/root/reference/resource"
scene = load_scn(f"{RES}/path_tracing_cornel.scn")
load_obj(f"{RES}/obj/bunny_5k_faces.obj", scene, material=0)
m = scene.models[-1]
m.scale = (600.0,) * 3
m.translation = (40.0, -305.0, 920.0)
arr = build_scene_arrays(scene)
ss = make_static_scene(arr)
mat_ch = make_mat_channels(ss)
ma = build_mesh_accel(arr, mat_ch)
t_min = scene_epsilon(ss, T_MIN_PT)
cam = make_camera(scene.camera)

size = 500
n_pix = size * size
N = int(nm * 1e6) // n_pix * n_pix
chunk = N // n_pix
print(f"N={N/1e6:.2f}M rays depth={DEPTH}", flush=True)

jj = np.tile(np.tile(np.arange(size, dtype=np.float32), size), chunk)
ii = np.tile(np.repeat(np.arange(size, dtype=np.float32), size), chunk)


@jax.jit
def chain(key):
    k_jx, k_jy, k_path = jax.random.split(key, 3)
    rx = jax.random.uniform(k_jx, (N,), minval=-1.0, maxval=1.0)
    ry = jax.random.uniform(k_jy, (N,), minval=-1.0, maxval=1.0)
    o, d = shoot_v3(cam, (jnp.asarray(jj) + rx) / size,
                    (jnp.asarray(ii) + ry) / size)
    ones = jnp.ones((N,))
    thr = V3(ones, ones, ones)
    rad = V3(ones * 0, ones * 0, ones * 0)
    alive = jnp.ones((N,), jnp.bool_)

    def step(carry, b):
        o, d, thr, rad, alive = carry
        kb = jax.random.fold_in(k_path, b)
        ks = jax.random.split(kb, 3)
        u1 = jax.random.uniform(ks[0], (N,))
        u2 = jax.random.uniform(ks[1], (N,))
        u3 = jax.random.uniform(ks[2], (N,))
        o, d, thr, rad, alive = bsdf_bounce(
            ss, mat_ch, o, d, thr, rad, alive, u1, u2, u3,
            t_min=t_min, tri_bvh=ma)
        return (o, d, thr, rad, alive), jnp.sum(alive.astype(jnp.int32))

    (o, d, thr, rad, alive), alive_per_bounce = jax.lax.scan(
        step, (o, d, thr, rad, alive), jnp.arange(DEPTH, dtype=jnp.int32))
    return rad.x.reshape(-1, n_pix).sum(axis=0), alive_per_bounce


key = jax.random.PRNGKey(0)
r, apb = jax.block_until_ready(chain(key))
t0 = time.perf_counter()
r, apb = jax.block_until_ready(chain(jax.random.PRNGKey(1)))
dt = time.perf_counter() - t0
print(f"chain total: {dt*1e3:.0f} ms ({dt*1e3/DEPTH:.1f} ms/bounce avg)",
      flush=True)
print("alive/bounce:", [f"{int(a)/1e6:.2f}M" for a in np.asarray(apb)],
      flush=True)

LOG = "/tmp/nr_chain_trace"
with jax.profiler.trace(LOG):
    jax.block_until_ready(chain(jax.random.PRNGKey(2)))

files = sorted(glob.glob(f"{LOG}/plugins/profile/*/*.trace.json.gz"))
if not files:
    sys.exit(0)
with gzip.open(files[-1], "rt") as fh:
    tr = json.load(fh)
events = tr.get("traceEvents", [])
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, nm_ in pids.items() if "TPU" in nm_}
occ = defaultdict(list)
fam = defaultdict(float)
for e in events:
    if e.get("ph") != "X" or (dev_pids and e.get("pid") not in dev_pids):
        continue
    name = e["name"]
    if name.startswith("run") or name.startswith("conditional"):
        occ[name.rstrip("0123456789.")].append((e["ts"], e["dur"]))
    fam[name.rstrip("0123456789.")] += e.get("dur", 0.0)
print("\n-- op families (total ms over one chain) --", flush=True)
for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:14]:
    print(f"  {dur/1e3:8.1f} ms  {name}", flush=True)
print("\n-- per-occurrence (ms), time-ordered --", flush=True)
for name, lst in occ.items():
    lst.sort()
    durs = [f"{d/1e3:.1f}" for _, d in lst]
    print(f"  {name} x{len(lst)}: {' '.join(durs)}", flush=True)
