"""Profiler-trace ONE FULL staged-wavefront bounce (bsdf_bounce with the
Pallas mesh engine) at real bunny camera-ray shapes and rank device ops.

render_phases.py measured the bounce at 239.6 ms @16M rays while its
known parts (pipe ~93, dense ~7, sweep ~20, physics ~25) sum to ~150 —
this tool attributes the remaining ~90 ms to actual device ops.

Usage: trace_bounce.py [n_million] (default 16)
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
REP = 5

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
print(f"N={N/1e6:.2f}M rays", flush=True)

jj = np.tile(np.tile(np.arange(size, dtype=np.float32), size), chunk)
ii = np.tile(np.repeat(np.arange(size, dtype=np.float32), size), chunk)


@jax.jit
def camera_gen(key):
    k_jx, k_jy = jax.random.split(key)
    rx = jax.random.uniform(k_jx, (N,), minval=-1.0, maxval=1.0)
    ry = jax.random.uniform(k_jy, (N,), minval=-1.0, maxval=1.0)
    o, d = shoot_v3(cam, (jnp.asarray(jj) + rx) / size,
                    (jnp.asarray(ii) + ry) / size)
    return o.x, o.y, o.z, d.x, d.y, d.z


key = jax.random.PRNGKey(0)
ox, oy, oz, dx, dy, dz = jax.block_until_ready(camera_gen(key))


def bounce_body(c, ox, oy, oz, dx, dy, dz, key):
    o = V3(ox + c, oy, oz)
    d = V3(dx, dy, dz)
    ones = jnp.ones((N,))
    thr = V3(ones, ones, ones)
    rad = V3(ones * 0, ones * 0, ones * 0)
    alive = jnp.ones((N,), jnp.bool_)
    ks = jax.random.split(key, 3)
    u1 = jax.random.uniform(ks[0], (N,))
    u2 = jax.random.uniform(ks[1], (N,))
    u3 = jax.random.uniform(ks[2], (N,))
    o, d, thr, rad, alive = bsdf_bounce(
        ss, mat_ch, o, d, thr, rad, alive, u1, u2, u3,
        t_min=t_min, tri_bvh=ma)
    return c + o.x[0] * 0 + d.x[0] * 0 + thr.x[0] * 0 + rad.x[0] * 0


def scanned(body):
    def outer(c0, *args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, c0, None, length=REP)
        return c
    return outer


f = jax.jit(scanned(bounce_body))
r = jax.block_until_ready(f(jnp.float32(0), ox, oy, oz, dx, dy, dz, key))
t0 = time.perf_counter()
r = jax.block_until_ready(f(jnp.float32(1), ox, oy, oz, dx, dy, dz, key))
print(f"full bounce: {(time.perf_counter()-t0)/REP*1e3:.1f} ms/iter",
      flush=True)

LOG = "/tmp/nr_trace_bounce"
with jax.profiler.trace(LOG):
    r = f(jnp.float32(2), ox, oy, oz, dx, dy, dz, key)
    jax.block_until_ready(r)

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
    dev_pids = {p for p, nm_ in pids.items()
                if "TPU" in nm_ or "/device" in nm_.lower() or "XLA" in nm_}
    print(f"processes: {pids}", flush=True)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        by_name[e["name"]] += e.get("dur", 0.0)
        cnt[e["name"]] += 1
        total += e.get("dur", 0.0)
    print(f"total device event time: {total/1e3:.1f} ms (REP={REP} iters)\n",
          flush=True)
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    # aggregate families: strip trailing .NN indices
    fam = defaultdict(float)
    famc = defaultdict(int)
    for name, dur in by_name.items():
        base = name.rstrip("0123456789.")
        fam[base] += dur
        famc[base] += cnt[name]
    print("-- by op family --", flush=True)
    for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/1e3/REP:8.2f} ms/iter x{famc[name]:5d}  {name}",
              flush=True)
    print("\n-- top individual ops --", flush=True)
    for name, dur in rows[:30]:
        print(f"  {dur/1e3/REP:8.2f} ms/iter x{cnt[name]:4d}  {name}",
              flush=True)
