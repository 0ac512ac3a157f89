"""Profiler-trace the standalone mesh compaction pipe at 8M rays and rank
the device ops by total duration.  Answers WHERE intersect_triangles_mesh's
203 ms/bounce goes (pack? gathers? scatters? sweep?).

Writes the jax.profiler trace to /tmp/nr_trace_mesh, then parses the
TraceViewer JSON (plugins/profile/*/...trace.json.gz) and prints the top
ops by summed duration.
"""
import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.bvh import build_mesh_accel
from nrenderer_tpu.ops.mesh_pallas import intersect_triangles_mesh
from nrenderer_tpu.ops.pt_core import make_mat_channels, scene_epsilon
from nrenderer_tpu.ops.soa import V3

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

N = 8_000_000
REP = 10
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
ox = jax.random.uniform(k1, (N,), minval=50.0, maxval=500.0)
oy = jax.random.uniform(k2, (N,), minval=50.0, maxval=500.0)
oz = jax.random.uniform(k3, (N,), minval=300.0, maxval=900.0)
dv = jax.random.normal(k4, (N, 3))
dv = dv / jnp.linalg.norm(dv, axis=1, keepdims=True)
o = V3(ox, oy, oz)
d = V3(dv[:, 0], dv[:, 1], dv[:, 2])
alive = jnp.ones((N,), jnp.bool_)
# Realistic t_dense: most rays have a nearish dense hit (box walls), so the
# AABB mask lands in the compacted branch like real bounce wavefronts.
t_dense = jax.random.uniform(k4, (N,), minval=100.0, maxval=2000.0)


def mesh_only(c, o, d, t_dense, alive):
    o2 = V3(o.x + c, o.y, o.z)
    out = intersect_triangles_mesh(ma, o2, d, t_min, t_dense, mat_ch,
                                   alive=alive)
    return c + out[0][0] * 0


def scanned(body):
    def outer(c0, *args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, c0, None, length=REP)
        return c
    return outer


# report the AABB-hit fraction so we know which lax.cond branch ran
mesh_min = ma.bt.bb_min.min(axis=0)
mesh_max = ma.bt.bb_max.max(axis=0)


def frac(o, d, t_cap):
    def axis(mn, mx, oo, dd):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        return (jnp.minimum((mn - oo) * inv, (mx - oo) * inv),
                jnp.maximum((mn - oo) * inv, (mx - oo) * inv))

    nx0, nx1 = axis(mesh_min[0], mesh_max[0], o.x, d.x)
    ny0, ny1 = axis(mesh_min[1], mesh_max[1], o.y, d.y)
    nz0, nz1 = axis(mesh_min[2], mesh_max[2], o.z, d.z)
    t_near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
    t_far = jnp.minimum(jnp.minimum(nx1, ny1), nz1)
    mm = ((t_near <= t_far) & (t_far >= t_min)
          & (jnp.maximum(t_near, t_min) < t_cap))
    return jnp.mean(mm.astype(jnp.float32))


print(f"AABB-hit fraction: {float(jax.jit(frac)(o, d, t_dense)):.4f} "
      f"(cap fraction 1/8 = 0.125)", flush=True)

f = jax.jit(scanned(mesh_only))
r = f(jnp.float32(0), o, d, t_dense, alive)
jax.block_until_ready(r)
t0 = time.perf_counter()
r = f(jnp.float32(1), o, d, t_dense, alive)
jax.block_until_ready(r)
print(f"mesh pipe standalone: {(time.perf_counter()-t0)/REP*1e3:.1f} ms/iter",
      flush=True)

LOG = "/tmp/nr_trace_mesh"
with jax.profiler.trace(LOG):
    r = f(jnp.float32(2), o, d, t_dense, alive)
    jax.block_until_ready(r)

files = sorted(glob.glob(f"{LOG}/plugins/profile/*/*.trace.json.gz"))
print(f"trace files: {files}", flush=True)
if files:
    with gzip.open(files[-1], "rt") as fh:
        tr = json.load(fh)
    events = tr.get("traceEvents", [])
    # device-side complete events, grouped by op name
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
    print(f"\nprocesses: {pids}")
    print(f"total device event time: {total/1e3:.1f} ms "
          f"(REP={REP} iters)\n")
    for nm, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3/REP:8.2f} ms/iter x{cnt[nm]:4d}  {nm[:110]}")
