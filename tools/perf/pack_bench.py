"""Time the standalone mesh compaction pipe at 8M rays under both pack
engines (NR_MESH_PACK=shift vs scatter) on the real chip.

The pipe's cost is all data movement around the Pallas sweep (the sweep
itself is ~1 ms; see tools/perf/trace_mesh.py): the scatter pack pays
cumsum-scatter + 7 per-element gathers + 6 scatter-backs at TPU
gather/scatter speed (~140M elem/s); the shift pack replaces the pack +
gathers with ~23 roll+select streaming passes.
"""
import os
import time

import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.bvh import build_mesh_accel
import nrenderer_tpu.ops.mesh_pallas as mp
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
t_dense = jax.random.uniform(k4, (N,), minval=100.0, maxval=2000.0)


def scanned(body):
    def outer(c0, *args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, c0, None, length=REP)
        return c
    return outer


def run_mode(mode):
    os.environ["NR_MESH_PACK"] = mode

    def mesh_only(c, o, d, t_dense, alive):
        o2 = V3(o.x + c, o.y, o.z)
        out = mp.intersect_triangles_mesh(ma, o2, d, t_min, t_dense,
                                          mat_ch, alive=alive)
        return c + out[0][0] * 0

    f = jax.jit(scanned(mesh_only))
    r = f(jnp.float32(0), o, d, t_dense, alive)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(jnp.float32(1), o, d, t_dense, alive)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / REP * 1e3)
    print(f"pack={mode:8s}: {best:7.1f} ms/iter at {N/1e6:.0f}M rays",
          flush=True)
    return best


a = run_mode("scatter")
b = run_mode("shift")
print(f"speedup: {a/b:.2f}x", flush=True)
