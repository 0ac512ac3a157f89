"""Pin down the mesh sweep's FIXED cost (VERDICT r3 #2): ~28 ms per
pallas_call was measured even with every tile skipped (n_valid=0).

Hypotheses:
  H1 per-call launch overhead (constant in n)          -> same ms at all n
  H2 per-TILE overhead (DMA issue latency per grid
     step: 13 separate block copies/tile)              -> ms linear in n
  H3 XLA-side prep (pad/reshape/where) dominates       -> trace shows fusions

Measures sweep_mesh_full with n_valid=0 (all tiles skip the block loop) at
1M/2M/4M/8M rays, then n_valid=n for scale, REP=20 inside one scan so the
relay's per-execution cost is amortized away.
"""
import time

import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.bvh import build_mesh_accel
from nrenderer_tpu.ops.mesh_pallas import sweep_mesh_full
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
t_min = float(scene_epsilon(ss, T_MIN_PT))

REP = 20


def bench(n, n_valid, label):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    o = V3(jax.random.uniform(k1, (n,), minval=50.0, maxval=500.0),
           jax.random.uniform(k2, (n,), minval=50.0, maxval=500.0),
           jax.random.uniform(k3, (n,), minval=300.0, maxval=900.0))
    dv = jax.random.normal(k4, (n, 3))
    dv = dv / jnp.linalg.norm(dv, axis=1, keepdims=True)
    d = V3(dv[:, 0], dv[:, 1], dv[:, 2])
    tcap = jnp.full((n,), jnp.float32(1e9))

    @jax.jit
    def run(c, ox):
        def step(c, _):
            t, idx, *_ = sweep_mesh_full(
                ma.bt, V3(ox + c, o.y, o.z), d, t_min, t_cap=tcap,
                n_valid=jnp.int32(n_valid))
            return c + t[0] * 0, None
        c, _ = jax.lax.scan(step, c, None, length=REP)
        return c

    r = run(jnp.float32(0), o.x); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(jnp.float32(1), o.x); jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / REP * 1e3)
    tiles = n // 4096
    print(f"{label:24s} n={n>>20:2d}M tiles={tiles:5d} "
          f"{best:7.2f} ms/call  {best/tiles*1e3:6.2f} us/tile", flush=True)


for n in (1 << 20, 2 << 20, 4 << 20, 8 << 20):
    bench(n, 0, "skip-all (n_valid=0)")
for n in (2 << 20, 8 << 20):
    bench(n, n, "full (n_valid=n)")
