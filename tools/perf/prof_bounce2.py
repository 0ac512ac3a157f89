"""Per-bounce cost breakdown of the real AccPT mesh bounce at 8M rays.
Stages: dense-prim closest hit only; + mesh compaction path; full
bsdf_bounce; and a 20-bounce scan (amortized per bounce)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.intersect import (
    make_static_scene, intersect_scene_unrolled,
    intersect_area_lights_unrolled, T_MIN_PT)
from nrenderer_tpu.ops.bvh import build_mesh_accel
from nrenderer_tpu.ops.mesh_pallas import intersect_triangles_mesh
from nrenderer_tpu.ops.pt_core import (
    make_mat_channels, scene_epsilon, bsdf_bounce, closest_hit)
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
ones = jnp.ones((N,), jnp.float32)
zeros = jnp.zeros((N,), jnp.float32)
alive = jnp.ones((N,), jnp.bool_)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REP
    print(f"{name}: {dt*1e3:.1f} ms/iter", flush=True)


def scanned(body):
    def outer(c0, *args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, c0, None, length=REP)
        return c
    return outer


ss_nt = ss._replace(tri=[], tri_uv=())  # closest_hit strips tris for the
                                        # dense pass — do the same here, or
                                        # 5016 unrolled intersects trace


def dense_only(c, o, d):
    o2 = V3(o.x + c, o.y, o.z)
    hit = intersect_scene_unrolled(ss_nt, o2, d, t_min, mat_ch)
    return c + hit.t[0] * 0


def mesh_only(c, o, d, t_dense, alive):
    """The mesh compaction pipe standalone: t_dense is an INPUT, so XLA
    can't fuse/reschedule it with the dense intersect."""
    o2 = V3(o.x + c, o.y, o.z)
    out = intersect_triangles_mesh(ma, o2, d, t_min, t_dense, mat_ch,
                                   alive=alive)
    return c + out[0][0] * 0


def ch_full(c, o, d, alive):
    o2 = V3(o.x + c, o.y, o.z)
    hit = closest_hit(ss, o2, d, t_min, mat_ch, tri_bvh=ma, alive=alive)
    return c + hit.t[0] * 0


def bounce_full(c, o, d, alive):
    o2 = V3(o.x + c, o.y, o.z)
    thr = V3(ones, ones, ones)
    rad = V3(zeros, zeros, zeros)
    kb = jax.random.fold_in(key, 3)
    kk1, kk2, kk3 = jax.random.split(kb, 3)
    u1 = jax.random.uniform(kk1, (N,))
    u2 = jax.random.uniform(kk2, (N,))
    u3 = jax.random.uniform(kk3, (N,))
    o3, d3, thr3, rad3, alive3 = bsdf_bounce(
        ss, mat_ch, o2, d, thr, rad, alive, u1, u2, u3,
        t_min=t_min, tri_bvh=ma)
    return c + rad3.x[0] * 0


def bounce_chain(c, o, d):
    """20 real bounces carried (state evolves), amortized."""
    thr = V3(ones, ones, ones)
    rad = V3(zeros, zeros, zeros)
    av = jnp.ones((N,), jnp.bool_)
    oo = V3(o.x + c, o.y, o.z)
    dd = d

    def step(carry, b):
        oo, dd, thr, rad, av = carry
        kb = jax.random.fold_in(key, b)
        kk1, kk2, kk3 = jax.random.split(kb, 3)
        u1 = jax.random.uniform(kk1, (N,))
        u2 = jax.random.uniform(kk2, (N,))
        u3 = jax.random.uniform(kk3, (N,))
        return bsdf_bounce(ss, mat_ch, oo, dd, thr, rad, av, u1, u2, u3,
                           t_min=t_min, tri_bvh=ma), None

    (oo, dd, thr, rad, av), _ = jax.lax.scan(
        step, (oo, dd, thr, rad, av), jnp.arange(20, dtype=jnp.int32))
    return c + rad.x[0] * 0


def rng_only(c, o, d):
    kb = jax.random.fold_in(key, c.astype(jnp.int32))
    kk1, kk2, kk3 = jax.random.split(kb, 3)
    u1 = jax.random.uniform(kk1, (N,))
    u2 = jax.random.uniform(kk2, (N,))
    u3 = jax.random.uniform(kk3, (N,))
    return c + u1[0] + u2[0] + u3[0]


timeit("3x jax.random.uniform (8M)", scanned(rng_only), jnp.float32(0), o, d)
timeit("dense unrolled only (8M)", scanned(dense_only), jnp.float32(0), o, d)
t_dense = jnp.full((N,), 1e30, jnp.float32)
timeit("mesh pipe standalone (8M)", scanned(mesh_only), jnp.float32(0),
       o, d, t_dense, alive)
timeit("closest_hit dense+mesh (8M)", scanned(ch_full), jnp.float32(0),
       o, d, alive)
timeit("bsdf_bounce full (8M)", scanned(bounce_full), jnp.float32(0),
       o, d, alive)

f = jax.jit(bounce_chain)
r = f(jnp.float32(0), o, d)
jax.block_until_ready(r)
t0 = time.perf_counter()
r = f(jnp.float32(1), o, d)
jax.block_until_ready(r)
dt = time.perf_counter() - t0
print(f"20-bounce evolving chain: {dt:.2f}s = {dt/20*1e3:.1f} ms/bounce",
      flush=True)
