"""Per-bounce mesh-AABB hit counts on a real chain — sizes the mesh
compaction cap and the sort window (how many packed slots are live when
the entry-cell sort runs).

Usage: aabb_counts.py [n_million] [depth]
"""
import sys
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

jj = np.tile(np.tile(np.arange(size, dtype=np.float32), size), chunk)
ii = np.tile(np.repeat(np.arange(size, dtype=np.float32), size), chunk)

mesh_min = np.asarray(ma.bt.bb_min).min(axis=0)
mesh_max = np.asarray(ma.bt.bb_max).max(axis=0)


def aabb_hits(o, d, alive):
    def axis(mn, mx, oo, dd):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        t0 = (mn - oo) * inv
        t1 = (mx - oo) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    nx0, nx1 = axis(mesh_min[0], mesh_max[0], o.x, d.x)
    ny0, ny1 = axis(mesh_min[1], mesh_max[1], o.y, d.y)
    nz0, nz1 = axis(mesh_min[2], mesh_max[2], o.z, d.z)
    t_near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
    t_far = jnp.minimum(jnp.minimum(nx1, ny1), nz1)
    m = (t_near <= t_far) & (t_far >= t_min) & alive
    return jnp.sum(m.astype(jnp.int32))


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
        hits = aabb_hits(o, d, alive)  # hits BEFORE this bounce's sweep
        kb = jax.random.fold_in(k_path, b)
        ks = jax.random.split(kb, 3)
        u1 = jax.random.uniform(ks[0], (N,))
        u2 = jax.random.uniform(ks[1], (N,))
        u3 = jax.random.uniform(ks[2], (N,))
        o, d, thr, rad, alive = bsdf_bounce(
            ss, mat_ch, o, d, thr, rad, alive, u1, u2, u3,
            t_min=t_min, tri_bvh=ma)
        return (o, d, thr, rad, alive), (hits,
                                         jnp.sum(alive.astype(jnp.int32)))

    _, (hits, alive_n) = jax.lax.scan(
        step, (o, d, thr, rad, alive), jnp.arange(DEPTH, dtype=jnp.int32))
    return hits, alive_n


hits, alive_n = jax.block_until_ready(chain(jax.random.PRNGKey(1)))
hits, alive_n = np.asarray(hits), np.asarray(alive_n)
cap = N // 4
print(f"N={N/1e6:.1f}M cap=N/4={cap/1e6:.2f}M")
for b in range(DEPTH):
    print(f"bounce {b:2d}: aabb-hits {hits[b]/1e6:7.3f}M "
          f"({hits[b]/cap*100:5.1f}% of cap)  alive-after "
          f"{alive_n[b]/1e6:6.2f}M")
