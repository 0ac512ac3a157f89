"""Row-clustering statistics of the REAL mesh-AABB masks, per bounce.

The pack/unpack of the mesh compaction pipe moves every channel through
~23 staged shift passes (log-shift compaction) — ~81 ms of the ~160 ms
bounce at 8M rays.  If the live mask is ROW-clustered (live rays sharing
their 128-lane rows), a row-granular pack — gather whole (128,) rows by a
row index list — reads each channel ONCE and turns the pack into a few ms.
This tool replays the real bunny bounce evolution and reports, per bounce:

  elem%   — live-element fraction (AABB-hitting rays)
  row%    — fraction of 128-lane rows with >= 1 live ray
  occ     — mean live lanes per LIVE row (128 = perfectly clustered)

row% close to elem% (occ near 128) => row packing carries ~no overhead and
the sweep does the same work; row% >> elem% (occ ~ 1) => rows are wasted
and only element packing works.

Usage: mask_row_stats.py [size] [spp]
"""
import sys
import time

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

size = int(sys.argv[1]) if len(sys.argv) > 1 else 500
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8

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

n_pix = size * size
N = n_pix * spp
key = jax.random.PRNGKey(0)

mesh_min = ma.bt.bb_min.min(axis=0)
mesh_max = ma.bt.bb_max.max(axis=0)


@jax.jit
def camera_rays(key):
    jj = jnp.tile(jnp.tile(jnp.arange(size, dtype=jnp.float32), size), spp)
    ii = jnp.tile(jnp.repeat(jnp.arange(size, dtype=jnp.float32), size), spp)
    k_jx, k_jy = jax.random.split(key)
    rx = jax.random.uniform(k_jx, (N,), minval=-1.0, maxval=1.0)
    ry = jax.random.uniform(k_jy, (N,), minval=-1.0, maxval=1.0)
    return shoot_v3(cam, (jj + rx) / size, (ii + ry) / size)


@jax.jit
def aabb_mask(o, d, alive):
    t_cap = jnp.where(alive, 1e30, 0.0)

    def axis(mn, mx, oo, dd):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        return (jnp.minimum((mn - oo) * inv, (mx - oo) * inv),
                jnp.maximum((mn - oo) * inv, (mx - oo) * inv))

    nx0, nx1 = axis(mesh_min[0], mesh_max[0], o.x, d.x)
    ny0, ny1 = axis(mesh_min[1], mesh_max[1], o.y, d.y)
    nz0, nz1 = axis(mesh_min[2], mesh_max[2], o.z, d.z)
    t_near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
    t_far = jnp.minimum(jnp.minimum(nx1, ny1), nz1)
    return ((t_near <= t_far) & (t_far >= t_min)
            & (jnp.maximum(t_near, t_min) < t_cap))


@jax.jit
def mask_stats(m):
    nm = m.shape[0]
    elem = jnp.mean(m.astype(jnp.float32))
    rows = m.reshape(nm // 128, 128)
    row_live = jnp.any(rows, axis=1)
    rowf = jnp.mean(row_live.astype(jnp.float32))
    occ = (jnp.sum(m.astype(jnp.float32))
           / jnp.maximum(jnp.sum(row_live.astype(jnp.float32)), 1.0))
    n1k = (nm // 1024) * 1024
    r1k = m[:n1k].reshape(-1, 1024)
    r1kf = jnp.mean(jnp.any(r1k, axis=1).astype(jnp.float32))
    return elem, rowf, occ, r1kf


@jax.jit
def one_bounce(o, d, thr, rad, alive, kb):
    k1, k2, k3 = jax.random.split(kb, 3)
    u1 = jax.random.uniform(k1, (N,))
    u2 = jax.random.uniform(k2, (N,))
    u3 = jax.random.uniform(k3, (N,))
    return bsdf_bounce(ss, mat_ch, o, d, thr, rad, alive, u1, u2, u3,
                       t_min=t_min, tri_bvh=ma)


o, d = camera_rays(key)
ones = jnp.ones((N,), jnp.float32)
zeros = jnp.zeros((N,), jnp.float32)
thr, rad = V3(ones, ones, ones), V3(zeros, zeros, zeros)
alive = jnp.ones((N,), jnp.bool_)

print(f"bunny-5k {size}x{size} {spp}spp, N={N/1e6:.1f}M rays", flush=True)
print("bounce  alive%   elem%    row%   occ/128  1k-row%")
for b in range(20):
    mk = aabb_mask(o, d, alive)
    elem, rowf, occ, r1kf = (float(x) for x in mask_stats(mk))
    av = float(jnp.mean(alive.astype(jnp.float32)))
    print(f"{b:4d}   {av*100:6.2f}  {elem*100:6.2f}  {rowf*100:6.2f}"
          f"  {occ:7.1f}  {r1kf*100:6.2f}", flush=True)
    o, d, thr, rad, alive = one_bounce(o, d, thr, rad, alive,
                                       jax.random.fold_in(key, b))

# --- row gather/scatter throughput at pack-relevant sizes ---------------
print("\nrow gather/scatter microbench (f32, 128-lane rows):", flush=True)
REP = 10
for n_rows_src, n_rows_dst in ((65536, 16384), (131072, 32768)):
    src = jnp.arange(n_rows_src * 128, dtype=jnp.float32).reshape(-1, 128)
    ridx = jnp.sort(jax.random.randint(
        key, (n_rows_dst,), 0, n_rows_src, dtype=jnp.int32))

    def g(c, src, ridx):
        def body(c, _):
            return (c + jnp.take(src + c, ridx, axis=0,
                                 mode="clip")[0, 0] * 0, None)
        return jax.lax.scan(body, c, None, length=REP)[0]

    def s(c, src, ridx):
        dst = jnp.zeros((n_rows_src, 128), jnp.float32)

        def body(c, _):
            r = dst.at[ridx].set(src[:n_rows_dst] + c, mode="drop",
                                 unique_indices=True,
                                 indices_are_sorted=True)
            return c + r[0, 0] * 0, None
        return jax.lax.scan(body, c, None, length=REP)[0]

    for name, fn in (("gather", g), ("scatter", s)):
        f = jax.jit(fn)
        jax.block_until_ready(f(jnp.float32(0), src, ridx))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.float32(1), src, ridx))
            best = min(best, (time.perf_counter() - t0) / REP)
        mb = n_rows_dst * 128 * 4 / 1e6
        print(f"  {name} {n_rows_dst} rows from {n_rows_src}: "
              f"{best*1e3:6.2f} ms  ({mb/best/1e3:.1f} GB/s moved)",
              flush=True)
