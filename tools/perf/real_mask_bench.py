"""Pipe-vs-sweep split at REALISTIC bounce-wavefront mask fractions.

Random-direction microbenches give a 1.6% AABB-hit fraction; real bunny
bounces run 10-18% with hits pixel-scattered (~1 per 32x128 tile).  Here a
target fraction of rays is aimed AT the mesh box (interleaved per lane, so
hits stay scattered), the rest away, and t_dense is far — isolating how
much of the per-bounce cost is the compaction pipe vs genuine sweep work.

Usage: real_mask_bench.py [frac_percent]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.bvh import build_mesh_accel
from nrenderer_tpu.ops.mesh_pallas import (
    intersect_triangles_mesh, sweep_mesh_full)
from nrenderer_tpu.ops.pt_core import make_mat_channels, scene_epsilon
from nrenderer_tpu.ops.soa import V3

frac = (float(sys.argv[1]) if len(sys.argv) > 1 else 12.0) / 100.0

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
rng = np.random.default_rng(0)
# origins on the box walls-ish
o_np = np.stack([rng.uniform(-270, 270, N), rng.uniform(-270, 270, N),
                 rng.uniform(760, 1290, N)], 1).astype(np.float32)
# mesh box center (bunny)
center = np.array([40.0, -200.0, 920.0], np.float32)
to_mesh = center + rng.normal(0, 35, (N, 3)).astype(np.float32) - o_np
to_mesh /= np.linalg.norm(to_mesh, axis=1, keepdims=True)
away = rng.normal(0, 1, (N, 3)).astype(np.float32)
away /= np.linalg.norm(away, axis=1, keepdims=True)
# keep "away" rays genuinely away from the box
bad = (np.einsum("nd,nd->n", away, to_mesh) > 0.55)
away[bad] *= -1.0
aim = rng.random(N) < frac          # scattered per lane
d_np = np.where(aim[:, None], to_mesh, away)
o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
alive = jnp.ones((N,), jnp.bool_)
t_dense = jnp.full((N,), 5000.0)


def scanned(body):
    def outer(c0, *args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, c0, None, length=REP)
        return c
    return outer


def timeit(name, fn, *args):
    f = jax.jit(scanned(fn))
    r = f(jnp.float32(0), *args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(jnp.float32(1), *args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / REP * 1e3)
    print(f"{name}: {best:7.1f} ms/iter", flush=True)


# actual AABB fraction
mesh_min = ma.bt.bb_min.min(axis=0)
mesh_max = ma.bt.bb_max.max(axis=0)


def f_aabb(o, d, t_cap):
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


print(f"target frac {frac:.2f}, AABB-hit fraction "
      f"{float(jax.jit(f_aabb)(o, d, t_dense)):.4f}", flush=True)


def full_pipe(c, o, d, t_dense, alive):
    o2 = V3(o.x + c, o.y, o.z)
    out = intersect_triangles_mesh(ma, o2, d, t_min, t_dense, mat_ch,
                                   alive=alive)
    return c + out[0][0] * 0


n_hit = int(aim.sum())
n_cap = max(4096, (n_hit // 4096) * 4096)
sel = np.nonzero(aim)[0][:n_cap]   # host-side: the true compacted
o_c = o_np[sel]                    # population is ALL box-aimed rays
d_c = d_np[sel]
oc = V3(*(jnp.asarray(o_c[:, i]) for i in range(3)))
dc = V3(*(jnp.asarray(d_c[:, i]) for i in range(3)))
tc = jnp.full((n_cap,), 5000.0)


def sweep_only(c, o, d, tc):
    """The sweep alone on a cap-sized buffer of realistic rays (all live:
    upper bound of post-compaction sweep cost)."""
    o2 = V3(o.x + c, o.y, o.z)
    out = sweep_mesh_full(ma.bt, o2, d, t_min, t_cap=tc)
    return c + out[0][0] * 0


timeit("full pipe (shift pack + sweep + scatters)", full_pipe, o, d,
       t_dense, alive)
timeit(f"sweep only on cap buffer ({n_cap/1e6:.1f}M realistic rays)",
       sweep_only, oc, dc, tc)


def full_pipe_all(c, o, d, t_dense, alive):
    """DCE-proof: consumes every output."""
    o2 = V3(o.x + c, o.y, o.z)
    t, nx, ny, nz, mat, pid, ch = intersect_triangles_mesh(
        ma, o2, d, t_min, t_dense, mat_ch, alive=alive)
    acc = (jnp.where(jnp.isfinite(t), t, 0.0).sum() + nx.sum() + ny.sum()
           + nz.sum() + mat.sum() + pid.sum())
    return c + acc * 1e-20


from nrenderer_tpu.ops.compact import shift_pack_channels


def pack_only(c, o, d, t_dense, alive):
    o2 = V3(o.x + c, o.y, o.z)
    mm = jax.jit(f_aabb, static_argnums=())  # reuse slab math? no — inline
    # inline the same slab mask as the pipe
    def axis(mn, mx, oo, dd):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        return (jnp.minimum((mn - oo) * inv, (mx - oo) * inv),
                jnp.maximum((mn - oo) * inv, (mx - oo) * inv))
    nx0, nx1 = axis(mesh_min[0], mesh_max[0], o2.x, d.x)
    ny0, ny1 = axis(mesh_min[1], mesh_max[1], o2.y, d.y)
    nz0, nz1 = axis(mesh_min[2], mesh_max[2], o2.z, d.z)
    t_near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
    t_far = jnp.minimum(jnp.minimum(nx1, ny1), nz1)
    mk = ((t_near <= t_far) & (t_far >= t_min)
          & (jnp.maximum(t_near, t_min) < t_dense))
    packed, ridx, nh = shift_pack_channels(
        mk, (o2.x, o2.y, o2.z, d.x, d.y, d.z, t_dense), N // 4)
    return c + sum(p.sum() for p in packed) * 1e-20 + ridx[0] * 0.0


timeit("full pipe, ALL outputs consumed", full_pipe_all, o, d, t_dense,
       alive)
timeit("pack only (mask + shift pack)", pack_only, o, d, t_dense, alive)


# --- round-4 question: does entry-cell sorting fix the block-union
# saturation?  Sort the compacted population by quantized box-entry point
# and compare sweep cost sorted vs unsorted, plus the sort's own cost.
def entry_key(o, d):
    def axis(mn, mx, oo, dd):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        return (jnp.minimum((mn - oo) * inv, (mx - oo) * inv),
                jnp.maximum((mn - oo) * inv, (mx - oo) * inv))
    nx0, nx1 = axis(mesh_min[0], mesh_max[0], o.x, d.x)
    ny0, ny1 = axis(mesh_min[1], mesh_max[1], o.y, d.y)
    nz0, nz1 = axis(mesh_min[2], mesh_max[2], o.z, d.z)
    t_near = jnp.maximum(jnp.maximum(jnp.maximum(nx0, ny0), nz0), t_min)
    ex = o.x + t_near * d.x
    ey = o.y + t_near * d.y
    ez = o.z + t_near * d.z
    q = lambda v, mn, mx: jnp.clip(
        ((v - mn) / (mx - mn) * 8).astype(jnp.int32), 0, 7)
    cell = (q(ex, mesh_min[0], mesh_max[0]) * 64
            + q(ey, mesh_min[1], mesh_max[1]) * 8
            + q(ez, mesh_min[2], mesh_max[2]))
    # sub-key: entry direction octant for intra-cell coherence
    oct_ = ((d.x > 0).astype(jnp.int32) * 4 + (d.y > 0).astype(jnp.int32)
            * 2 + (d.z > 0).astype(jnp.int32))
    return cell * 8 + oct_


def sort_then_sweep(c, o, d, tc):
    o2 = V3(o.x + c, o.y, o.z)
    key = entry_key(o2, d)
    key, ox, oy, oz, dx, dy, dz, tcs = jax.lax.sort(
        (key, o2.x, o2.y, o2.z, d.x, d.y, d.z, tc), num_keys=1)
    out = sweep_mesh_full(ma.bt, V3(ox, oy, oz), V3(dx, dy, dz), t_min,
                          t_cap=tcs)
    return c + out[0][0] * 0


def sort_only(c, o, d, tc):
    o2 = V3(o.x + c, o.y, o.z)
    key = entry_key(o2, d)
    out = jax.lax.sort((key, o2.x, o2.y, o2.z, d.x, d.y, d.z, tc),
                       num_keys=1)
    return c + out[1][0] * 0


timeit(f"sort+sweep on cap buffer ({n_cap/1e6:.1f}M)", sort_then_sweep,
       oc, dc, tc)
timeit(f"sort only ({n_cap/1e6:.1f}M, 7 channels)", sort_only, oc, dc, tc)
