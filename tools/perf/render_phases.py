"""Whole-render phase attribution for the staged mesh wavefront.

The bunny-5k bounce-chain arithmetic (77 ms per 8M-ray bounce x ~82
equivalent steps ~= 6.3 s) explains only half of the measured 13.6 s
render.  This tool times each OUTER phase of `build_staged_wavefront_fn`
separately at the real shapes so the remainder is attributed, not
guessed: camera gen, one bounce per stage width, the RR shift pack,
the film scatter-add bank, and the dense reshape bank.

Usage: render_phases.py [size] [chunk_spp]   (defaults 500 64)
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
from nrenderer_tpu.ops.compact import shift_pack_channels
from nrenderer_tpu.ops.soa import V3

size = int(sys.argv[1]) if len(sys.argv) > 1 else 500
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 64

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
N = n_pix * chunk
print(f"N={N/1e6:.1f}M rays  n_pix={n_pix}  chunk={chunk}spp", flush=True)

jj = np.tile(np.tile(np.arange(size, dtype=np.float32), size), chunk)
ii = np.tile(np.repeat(np.arange(size, dtype=np.float32), size), chunk)


def bench(label, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))   # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label:42s} {dt:8.1f} ms", flush=True)
    return out


@jax.jit
def camera_gen(key):
    k_jx, k_jy = jax.random.split(key)
    rx = jax.random.uniform(k_jx, (N,), minval=-1.0, maxval=1.0)
    ry = jax.random.uniform(k_jy, (N,), minval=-1.0, maxval=1.0)
    o, d = shoot_v3(cam, (jnp.asarray(jj) + rx) / size,
                    (jnp.asarray(ii) + ry) / size)
    return o.x, o.y, o.z, d.x, d.y, d.z


key = jax.random.PRNGKey(0)
ox, oy, oz, dx, dy, dz = bench("camera gen (jitter+shoot)", camera_gen, key)


def make_bounce(n):
    @jax.jit
    def one_bounce(ox, oy, oz, dx, dy, dz, key):
        o = V3(ox[:n], oy[:n], oz[:n])
        d = V3(dx[:n], dy[:n], dz[:n])
        ones = jnp.ones((n,))
        thr = V3(ones, ones, ones)
        rad = V3(ones * 0, ones * 0, ones * 0)
        alive = jnp.ones((n,), jnp.bool_)
        ks = jax.random.split(key, 3)
        u1 = jax.random.uniform(ks[0], (n,))
        u2 = jax.random.uniform(ks[1], (n,))
        u3 = jax.random.uniform(ks[2], (n,))
        o, d, thr, rad, alive = bsdf_bounce(
            ss, mat_ch, o, d, thr, rad, alive, u1, u2, u3,
            t_min=t_min, tri_bvh=ma)
        return o.x[0] + d.x[0] + thr.x[0] + rad.x[0]
    return one_bounce


for n in (N, N // 2, N // 4, N // 8):
    bench(f"one bounce @ {n/1e6:5.1f}M", make_bounce(n),
          ox, oy, oz, dx, dy, dz, key)


def make_rr_pack(n, cap):
    @jax.jit
    def rr(ox, oy, oz, dx, dy, dz, key):
        o = V3(ox[:n], oy[:n], oz[:n])
        d = V3(dx[:n], dy[:n], dz[:n])
        ones = jnp.ones((n,))
        pix = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), n // n_pix)
        keep = jax.random.uniform(key, (n,)) < 0.45
        packed, _, n_keep = shift_pack_channels(
            keep, (o.x, o.y, o.z, d.x, d.y, d.z, ones, ones, ones,
                   pix), cap)
        return packed[0][0] + packed[9][-1].astype(jnp.float32) + n_keep
    return rr


bench(f"RR pack 10ch {N/1e6:.0f}M->/2", make_rr_pack(N, N // 2),
      ox, oy, oz, dx, dy, dz, key)
bench(f"RR pack 10ch {N/2e6:.0f}M->/2", make_rr_pack(N // 2, N // 4),
      ox, oy, oz, dx, dy, dz, key)


def make_film_bank(n):
    @jax.jit
    def bank(ox, key):
        pix = jax.random.randint(key, (n,), 0, n_pix)
        rad = ox[:n]
        f3 = jnp.zeros((n_pix, 3)).at[pix].add(
            jnp.stack([rad, rad, rad], axis=-1))
        return f3.sum()
    return bank


# scatter bank with REAL pix pattern: packed-sorted segments, not random
def make_film_bank_sorted(n):
    @jax.jit
    def bank(ox, key):
        per = n // chunk if n >= chunk else 1
        pix = jnp.tile(
            jnp.sort(jax.random.randint(key, (per,), 0, n_pix)), chunk)[:n]
        rad = ox[:n]
        f3 = jnp.zeros((n_pix, 3)).at[pix].add(
            jnp.stack([rad, rad, rad], axis=-1))
        return f3.sum()
    return bank


for n in (N // 2, N // 4, N // 8):
    bench(f"film scatter-add bank @ {n/1e6:4.1f}M random", make_film_bank(n),
          ox, key)
    bench(f"film scatter-add bank @ {n/1e6:4.1f}M sorted",
          make_film_bank_sorted(n), ox, key)


@jax.jit
def dense_bank(ox):
    return ox.reshape(-1, n_pix).sum(axis=0)


bench(f"dense reshape bank @ {N/1e6:.0f}M", dense_bank, ox)
