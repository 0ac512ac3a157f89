"""A/B the mesh-sweep knobs on a REAL 20-bounce chain in ONE process.

Each config re-traces the chain with its NR_* env settings (all are read
at trace/build time), so the pool claim and process startup are paid
once.  Timings are steady-state (one warm run, then timed runs).

Usage: mesh_ab.py [n_million] [depth] [config ...]
  config = comma-separated k=v pairs, e.g. SUBBLK=32,BLOCK=64
  default configs: SUBBLK=0 / SUBBLK=32 / SUBBLK=16 / SUBBLK=32,BLOCK=64
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import nrenderer_tpu
nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu.utils.device_warm import warm_device_async
warm_device_async()
from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
from nrenderer_tpu.ops.camera import make_camera, shoot_v3
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.bvh import build_mesh_accel
from nrenderer_tpu.ops.pt_core import (
    make_mat_channels, scene_epsilon, bsdf_bounce)
from nrenderer_tpu.ops.soa import V3

nm = float(sys.argv[1]) if len(sys.argv) > 1 else 16
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 20
configs = sys.argv[3:] or ["SUBBLK=0", "SUBBLK=32", "SUBBLK=16",
                           "SUBBLK=32,BLOCK=64"]

RES = "/root/reference/resource"
scene = load_scn(f"{RES}/path_tracing_cornel.scn")
load_obj(f"{RES}/obj/bunny_5k_faces.obj", scene, material=0)
m = scene.models[-1]
m.scale = (600.0,) * 3
m.translation = (40.0, -305.0, 920.0)
arr = build_scene_arrays(scene)
ss = make_static_scene(arr)
mat_ch = make_mat_channels(ss)
t_min = scene_epsilon(ss, T_MIN_PT)
cam = make_camera(scene.camera)

size = 500
n_pix = size * size
N = int(nm * 1e6) // n_pix * n_pix
chunk = N // n_pix
print(f"N={N/1e6:.2f}M rays depth={DEPTH}", flush=True)

jj = np.tile(np.tile(np.arange(size, dtype=np.float32), size), chunk)
ii = np.tile(np.repeat(np.arange(size, dtype=np.float32), size), chunk)

ref_sum = None
for cfg in configs:
    # apply env
    kvs = [kv.split("=") for kv in cfg.split(",") if kv]
    saved = {}
    for k, v in kvs:
        env = f"NR_MESH_{k}"
        saved[env] = os.environ.get(env)
        os.environ[env] = v
    ma = build_mesh_accel(arr, mat_ch)

    @jax.jit
    def chain(key, ma=ma):
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
            return (o, d, thr, rad, alive), None

        (o, d, thr, rad, alive), _ = jax.lax.scan(
            step, (o, d, thr, rad, alive), jnp.arange(DEPTH, dtype=jnp.int32))
        return rad.x.reshape(-1, n_pix).sum(axis=0)

    t0 = time.perf_counter()
    r = jax.block_until_ready(chain(jax.random.PRNGKey(1)))
    t_compile = time.perf_counter() - t0
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        r = jax.block_until_ready(chain(jax.random.PRNGKey(1)))
        times.append(time.perf_counter() - t0)
    s = float(np.asarray(r).sum())
    tag = "SUM-MATCH" if (ref_sum is None or abs(s - ref_sum) < 1e-3 * abs(
        ref_sum)) else f"SUM-DIFFERS ({s} vs {ref_sum})"
    if ref_sum is None:
        ref_sum = s
    best = min(times)
    print(f"{cfg:28s} chain {best*1e3:7.0f} ms "
          f"({best*1e3/DEPTH:5.1f} ms/bounce) compile+claim {t_compile:5.0f}s "
          f"{tag}", flush=True)
    # restore env
    for env, old in saved.items():
        if old is None:
            os.environ.pop(env, None)
        else:
            os.environ[env] = old
