"""Primary-env-pass breakdown: camera+intersect vs index math vs gather.
env_prof2 found the exact bounce-0 pass = 5.81 s of the 7.49 s total;
this splits that 5.81 s."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, build_scene_arrays
from nrenderer_tpu.io.image import load_image
from nrenderer_tpu.scene.model import AmbientType, Texture
from nrenderer_tpu.ops.camera import make_camera
from nrenderer_tpu.ops.intersect import (
    make_static_scene, T_MIN_PT, intersect_scene_unrolled,
    intersect_area_lights_unrolled)
from nrenderer_tpu.ops.pt_core import scene_epsilon, hash_uniform
from nrenderer_tpu.ops.soa import V3, normalize3

RES = "/root/reference/resource"
scene = load_scn(f"{RES}/env_map_spheres.scn")
px = load_image(f"{RES}/textures/wallhaven-8o77d1.jpg")
scene.ambient.environment_map = len(scene.textures)
scene.textures.append(Texture(name="env", pixels=px))
scene.ambient.type = AmbientType.ENVIRONMENT_MAP
arr = build_scene_arrays(scene)
ss = make_static_scene(arr)
cam = make_camera(scene.camera)
t_min = float(scene_epsilon(ss, T_MIN_PT))
env = jnp.asarray(arr.env_map)
he, we = env.shape[0], env.shape[1]
print(f"env map: {he}x{we}", flush=True)

N = 1 << 21  # one scan step's worth of rays
key = jax.random.key(0)
kx, ky, kz = jax.random.split(key, 3)
dx = jax.random.normal(kx, (N,), jnp.float32)
dy = jax.random.normal(ky, (N,), jnp.float32)
dz = jax.random.normal(kz, (N,), jnp.float32)
o = V3(jnp.zeros((N,)), jnp.zeros((N,)), jnp.zeros((N,)))
d = normalize3(V3(dx, dy, dz))
d = jax.block_until_ready(jax.tree.map(lambda a: a, d))

def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return r

@jax.jit
def f_intersect(o, d):
    hit = intersect_scene_unrolled(ss, o, d, t_min=t_min)
    t_l, _ = intersect_area_lights_unrolled(ss, o, d, t_min=t_min)
    miss = ~(hit.valid & (hit.t < t_l)) & ~jnp.isfinite(t_l)
    return miss

@jax.jit
def f_index(d):
    dn = normalize3(d, eps=1e-12)
    u = 0.5 + jnp.arctan2(dn.z, dn.x) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(dn.y, -1.0, 1.0)) / jnp.pi
    x = jnp.clip((u * we).astype(jnp.int32), 0, we - 1)
    y = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    return y * we + x

@jax.jit
def f_gather(env, idx):
    flat = env.reshape(-1, 3)
    return (jnp.take(flat[:, 0], idx, mode="clip")
            + jnp.take(flat[:, 1], idx, mode="clip")
            + jnp.take(flat[:, 2], idx, mode="clip"))

@jax.jit
def f_gather_sorted(env, idx):
    flat = env.reshape(-1, 3)
    si = jnp.sort(idx)
    return (jnp.take(flat[:, 0], si, mode="clip")
            + jnp.take(flat[:, 1], si, mode="clip")
            + jnp.take(flat[:, 2], si, mode="clip"))

@jax.jit
def f_gather_planar(envp, idx):
    # (3, He*We) planes instead of (He*We, 3) columns
    return (jnp.take(envp[0], idx, mode="clip")
            + jnp.take(envp[1], idx, mode="clip")
            + jnp.take(envp[2], idx, mode="clip"))

timeit("intersect+miss (2M rays)", f_intersect, o, d)
idx = timeit("index math (2M)", f_index, d)
timeit("gather 3ch from %dk texels (2M)" % (he * we // 1000), f_gather,
       env, idx)
envp = jnp.asarray(np.asarray(arr.env_map).reshape(-1, 3).T.copy())
timeit("gather planar (2M)", f_gather_planar, envp, idx)
timeit("gather sorted-idx (2M)", f_gather_sorted, env, idx)
# monotone pixel-order indices (what the real pass sees)
idx2 = jnp.sort(idx)
timeit("gather presorted input (2M)", f_gather, env, idx2)
