"""env_map_spheres 512x512 1024spp depth8: kernel vs exact bounce-0 pass.
VERDICT r2 #10: find which side of the split dominates the 6.74 s."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, build_scene_arrays
from nrenderer_tpu.io.image import load_image
from nrenderer_tpu.scene.model import AmbientType, Texture
from nrenderer_tpu.ops.camera import make_camera
from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
from nrenderer_tpu.ops.pt_core import scene_epsilon
from nrenderer_tpu.ops.pt_pallas import (
    ENV_ROWS, _build_env_primary, _build_pallas_pt, _camera_tuple,
    _env_tabs, _hashable_static_scene, render_bsdf_pt_pallas)

RES = "/root/reference/resource"
scene = load_scn(f"{RES}/env_map_spheres.scn")
px = load_image(f"{RES}/textures/wallhaven-8o77d1.jpg")
scene.ambient.environment_map = len(scene.textures)
scene.textures.append(Texture(name="env", pixels=px))
scene.ambient.type = AmbientType.ENVIRONMENT_MAP
arr = build_scene_arrays(scene)
ss = make_static_scene(arr)
cam = make_camera(scene.camera)
W = H = 512
SPP = 1024
DEPTH = 8
t_min = scene_epsilon(ss, T_MIN_PT)
hs = _hashable_static_scene(ss)
ct = _camera_tuple(cam)

# full end-to-end
img = np.asarray(render_bsdf_pt_pallas(ss, cam, W, H, SPP, DEPTH, seed=0,
                                       env_map=arr.env_map))
t0 = time.perf_counter()
img = np.asarray(render_bsdf_pt_pallas(ss, cam, W, H, SPP, DEPTH, seed=1,
                                       env_map=arr.env_map))
full = time.perf_counter() - t0
print(f"full end-to-end: {full:.2f}s ({SPP/full:.0f} spp/s)", flush=True)

# kernel only
run = _build_pallas_pt(hs, ct, W, H, SPP, DEPTH, t_min, bsdf=True,
                       linear=True, env_rows=ENV_ROWS, n_tex=0)
tabs = _env_tabs(arr.env_map)
f = lambda s: jax.block_until_ready(run(jnp.asarray([s], jnp.int32), *tabs))
f(0)
t0 = time.perf_counter(); f(1); kt = time.perf_counter() - t0
print(f"kernel only: {kt:.2f}s", flush=True)

# primary pass only
prim = _build_env_primary(hs, ct, W, H, SPP, t_min)
em = jnp.asarray(arr.env_map)
g = lambda s: jax.block_until_ready(prim(jnp.int32(s), em))
g(0)
t0 = time.perf_counter(); g(1); pt_ = time.perf_counter() - t0
print(f"primary env pass only: {pt_:.2f}s", flush=True)
