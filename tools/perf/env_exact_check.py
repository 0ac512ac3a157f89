"""Quick CPU check: in-kernel exact bounce-0 env patches vs the XLA
primary pass (NR_ENV_EXACT0=0 fallback).  Run with JAX_PLATFORMS=cpu."""
import os
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from jax.experimental.pallas import tpu as pltpu

from nrenderer_tpu import AmbientType, Texture, load_scn, build_scene_arrays
from nrenderer_tpu.ops.camera import make_camera
from nrenderer_tpu.ops.intersect import make_static_scene
from nrenderer_tpu.ops import pt_pallas

RES = "/root/reference/resource"
scene = load_scn(f"{RES}/env_map_spheres.scn")
rng = np.random.default_rng(0)
env = rng.uniform(0.0, 2.0, (64, 128, 3)).astype(np.float32)
scene.ambient.environment_map = len(scene.textures)
scene.textures.append(Texture(name="env", pixels=env))
scene.ambient.type = AmbientType.ENVIRONMENT_MAP
arr = build_scene_arrays(scene)
ss = make_static_scene(arr)
cam = make_camera(scene.camera)
W = H = 32
SPP = 4
DEPTH = 3

ct = pt_pallas._camera_tuple(cam)
key, arrs = pt_pallas._env_exact_args(arr.env_map, ct, W, H)
print("env_exact key:", key)
assert key is not None, "patch build fell back — footprint check failed"

with pltpu.force_tpu_interpret_mode():
    img_exact = np.asarray(pt_pallas.render_bsdf_pt_pallas(
        ss, cam, W, H, SPP, DEPTH, seed=3, env_map=arr.env_map))

os.environ["NR_ENV_EXACT0"] = "0"
pt_pallas._ENV_PATCH_CACHE.clear()
pt_pallas._build_pallas_pt.cache_clear()
with pltpu.force_tpu_interpret_mode():
    img_fallback = np.asarray(pt_pallas.render_bsdf_pt_pallas(
        ss, cam, W, H, SPP, DEPTH, seed=3, env_map=arr.env_map))

diff = np.abs(img_exact - img_fallback)
print(f"max diff {diff.max():.6f}  mean diff {diff.mean():.6f}  "
      f"means {img_exact.mean():.5f} vs {img_fallback.mean():.5f}")
assert diff.max() < 5e-3, "exact-patch path diverges from XLA primary pass"
print("OK")
