"""Environment-map lighting tests (a declared-but-unimplemented reference
capability — `Ambient::ENVIROMENT_MAP`, SURVEY.md §2.2 — implemented here)."""
import numpy as np
import pytest

import jax.numpy as jnp

import nrenderer_tpu
from nrenderer_tpu import AmbientType, Texture, load_scn
from nrenderer_tpu.ops.env import sample_env_map_v3
from nrenderer_tpu.ops.soa import V3

nrenderer_tpu._register_builtin_renderers()


def test_equirect_lookup_directions():
    env = np.zeros((2, 4, 3), np.float32)
    env[0, :, :] = [1, 0, 0]   # top hemisphere red
    env[1, :, :] = [0, 1, 0]   # bottom green
    up = V3(jnp.asarray([0.0]), jnp.asarray([1.0]), jnp.asarray([0.0]))
    down = V3(jnp.asarray([0.0]), jnp.asarray([-1.0]), jnp.asarray([0.0]))
    cu = sample_env_map_v3(jnp.asarray(env), up)
    cd = sample_env_map_v3(jnp.asarray(env), down)
    assert float(cu.x[0]) == 1.0 and float(cu.y[0]) == 0.0
    assert float(cd.y[0]) == 1.0 and float(cd.x[0]) == 0.0


def test_env_map_render_lights_the_scene(resource_dir):
    from nrenderer_tpu.renderers.acc_pt import AccPathTracerRenderer
    scene = load_scn(str(resource_dir / "env_map_spheres.scn"))
    env = np.full((8, 16, 4), 0.8, np.float32)
    scene.ambient.environment_map = len(scene.textures)
    scene.textures.append(Texture(name="env", pixels=env))
    scene.ambient.type = AmbientType.ENVIRONMENT_MAP
    ro = scene.render_option
    ro.width = ro.height = 24
    ro.samples_per_pixel = 8
    ro.depth = 4
    img = AccPathTracerRenderer().render(scene).pixels[..., :3]
    assert np.isfinite(img).all()
    # a uniform 0.8 environment lights everything; background ~sqrt(0.8)
    corner = img[1:4, 1:4].mean()
    assert corner > 0.6
    # without the map, the scene is black (no lights at all)
    scene.ambient.type = AmbientType.CONSTANT
    scene.ambient.environment_map = -1
    img2 = AccPathTracerRenderer().render(scene).pixels[..., :3]
    assert img2.max() == 0.0
