"""RayCast renderer: single-bounce Phong/Lambert direct lighting.

Rebuild of the ray_cast plugin (`components/ray_cast/src/RayCastRenderer.cpp`):
one hard-coded point light (`pointLightBuffer[0]`), a shadow ray with
epsilon 0.01, Phong/Lambert shading by material type {0: Lambertian,
1: Phong} (`ray_cast/include/shaders/ShaderCreator.hpp:15-30`), clamp +
sqrt gamma, and the bottom-up pixel write folded into a final flip.

TPU-native design: the whole image is ONE jitted batch — primary rays, the
dense closest-hit, the shadow-ray pass, and branchless material shading all
evaluate as (H*W)-wide SoA ops; there is no per-pixel loop."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import CameraParams, make_camera, shoot
from ..ops.intersect import T_MIN_RAYCAST, intersect_scene
from ..ops.vecmath import dot, normalize, reflect
from ..scene.arrays import (
    MAT_DIFFUSE, MAT_SPECULAR, MAT_SPECULAR_EX, SceneArrays,
    build_scene_arrays,
)
from ..scene.model import Scene
from ..server.component import RenderComponent, RenderResult
from ..server.registry import register_renderer


@partial(jax.jit, static_argnums=(2, 3))
def render_raycast(scene: SceneArrays, cam: CameraParams,
                   width: int, height: int) -> jnp.ndarray:
    """Returns an (H, W, 3) image, row 0 = BOTTOM (caller flips)."""
    jj, ii = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                          jnp.arange(height, dtype=jnp.float32))
    s = (jj / width).reshape(-1)
    t = (ii / height).reshape(-1)
    o, d = shoot(cam, s, t)

    hit = intersect_scene(scene, o, d, t_min=T_MIN_RAYCAST)

    light_pos = scene.pl_pos[0]
    light_int = scene.pl_intensity[0]
    has_light = scene.pl_valid[0]

    to_light = light_pos - hit.point
    dist = jnp.sqrt(dot(to_light, to_light))
    out = to_light / dist[..., None]
    # ray_cast normalizes normals in its intersections; do it at shading time
    n = normalize(hit.normal, eps=1e-12)
    facing = dot(out, n) > 0

    shadow = intersect_scene(scene, hit.point, out, t_min=T_MIN_RAYCAST)
    lit = (~shadow.valid) | (shadow.t > dist)

    # branchless material shading over the dense material table
    params = jnp.take(scene.mat_params, hit.mat, axis=0, mode="clip")
    mtype = jnp.take(scene.mat_type, hit.mat, axis=0, mode="clip")
    diffuse = params[:, MAT_DIFFUSE] * dot(out, n)[..., None]
    v = -d  # `in` direction of Phong::shade (`Phong.cpp:25-31`)
    r = reflect(out, n)
    spec = (params[:, MAT_SPECULAR]
            * jnp.abs(dot(v, r) ** params[:, MAT_SPECULAR_EX])[..., None])
    color = diffuse + jnp.where((mtype == 1)[..., None], spec, 0.0)
    color = color * light_int

    ok = hit.valid & facing & lit & has_light
    color = jnp.where(ok[..., None], color, 0.0)
    color = jnp.sqrt(jnp.clip(color, 0.0, 1.0))  # clamp + gamma
    return color.reshape(height, width, 3)


@register_renderer("RayCast", description=(
    "A simple ray cast renderer.\n"
    "Phong/Lambertian direct lighting from one point light, with shadows."))
class RayCastRenderer(RenderComponent):
    def render(self, scene: Scene) -> RenderResult:
        w = scene.render_option.width
        h = scene.render_option.height
        arrays = build_scene_arrays(scene)
        cam = make_camera(scene.camera)
        img = np.asarray(render_raycast(arrays, cam, w, h))
        img = img[::-1]  # bottom-up scan -> row 0 = top
        rgba = np.concatenate([img, np.ones((h, w, 1), np.float32)], axis=2)
        return RenderResult(pixels=rgba, width=w, height=h)
