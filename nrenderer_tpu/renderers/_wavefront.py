"""Shared wavefront film-loop builder for the XLA render engines.

SimplePathTracer and AccPathTracer differ only in their bounce physics; the
film loop around it — pixel jitter, thin lens, spp-chunk scan, linear film
accumulation, sqrt gamma — is identical (reference `renderTask`,
`SimplePathTracer.cpp:19-37` / `AccPathTracer.cpp:18-38`).  This module holds
the single implementation both renderers close over."""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import CameraParams, shoot_v3
from ..ops.sampling import uniform_circle
from ..ops.soa import V3, to_array


def build_wavefront_fn(width: int, height: int, spp: int, chunk: int,
                       has_lens: bool, trace_fn: Callable,
                       linear: bool = False) -> Callable:
    """Compile the film loop around `trace_fn(o, d, key, env_map, tri_bvh,
    textures) -> V3 radiance`.

    Returns `fn(cam, env_map, key, tri_bvh=None, textures=None)`; with
    `linear=False` an (H, W, 3) gamma'd image (row 0 = BOTTOM), else the
    (n_pix, 3) LINEAR film SUM over `spp` samples (chunked/progressive
    accumulation).  `textures` (tuple of (H, W, 3) arrays) are traced args,
    so texture contents never invalidate the compile cache."""
    n_pix = width * height
    n_rays = n_pix * chunk
    n_steps = spp // chunk
    jj = np.tile(np.tile(np.arange(width, dtype=np.float32), height), chunk)
    ii = np.tile(np.repeat(np.arange(height, dtype=np.float32), width), chunk)

    @jax.jit
    def render(cam: CameraParams, env_map, key, tri_bvh=None,
               textures=None):
        jjd = jnp.asarray(jj)
        iid = jnp.asarray(ii)

        def step(film, it):
            k = jax.random.fold_in(key, it)
            k_jx, k_jy, k_lens, k_path = jax.random.split(k, 4)
            rx = jax.random.uniform(k_jx, (n_rays,), minval=-1.0, maxval=1.0)
            ry = jax.random.uniform(k_jy, (n_rays,), minval=-1.0, maxval=1.0)
            x = (jjd + rx) / width   # 2px-wide jitter, UniformInSquare
            y = (iid + ry) / height
            if has_lens:
                lens = uniform_circle(k_lens, (n_rays,))
                lens_uv = (lens[..., 0], lens[..., 1])
            else:
                lens_uv = None
            o, d = shoot_v3(cam, x, y, lens_uv=lens_uv)
            radiance = trace_fn(o, d, k_path, env_map, tri_bvh, textures)
            fx, fy, fz = film
            fx = fx + radiance.x.reshape(chunk, n_pix).sum(axis=0)
            fy = fy + radiance.y.reshape(chunk, n_pix).sum(axis=0)
            fz = fz + radiance.z.reshape(chunk, n_pix).sum(axis=0)
            return (fx, fy, fz), None

        zeros = jnp.zeros((n_pix,), jnp.float32)
        (fx, fy, fz), _ = jax.lax.scan(
            step, (zeros, zeros, zeros), jnp.arange(n_steps, dtype=jnp.int32))
        if linear:
            return to_array(V3(fx, fy, fz)).reshape(n_pix, 3)
        inv = 1.0 / float(spp)
        color = V3(jnp.sqrt(jnp.maximum(fx * inv, 0.0)),
                   jnp.sqrt(jnp.maximum(fy * inv, 0.0)),
                   jnp.sqrt(jnp.maximum(fz * inv, 0.0)))  # sqrt gamma
        return to_array(color).reshape(height, width, 3)

    return render
