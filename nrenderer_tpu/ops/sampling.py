"""Counter-based random sampling for render kernels.

Replaces the reference's `thread_local` time-seeded sampler objects
(`simple_path_tracing/include/samplers/*`, seeded `time(0)+counter`,
`Marsaglia.hpp:17-20`) with stateless JAX PRNG: every pixel/sample/bounce gets
an independent stream derived by `fold_in`, so renders are reproducible and
race-free by construction (SURVEY.md §5.2).

Distributions mirror the reference samplers:
  - uniform_square: [-1, 1]^2            (`UniformInSquare.hpp:11-24`)
  - uniform_circle: unit disk            (`UniformInCircle.hpp` — the reference
    uses rejection with a typo'd test; we use the exact polar map)
  - hemisphere: uniform hemisphere about +z, pdf = 1/(2 pi)
    (`Hemisphere.hpp:11-33`: z = e1, r = sqrt(1 - e1^2), angle = 2 pi e2)
  - sphere: uniform sphere (Marsaglia)   (`Marsaglia.hpp:11-35`)
  - cosine_hemisphere: cosine-weighted (used by MLT's VecCosine and by NEE)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .vecmath import cross, dot, normalize

PI = jnp.pi


def uniform_square(key, shape=()) -> jnp.ndarray:
    """(..., 2) uniform in [-1, 1]^2 (pixel jitter, UniformInSquare)."""
    return jax.random.uniform(key, shape + (2,), minval=-1.0, maxval=1.0)


def uniform_circle(key, shape=()) -> jnp.ndarray:
    """(..., 2) uniform in the unit disk (thin-lens aperture sampling)."""
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, shape))
    phi = jax.random.uniform(k2, shape, maxval=2.0 * PI)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def hemisphere(key, shape=()) -> jnp.ndarray:
    """(..., 3) uniform on the +z hemisphere; pdf = 1/(2 pi).

    Exactly the reference's map (`Hemisphere.hpp:25-32`): z = e1,
    r = sqrt(1 - e1^2), (x, y) = r (cos, sin)(2 pi e2)."""
    k1, k2 = jax.random.split(key)
    e1 = jax.random.uniform(k1, shape)
    e2 = jax.random.uniform(k2, shape)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - e1 * e1))
    phi = 2.0 * PI * e2
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, e1], axis=-1)


def sphere(key, shape=()) -> jnp.ndarray:
    """(..., 3) uniform on the unit sphere."""
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, shape, minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(k2, shape, maxval=2.0 * PI)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def cosine_hemisphere(key, shape=()) -> jnp.ndarray:
    """(..., 3) cosine-weighted on the +z hemisphere; pdf = cos(theta)/pi."""
    k1, k2 = jax.random.split(key)
    e1 = jax.random.uniform(k1, shape)
    e2 = jax.random.uniform(k2, shape)
    r = jnp.sqrt(e1)
    phi = 2.0 * PI * e2
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - e1))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def onb(normal: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis (u, v, w=normal) matching the reference's Onb
    (`simple_path_tracing/include/Onb.hpp:17-27`):

        a = |w.x| > 0.9 ? (0,1,0) : (1,0,0)
        v = normalize(cross(w, a));  u = cross(w, v)
    """
    w = normal
    a = jnp.where(jnp.abs(w[..., 0:1]) > 0.9,
                  jnp.array([0.0, 1.0, 0.0], dtype=w.dtype),
                  jnp.array([1.0, 0.0, 0.0], dtype=w.dtype))
    v = normalize(cross(w, a))
    u = cross(w, v)
    return u, v, w


def onb_local(normal: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Transform `vec` from the ONB local frame (z = normal) to world:
    `Onb::local` = x*u + y*v + z*w."""
    u, v, w = onb(normal)
    return (vec[..., 0:1] * u + vec[..., 1:2] * v + vec[..., 2:3] * w)
