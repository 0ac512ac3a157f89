"""Small batched vector helpers shared by the ops modules.

Replaces glm (`code/include/geometry/vec.hpp`) with jnp over trailing-(3,)
axes.  Everything broadcasts: inputs are (..., 3)."""
from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    n = norm(a)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror `d` about normal `n` (reference `vec.hpp:57-59` convention:
    d - 2*dot(d,n)*n)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])
