"""Camera ray generation (pinhole + thin lens), batched.

Reimplements the math of the reference's per-plugin `Camera` classes
(`simple_path_tracing/include/Camera.hpp:16-64`, RT-in-one-weekend basis):

    w = normalize(position - lookAt);  u = normalize(cross(up, w));  v = cross(w, u)
    halfHeight = tan(radians(clamp(fov, 20, 160)) / 2);  halfWidth = aspect * halfHeight
    lowerLeft  = position - halfWidth*fd*u - halfHeight*fd*v - fd*w
    shoot(s,t) = Ray(position + lensOffset,
                     normalize(lowerLeft + s*horizontal + t*vertical - position - lensOffset))

The ray_cast camera (`ray_cast/include/Camera.hpp:25-57`) is the aperture=0
special case of the same formulas.  Instead of a per-ray `shoot` call, the
whole (s, t [, lens-sample]) batch is generated at once.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..scene.model import Camera
from .vecmath import normalize


class CameraParams(NamedTuple):
    """Precomputed camera basis; a small pytree closed over by render kernels."""
    position: jnp.ndarray    # (3,)
    lower_left: jnp.ndarray  # (3,)
    horizontal: jnp.ndarray  # (3,)
    vertical: jnp.ndarray    # (3,)
    u: jnp.ndarray           # (3,)
    v: jnp.ndarray           # (3,)
    w: jnp.ndarray           # (3,)
    lens_radius: jnp.ndarray  # ()
    half_height: jnp.ndarray  # ()  (used by MLT's pixel projection)
    focus_distance: jnp.ndarray  # ()


def make_camera(camera: Camera, aspect: Optional[float] = None,
                dtype=jnp.float32) -> CameraParams:
    """Host-side camera basis computation (float64, then cast)."""
    position = np.asarray(camera.position, np.float64)
    look_at = np.asarray(camera.look_at, np.float64)
    up = np.asarray(camera.up, np.float64)
    vfov = float(np.clip(camera.fov, 20.0, 160.0))
    theta = np.radians(vfov)
    half_height = np.tan(theta / 2.0)
    asp = camera.aspect if aspect is None else aspect
    half_width = asp * half_height
    w = position - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    fd = float(camera.focus_distance)
    lower_left = position - half_width * fd * u - half_height * fd * v - fd * w
    horizontal = 2.0 * half_width * fd * u
    vertical = 2.0 * half_height * fd * v
    f = lambda x: jnp.asarray(x, dtype=dtype)
    return CameraParams(
        position=f(position), lower_left=f(lower_left), horizontal=f(horizontal),
        vertical=f(vertical), u=f(u), v=f(v), w=f(w),
        lens_radius=f(camera.aperture / 2.0), half_height=f(half_height),
        focus_distance=f(fd),
    )


def shoot_v3(cam: CameraParams, s: jnp.ndarray, t: jnp.ndarray,
             lens_uv=None):
    """SoA ray generation: returns (origin V3, direction V3) of (N,) arrays.
    `lens_uv`: optional (u, v) pair of (N,) unit-disk samples."""
    from .soa import V3, normalize3
    cx, cy, cz = [jnp.asarray(c) for c in
                  (cam.position[0], cam.position[1], cam.position[2])]
    if lens_uv is None:
        ox = jnp.broadcast_to(cx, s.shape)
        oy = jnp.broadcast_to(cy, s.shape)
        oz = jnp.broadcast_to(cz, s.shape)
    else:
        lu, lv = lens_uv
        rx = lu * cam.lens_radius
        ry = lv * cam.lens_radius
        ox = cx + rx * cam.u[0] + ry * cam.v[0]
        oy = cy + rx * cam.u[1] + ry * cam.v[1]
        oz = cz + rx * cam.u[2] + ry * cam.v[2]
    dx = cam.lower_left[0] + s * cam.horizontal[0] + t * cam.vertical[0] - ox
    dy = cam.lower_left[1] + s * cam.horizontal[1] + t * cam.vertical[1] - oy
    dz = cam.lower_left[2] + s * cam.horizontal[2] + t * cam.vertical[2] - oz
    d = normalize3(V3(dx, dy, dz))
    return V3(ox, oy, oz), d


def shoot(cam: CameraParams, s: jnp.ndarray, t: jnp.ndarray,
          lens_uv: Optional[jnp.ndarray] = None
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate rays for screen coordinates (s, t) in [0,1].

    `lens_uv`: optional (..., 2) points in the unit disk for depth of field
    (thin-lens `Camera::shoot`, `simple_path_tracing/include/Camera.hpp:52-63`).
    Returns (origins, directions), directions normalized."""
    s = s[..., None]
    t = t[..., None]
    if lens_uv is None:
        offset = jnp.zeros(3, dtype=cam.position.dtype)
    else:
        rd = lens_uv * cam.lens_radius
        offset = rd[..., 0:1] * cam.u + rd[..., 1:2] * cam.v
    origin = cam.position + offset
    direction = normalize(cam.lower_left + s * cam.horizontal
                          + t * cam.vertical - cam.position - offset)
    origin = jnp.broadcast_to(origin, direction.shape)
    return origin, direction
