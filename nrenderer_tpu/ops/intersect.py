"""Batched ray-primitive intersection kernels.

The math ports the *behavior* of the reference's per-plugin intersection
routines (`simple_path_tracing/src/intersections/intersections.cpp:1-95`),
keeping the PT variants' epsilon and boundary conventions (SURVEY.md §2.8):

  - triangle: Möller-Trumbore with det-sign folding, parallel reject at
    det < 1e-6, `t >= tMin` acceptance, stored (unnormalized) normal returned
  - sphere: both quadratic roots tried in order, normal = (p-c)/r
  - plane: parallelogram patch via the precomputed inverse of [u, v, u x v]
    (the reference inverts per ray; we precompute per plane), near-parallel
    reject at |n.d| ~ 1e-7
  - area light: the plane test on (position, u, v) with normal cross(u, v)

Instead of per-ray virtual calls, each kernel evaluates ALL primitives of a
type for ALL rays at once — (N rays, P prims) broadcasting that XLA fuses and
tiles for the VPU — then a masked argmin picks the closest hit across types.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..scene.arrays import SceneArrays
from .vecmath import cross, dot

FLOAT_INF = jnp.inf
T_MIN_PT = 1e-6    # PT shadow/self-hit epsilon (`SimplePathTracer.cpp:108`)
T_MIN_RAYCAST = 0.01  # ray_cast epsilon (`RayCastRenderer.cpp:70`)


class HitRecord(NamedTuple):
    """SoA hit record over a ray batch (reference `HitRecord.hpp:13-29`)."""
    t: jnp.ndarray        # (N,) inf if miss
    valid: jnp.ndarray    # (N,) bool
    point: jnp.ndarray    # (N, 3)
    normal: jnp.ndarray   # (N, 3) — raw, NOT renormalized (PT convention)
    mat: jnp.ndarray      # (N,) int32


def _sphere_ts(scene: SceneArrays, o: jnp.ndarray, d: jnp.ndarray,
               t_min: float) -> jnp.ndarray:
    """(N, S) hit distances, +inf on miss."""
    oc = o[:, None, :] - scene.sph_pos[None, :, :]          # (N, S, 3)
    a = dot(d, d)[:, None]                                  # (N, 1)
    b = jnp.einsum("nsk,nk->ns", oc, d)                     # (N, S)
    c = dot(oc, oc) - scene.sph_radius[None, :] ** 2        # (N, S)
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / a
    t2 = (-b + sq) / a
    ok = (disc > 0) & scene.sph_valid[None, :]
    t1_ok = ok & (t1 >= t_min)
    t2_ok = ok & (t2 >= t_min)
    t = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, FLOAT_INF))
    return t


def _triangle_ts(scene: SceneArrays, o: jnp.ndarray, d: jnp.ndarray,
                 t_min: float) -> jnp.ndarray:
    """(N, T) hit distances (Möller-Trumbore, det-sign fold)."""
    e1 = scene.tri_e1[None, :, :]                           # (1, T, 3)
    e2 = scene.tri_e2[None, :, :]
    p = cross(d[:, None, :], e2)                            # (N, T, 3)
    det0 = dot(e1, p)                                       # (N, T)
    sign = jnp.where(det0 > 0, 1.0, -1.0)
    det = det0 * sign
    tvec = (o[:, None, :] - scene.tri_v1[None, :, :]) * sign[..., None]
    u = dot(tvec, p)
    q = cross(tvec, e1)
    v = jnp.einsum("nk,ntk->nt", d, q)
    w = dot(e2, q) / jnp.where(det == 0, 1.0, det)
    ok = ((det >= 1e-6) & (u >= 0) & (u <= det) & (v >= 0) & (u + v <= det)
          & (w >= t_min) & scene.tri_valid[None, :])
    return jnp.where(ok, w, FLOAT_INF)


def _patch_ts(pos: jnp.ndarray, normal: jnp.ndarray, inv: jnp.ndarray,
              valid: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray,
              t_min: float) -> jnp.ndarray:
    """(N, P) distances for parallelogram patches (planes & area lights)."""
    nd = jnp.einsum("nk,pk->np", d, normal)                 # (N, P)
    # near-parallel reject (reference's asymmetric check, intersections.cpp:62)
    parallel = (nd < 1e-7) & (nd > -1e-8)
    num = dot(pos, normal)[None, :] - jnp.einsum("nk,pk->np", o, normal)
    t = num / jnp.where(parallel, 1.0, nd)
    hit = o[:, None, :] + t[..., None] * d[:, None, :]      # (N, P, 3)
    rel = hit - pos[None, :, :]
    uv = jnp.einsum("pij,npj->npi", inv, rel)               # (N, P, 3)
    u, v = uv[..., 0], uv[..., 1]
    ok = (~parallel & (t >= t_min) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
          & valid[None, :])
    return jnp.where(ok, t, FLOAT_INF)


def _take(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(arr, idx, axis=0, mode="clip")


def intersect_scene(scene: SceneArrays, o: jnp.ndarray, d: jnp.ndarray,
                    t_min: float = T_MIN_PT,
                    t_max: float = FLOAT_INF) -> HitRecord:
    """Closest hit against spheres + triangles + planes for a ray batch.

    Equivalent of `closestHitObject`'s brute-force loops
    (`SimplePathTracer.cpp:104-129`), evaluated dense + masked."""
    ts = _sphere_ts(scene, o, d, t_min)       # (N, S)
    tt = _triangle_ts(scene, o, d, t_min)     # (N, T)
    tp = _patch_ts(scene.pln_pos, scene.pln_normal, scene.pln_inv,
                   scene.pln_valid, o, d, t_min)  # (N, P)

    ts_min, ts_idx = jnp.min(ts, axis=1), jnp.argmin(ts, axis=1)
    tt_min, tt_idx = jnp.min(tt, axis=1), jnp.argmin(tt, axis=1)
    tp_min, tp_idx = jnp.min(tp, axis=1), jnp.argmin(tp, axis=1)

    t3 = jnp.stack([ts_min, tt_min, tp_min], axis=1)        # (N, 3)
    kind = jnp.argmin(t3, axis=1)                           # (N,)
    t = jnp.min(t3, axis=1)
    valid = t < t_max

    point = o + t[..., None] * d

    # sphere shading data
    sph_pos = _take(scene.sph_pos, ts_idx)
    sph_r = _take(scene.sph_radius, ts_idx)
    n_sph = (point - sph_pos) / sph_r[..., None]
    m_sph = _take(scene.sph_mat, ts_idx)
    # triangle
    n_tri = _take(scene.tri_normal, tt_idx)
    m_tri = _take(scene.tri_mat, tt_idx)
    # plane
    n_pln = _take(scene.pln_normal, tp_idx)
    m_pln = _take(scene.pln_mat, tp_idx)

    is_sph = (kind == 0)[..., None]
    is_tri = (kind == 1)[..., None]
    normal = jnp.where(is_sph, n_sph, jnp.where(is_tri, n_tri, n_pln))
    mat = jnp.where(kind == 0, m_sph, jnp.where(kind == 1, m_tri, m_pln))

    return HitRecord(t=t, valid=valid, point=point, normal=normal,
                     mat=mat.astype(jnp.int32))


def intersect_area_lights(scene: SceneArrays, o: jnp.ndarray, d: jnp.ndarray,
                          t_min: float = T_MIN_PT
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`closestHitLight` (`SimplePathTracer.cpp:131-142`): nearest area-light
    crossing.  Returns (t, radiance); t = +inf if none."""
    ta = _patch_ts(scene.al_pos, scene.al_normal, scene.al_inv,
                   scene.al_valid, o, d, t_min)             # (N, A)
    t_minv, idx = jnp.min(ta, axis=1), jnp.argmin(ta, axis=1)
    rad = _take(scene.al_radiance, idx)
    rad = jnp.where(jnp.isfinite(t_minv)[..., None], rad, 0.0)
    return t_minv, rad
