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

import os
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _put(a) -> jnp.ndarray:
    """Upload a ready numpy array as a plain transfer.  `jnp.asarray`
    dispatches an eager convert_element_type whose executable is compiled
    PER SHAPE through the remote-compile relay — for a fresh mesh size
    that turns scene prep into minutes of tiny compiles; device_put of an
    already-typed array never compiles."""
    return jax.device_put(np.ascontiguousarray(a))


class FlatBVH(NamedTuple):
    """Preorder-flattened BVH with escape indices (device arrays)."""
    bb_min: jnp.ndarray   # (Nn, 3) float32
    bb_max: jnp.ndarray   # (Nn, 3) float32
    skip: jnp.ndarray     # (Nn,) int32: node index to jump to on bbox miss
    prim: jnp.ndarray     # (Nn,) int32: primitive index at leaf, -1 internal
    n_nodes: int          # static count


def build_bvh(bb_min: np.ndarray, bb_max: np.ndarray, use_native: bool = True
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build from per-primitive AABBs; returns flat (bb_min, bb_max, skip,
    prim) numpy arrays in depth-first preorder.

    Matches the reference's median-object split on the max-extent axis of the
    *centroid* bounds (`BVH.hpp:176-207`).

    Uses the native C++ builder (native/nrnative.cpp, ~50x faster for large
    meshes) when available; this numpy version is the fallback and the
    reference for equality tests."""
    n = bb_min.shape[0]
    if n == 0:
        return (np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
                np.ones((1,), np.int32), np.full((1,), -1, np.int32))
    if use_native:
        from .. import native
        built = native.build_bvh(np.asarray(bb_min, np.float32),
                                 np.asarray(bb_max, np.float32))
        if built is not None:
            return built
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
    return FlatBVH(bb_min=_put(mn), bb_max=_put(mx),
                   skip=_put(skip), prim=_put(prim),
                   n_nodes=int(prim.shape[0]))


class TrianglePack(NamedTuple):
    """Device-side triangle pool for BVH leaves (component SoA)."""
    v1x: jnp.ndarray
    v1y: jnp.ndarray
    v1z: jnp.ndarray
    e1x: jnp.ndarray
    e1y: jnp.ndarray
    e1z: jnp.ndarray
    e2x: jnp.ndarray
    e2y: jnp.ndarray
    e2z: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    mat: jnp.ndarray        # (T,) float material id
    channels: jnp.ndarray   # (K, T) tracked material constants


def pack_triangles(scene_arrays, mat_channels) -> TrianglePack:
    """Build the leaf triangle pool from SceneArrays (+ per-material channel
    table, same layout as intersect_scene_unrolled's mat_channels)."""
    a = scene_arrays
    v1 = np.asarray(a.tri_v1, np.float32)
    e1 = np.asarray(a.tri_e1, np.float32)
    e2 = np.asarray(a.tri_e2, np.float32)
    n = np.asarray(a.tri_normal, np.float32)
    mat = np.asarray(a.tri_mat, np.int64)
    k = len(mat_channels[0]) if mat_channels else 0
    chan_table = np.asarray(mat_channels, np.float32).reshape(-1, k)
    channels = chan_table[mat].T if k else np.zeros((0, mat.shape[0]),
                                                    np.float32)
    f = _put
    return TrianglePack(
        v1x=f(v1[:, 0]), v1y=f(v1[:, 1]), v1z=f(v1[:, 2]),
        e1x=f(e1[:, 0]), e1y=f(e1[:, 1]), e1z=f(e1[:, 2]),
        e2x=f(e2[:, 0]), e2y=f(e2[:, 1]), e2z=f(e2[:, 2]),
        nx=f(n[:, 0]), ny=f(n[:, 1]), nz=f(n[:, 2]),
        mat=f(mat.astype(np.float32)), channels=f(channels))


def build_triangle_bvh(scene_arrays) -> FlatBVH:
    """BVH over the triangle buffer only (spheres/planes stay on the dense
    unrolled path — Cornell-size prim sets beat any tree on a vector unit)."""
    a = scene_arrays
    v1 = np.asarray(a.tri_v1, np.float64)
    v2 = v1 + np.asarray(a.tri_e1, np.float64)
    v3 = v1 + np.asarray(a.tri_e2, np.float64)
    valid = np.asarray(a.tri_valid)
    bb_min = np.minimum(np.minimum(v1, v2), v3) - 1e-4
    bb_max = np.maximum(np.maximum(v1, v2), v3) + 1e-4
    # exclude padding rows from the tree
    idx = np.nonzero(valid)[0]
    mn, mx, skip, prim = build_bvh(bb_min[idx], bb_max[idx])
    prim = np.where(prim >= 0, idx[np.clip(prim, 0, len(idx) - 1)], -1)
    return FlatBVH(bb_min=_put(mn), bb_max=_put(mx),
                   skip=_put(skip), prim=_put(prim),
                   n_nodes=int(prim.shape[0]))


def intersect_triangles_bvh(bvh: FlatBVH, tp: TrianglePack, o, d,
                            t_min: float = 1e-6):
    """Stackless escape-index BVH walk for a ray batch (component-SoA).

    Replaces the reference's recursive both-children descent
    (`acc/include/BVH.hpp:93-155`) with a preorder walk: on bbox hit advance
    to node+1 (first child), on miss jump to skip[node].  Every ray carries
    its own node cursor through one `lax.while_loop`; node/leaf data are
    (N,)-wide gathers from the flat tree tables.

    Returns (t, nx, ny, nz, mat_id, prim_id, channels tuple) like the
    unrolled kernels; t=+inf on miss."""
    import jax

    n = o.x.shape[0]
    inf = jnp.float32(jnp.inf)
    inv_dx = 1.0 / jnp.where(jnp.abs(d.x) < 1e-20, 1e-20, d.x)
    inv_dy = 1.0 / jnp.where(jnp.abs(d.y) < 1e-20, 1e-20, d.y)
    inv_dz = 1.0 / jnp.where(jnp.abs(d.z) < 1e-20, 1e-20, d.z)

    bb_min, bb_max = bvh.bb_min, bvh.bb_max
    skip, prim = bvh.skip, bvh.prim
    n_nodes = bvh.n_nodes

    def take(tab, idx):
        return jnp.take(tab, idx, axis=0, mode="clip")

    def cond(state):
        node, t_best, idx_best = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, t_best, idx_best = state
        nc = jnp.clip(node, 0, n_nodes - 1)
        bmin_x = take(bb_min[:, 0], nc)
        bmin_y = take(bb_min[:, 1], nc)
        bmin_z = take(bb_min[:, 2], nc)
        bmax_x = take(bb_max[:, 0], nc)
        bmax_y = take(bb_max[:, 1], nc)
        bmax_z = take(bb_max[:, 2], nc)
        t0x = (bmin_x - o.x) * inv_dx
        t1x = (bmax_x - o.x) * inv_dx
        t0y = (bmin_y - o.y) * inv_dy
        t1y = (bmax_y - o.y) * inv_dy
        t0z = (bmin_z - o.z) * inv_dz
        t1z = (bmax_z - o.z) * inv_dz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z))
        # max(t_near, t_min) is the earliest possible in-box hit; raw
        # t_near is negative when the origin is inside the box, which
        # would defeat the cap cull for rays parked on the mesh
        hit_box = ((t_near <= t_far) & (t_far >= t_min)
                   & (jnp.maximum(t_near, t_min) < t_best))

        pidx = take(prim, nc)
        is_leaf = pidx >= 0
        pc = jnp.clip(pidx, 0, tp.v1x.shape[0] - 1)

        # Moller-Trumbore on the leaf triangle (PT conventions)
        e1x, e1y, e1z = take(tp.e1x, pc), take(tp.e1y, pc), take(tp.e1z, pc)
        e2x, e2y, e2z = take(tp.e2x, pc), take(tp.e2y, pc), take(tp.e2z, pc)
        v1x, v1y, v1z = take(tp.v1x, pc), take(tp.v1y, pc), take(tp.v1z, pc)
        px = d.y * e2z - d.z * e2y
        py = d.z * e2x - d.x * e2z
        pz = d.x * e2y - d.y * e2x
        det0 = e1x * px + e1y * py + e1z * pz
        sign = jnp.where(det0 > 0, 1.0, -1.0)
        det = det0 * sign
        tx = (o.x - v1x) * sign
        ty = (o.y - v1y) * sign
        tz = (o.z - v1z) * sign
        u = tx * px + ty * py + tz * pz
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = d.x * qx + d.y * qy + d.z * qz
        w = (e2x * qx + e2y * qy + e2z * qz) / jnp.where(det == 0, 1.0, det)
        tri_hit = (hit_box & is_leaf & (det >= 1e-6) & (u >= 0) & (u <= det)
                   & (vv >= 0) & (u + vv <= det) & (w >= t_min)
                   & (w < t_best))
        t_best = jnp.where(tri_hit, w, t_best)
        idx_best = jnp.where(tri_hit, pidx, idx_best)

        node = jnp.where(node >= n_nodes, node,
                         jnp.where(hit_box & ~is_leaf, node + 1,
                                   take(skip, nc)))
        return node, t_best, idx_best

    node0 = jnp.zeros((n,), jnp.int32)
    t0 = jnp.full((n,), inf)
    i0 = jnp.full((n,), -1, jnp.int32)
    node, t_best, idx_best = jax.lax.while_loop(cond, body,
                                                (node0, t0, i0))
    ic = jnp.clip(idx_best, 0, tp.v1x.shape[0] - 1)
    nx = take(tp.nx, ic)
    ny = take(tp.ny, ic)
    nz = take(tp.nz, ic)
    mat = take(tp.mat, ic)
    chans = tuple(take(tp.channels[k], ic)
                  for k in range(tp.channels.shape[0]))
    miss = idx_best < 0
    return (t_best, jnp.where(miss, 0.0, nx), jnp.where(miss, 0.0, ny),
            jnp.where(miss, 0.0, nz), jnp.where(miss, 0.0, mat),
            jnp.where(miss, -1.0, idx_best.astype(jnp.float32)), chans)


class BlockedTris(NamedTuple):
    """Triangle pool chunked into (n_blocks, B) arrays for a lax.scan sweep.

    The TPU-native large-mesh intersector: a per-ray BVH cursor walk is
    gather-bound and divergence-bound on a vector unit (measured ~400x slower
    than brute force at bunny scale), so instead ALL rays test ALL triangles,
    B per scan step, with each block unrolled into scalar-broadcast vector
    ops.  Triangles are ordered by BVH preorder so blocks stay spatially
    coherent (and each block's AABB is kept for future culling)."""
    v1x: jnp.ndarray   # (n_blocks, B)
    v1y: jnp.ndarray
    v1z: jnp.ndarray
    e1x: jnp.ndarray
    e1y: jnp.ndarray
    e1z: jnp.ndarray
    e2x: jnp.ndarray
    e2y: jnp.ndarray
    e2z: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    mat: jnp.ndarray       # (n_blocks, B)
    pid: jnp.ndarray       # (n_blocks, B) original triangle index
    channels: jnp.ndarray  # (K, n_blocks, B)
    bb_min: jnp.ndarray    # (n_blocks, 3)
    bb_max: jnp.ndarray    # (n_blocks, 3)
    # sub-block AABBs for finer in-kernel gating: (n_blocks, n_sub, 3)
    # boxes over consecutive `B // n_sub`-triangle runs (BVH preorder =
    # contiguous subtrees, so they stay tight).  All-padding sub-blocks
    # get an empty box (+inf/-inf) and are skipped by the slab test.
    sb_min: jnp.ndarray = None
    sb_max: jnp.ndarray = None
    # per-triangle texture coords (None when the scene has no textured
    # faces): uv at v1, uv edges, texture id — the sweep interpolates the
    # winner's UV from its barycentrics (`with_uv`)
    uv1x: jnp.ndarray = None
    uv1y: jnp.ndarray = None
    ue1x: jnp.ndarray = None
    ue1y: jnp.ndarray = None
    ue2x: jnp.ndarray = None
    ue2y: jnp.ndarray = None
    tex: jnp.ndarray = None
    # MXU bilinear coefficients (round 5): every Moller-Trumbore quantity
    # is LINEAR in the 10-dim ray feature f = [1, o', d, o'xd] (o' = origin
    # centered on the mesh AABB — centering bounds the cancellation error
    # the factored form otherwise pays at world coordinates):
    #   det    = (e2 x e1) . d
    #   u_raw  = e2 . (o'xd) + (v1' x e2) . d
    #   v_raw  = -e1 . (o'xd) + (e1 x v1') . d
    #   t*det  = (e1 x e2) . o' - (v1' . (e1 x e2))
    # so a (4B, 16) per-block table turns the whole block test into ONE
    # (4B,16)@(16,128) matmul per ray row — the sweep's multiply work moves
    # from the VPU to the MXU (`mesh_pallas.sweep_tile_mxu`).  Feature dims
    # 10..15 are zero padding to the f32 sublane tile.
    mxu_coef: jnp.ndarray = None  # (n_blocks, 4*B, 16)
    # static python floats (kernel parameter, NOT device data); becomes
    # traced when the accel itself is a jit argument, which the engine
    # select treats as "fall back to the VPU sweep"
    mxu_center: tuple = None
    # front-to-back block orders (8, n_blocks) int32: row o = block visit
    # order ascending along direction octant o (bit 2/1/0 = d.x/y/z > 0).
    # Visiting blocks near-to-far makes the sweep's existing
    # `t_near < t_best` box cull an EARLY EXIT: once a tile's rays have
    # hits, farther blocks fail the cull wholesale — what the reference's
    # ordered BVH descent buys (`acc/include/BVH.hpp:141-154`).  Winner
    # results are order-independent except exact-t ties, so this rides
    # behind NR_MESH_F2B (the bit-exact natural order stays the default
    # for the parity tests).
    f2b_ord: jnp.ndarray = None

    @property
    def block(self) -> int:
        return self.v1x.shape[1]


def pack_blocked_triangles(scene_arrays, mat_channels,
                           block: int = 128) -> BlockedTris:
    """Chunk the (valid) triangle pool into BVH-preorder blocks of `block`."""
    a = scene_arrays
    v1 = np.asarray(a.tri_v1, np.float32)
    e1 = np.asarray(a.tri_e1, np.float32)
    e2 = np.asarray(a.tri_e2, np.float32)
    nrm = np.asarray(a.tri_normal, np.float32)
    mat = np.asarray(a.tri_mat, np.int64)
    valid = np.asarray(a.tri_valid)

    # order by BVH preorder leaves for spatial coherence
    idx = np.nonzero(valid)[0]
    v2 = v1 + e1
    v3 = v1 + e2
    bmn = np.minimum(np.minimum(v1, v2), v3)[idx]
    bmx = np.maximum(np.maximum(v1, v2), v3)[idx]
    _, _, _, prim = build_bvh(bmn, bmx)
    order = idx[prim[prim >= 0]]

    t = order.shape[0]
    n_blocks = -(-t // block)
    pad = n_blocks * block - t
    # pad with copies of the last triangle but pid -1 (never wins: the
    # duplicate can only produce the same t, and argmin keeps the first)
    order_p = np.concatenate([order, np.repeat(order[-1:], pad)])
    pid = np.concatenate([order, np.full((pad,), -1, np.int64)])

    k = len(mat_channels[0]) if mat_channels else 0
    chan_table = np.asarray(mat_channels, np.float32).reshape(-1, k)
    channels = chan_table[mat[order_p]].T if k else np.zeros(
        (0, t + pad), np.float32)

    def blk(arr):
        return _put(arr[order_p].reshape(n_blocks, block))

    v2p = v1 + e1
    v3p = v1 + e2
    tri_mn = np.minimum(np.minimum(v1, v2p), v3p)[order_p].reshape(
        n_blocks, block, 3)
    tri_mx = np.maximum(np.maximum(v1, v2p), v3p)[order_p].reshape(
        n_blocks, block, 3)
    mn = tri_mn.min(axis=1)
    mx = tri_mx.max(axis=1)
    # sub-block AABBs (padding slots -> empty boxes so pure-padding
    # sub-blocks never pass a slab test)
    sub = int(os.environ.get("NR_MESH_SUBBLK", "32"))
    sub = max(1, min(sub, block))
    n_sub = -(-block // sub)
    pad_sub = n_sub * sub - block
    is_pad = (pid < 0).reshape(n_blocks, block, 1)
    smn = np.where(is_pad, np.inf, tri_mn)
    smx = np.where(is_pad, -np.inf, tri_mx)
    if pad_sub:
        smn = np.concatenate(
            [smn, np.full((n_blocks, pad_sub, 3), np.inf)], axis=1)
        smx = np.concatenate(
            [smx, np.full((n_blocks, pad_sub, 3), -np.inf)], axis=1)
    sb_mn = smn.reshape(n_blocks, n_sub, sub, 3).min(axis=2)
    sb_mx = smx.reshape(n_blocks, n_sub, sub, 3).max(axis=2)

    uv_kw = {}
    tex_col = np.asarray(getattr(a, "tri_tex", np.full(v1.shape[0], -1)),
                         np.float32)
    stex_col = np.asarray(getattr(a, "tri_stex", np.full(v1.shape[0], -1)),
                          np.float32)
    # faces carrying EITHER map need interpolated UVs; the diffuse tex id
    # rides the per-face table, the specularMap id rides the material
    # channels (pt_core.make_mat_channels)
    if (tex_col[valid] >= 0).any() or (stex_col[valid] >= 0).any():
        uv1 = np.asarray(a.tri_uv1, np.float32)
        ue1 = np.asarray(a.tri_uve1, np.float32)
        ue2 = np.asarray(a.tri_uve2, np.float32)
        uv_kw = dict(uv1x=blk(uv1[:, 0]), uv1y=blk(uv1[:, 1]),
                     ue1x=blk(ue1[:, 0]), ue1y=blk(ue1[:, 1]),
                     ue2x=blk(ue2[:, 0]), ue2y=blk(ue2[:, 1]),
                     tex=blk(tex_col))

    # MXU bilinear coefficient table (see BlockedTris.mxu_coef); the
    # centering used here rides along as static floats (mxu_center).
    center = ((mn.min(axis=0) + mx.max(axis=0)).astype(np.float32)
              * np.float32(0.5))
    v1o, e1o, e2o = v1[order_p], e1[order_p], e2[order_p]
    v1c = (v1o - center).astype(np.float32)
    n12 = np.cross(e1o, e2o)
    coef = np.zeros((t + pad, 4, 16), np.float32)
    coef[:, 0, 4:7] = np.cross(e2o, e1o)          # det:   d
    coef[:, 1, 4:7] = np.cross(v1c, e2o)          # u:     d
    coef[:, 1, 7:10] = e2o                        # u:     o'xd
    coef[:, 2, 4:7] = np.cross(e1o, v1c)          # v:     d
    coef[:, 2, 7:10] = -e1o                       # v:     o'xd
    coef[:, 3, 0] = -(v1c * n12).sum(axis=-1)     # t*det: 1
    coef[:, 3, 1:4] = n12                         # t*det: o'
    coef[pid < 0] = 0.0  # padding: det == 0 never passes the eps test
    coef = coef.reshape(n_blocks, block, 4, 16).transpose(
        0, 2, 1, 3).reshape(n_blocks, 4 * block, 16)

    # per-octant front-to-back block orders (see BlockedTris.f2b_ord)
    cent = (mn + mx) * 0.5
    f2b = np.zeros((8, n_blocks), np.int32)
    for o in range(8):
        s = np.array([1.0 if o & 4 else -1.0, 1.0 if o & 2 else -1.0,
                      1.0 if o & 1 else -1.0], np.float32)
        f2b[o] = np.argsort(cent @ s, kind="stable").astype(np.int32)

    return BlockedTris(
        v1x=blk(v1[:, 0]), v1y=blk(v1[:, 1]), v1z=blk(v1[:, 2]),
        e1x=blk(e1[:, 0]), e1y=blk(e1[:, 1]), e1z=blk(e1[:, 2]),
        e2x=blk(e2[:, 0]), e2y=blk(e2[:, 1]), e2z=blk(e2[:, 2]),
        nx=blk(nrm[:, 0]), ny=blk(nrm[:, 1]), nz=blk(nrm[:, 2]),
        mat=blk(mat.astype(np.float32)),
        pid=_put(pid.astype(np.float32).reshape(n_blocks, block)),
        channels=_put(channels.reshape(-1, n_blocks, block)),
        bb_min=_put(mn), bb_max=_put(mx),
        sb_min=_put(np.asarray(sb_mn, np.float32)),
        sb_max=_put(np.asarray(sb_mx, np.float32)),
        mxu_coef=_put(coef),
        mxu_center=tuple(float(c) for c in center),
        f2b_ord=_put(f2b), **uv_kw)


class MeshAccel(NamedTuple):
    """Large-mesh acceleration bundle for the Pallas sweep engine: the
    BVH-preorder blocked triangle pool (kernel input) plus the flat
    per-triangle shading tables (post-sweep gather source)."""
    bt: BlockedTris
    tp: TrianglePack


def build_mesh_accel(scene_arrays, mat_channels, block: int = None
                     ) -> MeshAccel:
    if block is None:
        # sweep-cost tradeoff: a forced block sweeps all `block` triangles
        # for the whole 32x128 ray tile, so smaller blocks cull tighter at
        # the price of more per-block slab tests (NR_MESH_BLOCK to tune)
        block = int(os.environ.get("NR_MESH_BLOCK", "128"))
    return MeshAccel(bt=pack_blocked_triangles(scene_arrays, mat_channels,
                                               block=block),
                     tp=pack_triangles(scene_arrays, mat_channels))


def intersect_triangles_blocked(bt: BlockedTris, o, d, t_min: float = 1e-6,
                                with_uv: bool = False):
    """Closest triangle hit via the blocked sweep.  Returns
    (t, nx, ny, nz, mat_id, prim_id, channels tuple); t=+inf on miss.
    With `with_uv` (requires bt.tex) an extra (uvx, uvy, tex) triple is
    appended — the winner's texture coords interpolated from its
    barycentrics during the sweep."""
    import jax

    n = o.x.shape[0]
    inf = jnp.float32(jnp.inf)
    k = bt.channels.shape[0]
    b = bt.block
    with_uv = with_uv and bt.tex is not None

    def body(carry, xs):
        (v1x, v1y, v1z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz, mat, pid,
         chans, uvs) = xs
        t_best, bnx, bny, bnz, bmat, bpid, bch, buv = carry
        for i in range(b):
            px = d.y * e2z[i] - d.z * e2y[i]
            py = d.z * e2x[i] - d.x * e2z[i]
            pz = d.x * e2y[i] - d.y * e2x[i]
            det0 = e1x[i] * px + e1y[i] * py + e1z[i] * pz
            sign = jnp.where(det0 > 0, 1.0, -1.0)
            det = det0 * sign
            tx = (o.x - v1x[i]) * sign
            ty = (o.y - v1y[i]) * sign
            tz = (o.z - v1z[i]) * sign
            u = tx * px + ty * py + tz * pz
            qx = ty * e1z[i] - tz * e1y[i]
            qy = tz * e1x[i] - tx * e1z[i]
            qz = tx * e1y[i] - ty * e1x[i]
            vv = d.x * qx + d.y * qy + d.z * qz
            w = ((e2x[i] * qx + e2y[i] * qy + e2z[i] * qz)
                 / jnp.where(det == 0, 1.0, det))
            ok = ((det >= 1e-6) & (u >= 0) & (u <= det) & (vv >= 0)
                  & (u + vv <= det) & (w >= t_min) & (w < t_best)
                  & (pid[i] >= 0))
            t_best = jnp.where(ok, w, t_best)
            bnx = jnp.where(ok, nx[i], bnx)
            bny = jnp.where(ok, ny[i], bny)
            bnz = jnp.where(ok, nz[i], bnz)
            bmat = jnp.where(ok, mat[i], bmat)
            bpid = jnp.where(ok, pid[i], bpid)
            bch = tuple(jnp.where(ok, chans[j, i], bch[j]) for j in range(k))
            if with_uv:
                uv1x, uv1y, ue1x, ue1y, ue2x, ue2y, tex = uvs
                inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
                b1 = u * inv_det
                b2 = vv * inv_det
                buv = (jnp.where(ok, uv1x[i] + b1 * ue1x[i] + b2 * ue2x[i],
                                 buv[0]),
                       jnp.where(ok, uv1y[i] + b1 * ue1y[i] + b2 * ue2y[i],
                                 buv[1]),
                       jnp.where(ok, tex[i], buv[2]))
        return (t_best, bnx, bny, bnz, bmat, bpid, bch, buv), None

    zeros = jnp.zeros((n,))
    carry0 = (jnp.full((n,), inf), zeros, zeros, zeros, zeros,
              jnp.full((n,), -1.0), tuple(zeros for _ in range(k)),
              (zeros, zeros, jnp.full((n,), -1.0)))
    uv_xs = ((bt.uv1x, bt.uv1y, bt.ue1x, bt.ue1y, bt.ue2x, bt.ue2y, bt.tex)
             if with_uv else
             tuple(jnp.zeros((bt.v1x.shape[0], 0)) for _ in range(7)))
    xs = (bt.v1x, bt.v1y, bt.v1z, bt.e1x, bt.e1y, bt.e1z, bt.e2x, bt.e2y,
          bt.e2z, bt.nx, bt.ny, bt.nz, bt.mat, bt.pid,
          jnp.moveaxis(bt.channels, 1, 0), uv_xs)
    (t_best, bnx, bny, bnz, bmat, bpid, bch, buv), _ = jax.lax.scan(
        body, carry0, xs)
    if with_uv:
        return t_best, bnx, bny, bnz, bmat, bpid, bch, buv
    return t_best, bnx, bny, bnz, bmat, bpid, bch


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
