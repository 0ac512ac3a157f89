"""Pallas TPU kernel for the large-mesh triangle sweep.

This is the fast path behind `pt_core.closest_hit` for mesh-heavy scenes
(the acc_path_tracing plugin's BVH workload,
`/root/reference/code/components/acc_path_tracing/include/BVH.hpp:93-155`,
`AccPathTracer.cpp:58-62`).  The XLA blocked sweep
(`ops/bvh.py:intersect_triangles_blocked`) is numerically the model, but its
`lax.scan` carries ~23 per-ray arrays through HBM on every 128-triangle
block step — measured ~11x off compute-bound on a bunny-5k wavefront.  Here
the whole sweep is ONE `pallas_call`:

  - grid over ray tiles of SUB_M x 128; ray state and the winner carry
    (t, idx, normal, material) live in vector registers for the entire
    sweep; HBM sees one write per ray per output.
  - triangle data sits in VMEM as BVH-preorder blocks (~250 KB for 5k
    tris), resident across all grid steps (constant index map).
  - per block, a per-ray slab test against the block's AABB gates the
    unrolled 128-triangle Moller-Trumbore sweep behind `lax.cond` — this is
    what the reference's recursive bbox descent buys, without per-ray
    divergence.  The test also culls on the per-ray `t_cap` (the closest
    dense-primitive hit so far, and 0 for dead rays), so rays that already
    found nearer geometry — or are finished — skip the mesh for free.
  - `n_valid` (SMEM scalar) lets whole tiles past a known ray count skip
    the block loop outright.

Design notes from profiling the alternatives (v5e, 2M-ray wavefront,
bunny-5k):

  - host-side ray compaction (`jnp.nonzero(size=n)` + gather/scatter, the
    XLA path's structure) costs ~170 ms/bounce at 2M rays before the sweep
    even starts — the in-kernel tile/block culling achieves the same work
    reduction for free, so this engine deliberately does NOT compact.
  - gathering shading data per winning triangle (normal + 17 material
    channels from flat tables) costs more than the sweep; tracking the
    winner's normal/material as four more carried registers is ~8 extra
    VPU ops per triangle and removes every per-triangle gather.  Material
    channels are reconstructed OUTSIDE the kernel by a small select-chain
    over the (static, tiny) material table.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import BlockedTris, MeshAccel, TrianglePack
from .compact import (pack_indices, shift_pack_channels,
                      shift_unpack_channels)
from .stream_compact import (stream_pack_channels, stream_rows_needed,
                             stream_unpack_channels)
from .soa import V3

def _sub_m() -> int:
    """Ray-tile height: SUB_M x 128 rays per grid program.  Smaller tiles
    tighten the per-tile block UNION (each tile sweeps only blocks whose
    AABB any of its rays enters) at the cost of more grid steps — and the
    entry-cell sort makes adjacent packed rays spatially coherent, so the
    union-tightening is much stronger on sorted buffers.  Read per trace
    (NR_MESH_SUB_M) so A/B sweeps don't need a fresh process."""
    return int(os.environ.get("NR_MESH_SUB_M", "32"))


SUB_M = _sub_m()  # legacy import-time view (pt_pallas megamesh docs only)
LANES = 128


def sweep_tile(bbmin_ref, bbmax_ref, tri_refs, o, d, tcap, *,
               n_blocks: int, b: int, t_min: float, uv_refs=None,
               sub_refs=None, n_sub: int = 1, ord_ref=None):
    """Blocked closest-triangle sweep over ONE ray tile, inside a Pallas
    kernel.  `tri_refs` = the 14 (n_blocks, b) VMEM-resident tables
    (v1, e1, e2, n, mat, pid); `bbmin/bbmax` the (n_blocks, 3) block AABBs
    in SMEM; `o`/`d` V3 of (M, 128) arrays; `tcap` the per-ray upper bound
    (carry in the dense-prim hit t; 0 kills a ray's sweep).

    Returns (t_best, idx_best, nx, ny, nz, mat) — t_best stays at `tcap`
    and idx_best at -1.0 when no triangle beats the cap.  This is the
    shared engine of the standalone `_sweep_kernel` AND the in-megakernel
    mesh path (`pt_pallas._pt_kernel` folds it into the bounce loop so
    mesh scenes never leave VMEM — VERDICT r2 #2).

    `uv_refs` = optional (uv1x, uv1y, ue1x, ue1y, ue2x, ue2y, tex) tables:
    the winner's texture coords are interpolated from its barycentrics
    DURING the sweep (3 more carries, ~8 extra VPU ops per triangle) and
    (uvx, uvy, tex) are appended to the return tuple — this is what lets
    textured meshes stay on the megakernel (VERDICT r2 #4)."""
    (v1x_ref, v1y_ref, v1z_ref, e1x_ref, e1y_ref, e1z_ref, e2x_ref, e2y_ref,
     e2z_ref, nx_ref, ny_ref, nz_ref, mat_ref, pid_ref) = tri_refs
    ox, oy, oz = o.x, o.y, o.z
    dx, dy, dz = d.x, d.y, d.z

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

    if ord_ref is not None:
        # front-to-back visit order for this tile's MAJORITY direction
        # octant (exact for octant-pure sorted tiles; merely approximate
        # order — still correct results — for mixed tiles): with blocks
        # near-to-far, the `t_near < t_best` cull below becomes an early
        # exit once rays have found hits
        oct_ = ((jnp.sum(dx) > 0).astype(jnp.int32) * 4
                + (jnp.sum(dy) > 0).astype(jnp.int32) * 2
                + (jnp.sum(dz) > 0).astype(jnp.int32))

    def blk_body(step, carry):
        blk = ord_ref[oct_, step] if ord_ref is not None else step
        t_best = carry[0]
        # slab test vs this block's AABB (scalars from SMEM); rays whose
        # best hit so far (dense prim, earlier triangle, or a dead ray's
        # zero cap) beats the box entry are culled
        mnx, mny, mnz = bbmin_ref[blk, 0], bbmin_ref[blk, 1], bbmin_ref[blk, 2]
        mxx, mxy, mxz = bbmax_ref[blk, 0], bbmax_ref[blk, 1], bbmax_ref[blk, 2]
        t0x = (mnx - ox) * inv_dx
        t1x = (mxx - ox) * inv_dx
        t0y = (mny - oy) * inv_dy
        t1y = (mxy - oy) * inv_dy
        t0z = (mnz - oz) * inv_dz
        t1z = (mxz - oz) * inv_dz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z))
        # entry point of any in-box hit is max(t_near, t_min): comparing
        # THAT against the cap (not raw t_near, which is negative when the
        # ray ORIGIN is inside the box) is what lets zero-cap dead rays
        # parked on the mesh surface skip every block
        box_hit = ((t_near <= t_far) & (t_far >= t_min)
                   & (jnp.maximum(t_near, t_min) < t_best))

        def sweep(c):
            if uv_refs is not None:
                (uv1x_ref, uv1y_ref, ue1x_ref, ue1y_ref, ue2x_ref,
                 ue2y_ref, tex_ref) = uv_refs
                uv1xr, uv1yr = uv1x_ref[blk], uv1y_ref[blk]
                ue1xr, ue1yr = ue1x_ref[blk], ue1y_ref[blk]
                ue2xr, ue2yr = ue2x_ref[blk], ue2y_ref[blk]
                texr = tex_ref[blk]
            # one vector row load per table per block, then static lane
            # extracts — scalar VMEM loads at a dynamic row index are slow
            # for Mosaic to build; a (B,) row load + B static extracts is not
            v1xr, v1yr, v1zr = v1x_ref[blk], v1y_ref[blk], v1z_ref[blk]
            e1xr, e1yr, e1zr = e1x_ref[blk], e1y_ref[blk], e1z_ref[blk]
            e2xr, e2yr, e2zr = e2x_ref[blk], e2y_ref[blk], e2z_ref[blk]
            nxr, nyr, nzr = nx_ref[blk], ny_ref[blk], nz_ref[blk]
            matr, pidr = mat_ref[blk], pid_ref[blk]

            def tri_run(lo, hi, state):
                # unrolled Moller-Trumbore over triangles [lo, hi),
                # numerically identical to
                # ops/bvh.py:intersect_triangles_blocked (equality-tested)
                if uv_refs is not None:
                    (t_best, idx_best, nx_best, ny_best, nz_best, mat_best,
                     uvx_best, uvy_best, tex_best) = state
                else:
                    (t_best, idx_best, nx_best, ny_best, nz_best,
                     mat_best) = state
                for i in range(lo, hi):
                    v1x, v1y, v1z = v1xr[i], v1yr[i], v1zr[i]
                    e1x, e1y, e1z = e1xr[i], e1yr[i], e1zr[i]
                    e2x, e2y, e2z = e2xr[i], e2yr[i], e2zr[i]
                    pidv = pidr[i]
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det0 = e1x * px + e1y * py + e1z * pz
                    sign = jnp.where(det0 > 0, 1.0, -1.0)
                    det = det0 * sign
                    tx = (ox - v1x) * sign
                    ty = (oy - v1y) * sign
                    tz = (oz - v1z) * sign
                    u = tx * px + ty * py + tz * pz
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    vv = dx * qx + dy * qy + dz * qz
                    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
                    w = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = ((det >= 1e-6) & (u >= 0) & (u <= det) & (vv >= 0)
                          & (u + vv <= det) & (w >= t_min) & (w < t_best)
                          & (pidv >= 0))
                    t_best = jnp.where(ok, w, t_best)
                    idx_best = jnp.where(ok, pidv, idx_best)
                    nx_best = jnp.where(ok, nxr[i], nx_best)
                    ny_best = jnp.where(ok, nyr[i], ny_best)
                    nz_best = jnp.where(ok, nzr[i], nz_best)
                    mat_best = jnp.where(ok, matr[i], mat_best)
                    if uv_refs is not None:
                        bu = u * inv_det
                        bv = vv * inv_det
                        uvx_best = jnp.where(
                            ok, uv1xr[i] + bu * ue1xr[i] + bv * ue2xr[i],
                            uvx_best)
                        uvy_best = jnp.where(
                            ok, uv1yr[i] + bu * ue1yr[i] + bv * ue2yr[i],
                            uvy_best)
                        tex_best = jnp.where(ok, texr[i], tex_best)
                out = (t_best, idx_best, nx_best, ny_best, nz_best, mat_best)
                if uv_refs is not None:
                    out = out + (uvx_best, uvy_best, tex_best)
                return out

            if sub_refs is None or n_sub <= 1:
                return tri_run(0, b, c)
            # sub-block gating: each `step`-triangle run (a contiguous
            # BVH-preorder subtree) is slab-tested against its own AABB
            # and skipped whole when no ray in the tile can beat its
            # current best inside it — conservative, so results are
            # identical to the ungated sweep
            sbmin_ref, sbmax_ref = sub_refs
            step = -(-b // n_sub)
            st = c
            for j in range(n_sub):
                lo, hi = j * step, min((j + 1) * step, b)
                if lo >= hi:
                    break
                smnx = sbmin_ref[blk, j, 0]
                smny = sbmin_ref[blk, j, 1]
                smnz = sbmin_ref[blk, j, 2]
                smxx = sbmax_ref[blk, j, 0]
                smxy = sbmax_ref[blk, j, 1]
                smxz = sbmax_ref[blk, j, 2]
                s0x = (smnx - ox) * inv_dx
                s1x = (smxx - ox) * inv_dx
                s0y = (smny - oy) * inv_dy
                s1y = (smxy - oy) * inv_dy
                s0z = (smnz - oz) * inv_dz
                s1z = (smxz - oz) * inv_dz
                s_near = jnp.maximum(jnp.maximum(jnp.minimum(s0x, s1x),
                                                 jnp.minimum(s0y, s1y)),
                                     jnp.minimum(s0z, s1z))
                s_far = jnp.minimum(jnp.minimum(jnp.maximum(s0x, s1x),
                                                jnp.maximum(s0y, s1y)),
                                    jnp.maximum(s0z, s1z))
                sub_hit = ((s_near <= s_far) & (s_far >= t_min)
                           & (jnp.maximum(s_near, t_min) < st[0]))
                st = jax.lax.cond(
                    jnp.any(sub_hit),
                    functools.partial(tri_run, lo, hi),
                    lambda cc: cc, st)
            return st

        return jax.lax.cond(jnp.any(box_hit), sweep, lambda c: c, carry)

    zeros = jnp.zeros_like(tcap)
    init = (tcap, jnp.full_like(tcap, -1.0), zeros, zeros, zeros, zeros)
    if uv_refs is not None:
        init = init + (zeros, zeros, jnp.full_like(tcap, -1.0))
    return jax.lax.fori_loop(0, n_blocks, blk_body, init)


def sweep_tile_mxu(bbmin_ref, bbmax_ref, coef_ref, shade_rows, o, d, tcap,
                   *, n_blocks: int, b: int, t_min: float, center,
                   sub_m: int, lanes: int = LANES,
                   prec=jax.lax.Precision.HIGHEST):
    """MXU variant of `sweep_tile` (VERDICT r4 #1): the per-block
    Moller-Trumbore test is a `(4B,16)@(16,128)` matmul per ray row against
    host-precomputed bilinear coefficients (`BlockedTris.mxu_coef`), so the
    multiply work rides the systolic array; the VPU only runs the accept
    tests and the winner reduction on the (tris, rays) result panes.

    `shade_rows(blk) -> (5, B)` stacks [nx, ny, nz, mat, pid] for the
    winner-extraction matvec `(5,B)@(B,128)` (one nonzero per column, so
    the f32 sum is exact).  Not bit-identical to the VPU engine — the
    factored coefficients round differently — but centered coordinates
    keep the boundary fuzz ~1e-6 of an edge length (tolerance-tested on
    CPU, `tests/test_mesh_pallas.py`)."""
    cx, cy, cz = center
    oxc, oyc, ozc = o.x - cx, o.y - cy, o.z - cz
    dx, dy, dz = d.x, d.y, d.z
    # o' x d, hoisted once per tile
    rcx = oyc * dz - ozc * dy
    rcy = ozc * dx - oxc * dz
    rcz = oxc * dy - oyc * dx
    ones = jnp.ones_like(oxc)
    zeros = jnp.zeros_like(oxc)
    # (sub_m, 16, 128): per-row ray feature matrices
    feats = jnp.stack([ones, oxc, oyc, ozc, dx, dy, dz, rcx, rcy, rcz,
                       zeros, zeros, zeros, zeros, zeros, zeros], axis=1)

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
    ox, oy, oz = o.x, o.y, o.z
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 0)

    def blk_body(blk, carry):
        t_best = carry[0]
        mnx, mny, mnz = bbmin_ref[blk, 0], bbmin_ref[blk, 1], bbmin_ref[blk, 2]
        mxx, mxy, mxz = bbmax_ref[blk, 0], bbmax_ref[blk, 1], bbmax_ref[blk, 2]
        t0x = (mnx - ox) * inv_dx
        t1x = (mxx - ox) * inv_dx
        t0y = (mny - oy) * inv_dy
        t1y = (mxy - oy) * inv_dy
        t0z = (mnz - oz) * inv_dz
        t1z = (mxz - oz) * inv_dz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z))
        box_hit = ((t_near <= t_far) & (t_far >= t_min)
                   & (jnp.maximum(t_near, t_min) < t_best))

        def sweep(c):
            t_best, idx_best, nx_best, ny_best, nz_best, mat_best = c
            A = coef_ref[blk]          # (4b, 16)
            chs = shade_rows(blk)      # (5, b): nx, ny, nz, mat, pid
            rows = []                  # per-row (t, idx, nx, ny, nz, mat)
            for m in range(sub_m):
                # never below HIGH: the TPU default matmul precision is
                # bf16, whose 8 mantissa bits break the eps/boundary
                # tests (and the pid extraction outright: 5000 -> +-16)
                C = jnp.dot(A, feats[m], precision=prec,
                            preferred_element_type=jnp.float32)  # (4b, L)
                det = C[0 * b:1 * b]
                u = C[1 * b:2 * b]
                v = C[2 * b:3 * b]
                wp = C[3 * b:4 * b]
                s = jnp.where(det >= 0, 1.0, -1.0)
                ad = det * s
                t1 = u * s
                t2 = v * s
                ws = wp * s
                tb = t_best[m][None, :]          # (1, 128)
                # ws/ad compares are done cross-multiplied (ad > 0 on any
                # candidate); tb=inf with ad=0 padding gives NaN, which
                # compares false — exactly the rejection we want
                ok = ((ad >= 1e-6) & (t1 >= 0) & (t1 <= ad) & (t2 >= 0)
                      & (t1 + t2 <= ad) & (ws >= t_min * ad)
                      & (ws < tb * ad))
                w = ws / jnp.where(ad == 0, 1.0, ad)
                wmask = jnp.where(ok, w, jnp.inf)
                wmin = jnp.min(wmask, axis=0)    # (128,)
                valid = wmin < t_best[m]
                # first tri achieving wmin wins (strict-< keeps block order
                # semantics identical to the VPU chain)
                eq = wmask == wmin[None, :]
                iwin = jnp.min(jnp.where(eq, iota, jnp.int32(b)), axis=0)
                fm = ((iota == iwin[None, :]) & eq).astype(jnp.float32)
                ext = jnp.dot(chs, fm, precision=prec,
                              preferred_element_type=jnp.float32)
                rows.append((jnp.where(valid, wmin, t_best[m]),
                             jnp.where(valid, ext[4], idx_best[m]),
                             jnp.where(valid, ext[0], nx_best[m]),
                             jnp.where(valid, ext[1], ny_best[m]),
                             jnp.where(valid, ext[2], nz_best[m]),
                             jnp.where(valid, ext[3], mat_best[m])))
            # carries are rebuilt whole by stacking the row results —
            # Mosaic lowers neither scatter nor dynamic_update_slice, and
            # a concatenate of static rows is just vreg writes
            return tuple(
                jnp.concatenate([r[q][None, :] for r in rows], axis=0)
                for q in range(6))

        return jax.lax.cond(jnp.any(box_hit), sweep, lambda c: c, carry)

    zeros_c = jnp.zeros_like(tcap)
    init = (tcap, jnp.full_like(tcap, -1.0), zeros_c, zeros_c, zeros_c,
            zeros_c)
    return jax.lax.fori_loop(0, n_blocks, blk_body, init)


def _sweep_kernel_mxu(nvalid_ref, bbmin_ref, bbmax_ref, coef_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tcap_ref, nx_ref, ny_ref, nz_ref, mat_ref, pid_ref,
                      t_out, idx_out, nx_out, ny_out, nz_out, mat_out, *,
                      n_blocks: int, b: int, t_min: float, center,
                      rows: int, lanes: int, prec):
    base = pl.program_id(0) * (rows * lanes)
    o = V3(ox_ref[0], oy_ref[0], oz_ref[0])
    d = V3(dx_ref[0], dy_ref[0], dz_ref[0])
    tcap = tcap_ref[0]

    def shade_rows(blk):
        return jnp.stack([nx_ref[blk], ny_ref[blk], nz_ref[blk],
                          mat_ref[blk], pid_ref[blk]])

    zeros = jnp.zeros((rows, lanes), jnp.float32)
    init = (tcap, jnp.full((rows, lanes), -1.0, jnp.float32),
            zeros, zeros, zeros, zeros)
    out = jax.lax.cond(
        base < nvalid_ref[0],
        lambda c: sweep_tile_mxu(bbmin_ref, bbmax_ref, coef_ref, shade_rows,
                                 o, d, tcap, n_blocks=n_blocks, b=b,
                                 t_min=t_min, center=center, sub_m=rows,
                                 lanes=lanes, prec=prec),
        lambda c: c, init)
    t_best, idx_best, nx_best, ny_best, nz_best, mat_best = out

    t_out[0] = jnp.where(idx_best >= 0, t_best, jnp.float32(jnp.inf))
    idx_out[0] = idx_best
    nx_out[0] = nx_best
    ny_out[0] = ny_best
    nz_out[0] = nz_best
    mat_out[0] = mat_best


@functools.lru_cache(maxsize=64)
def _build_sweep_mxu(n_tiles: int, n_blocks: int, b: int, t_min: float,
                     interpret: bool, rows: int, lanes: int, center,
                     prec_name: str = "highest"):
    # Mosaic's dot lowering supports only DEFAULT and HIGHEST; DEFAULT
    # (bf16) breaks the eps tests and the pid extraction, so HIGHEST is
    # the only usable precision (prec_name kept for a future Mosaic)
    prec = jax.lax.Precision.HIGHEST
    kernel = functools.partial(_sweep_kernel_mxu, n_blocks=n_blocks, b=b,
                               t_min=t_min, center=center, rows=rows,
                               lanes=lanes, prec=prec)
    ray_shape = jax.ShapeDtypeStruct((n_tiles, rows, lanes), jnp.float32)
    ray_block = pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # resident, unblocked
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(n_valid, bb_min, bb_max, coef, rays, tris):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[smem] * 3 + [tri_spec] + [ray_block] * 7
            + [tri_spec] * 5,
            out_shape=(ray_shape,) * 6,
            out_specs=(ray_block,) * 6,
            interpret=interpret,
        )(n_valid, bb_min, bb_max, coef, *rays, *tris)

    return run


def _sweep_kernel(nvalid_ref, bbmin_ref, bbmax_ref, sbmin_ref, sbmax_ref,
                  ord_ref, ox_ref, oy_ref, oz_ref,
                  dx_ref, dy_ref, dz_ref, tcap_ref, v1x_ref, v1y_ref,
                  v1z_ref, e1x_ref, e1y_ref, e1z_ref, e2x_ref, e2y_ref,
                  e2z_ref, nx_ref, ny_ref, nz_ref, mat_ref, pid_ref,
                  t_out, idx_out, nx_out, ny_out, nz_out, mat_out, *,
                  n_blocks: int, b: int, t_min: float, n_sub: int,
                  sub_m: int, f2b: bool):
    base = pl.program_id(0) * (sub_m * LANES)
    tri_refs = (v1x_ref, v1y_ref, v1z_ref, e1x_ref, e1y_ref, e1z_ref,
                e2x_ref, e2y_ref, e2z_ref, nx_ref, ny_ref, nz_ref,
                mat_ref, pid_ref)
    o = V3(ox_ref[0], oy_ref[0], oz_ref[0])
    d = V3(dx_ref[0], dy_ref[0], dz_ref[0])
    tcap = tcap_ref[0]

    zeros = jnp.zeros((sub_m, LANES), jnp.float32)
    init = (tcap, jnp.full((sub_m, LANES), -1.0, jnp.float32),
            zeros, zeros, zeros, zeros)
    sub_refs = (sbmin_ref, sbmax_ref) if n_sub > 1 else None
    out = jax.lax.cond(
        base < nvalid_ref[0],
        lambda c: sweep_tile(bbmin_ref, bbmax_ref, tri_refs, o, d, tcap,
                             n_blocks=n_blocks, b=b, t_min=t_min,
                             sub_refs=sub_refs, n_sub=n_sub,
                             ord_ref=ord_ref if f2b else None),
        lambda c: c, init)
    t_best, idx_best, nx_best, ny_best, nz_best, mat_best = out

    t_out[0] = jnp.where(idx_best >= 0, t_best, jnp.float32(jnp.inf))
    idx_out[0] = idx_best
    nx_out[0] = nx_best
    ny_out[0] = ny_best
    nz_out[0] = nz_best
    mat_out[0] = mat_best


@functools.lru_cache(maxsize=64)
def _build_sweep(n_tiles: int, n_blocks: int, b: int, t_min: float,
                 interpret: bool, n_sub: int = 1, sub_m: int = 32,
                 f2b: bool = False):
    kernel = functools.partial(_sweep_kernel, n_blocks=n_blocks, b=b,
                               t_min=t_min, n_sub=n_sub, sub_m=sub_m,
                               f2b=f2b)
    ray_shape = jax.ShapeDtypeStruct((n_tiles, sub_m, LANES), jnp.float32)
    ray_block = pl.BlockSpec((1, sub_m, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # resident, unblocked
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(n_valid, bb_min, bb_max, sb_min, sb_max, f2b_ord, rays, tris):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[smem] * 6 + [ray_block] * 7 + [tri_spec] * 14,
            out_shape=(ray_shape,) * 6,
            out_specs=(ray_block,) * 6,
            interpret=interpret,
        )(n_valid, bb_min, bb_max, sb_min, sb_max, f2b_ord, *rays, *tris)

    return run


def sweep_mesh_full(bt: BlockedTris, o: V3, d: V3, t_min: float,
                    t_cap=None, n_valid=None, interpret: bool = None,
                    f2b: bool = None):
    """Closest-triangle sweep for a component-SoA ray batch on the Pallas
    kernel.  `t_cap`: optional per-ray upper bound (e.g. the dense-prim hit
    distance, or 0 for rays to skip entirely) — hits at or beyond it are
    not reported, which both matches the caller's merge rule and powers
    block culling.  `n_valid`: number of leading rays that are real.

    Returns (t, idx, nx, ny, nz, mat): t=+inf, idx=-1 (int32) and
    zero-filled shading on miss."""
    if interpret is None:  # CPU (tests / virtual mesh) runs interpreted
        interpret = jax.default_backend() == "cpu"
    n = o.x.shape[0]
    sub_m = _sub_m()
    tile = sub_m * LANES
    n_tiles = pl.cdiv(n, tile)
    n_pad = n_tiles * tile

    inf = jnp.float32(jnp.inf)
    if t_cap is None:
        t_cap = jnp.full((n,), inf)
    if n_valid is None:
        n_valid = jnp.int32(n)
    else:
        # The kernel's n_valid check skips whole sub_m*128 tiles; rays in a
        # partially-valid tile must be masked per-ray too, or hits past an
        # unaligned n_valid leak out (ADVICE r2).  t_cap=0 makes a ray
        # unsatisfiable (no w with t_min <= w < 0).
        t_cap = jnp.where(jnp.arange(n) < jnp.asarray(n_valid, jnp.int32),
                         t_cap, 0.0)

    def prep(a, fill=0.0):
        a = a.astype(jnp.float32)
        if n_pad != n:
            a = jnp.concatenate(
                [a, jnp.full((n_pad - n,), fill, jnp.float32)])
        return a.reshape(n_tiles, sub_m, LANES)

    # padded rays get t_cap=0: no w can satisfy t_min <= w < 0
    rays = (prep(o.x), prep(o.y), prep(o.z), prep(d.x), prep(d.y), prep(d.z),
            prep(t_cap, fill=0.0))
    tris = (bt.v1x, bt.v1y, bt.v1z, bt.e1x, bt.e1y, bt.e1z, bt.e2x, bt.e2y,
            bt.e2z, bt.nx, bt.ny, bt.nz, bt.mat, bt.pid)

    # MXU engine (NR_MESH_MXU=1): bilinear-form Moller-Trumbore on the
    # systolic array.  Needs the coefficient table AND a concrete accel
    # (the center is a STATIC kernel parameter) — traced accels (equality
    # tests jit the accel as an argument) fall back to the VPU engine.
    if (os.environ.get("NR_MESH_MXU", "0") == "1"
            and bt.mxu_coef is not None and bt.mxu_center is not None):
        try:
            center = tuple(float(c) for c in bt.mxu_center)
        except Exception:
            center = None
        if center is not None:
            # G lane-rows share one matmul: the (rows, lanes) view of the
            # 4096-ray tile is the SAME memory layout ((32,128) ->
            # (8,512) is a free reinterpretation outside the kernel), and
            # (4B,16)@(16,512) amortizes the MXU's per-matmul overhead
            # 4x over (16,128) panes
            g = max(1, int(os.environ.get("NR_MESH_MXU_G", "4")))
            g = min(g, sub_m)
            rows_m, lanes_m = sub_m // g, LANES * g
            rays_m = tuple(r.reshape(n_tiles, rows_m, lanes_m)
                           for r in rays)
            run = _build_sweep_mxu(
                n_tiles, int(bt.v1x.shape[0]), int(bt.block), float(t_min),
                bool(interpret), rows_m, lanes_m, center,
                os.environ.get("NR_MESH_MXU_PREC", "highest"))
            outs = run(jnp.asarray(n_valid, jnp.int32).reshape(1),
                       bt.bb_min, bt.bb_max, bt.mxu_coef, rays_m,
                       (bt.nx, bt.ny, bt.nz, bt.mat, bt.pid))
            t, idx, nx, ny, nz, mat = (a.reshape(-1)[:n] for a in outs)
            return t, idx.astype(jnp.int32), nx, ny, nz, mat

    # sub-block gating (NR_MESH_SUBBLK, default on at build granularity):
    # older pools without sub-AABBs and an explicit =0 both disable it
    sb_min, sb_max = bt.sb_min, bt.sb_max
    if sb_min is None or os.environ.get("NR_MESH_SUBBLK", "32") == "0":
        sb_min = jnp.zeros((1, 1, 3), jnp.float32)
        sb_max = jnp.zeros((1, 1, 3), jnp.float32)
        n_sub = 1
    else:
        n_sub = int(sb_min.shape[1])

    # front-to-back visit order: with the existing `t_near < t_best` box
    # cull, near-to-far blocks let rays that found hits skip all farther
    # blocks (~5% on the real bunny chain, free).  Callers pass True
    # (renders, via intersect_triangles_mesh) or leave None = NR_MESH_F2B
    # env, default OFF — order changes which tri wins EXACT-t ties, so
    # direct-call bit-parity tests hold only on the natural order.
    if f2b is None:
        f2b = os.environ.get("NR_MESH_F2B", "0") == "1"
    f2b = bool(f2b) and bt.f2b_ord is not None
    f2b_ord = (bt.f2b_ord if bt.f2b_ord is not None
               else jnp.zeros((8, 1), jnp.int32))
    run = _build_sweep(n_tiles, int(bt.v1x.shape[0]), int(bt.block),
                       float(t_min), bool(interpret), n_sub, sub_m, f2b)
    outs = run(jnp.asarray(n_valid, jnp.int32).reshape(1),
               bt.bb_min, bt.bb_max, sb_min, sb_max, f2b_ord, rays, tris)
    t, idx, nx, ny, nz, mat = (a.reshape(-1)[:n] for a in outs)
    return t, idx.astype(jnp.int32), nx, ny, nz, mat


def sweep_mesh_pallas(bt: BlockedTris, o: V3, d: V3, t_min: float,
                      t_cap=None, n_valid=None, interpret: bool = None):
    """(t, idx)-only view of `sweep_mesh_full`."""
    t, idx, *_ = sweep_mesh_full(bt, o, d, t_min, t_cap=t_cap,
                                 n_valid=n_valid, interpret=interpret)
    return t, idx


def _channels_from_mat(mat, miss, mat_channels):
    """Reconstruct the tracked per-ray channel tuple from the winner's
    material id by a select-chain over the static material table — the
    table is tiny (a handful of materials), so K x n_mats vector selects
    beat K per-triangle gathers by a wide margin."""
    k = len(mat_channels[0]) if mat_channels else 0
    chans = []
    for ki in range(k):
        out = jnp.full_like(mat, float(mat_channels[0][ki]))
        for mi in range(1, len(mat_channels)):
            out = jnp.where(mat == float(mi), float(mat_channels[mi][ki]),
                            out)
        chans.append(jnp.where(miss, 0.0, out))
    return tuple(chans)


MESH_COMPACT_FRACTION = 4   # compacted ray buffer = N / this.  N/8 was
# the right cap when the pack paid per-element gather cost; the shift
# pack is cap-independent, and N/4 keeps the 10-18% AABB-rate camera and
# early bounces from overflowing into scattered full sweeps (bunny-5k
# 256spp: 24.5 -> 16.1 s).  Idle tail tiles are n_valid-skipped.
MESH_COMPACT_MIN = 64 * 1024  # below this wavefront size, skip compaction


def intersect_triangles_mesh(ma: MeshAccel, o: V3, d: V3, t_min: float,
                             t_dense, mat_channels, alive=None,
                             interpret: bool = None, cap: int = None,
                             sort: bool = None):
    """Mesh intersection for a full wavefront on the Pallas sweep engine.

    `t_dense`: the already-found dense-primitive hit distance per ray
    (culls triangle work behind nearer geometry).  `alive`: optional mask —
    finished rays get a zero cap and skip the mesh entirely (the lockstep
    wavefront keeps dead lanes; this makes them free here).

    Mesh-AABB ray COMPACTION (round 3): every ray is slab-tested against
    the mesh's TOP-LEVEL AABB in plain XLA (~3 ms at 8M rays); rays that
    can't reach the mesh — dead lanes, rays pointing away, rays whose
    dense-prim hit is nearer than the box entry — get `t_cap = 0`, and
    the survivors (5-18% on bunny-5k bounce wavefronts) are packed into a
    `cap = N/4` buffer for the sweep, the results distributed back.  The
    pack is the single-pass Pallas STREAMING COMPACTOR by default
    (`ops/stream_compact.py`, round 4: pack 1.6 + unpack 2.3 ms at 16M
    rays in situ, vs ~131 ms for the XLA log-shift engine it replaced —
    `NR_MESH_PACK=shift` restores that one, `=scatter` the r3-early
    cumsum-pack + gathers), and the compacted buffer is entry-cell
    SORTED before the sweep by default (see NR_MESH_SORT below).
    Overflow (> cap survivors) falls back via
    `lax.cond` to the UNCOMPACTED sweep with the zeroed caps — which is
    exactly right for the one place it fires, the near-coherent camera
    bounce (17.8% AABB rate on the reference bunny framing): coherent
    rays cluster by tile, so the in-kernel tile/block gating works and
    the full sweep is cheap.  SCATTERED bounces are the opposite — ~1
    AABB-hitting ray per 32x128 tile defeats the gating (measured 57 s
    whole-render full-sweep vs 36 s compacted) — which is why compaction
    is the default.  Block-granular packing was tried and reverted: 99%
    of 128-ray rows are live from bounce 1 on, so row packing recreates
    the lockstep divergence it was meant to remove (97 s whole-render).
    `NR_MESH_COMPACT=0` forces the zero-cap full sweep everywhere;
    `NR_MESH_COMPACT_FRACTION` overrides the cap = N/fraction sizing
    (the shift pack's cost is cap-independent, so a wider cap only costs
    sweep-grid size).

    Returns the `intersect_triangles_blocked` result tuple
    (t, nx, ny, nz, mat_id, prim_id, channels)."""
    t_cap = t_dense
    if alive is not None:
        t_cap = jnp.where(alive, t_cap, 0.0)
    n = o.x.shape[0]
    compact = os.environ.get("NR_MESH_COMPACT", "1") != "0"
    # renders run the front-to-back block order by default (free ~5% on
    # the real chain); NR_MESH_F2B=0 restores the natural preorder
    f2b = os.environ.get("NR_MESH_F2B", "1") != "0"
    if cap is None:
        frac = int(os.environ.get("NR_MESH_COMPACT_FRACTION",
                                  str(MESH_COMPACT_FRACTION)))
        cap = max(1024, n // frac)
    cap = max(1024, -(-cap // 4096) * 4096)  # tile-align for the sweep
    if n < MESH_COMPACT_MIN or (compact and cap >= n):
        t, idx, nx, ny, nz, mat = sweep_mesh_full(ma.bt, o, d, t_min,
                                                  t_cap=t_cap,
                                                  interpret=interpret,
                                                  f2b=f2b)
        miss = idx < 0
        chans = _channels_from_mat(mat, miss, mat_channels)
        pid = jnp.where(miss, -1.0, idx.astype(jnp.float32))
        return t, nx, ny, nz, mat, pid, chans

    # top-level mesh AABB slab test (same culling rule as the in-sweep
    # per-block test: a ray whose current cap beats the box entry skips)
    mesh_min = ma.bt.bb_min.min(axis=0)
    mesh_max = ma.bt.bb_max.max(axis=0)

    def axis(mn, mx, oo, dd):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
        t0 = (mn - oo) * inv
        t1 = (mx - oo) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    nx0, nx1 = axis(mesh_min[0], mesh_max[0], o.x, d.x)
    ny0, ny1 = axis(mesh_min[1], mesh_max[1], o.y, d.y)
    nz0, nz1 = axis(mesh_min[2], mesh_max[2], o.z, d.z)
    t_near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
    t_far = jnp.minimum(jnp.minimum(nx1, ny1), nz1)
    m = ((t_near <= t_far) & (t_far >= t_min)
         & (jnp.maximum(t_near, t_min) < t_cap))
    # rays that can't reach the mesh get a zero cap: every in-kernel block
    # slab test fails for them, and all-dead tiles skip the block loop
    t_cap = jnp.where(m, t_cap, 0.0)

    if not compact:
        t, idx, nxs, nys, nzs, mat = sweep_mesh_full(
            ma.bt, o, d, t_min, t_cap=t_cap, interpret=interpret, f2b=f2b)
        miss = idx < 0
        chans = _channels_from_mat(mat, miss, mat_channels)
        pid = jnp.where(miss, -1.0, idx.astype(jnp.float32))
        return t, nxs, nys, nzs, mat, pid, chans

    n_hit = jnp.sum(m.astype(jnp.int32))

    inf = jnp.float32(jnp.inf)
    # Pack engine: "shift" = log-shift compaction, ~23 roll+select
    # streaming passes, no gathers (ops/compact.shift_pack_channels);
    # "scatter" = cumsum-pack + 7 per-element gathers (the r3-early form;
    # TPU gathers run ~140M elem/s, ~105 ms at 8M rays vs ~25 ms shifted);
    # "row" = ROW-granular pack: gather whole 128-lane rows that contain
    # any AABB hit (TPU moves whole rows ~45x faster than elements), dead
    # lanes ride along with t_cap=0 and skip in-kernel.  Wins when the
    # live mask is row-clustered (real bunny wavefronts: the mask is the
    # mesh's screen footprint, measured ~60-128 live lanes per live row);
    # each channel is read ONCE instead of 23 shift passes.
    pack_mode = os.environ.get("NR_MESH_PACK", "stream")
    if pack_mode == "row":
        if n % LANES == 0:
            return _row_packed_sweep(ma, o, d, t_min, t_cap, m, cap,
                                     mat_channels, interpret, f2b)
        pack_mode = "shift"  # row granularity needs whole 128-lane rows
    # "stream" = the single-pass Pallas streaming compactor
    # (ops/stream_compact.py): each channel is read ONCE and the packed
    # buffer written once, vs the XLA shift pack's ~23 roll+select passes
    # which XLA fails to fuse IN SITU (~131 ms of a 217 ms bounce at 16M
    # rays, r4 device-op trace).  Layout is per-tile column-packed (the
    # sweep is position-independent per ray, so results are bit-identical
    # to the shift engine); overflow guards on the pack's own row-claim
    # arithmetic instead of the raw hit count.

    # Entry-cell SORT (round 3, OFF by default): on a SHUFFLED all-hitting
    # population, sorting the compacted buffer by quantized box-entry cell
    # collapses the sweep's per-tile block union (79.6 -> 11 ms/M rays,
    # sort ~4.6 ms/M — tools/perf/real_mask_bench.py).  But on the REAL
    # bunny render it LOSES (13.0 -> 14.1 s whole-render): the stable
    # shift pack preserves pixel order, so real bounce wavefronts are
    # already tile-coherent and the two 8-channel sorts at cap=4M cost
    # more than the residual divergence.  Kept behind NR_MESH_SORT=1 for
    # scenes whose wavefronts genuinely shuffle (synthetic ray sets,
    # secondary-bounce-heavy geometry).
    # `sort`: explicit override of the NR_MESH_SORT default — the staged
    # wavefront passes False for the PEELED camera bounce (pixel-coherent
    # rays gain nothing from the entry-cell sort but pay its largest
    # window: the r4 numbers are 36.6 ms sweep + ~48 ms sorts sorted vs
    # 54.5 ms sweep unsorted at bounce 0)
    def _sort_on(env_default):
        if sort is not None:
            return sort
        return os.environ.get("NR_MESH_SORT", env_default) != "0"

    sort_rays = pack_mode == "shift" and _sort_on("0")

    # NR_MESH_CELL_Q: per-axis quantization of the box-entry cell (key =
    # cell * 8 + direction octant).  Default 2 (r5-measured sweet spot on
    # the bunny-5k chain: 8 -> 909 ms of sweeps, 2 -> 761 ms, 1 -> 1040):
    # the sort is STABLE, so coarser keys keep more of the pack's pixel
    # order inside each bucket — finer cells scatter screen-coherent
    # neighbors into different buckets and the tile unions grow back.
    cell_q = int(os.environ.get("NR_MESH_CELL_Q", "2"))

    def entry_cell(oc, dc):
        def axis(mn, mx, oo, dd):
            inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
            t0 = (mn - oo) * inv
            t1 = (mx - oo) * inv
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        ex0, _ = axis(mesh_min[0], mesh_max[0], oc.x, dc.x)
        ey0, _ = axis(mesh_min[1], mesh_max[1], oc.y, dc.y)
        ez0, _ = axis(mesh_min[2], mesh_max[2], oc.z, dc.z)
        tn = jnp.maximum(
            jnp.maximum(jnp.maximum(ex0, ey0), ez0), jnp.float32(t_min))
        q = lambda v, mn, mx: jnp.clip(
            ((v - mn) / (mx - mn) * cell_q).astype(jnp.int32), 0,
            cell_q - 1)
        cell = (q(oc.x + tn * dc.x, mesh_min[0], mesh_max[0]) * cell_q**2
                + q(oc.y + tn * dc.y, mesh_min[1], mesh_max[1]) * cell_q
                + q(oc.z + tn * dc.z, mesh_min[2], mesh_max[2]))
        oct_ = ((dc.x > 0).astype(jnp.int32) * 4
                + (dc.y > 0).astype(jnp.int32) * 2
                + (dc.z > 0).astype(jnp.int32))
        return cell * 8 + oct_

    # (idx, mat) fold: both are small non-negative ids, so
    # mat * 2^17 + idx is EXACT in f32 when it stays below 2^24
    # (the ids are static table data, checked at trace time) —
    # one unpack channel instead of two, and the unpack is pure
    # HBM streaming, so bytes are time (~17%: one of six equal-
    # width unpack channels dropped; the per-channel split is in
    # the r3 profiler trace, tools/perf/trace_mesh.py).
    try:
        # the accel is normally a trace-time CONSTANT (renderers
        # close over it); a traced accel (equality tests jit it as
        # an argument) has no concrete ids — skip the fold there
        pid_max = float(np.max(ma.bt.pid))
        mat_max = float(np.max(ma.bt.mat))
    except Exception:
        pid_max = mat_max = float("inf")
    # exactness precondition checked on the CONCRETE ids:
    # mat * 2^17 + pid < 2^24  <=>  mat <= 127 given pid < 2^17
    fold = pid_max < 131071.5 and mat_max < 127.5

    def stream_compacted(_):
        sp = stream_pack_channels(
            (o.x, o.y, o.z, d.x, d.y, d.z, t_cap), cap, mask_from=6,
            interpret=interpret)
        oc = V3(sp.packed[0], sp.packed[1], sp.packed[2])
        dc = V3(sp.packed[3], sp.packed[4], sp.packed[5])
        if _sort_on("1"):
            # entry-cell sort of the COMPACTED buffer (stream-engine
            # DEFAULT; bunny-5k 9.1 -> 7.6 s): mid-chain bounce
            # wavefronts scatter (r4 chain_trace: sweep 54.5 ms at the
            # coherent camera bounce -> 238.7 ms at bounce 1, full
            # block-union saturation), and with the stream pack the pipe
            # cost around the sweep is ~4 ms, so the two lax.sorts that
            # LOST against the shift pack's pipe in r3 can now pay.
            # Garbage slots (pack claims + the unflushed tail, whose
            # t_cap bits are uninitialized) are keyed to sort LAST and
            # killed by a zeroed cap.
            #
            # WINDOWED (round 5): the two sorts were 43% of a real chain
            # (970 of 2238 ms at 16M rays) because they always process
            # the full cap while the live count collapses with depth
            # (AABB hits on the bunny chain: 2.85M at bounce 0, <1M from
            # bounce 4, <0.25M from bounce 12 — tools/perf/aabb_counts.py).
            # Both sorts therefore run on the smallest power-of-2 slice
            # that holds n_valid (lax.switch; the tail is dead slots with
            # zeroed caps, already in place), cutting sort work ~4x on a
            # real chain at identical results.
            cap_pad = sp.packed[0].shape[0]
            pslot = jnp.arange(cap_pad, dtype=jnp.int32)
            tc = jnp.where(pslot < sp.n_valid, sp.packed[6], 0.0)
            key = jnp.where(tc > 0.0, entry_cell(oc, dc),
                            jnp.int32(1 << 30))
            levels = [cap_pad]
            max_levels = int(os.environ.get("NR_MESH_SORT_LEVELS", "5"))
            while (len(levels) < max_levels
                   and levels[-1] // 2 >= 64 * 1024):
                levels.append(levels[-1] // 2)
            lvl = jnp.int32(0)
            for j, wj in enumerate(levels[1:], 1):
                lvl = jnp.where(sp.n_valid <= wj, jnp.int32(j), lvl)

            def _windowed_sort(w):
                def br(args):
                    out = jax.lax.sort(tuple(a[:w] for a in args),
                                       num_keys=1)
                    return tuple(jnp.concatenate([s, a[w:]])
                                 for s, a in zip(out, args))
                return br

            (_, ox, oy, oz, dx, dy, dz, tcs, p_carried) = jax.lax.switch(
                lvl, [_windowed_sort(w) for w in levels],
                (key, oc.x, oc.y, oc.z, dc.x, dc.y, dc.z, tc, pslot))
            oc, dc = V3(ox, oy, oz), V3(dx, dy, dz)
            t, idx, nxs, nys, nzs, mat = sweep_mesh_full(
                ma.bt, oc, dc, t_min, t_cap=tcs, interpret=interpret,
                f2b=f2b)
            # unsort: p_carried is a permutation — a unique-key sort over
            # the SAME window restores pack-slot order for the streaming
            # unpack (slots past the window were never moved)
            (_, t, idx, nxs, nys, nzs, mat) = jax.lax.switch(
                lvl, [_windowed_sort(w) for w in levels],
                (p_carried, t, idx, nxs, nys, nzs, mat))
        else:
            t, idx, nxs, nys, nzs, mat = sweep_mesh_full(
                ma.bt, oc, dc, t_min, t_cap=sp.packed[6],
                n_valid=sp.n_valid, interpret=interpret, f2b=f2b)
        if fold:
            code = jnp.where(idx >= 0,
                             mat * 131072.0 + idx.astype(jnp.float32),
                             -1.0)
            t, code, nxs, nys, nzs = stream_unpack_channels(
                t_cap, (t, code, nxs, nys, nzs),
                (float("inf"), -1.0, 0.0, 0.0, 0.0), sp,
                interpret=interpret)
            hitm = code >= 0
            mat = jnp.where(hitm, jnp.floor(code * (1.0 / 131072.0)), 0.0)
            idx = jnp.where(hitm, code - mat * 131072.0,
                            -1.0).astype(jnp.int32)
            return t, idx, nxs, nys, nzs, mat
        # traced-accel fallback: idx rides as f32 (exact below 2^24 —
        # mesh prim counts are far smaller), mat as its own channel
        t, idxf, nxs, nys, nzs, mat = stream_unpack_channels(
            t_cap, (t, idx.astype(jnp.float32), nxs, nys, nzs, mat),
            (float("inf"), -1.0, 0.0, 0.0, 0.0, 0.0), sp,
            interpret=interpret)
        return t, idxf.astype(jnp.int32), nxs, nys, nzs, mat

    def compacted(_):
        if pack_mode == "shift":
            (ox, oy, oz, dx, dy, dz, tcc), ridx, nh = shift_pack_channels(
                m, (o.x, o.y, o.z, d.x, d.y, d.z, t_cap), cap)
            oc, dc, tc_cap = V3(ox, oy, oz), V3(dx, dy, dz), tcc
        else:
            ridx = pack_indices(m, cap)
            g = jnp.clip(ridx, 0, n - 1)
            take = lambda a: jnp.take(a, g, mode="clip")
            oc = V3(take(o.x), take(o.y), take(o.z))
            dc = V3(take(d.x), take(d.y), take(d.z))
            tc_cap = take(t_cap)
        if sort_rays:
            pslot = jnp.arange(cap, dtype=jnp.int32)
            key = jnp.where(pslot < n_hit, entry_cell(oc, dc),
                            jnp.int32(1 << 30))  # pads sort last
            (_, ox, oy, oz, dx, dy, dz, tcc, p_carried) = jax.lax.sort(
                (key, oc.x, oc.y, oc.z, dc.x, dc.y, dc.z, tc_cap, pslot),
                num_keys=1)
            oc, dc, tc_cap = V3(ox, oy, oz), V3(dx, dy, dz), tcc
        t, idx, nxs, nys, nzs, mat = sweep_mesh_full(
            ma.bt, oc, dc, t_min, t_cap=tc_cap, n_valid=n_hit,
            interpret=interpret, f2b=f2b)
        if sort_rays:
            # unsort: p_carried is a permutation of [0, cap) — a second
            # unique-key sort restores pack-slot order for the unpack
            (_, t, idx, nxs, nys, nzs, mat) = jax.lax.sort(
                (p_carried, t, idx, nxs, nys, nzs, mat), num_keys=1)
        if pack_mode == "shift":
            # results ride back on the REVERSED shift steps — the 6
            # per-element scatter-backs were the pipe's single largest
            # cost once the pack went gather-free (~80 of 206 ms/bounce
            # at 8M rays, measured with all outputs consumed)
            zeros = jnp.zeros((n,))
            if fold:
                code = jnp.where(idx >= 0,
                                 mat * 131072.0 + idx.astype(jnp.float32),
                                 -1.0)
                t, code, nxs, nys, nzs = shift_unpack_channels(
                    m, (t, code, nxs, nys, nzs),
                    (jnp.full((n,), inf), jnp.full((n,), -1.0),
                     zeros, zeros, zeros), ridx=ridx)
                hitm = code >= 0
                mat = jnp.where(hitm, jnp.floor(code * (1.0 / 131072.0)),
                                0.0)
                idx = jnp.where(hitm, code - mat * 131072.0,
                                -1.0).astype(jnp.int32)
                return t, idx, nxs, nys, nzs, mat
            return shift_unpack_channels(
                m, (t, idx, nxs, nys, nzs, mat),
                (jnp.full((n,), inf), jnp.full((n,), -1, jnp.int32),
                 zeros, zeros, zeros, zeros), ridx=ridx)
        scat = lambda init, vals: init.at[ridx].set(
            vals, mode="drop", indices_are_sorted=True, unique_indices=True)
        return (scat(jnp.full((n,), inf), t),
                scat(jnp.full((n,), -1, jnp.int32), idx),
                scat(jnp.zeros((n,)), nxs), scat(jnp.zeros((n,)), nys),
                scat(jnp.zeros((n,)), nzs), scat(jnp.zeros((n,)), mat))

    def full_sweep(_):
        return sweep_mesh_full(ma.bt, o, d, t_min, t_cap=t_cap,
                               interpret=interpret, f2b=f2b)

    if pack_mode == "stream":
        # the stream pack claims ceil(max_col_cnt/8)*8 rows per tile —
        # guard on ITS row arithmetic, not the raw hit count
        overflow = stream_rows_needed(m) * LANES > cap
        branch = stream_compacted
    else:
        overflow = n_hit > cap
        branch = compacted
    t, idx, nxs, nys, nzs, mat = jax.lax.cond(
        overflow, full_sweep, branch, operand=None)
    miss = idx < 0
    chans = _channels_from_mat(mat, miss, mat_channels)
    pid = jnp.where(miss, -1.0, idx.astype(jnp.float32))
    return t, nxs, nys, nzs, mat, pid, chans


def _row_packed_sweep(ma: MeshAccel, o: V3, d: V3, t_min: float, t_cap,
                      m, cap: int, mat_channels, interpret, f2b=False):
    """Row-granular mesh compaction: pack whole 128-lane ROWS that contain
    at least one AABB-hitting ray, sweep the packed buffer, scatter rows
    back.  TPU row gathers (jnp.take along axis 0 of an (R, 128) view)
    move ~45x more bytes/s than per-element gathers, and each channel is
    read once — vs the log-shift pack's ~23 streaming passes (the pipe
    drops from ~46 ms to a few ms at 8M rays when the mask is
    row-clustered).  Dead lanes inside a live row ride along with
    t_cap=0: the in-kernel per-block slab test rejects them for free, so
    sweep work tracks the LIVE count, not the row count.

    Correctness: per-ray sweep results depend only on the ray and the
    (fixed) block order, not on buffer position, so outputs are
    bit-identical to the element-packed engine.  Dead lanes inside
    scattered-back rows receive the kernel's own miss fill (t=inf,
    idx=-1, zeroed shading) — exactly the unpack's miss values — and
    rows with no hit keep the init fill."""
    n = o.x.shape[0]
    rows = n // LANES
    cap_rows = cap // LANES
    m_rows = jnp.any(m.reshape(rows, LANES), axis=1)
    n_live_rows = jnp.sum(m_rows.astype(jnp.int32))

    def packed(_):
        rix = pack_indices(m_rows, cap_rows)
        g = jnp.clip(rix, 0, rows - 1)
        take = lambda a: jnp.take(a.reshape(rows, LANES), g, axis=0,
                                  mode="clip").reshape(cap)
        oc = V3(take(o.x), take(o.y), take(o.z))
        dc = V3(take(d.x), take(d.y), take(d.z))
        tcc = take(t_cap)
        # n_valid zeroes t_cap past the (row-aligned) live count, killing
        # the clip-duplicated tail rows
        t, idx, nxs, nys, nzs, mat = sweep_mesh_full(
            ma.bt, oc, dc, t_min, t_cap=tcc, n_valid=n_live_rows * LANES,
            interpret=interpret, f2b=f2b)
        scat = lambda init, vals: init.reshape(rows, LANES).at[rix].set(
            vals.reshape(cap_rows, LANES), mode="drop",
            indices_are_sorted=True, unique_indices=True).reshape(n)
        inf = jnp.float32(jnp.inf)
        zeros = jnp.zeros((n,))
        return (scat(jnp.full((n,), inf), t),
                scat(jnp.full((n,), -1, jnp.int32), idx),
                scat(zeros, nxs), scat(zeros, nys), scat(zeros, nzs),
                scat(zeros, mat))

    def full_sweep(_):
        return sweep_mesh_full(ma.bt, o, d, t_min, t_cap=t_cap,
                               interpret=interpret, f2b=f2b)

    t, idx, nxs, nys, nzs, mat = jax.lax.cond(
        n_live_rows > cap_rows, full_sweep, packed, operand=None)
    miss = idx < 0
    chans = _channels_from_mat(mat, miss, mat_channels)
    pid = jnp.where(miss, -1.0, idx.astype(jnp.float32))
    return t, nxs, nys, nzs, mat, pid, chans


def _gather_shading(tp: TrianglePack, t, idx):
    """(t, winner idx) -> the blocked-sweep result tuple, by gathering
    normal / material id / tracked channels from the flat tables."""
    miss = idx < 0
    ic = jnp.clip(idx, 0, tp.v1x.shape[0] - 1)
    take = lambda a: jnp.where(miss, 0.0, jnp.take(a, ic, mode="clip"))
    nx, ny, nz = take(tp.nx), take(tp.ny), take(tp.nz)
    mat = take(tp.mat)
    chans = tuple(take(tp.channels[k]) for k in range(tp.channels.shape[0]))
    pid = jnp.where(miss, -1.0, idx.astype(jnp.float32))
    return t, nx, ny, nz, mat, pid, chans


def intersect_triangles_pallas(bt: BlockedTris, tp: TrianglePack, o: V3,
                               d: V3, t_min: float = 1e-6, t_cap=None,
                               n_valid=None, interpret: bool = None):
    """Drop-in equivalent of `bvh.intersect_triangles_blocked`, running the
    sweep on the Pallas kernel and gathering tracked channels from the flat
    `TrianglePack` by winner index (the renderers use
    `intersect_triangles_mesh`, which avoids the gathers; this form exists
    for equality tests against the XLA sweep).

    Returns (t, nx, ny, nz, mat_id, prim_id, channels tuple); t=+inf on
    miss, zero-filled shading data on miss (same contract as the XLA
    sweep)."""
    t, idx, *_ = sweep_mesh_full(bt, o, d, t_min, t_cap=t_cap,
                                 n_valid=n_valid, interpret=interpret)
    return _gather_shading(tp, t, idx)
