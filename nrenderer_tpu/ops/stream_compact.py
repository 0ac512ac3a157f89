"""Single-pass Pallas streaming compactor for wavefront ray packing.

Replaces `compact.shift_pack_channels` / `shift_unpack_channels` on the
mesh pipe.  The XLA log-shift compaction is ~23 full-array roll+select
passes; standalone it streams at HBM speed, but IN SITU (inside the real
bounce program) XLA fails to fuse the shift slices and the pack+unpack
machinery costs ~131 ms of a 217 ms bounce at 16M rays (r4 device-op
trace, tools/perf/trace_bounce.py: 63.6 ms maximum_select fusions +
43 ms unfused `slice` ops + ~25 ms slice-done/add/pad selects).  This
kernel reads every channel ONCE and writes the packed buffer ONCE —
bytes-at-bandwidth ~5 ms for the same workload.

Layout contract (differs from the XLA pack's strictly-lane-ordered
layout — the sweep does not care, per-ray results are position
independent; the unpack kernel reverses the exact same layout):

  - the (n,) buffer is viewed as rows of 128 lanes, processed in tiles
    of ROWS x 128 (element i -> tile i // (ROWS*128), row, lane i % 128);
  - within a tile, each of the 128 columns compacts its masked lanes to
    the front IN ORDER (per-element log-shift along sublanes — the same
    staged roll+select scheme as `compact.shift_pack_channels`, same
    collision-freedom proof, applied per column in vector registers);
  - tile t's packed columns land at output rows [base_t, base_t+cnt_tc)
    where base_t = sum of previous tiles' claims and the claim is
    rmax8_t = ceil(max_c cnt_tc / 8)*8 rows (8-row alignment keeps every
    window DMA on the f32 sublane tile).  Columns shorter than the claim
    leave garbage slots; the mask channel is ZEROED there so the sweep's
    per-ray cap test kills them, and the unpack never reads them.

Per-tile base alignment is the key move: all columns of a tile share one
scalar base, so the flush cursor is scalar (no per-column min — no ring
deadlock) and the unpack's window per tile is a static ROWS-row DMA at a
dynamic offset.  Capacity waste vs a perfectly dense pack is
sum_t (rmax8_t - mean_t): bounded and small for real wavefront masks
(the mesh footprint varies slowly across a 64K-element tile); adversarial
lane-striped masks cost capacity, never correctness (the caller's
overflow `lax.cond` falls back exactly as with the XLA pack, via
`stream_rows_needed`).

The kernel runs a SEQUENTIAL grid over input tiles with a VMEM ring
buffer (2*ROWS rows) per channel; whole ROWS-row blocks flush to the
ANY-space output by DMA as the base cursor crosses block boundaries
(at most one flush per tile since a claim never exceeds ROWS).  All
building blocks (pltpu.roll across sublanes, VMEM scratch carry across
grid steps, make_async_copy VMEM<->ANY at dynamic block offsets,
scalar-prefetched offsets) were probed on v5e and in interpret mode
before this design was committed.

Reference semantics parity: this serves the same role as the reference's
implicit BVH-descent work partitioning
(`/root/reference/code/components/acc_path_tracing/include/BVH.hpp:93-155`)
— concentrating triangle work on the rays that can reach the mesh —
recast as a TPU stream compaction instead of per-ray recursion.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ALIGN = 8  # f32 sublane tile: per-tile claims round up to 8 rows so the
           # unpack's window DMA source offset stays tile-aligned


def _rows() -> int:
    # 256 is the measured sweet spot: Mosaic compile is seconds (512 hits
    # a multi-MINUTE compile cliff on the unrolled (512,128) program) and
    # runtime is flat across 128/256/512 (tools/perf/stream_tune.py)
    return int(os.environ.get("NR_STREAM_ROWS", "256"))


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


class StreamPacked(NamedTuple):
    """Result of `stream_pack_channels` + the metadata the unpack needs."""
    packed: Tuple[jnp.ndarray, ...]  # (cap_pad,) each, garbage past claims
    cnt: jnp.ndarray                 # (T, 128) i32 per-tile per-column hits
    base: jnp.ndarray                # (T,) i32 output-row base per tile
    n_rows: jnp.ndarray              # () i32 total claimed output rows
    n: int                           # original (unpadded) lane count
    rows: int                        # tile height the pack ran at
    mask_from: int                   # channel whose >0 defines the mask
    cap_pad_rows: int                # padded output rows (window headroom)

    @property
    def n_valid(self):
        """Lane count for the sweep's tail-kill (`n_valid` argument)."""
        return self.n_rows * LANES


# ---------------------------------------------------------------------------
# in-register helpers (all per-column, vectorized across the 128 lanes)

def _roll_down(x, step: int):
    """Wrap-rotate rows down by a STATIC step: out[r] = x[r - step]."""
    return pltpu.roll(x, step, 0)


def _roll_up(x, step: int, size: int):
    """Wrap-rotate rows up by a STATIC step: out[r] = x[(r + step) % size]."""
    return pltpu.roll(x, size - step, 0)


def _roll_down_dyn(x, off, size: int, min_align: int = 1):
    """Rotate rows down by a TRACED scalar `off` (0 <= off < size).
    Default: `pltpu.roll`'s native dynamic shift (one op, validated on
    v5e); NR_STREAM_DYNROLL=0 decomposes into log2(size) conditional
    static rotates — every step a plain static `pltpu.roll`, the
    conservatively portable lowering (measured ~equal at 8M rays).
    `min_align`: skip low bits the caller guarantees are zero."""
    if os.environ.get("NR_STREAM_DYNROLL", "1") == "1":
        return pltpu.roll(x, off, 0)
    k = 0
    while (1 << k) < size:
        if (1 << k) >= min_align:
            bit = ((off >> k) & 1) == 1
            x = jnp.where(bit, pltpu.roll(x, 1 << k, 0), x)
        k += 1
    return x


def _col_cumsum_inclusive(mi, rows: int):
    """Per-column inclusive cumsum along rows of an (rows, 128) i32 array,
    as log2(rows) roll+add steps (axis-0 scans lower poorly on Mosaic)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    c = mi
    k = 1
    while k < rows:
        c = c + jnp.where(iota >= k, _roll_down(c, k), 0)
        k *= 2
    return c


def _col_pack(chans, s, rows: int):
    """Per-column stable front-compaction of `chans` by shift plan `s`
    (per-element up-shift distances, -1 for non-hits), LSB-first staged
    roll+selects — `compact.shift_pack_channels` per column."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    k = 0
    while (1 << k) < rows:
        step = 1 << k
        s_up = _roll_up(s, step, rows)
        landing = ((iota < (rows - step)) & (s_up >= 0)
                   & (((s_up >> k) & 1) == 1))
        chans = [jnp.where(landing, _roll_up(a, step, rows), a)
                 for a in chans]
        s = jnp.where(landing, s_up, s)
        k += 1
    return chans


def _col_unpack(chans, s, rows: int):
    """Per-column expansion (inverse of `_col_pack`): run the staged
    shifts in REVERSE (MSB-first, moving down), deadening the `s` of
    vacated slots exactly as `compact.shift_unpack_channels` does."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    steps = []
    k = 0
    while (1 << k) < rows:
        steps.append(k)
        k += 1
    for k in reversed(steps):
        step = 1 << k
        s_dn = _roll_down(s, step)
        landing = ((iota >= step) & (s_dn >= 0)
                   & (((s_dn >> k) & 1) == 1))
        mover = (s >= 0) & (((s >> k) & 1) == 1)
        s = jnp.where(landing, s_dn, jnp.where(mover, jnp.int32(-1), s))
        chans = [jnp.where(landing, _roll_down(a, step), a) for a in chans]
    return chans


def _mask_plan(mask_vals, rows: int):
    """(mask, cnt (1,128), per-element shift plan s) from the mask
    channel's values (>0 == live)."""
    m = mask_vals > 0.0
    mi = m.astype(jnp.int32)
    c = _col_cumsum_inclusive(mi, rows)
    cnt = c[rows - 1:rows, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    s = jnp.where(m, iota - (c - mi), jnp.int32(-1))
    return m, cnt, s


# ---------------------------------------------------------------------------
# pack kernel

def _pack_kernel(*refs, C: int, rows: int, T: int, cap_blocks: int,
                 mask_from: int):
    ring_size = 2 * rows
    chan_refs = refs[:C]
    out_refs = refs[C:2 * C]
    ring_refs = refs[2 * C:3 * C]
    base_s, fb_s, sem = refs[3 * C:]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        base_s[0] = 0
        fb_s[0] = 0
        # pre-first-flush ring garbage must read as dead rays
        ring_refs[mask_from][:] = jnp.zeros((ring_size, LANES), jnp.float32)

    mask_vals = chan_refs[mask_from][:]
    m, cnt, s = _mask_plan(mask_vals, rows)
    chans = _col_pack([chan_refs[i][:] for i in range(C)], s, rows)

    rmax = jnp.max(cnt)
    claim = ((rmax + (ALIGN - 1)) // ALIGN) * ALIGN
    base = base_s[0]

    @pl.when(rmax > 0)
    def _merge():
        off = jnp.bitwise_and(base, ring_size - 1)
        ring_iota = jax.lax.broadcasted_iota(
            jnp.int32, (ring_size, LANES), 0)
        rel = jnp.bitwise_and(ring_iota - off, ring_size - 1)
        in_window = rel < cnt       # (ring, 128) per-column live region
        in_claim = rel < claim      # full aligned claim (scalar bound)
        pad = jnp.zeros((ring_size - rows, LANES), jnp.float32)
        for i in range(C):
            frame = jnp.concatenate([chans[i], pad], axis=0)
            rolled = _roll_down_dyn(frame, off, ring_size, min_align=ALIGN)
            cur = ring_refs[i][:]
            if i == mask_from:
                # zero the mask channel across the whole claim: garbage
                # slots (cnt_c <= rel < claim) must read as dead rays
                cur = jnp.where(in_claim, 0.0, cur)
            ring_refs[i][:] = jnp.where(in_window, rolled, cur)

    new_base = base + jnp.where(rmax > 0, claim, 0)
    fb = fb_s[0]
    nfb = new_base // rows  # claims never exceed `rows`: at most one flush

    def _flush_block(blk, src_row: int):
        dst = jnp.minimum(blk, cap_blocks - 1) * rows
        cps = [pltpu.make_async_copy(
            ring_refs[i].at[pl.ds(src_row, rows), :],
            out_refs[i].at[pl.ds(dst, rows), :], sem) for i in range(C)]
        for cp in cps:   # start all, then drain: copies run CONCURRENTLY
            cp.start()   # (serial start/wait pairs measured ~latency-bound
        for cp in cps:   # at ~40 flushes x 7 channels per 8M-ray pass)
            cp.wait()

    @pl.when((nfb > fb) & (jax.lax.rem(fb, 2) == 0))
    def _flush_even():
        _flush_block(fb, 0)

    @pl.when((nfb > fb) & (jax.lax.rem(fb, 2) == 1))
    def _flush_odd():
        _flush_block(fb, rows)

    last = t == T - 1
    partial = new_base > nfb * rows

    @pl.when(last & partial & (jax.lax.rem(nfb, 2) == 0))
    def _drain_even():
        _flush_block(nfb, 0)

    @pl.when(last & partial & (jax.lax.rem(nfb, 2) == 1))
    def _drain_odd():
        _flush_block(nfb, rows)

    base_s[0] = new_base
    fb_s[0] = nfb


@functools.lru_cache(maxsize=64)
def _build_pack(C: int, rows: int, T: int, cap_blocks: int, mask_from: int,
                interpret: bool):
    ring_size = 2 * rows
    kernel = functools.partial(_pack_kernel, C=C, rows=rows, T=T,
                               cap_blocks=cap_blocks, mask_from=mask_from)
    chan_block = pl.BlockSpec((rows, LANES), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    cap_pad_rows = cap_blocks * rows

    @jax.jit
    def run(*channels):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[chan_block] * C,
            out_shape=tuple(
                jax.ShapeDtypeStruct((cap_pad_rows, LANES), jnp.float32)
                for _ in range(C)),
            out_specs=tuple(any_spec for _ in range(C)),
            scratch_shapes=(
                [pltpu.VMEM((ring_size, LANES), jnp.float32)
                 for _ in range(C)]
                + [pltpu.SMEM((1,), jnp.int32), pltpu.SMEM((1,), jnp.int32),
                   pltpu.SemaphoreType.DMA]
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*channels)

    return run


def _pad_tile(a, n_pad: int, fill):
    n = a.shape[0]
    if n_pad == n:
        return a
    return jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])


def stream_pack_channels(channels: Sequence[jnp.ndarray], cap: int,
                         mask_from: int,
                         interpret: bool = None) -> StreamPacked:
    """Pack the lanes where `channels[mask_from] > 0` of every (n,) f32
    channel into a `cap`-element buffer (see module docstring for the
    exact layout).  `cap` must be a multiple of 128.  The returned
    `packed` arrays are cap-padded to whole flush blocks plus one window
    (`len(packed[0]) >= cap`); garbage slots carry 0 in the mask channel.

    The caller must guarantee `stream_rows_needed(mask) * 128 <= cap`
    (guard with the same `lax.cond` that guards the shift pack's
    overflow); on overflow the flush clamps to the last block — safe,
    but the packed data is garbage.
    """
    rows = _rows()
    n = channels[0].shape[0]
    assert cap % LANES == 0, "cap must be lane-aligned"
    tile = rows * LANES
    T = -(-n // tile)
    n_pad = T * tile
    cap_rows = cap // LANES
    cap_blocks = -(-cap_rows // rows) + 1
    chans = [
        _pad_tile(a.astype(jnp.float32), n_pad,
                  0.0).reshape(T * rows, LANES)
        for a in channels
    ]
    run = _build_pack(len(chans), rows, T, cap_blocks, mask_from,
                      _interp(interpret))
    outs = run(*chans)
    packed = tuple(o.reshape(cap_blocks * rows * LANES) for o in outs)
    # metadata recomputed in XLA (one cheap pass over the mask channel):
    # Mosaic's output-block tiling rules disallow (1, 128) metadata
    # blocks, and this arithmetic is identical to the kernel's internal
    # claim accounting by construction
    mi = (chans[mask_from] > 0.0).astype(jnp.int32)
    cnt = mi.reshape(T, rows, LANES).sum(axis=1)
    claim = ((cnt.max(axis=1) + (ALIGN - 1)) // ALIGN) * ALIGN
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(claim)[:-1]])
    return StreamPacked(packed, cnt, base, jnp.sum(claim),
                        n, rows, mask_from, cap_blocks * rows)


def stream_rows_needed(mask: jnp.ndarray, rows: int = None) -> jnp.ndarray:
    """Output rows the pack will claim for `mask` — the overflow-guard
    mirror of the kernel's per-tile `ceil(max_col_cnt / 8) * 8` claims.
    Plain XLA, a few cheap reductions over the (n,) bool mask."""
    if rows is None:
        rows = _rows()
    n = mask.shape[0]
    tile = rows * LANES
    T = -(-n // tile)
    mi = _pad_tile(mask, T * tile, False).astype(jnp.int32)
    cnt = mi.reshape(T, rows, LANES).sum(axis=1)          # (T, 128)
    rmax = cnt.max(axis=1)                                # (T,)
    return (((rmax + (ALIGN - 1)) // ALIGN) * ALIGN).sum()


# ---------------------------------------------------------------------------
# unpack kernel

def _unpack_kernel(base_pref, *refs, C: int, rows: int,
                   cap_pad_rows: int):
    mask_ref = refs[0]
    packed_refs = refs[1:1 + C]
    out_refs = refs[1 + C:1 + 2 * C]
    win_refs = refs[1 + 2 * C:1 + 3 * C]
    sem = refs[1 + 3 * C]

    t = pl.program_id(0)
    # clamp keeps the window DMA in bounds if the PACK overflowed its cap
    # (callers guard overflow with stream_rows_needed, or accept the
    # astronomically-rare wrong-lane values the way the shift pack
    # accepts dropped overflow rays)
    b = jnp.minimum(base_pref[t], cap_pad_rows - rows)
    cps = [pltpu.make_async_copy(
        packed_refs[i].at[pl.ds(b, rows), :], win_refs[i], sem)
        for i in range(C)]
    for cp in cps:  # concurrent window fetches, then drain
        cp.start()
    for cp in cps:
        cp.wait()

    m, cnt, s_lane = _mask_plan(mask_ref[:], rows)
    # slot-aligned shift plan: pack s_lane itself, then guard past cnt
    (s_packed,) = _col_pack([s_lane], jnp.where(s_lane >= 0, s_lane,
                                                jnp.int32(-1)), rows)
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    s = jnp.where(iota < cnt, s_packed, jnp.int32(-1))
    chans = _col_unpack([win_refs[i][:] for i in range(C)], s, rows)
    for i in range(C):
        out_refs[i][:] = chans[i]


@functools.lru_cache(maxsize=64)
def _build_unpack(C: int, rows: int, T: int, cap_pad_rows: int,
                  interpret: bool):
    kernel = functools.partial(_unpack_kernel, C=C, rows=rows,
                               cap_pad_rows=cap_pad_rows)
    chan_block = pl.BlockSpec((rows, LANES), lambda t, b: (t, 0),
                              memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    @jax.jit
    def run(base, mask_vals, *packed):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(T,),
                in_specs=[chan_block] + [any_spec] * C,
                out_specs=tuple(chan_block for _ in range(C)),
                scratch_shapes=(
                    [pltpu.VMEM((rows, LANES), jnp.float32)
                     for _ in range(C)]
                    + [pltpu.SemaphoreType.DMA]
                ),
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((T * rows, LANES), jnp.float32)
                for _ in range(C)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(base, mask_vals, *packed)

    return run


def stream_unpack_channels(mask_src: jnp.ndarray,
                           packed: Sequence[jnp.ndarray],
                           misses: Sequence[float],
                           sp: StreamPacked,
                           interpret: bool = None
                           ) -> Tuple[jnp.ndarray, ...]:
    """Distribute per-slot results back to the masked lanes: the inverse
    of `stream_pack_channels` for result channels computed ON the packed
    buffer (e.g. the sweep outputs).  `mask_src` is the original (n,)
    mask channel (same `>0` convention the pack ran with); `misses` are
    per-channel PYTHON scalars filled into dead lanes; `packed` arrays
    shorter than the pack's padded cap (e.g. slot-derived buffers sized
    to the raw cap) are zero-padded to it here so every window DMA stays
    in bounds."""
    rows, T, n = sp.rows, sp.cnt.shape[0], sp.n
    tile = rows * LANES
    mask_vals = _pad_tile(mask_src.astype(jnp.float32),
                          T * tile, 0.0).reshape(T * rows, LANES)
    cap_pad_rows = max(sp.cap_pad_rows, -(-packed[0].shape[0] // LANES))
    packed = [_pad_tile(a, cap_pad_rows * LANES, 0.0) for a in packed]
    pk = [a.astype(jnp.float32).reshape(cap_pad_rows, LANES) for a in packed]
    run = _build_unpack(len(pk), rows, T, cap_pad_rows, _interp(interpret))
    outs = run(sp.base, mask_vals, *pk)
    res = []
    m = mask_src > 0 if mask_src.dtype != jnp.bool_ else mask_src
    for o, miss in zip(outs, misses):
        flat = o.reshape(T * tile)[:n]
        res.append(jnp.where(m, flat, jnp.float32(miss)))
    return tuple(res)
