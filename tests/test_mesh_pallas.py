"""Pallas mesh-sweep kernel (interpret mode) vs the XLA blocked sweep.

The Pallas kernel (`ops/mesh_pallas.py`) must reproduce
`ops/bvh.py:intersect_triangles_blocked` exactly — same winner, same t,
same shading channels — plus its extra contracts: per-ray `t_cap` upper
bound, `alive` culling, `n_valid` tail skip, and non-tile-multiple ray
counts."""
import numpy as np
import pytest

import jax.numpy as jnp

from nrenderer_tpu import build_scene_arrays, load_obj
from nrenderer_tpu.ops.bvh import (
    build_mesh_accel, intersect_triangles_blocked,
)
from nrenderer_tpu.ops.mesh_pallas import (
    intersect_triangles_mesh, intersect_triangles_pallas, sweep_mesh_pallas,
)
from nrenderer_tpu.ops.soa import V3
from nrenderer_tpu.scene.model import Material


@pytest.fixture(scope="module")
def setup():
    s = load_obj("/root/reference/resource/obj/bunny_200_faces.obj")
    s.models[0].scale = (600.0, 600.0, 600.0)
    s.models[0].translation = (40.0, -305.0, 920.0)
    s.mesh_buffer[0].material = 1
    s.materials.append(Material(name="A"))
    s.materials.append(Material(name="B"))
    arr = build_scene_arrays(s)
    ch = [(0.25, 9.0), (1.0, 2.0)]   # two materials; the mesh uses mat 1
    ma = build_mesh_accel(arr, ch, block=64)

    rng = np.random.default_rng(3)
    n = 5000   # deliberately not a multiple of the 4096-ray tile
    origins = rng.uniform(-400, 400, (n, 3)).astype(np.float32)
    origins[:, 2] -= 400.0
    targets = (rng.uniform(-120, 120, (n, 3)).astype(np.float32)
               + np.array([40.0, -200.0, 920.0], np.float32))
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
    blocked = intersect_triangles_blocked(ma.bt, o, dv, t_min=1e-3)
    return ma, ch, o, dv, blocked


def test_full_tuple_matches_blocked(setup):
    ma, ch, o, dv, blocked = setup
    tb, nxb, nyb, nzb, matb, pidb, chb = blocked
    t_dense = jnp.full((o.x.shape[0],), jnp.inf)
    t, nx, ny, nz, mat, pid, chp = intersect_triangles_mesh(
        ma, o, dv, 1e-3, t_dense, ch)
    tb_, t_ = np.asarray(tb), np.asarray(t)
    hb, hp = np.isfinite(tb_), np.isfinite(t_)
    assert hb.sum() > 1000
    np.testing.assert_array_equal(hb, hp)
    np.testing.assert_allclose(t_[hp], tb_[hb], rtol=1e-6)
    for got, want in [(nx, nxb), (ny, nyb), (nz, nzb), (mat, matb),
                      (pid, pidb), (chp[0], chb[0]), (chp[1], chb[1])]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_mxu_engine_tolerance_parity(setup, monkeypatch):
    """NR_MESH_MXU=1 sweeps via the bilinear-form matmul kernel
    (`sweep_tile_mxu`) — not bit-identical to the VPU chain (the factored
    coefficients round differently), but centered coordinates keep the
    boundary fuzz ~1e-6 of an edge: hit classification may flip only on
    a tiny fraction of rays, and agreeing hits must match closely."""
    ma, ch, o, dv, blocked = setup
    tb, nxb, nyb, nzb, matb, pidb, chb = blocked
    monkeypatch.setenv("NR_MESH_MXU", "1")
    t_dense = jnp.full((o.x.shape[0],), jnp.inf)
    t, nx, ny, nz, mat, pid, chp = intersect_triangles_mesh(
        ma, o, dv, 1e-3, t_dense, ch)
    tb_, t_ = np.asarray(tb), np.asarray(t)
    hb, hm = np.isfinite(tb_), np.isfinite(t_)
    assert hb.sum() > 1000
    flips = (hb != hm).sum()
    assert flips <= max(2, int(0.002 * hb.size)), flips
    both = hb & hm
    np.testing.assert_allclose(t_[both], tb_[both], rtol=1e-4)
    same_tri = np.asarray(pid)[both] == np.asarray(pidb)[both]
    assert same_tri.mean() > 0.998
    for got, want in [(nx, nxb), (ny, nyb), (nz, nzb), (mat, matb),
                      (chp[0], chb[0]), (chp[1], chb[1])]:
        g, w = np.asarray(got)[both][same_tri], np.asarray(want)[both][same_tri]
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_gather_form_matches_blocked(setup):
    ma, ch, o, dv, blocked = setup
    tb, *_, chb = blocked
    t, nx, ny, nz, mat, pid, chp = intersect_triangles_pallas(
        ma.bt, ma.tp, o, dv, t_min=1e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(tb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(chp[1]), np.asarray(chb[1]))


def test_alive_culling(setup):
    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    t_dense = jnp.full((n,), jnp.inf)
    rng = np.random.default_rng(7)
    alive = jnp.asarray(rng.random(n) < 0.5)
    t_all, *_ = intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    t_cull, *_ = intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch,
                                          alive=alive)
    t_all, t_cull, al = np.asarray(t_all), np.asarray(t_cull), \
        np.asarray(alive)
    assert not np.isfinite(t_cull[~al]).any()
    np.testing.assert_allclose(t_cull[al], t_all[al], rtol=1e-6)


def test_t_dense_cap(setup):
    ma, ch, o, dv, blocked = setup
    tb = np.asarray(blocked[0])
    n = o.x.shape[0]
    td = jnp.where(jnp.arange(n) % 3 == 0, 600.0, jnp.inf)
    t, *_ = intersect_triangles_mesh(ma, o, dv, 1e-3, td, ch)
    ref = np.where(tb < np.asarray(td), tb, np.inf)
    np.testing.assert_allclose(np.asarray(t), ref, rtol=1e-6)


def test_n_valid_tail_skip(setup):
    ma, ch, o, dv, blocked = setup
    tb = np.asarray(blocked[0])
    n_valid = 4096
    t, idx = sweep_mesh_pallas(ma.bt, o, dv, 1e-3, n_valid=n_valid)
    t = np.asarray(t)
    np.testing.assert_allclose(t[:n_valid], tb[:n_valid], rtol=1e-6)
    assert not np.isfinite(t[n_valid:]).any()
    assert (np.asarray(idx)[n_valid:] == -1).all()


def test_unaligned_n_valid_no_leak(setup):
    """Rays past a NON-tile-aligned n_valid must report no hits (ADVICE r2:
    the kernel's tile skip is SUB*128-granular; the per-ray t_cap mask
    covers the partially-valid tile)."""
    ma, ch, o, dv, blocked = setup
    tb = np.asarray(blocked[0])
    n_valid = 1000  # inside the first 4096-ray tile
    t, idx = sweep_mesh_pallas(ma.bt, o, dv, 1e-3, n_valid=n_valid)
    t = np.asarray(t)
    np.testing.assert_allclose(t[:n_valid], tb[:n_valid], rtol=1e-6)
    assert not np.isfinite(t[n_valid:]).any()


def test_mesh_compaction_matches_uncompacted(setup, monkeypatch):
    """Mesh-AABB ray compaction (round 3) is a pure optimization: with the
    threshold lowered so the 5000-ray batch compacts, results must equal
    the uncompacted sweep exactly."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    t_dense = jnp.full((n,), jnp.inf)
    base = intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    comp = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    for got, want in zip(comp[:6], base[:6]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
    for got, want in zip(comp[6], base[6]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_mesh_pack_modes_identical(setup, monkeypatch):
    """NR_MESH_PACK=shift (log-shift compaction, default) and =scatter
    (cumsum pack + gathers) must produce bit-identical intersection
    results — the shift pack is a pure data-movement rewrite."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    t_dense = jnp.full((n,), jnp.inf)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_MESH_PACK", "shift")
    a = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    monkeypatch.setenv("NR_MESH_PACK", "scatter")
    b = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    for got, want in zip(a[:6], b[:6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(a[6], b[6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mesh_pack_row_mode_identical(setup, monkeypatch):
    """NR_MESH_PACK=row (row-granular pack: whole 128-lane rows gathered,
    dead lanes riding along with t_cap=0) must be bit-identical to the
    element-packed default — per-ray sweep results don't depend on buffer
    position.  Uses a 128-divisible slice with some rays flipped away from
    the mesh so live and dead rows both occur."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = (o.x.shape[0] // 128) * 128
    flip = (jnp.arange(n) % 7 == 0) | (jnp.arange(n) // 128 % 3 == 0)
    sgn = jnp.where(flip, -1.0, 1.0)
    o2 = V3(o.x[:n], o.y[:n], o.z[:n])
    d2 = V3(dv.x[:n] * sgn, dv.y[:n] * sgn, dv.z[:n] * sgn)
    t_dense = jnp.full((n,), jnp.inf)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_MESH_PACK", "shift")
    a = mp.intersect_triangles_mesh(ma, o2, d2, 1e-3, t_dense, ch)
    monkeypatch.setenv("NR_MESH_PACK", "row")
    b = mp.intersect_triangles_mesh(ma, o2, d2, 1e-3, t_dense, ch)
    for got, want in zip(b[:6], a[:6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(b[6], a[6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.isfinite(np.asarray(a[0])).sum() > 500


def test_mesh_pack_stream_mode_identical(setup, monkeypatch):
    """NR_MESH_PACK=stream (single-pass Pallas streaming compactor,
    ops/stream_compact.py) must be bit-identical to the shift engine —
    its per-tile column-packed layout differs, but per-ray sweep results
    don't depend on buffer position.  Rays flipped away from the mesh mix
    live and dead lanes through the pack."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    flip = (jnp.arange(n) % 7 == 0)
    sgn = jnp.where(flip, -1.0, 1.0)
    d2 = V3(dv.x * sgn, dv.y * sgn, dv.z * sgn)
    t_dense = jnp.full((n,), jnp.inf)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_STREAM_ROWS", "64")
    monkeypatch.setenv("NR_MESH_PACK", "shift")
    a = mp.intersect_triangles_mesh(ma, o, d2, 1e-3, t_dense, ch)
    monkeypatch.setenv("NR_MESH_PACK", "stream")
    b = mp.intersect_triangles_mesh(ma, o, d2, 1e-3, t_dense, ch)
    for got, want in zip(b[:6], a[:6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(b[6], a[6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.isfinite(np.asarray(a[0])).sum() > 500


def test_mesh_pack_stream_overflow_fallback(setup, monkeypatch):
    """Stream-mode overflow (row claims exceed the cap) falls back to the
    full sweep via the lax.cond — still exact."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    t_dense = jnp.full((n,), jnp.inf)
    base = intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_STREAM_ROWS", "64")
    monkeypatch.setenv("NR_MESH_PACK", "stream")
    comp = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch,
                                       cap=1024)
    np.testing.assert_allclose(np.asarray(comp[0]), np.asarray(base[0]),
                               rtol=1e-6)


def test_mesh_pack_row_overflow_fallback(setup, monkeypatch):
    """Row-mode overflow (more live rows than cap//128) falls back to the
    full sweep — still exact."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = (o.x.shape[0] // 128) * 128
    o2 = V3(o.x[:n], o.y[:n], o.z[:n])
    d2 = V3(dv.x[:n], dv.y[:n], dv.z[:n])
    t_dense = jnp.full((n,), jnp.inf)
    base = intersect_triangles_mesh(ma, o2, d2, 1e-3, t_dense, ch)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_MESH_PACK", "row")
    # nearly every row is live in this fixture; a tiny cap must overflow
    comp = mp.intersect_triangles_mesh(ma, o2, d2, 1e-3, t_dense, ch,
                                       cap=1024)
    np.testing.assert_allclose(np.asarray(comp[0]), np.asarray(base[0]),
                               rtol=1e-6)


def test_mesh_compaction_overflow_fallback(setup, monkeypatch):
    """When more rays hit the mesh AABB than the compact buffer holds, the
    lax.cond falls back to the full sweep — still exact."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    t_dense = jnp.full((n,), jnp.inf)
    base = intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    # fraction so large the cap is tiny -> guaranteed overflow
    monkeypatch.setattr(mp, "MESH_COMPACT_FRACTION", n)
    comp = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    np.testing.assert_allclose(np.asarray(comp[0]), np.asarray(base[0]),
                               rtol=1e-6)


def test_mesh_sort_mode_identical(setup, monkeypatch):
    """NR_MESH_SORT=1 (entry-cell sorted sweep) must be bit-identical to
    the unsorted default — the sort permutes sweep order only."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    t_dense = jnp.full((n,), jnp.inf)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_MESH_SORT", "0")
    a = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    monkeypatch.setenv("NR_MESH_SORT", "1")
    b = mp.intersect_triangles_mesh(ma, o, dv, 1e-3, t_dense, ch)
    for got, want in zip(a[:6], b[:6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mesh_sort_stream_identical(setup, monkeypatch):
    """NR_MESH_SORT=1 on the STREAM pack engine (entry-cell sort of the
    compacted buffer, unsort before the streaming unpack) must also be
    bit-identical — garbage claim slots and the uninitialized tail are
    keyed last and cap-killed."""
    import nrenderer_tpu.ops.mesh_pallas as mp

    ma, ch, o, dv, blocked = setup
    n = o.x.shape[0]
    flip = (jnp.arange(n) % 5 == 0)
    sgn = jnp.where(flip, -1.0, 1.0)
    d2 = V3(dv.x * sgn, dv.y * sgn, dv.z * sgn)
    t_dense = jnp.full((n,), jnp.inf)
    monkeypatch.setattr(mp, "MESH_COMPACT_MIN", 64)
    monkeypatch.setenv("NR_STREAM_ROWS", "64")
    monkeypatch.setenv("NR_MESH_PACK", "stream")
    monkeypatch.setenv("NR_MESH_SORT", "0")
    a = mp.intersect_triangles_mesh(ma, o, d2, 1e-3, t_dense, ch)
    monkeypatch.setenv("NR_MESH_SORT", "1")
    b = mp.intersect_triangles_mesh(ma, o, d2, 1e-3, t_dense, ch)
    for got, want in zip(a[:6], b[:6]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.isfinite(np.asarray(a[0])).sum() > 500
