"""Pallas streaming compactor (ops/stream_compact.py), interpret mode.

Validates the exact packed layout against a plain-numpy model of the
contract (per-tile column pack, 8-row-aligned claims, zeroed mask-channel
garbage), the pack->unpack round trip, and the `stream_rows_needed`
overflow-guard arithmetic, across degenerate masks (empty / full /
lane-striped / single element / tail-only)."""
import numpy as np
import pytest

import jax.numpy as jnp

from nrenderer_tpu.ops.stream_compact import (
    ALIGN, LANES, stream_pack_channels, stream_rows_needed,
    stream_unpack_channels,
)

ROWS = 64  # small tile height keeps interpret-mode runtime reasonable


@pytest.fixture(autouse=True)
def _small_tiles(monkeypatch):
    monkeypatch.setenv("NR_STREAM_ROWS", str(ROWS))


def _pack_case(m, chans, cap):
    tcap = np.where(m, 1.0, 0.0).astype(np.float32)
    all_chans = [jnp.asarray(c) for c in chans] + [jnp.asarray(tcap)]
    sp = stream_pack_channels(all_chans, cap, mask_from=len(chans))
    return tcap, sp


def _numpy_layout_check(m, chans, sp):
    """Walk the documented layout tile by tile and column by column."""
    n = m.shape[0]
    tile = ROWS * LANES
    T = -(-n // tile)
    mp_ = np.zeros(T * tile, bool)
    mp_[:n] = m
    mt = mp_.reshape(T, ROWS, LANES)
    pk = [np.asarray(p).reshape(-1, LANES) for p in sp.packed]
    base = 0
    for t in range(T):
        cnt = mt[t].sum(axis=0)
        claim = -(-int(cnt.max()) // ALIGN) * ALIGN
        assert int(sp.base[t]) == base
        assert np.array_equal(np.asarray(sp.cnt[t]), cnt)
        for c in range(LANES):
            live = np.nonzero(mt[t, :, c])[0]
            for ci, ch in enumerate(chans):
                chp = np.zeros(T * tile, np.float32)
                chp[:n] = ch
                src = chp.reshape(T, ROWS, LANES)[t, live, c]
                got = pk[ci][base:base + len(live), c]
                np.testing.assert_array_equal(got, src)
            # mask channel zeroed across the rest of the claim
            garbage = pk[-1][base + len(live):base + claim, c]
            assert (garbage == 0).all()
        base += claim
    assert int(sp.n_rows) == base


def test_layout_matches_numpy_model():
    rng = np.random.default_rng(0)
    n = 3 * ROWS * LANES + 1000  # padding path
    m = rng.random(n) < 0.2
    chans = [rng.standard_normal(n).astype(np.float32) for _ in range(3)]
    cap = (int(stream_rows_needed(jnp.asarray(m))) + ROWS) * LANES
    tcap, sp = _pack_case(m, chans, cap)
    _numpy_layout_check(m, chans + [tcap], sp)
    assert int(sp.n_rows) == int(stream_rows_needed(jnp.asarray(m)))


def test_roundtrip_through_transform():
    """pack -> per-slot transform -> unpack equals a masked elementwise
    transform (what the mesh sweep relies on)."""
    rng = np.random.default_rng(1)
    n = 2 * ROWS * LANES
    m = rng.random(n) < 0.35
    chans = [rng.standard_normal(n).astype(np.float32) for _ in range(2)]
    tcap, sp = _pack_case(m, chans, 4 * ROWS * LANES)
    results = [p * 2.0 + 1.0 for p in sp.packed]
    outs = stream_unpack_channels(jnp.asarray(tcap), results,
                                  [-7.0, 5.0, 0.0], sp)
    for ci, ch in enumerate(chans):
        want = np.where(m, ch * 2.0 + 1.0, np.float32([-7.0, 5.0][ci]))
        np.testing.assert_array_equal(np.asarray(outs[ci]), want)


@pytest.mark.parametrize("name", ["empty", "full", "striped", "one", "tail"])
def test_degenerate_masks(name):
    rng = np.random.default_rng(2)
    n = 4 * ROWS * LANES
    m = {
        "empty": np.zeros(n, bool),
        "full": np.ones(n, bool),
        # 20 of 128 lanes live: the adversarial per-column imbalance case —
        # capacity waste, never corruption
        "striped": (np.arange(n) % LANES) < 20,
        "one": np.eye(1, n, 777, bool)[0],
        "tail": np.arange(n) >= n - 130,
    }[name]
    x = rng.standard_normal(n).astype(np.float32)
    need = int(stream_rows_needed(jnp.asarray(m)))
    tcap, sp = _pack_case(m, [x], max(LANES, need * LANES))
    assert int(sp.n_rows) == need
    outs = stream_unpack_channels(jnp.asarray(tcap),
                                  [p + 3.0 for p in sp.packed],
                                  [0.0, -1.0], sp)
    np.testing.assert_array_equal(np.asarray(outs[0]),
                                  np.where(m, x + 3.0, 0.0))
