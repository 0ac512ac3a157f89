"""Blocked triangle sweep agrees with the unrolled brute force."""
import numpy as np
import pytest

import jax.numpy as jnp

from nrenderer_tpu import build_scene_arrays, load_obj
from nrenderer_tpu.ops.bvh import (
    intersect_triangles_blocked, pack_blocked_triangles,
)
from nrenderer_tpu.ops.intersect import (
    intersect_scene_unrolled, make_static_scene,
)
from nrenderer_tpu.ops.soa import V3
from nrenderer_tpu.scene.model import Material


@pytest.fixture(scope="module")
def bunny():
    s = load_obj("/root/reference/resource/obj/bunny_200_faces.obj")
    s.models[0].scale = (600.0, 600.0, 600.0)
    s.models[0].translation = (40.0, -305.0, 920.0)
    s.mesh_buffer[0].material = 0
    s.materials.append(Material(name="W"))
    return build_scene_arrays(s)


def test_blocked_matches_brute(bunny):
    ss = make_static_scene(bunny)
    bt = pack_blocked_triangles(bunny, [(1.0,)], block=64)
    assert bt.v1x.shape == (4, 64)  # 200 tris -> 4 blocks of 64

    rng = np.random.default_rng(3)
    n = 512
    origins = rng.uniform(-400, 400, (n, 3)).astype(np.float32)
    origins[:, 2] -= 400.0
    targets = (rng.uniform(-120, 120, (n, 3)).astype(np.float32)
               + np.array([40.0, -200.0, 920.0], np.float32))
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))

    brute = intersect_scene_unrolled(ss, o, dv, mat_channels=[(1.0,)])
    t, nx, ny, nz, mat, pid, chans = intersect_triangles_blocked(bt, o, dv)
    tb, tv = np.asarray(brute.t), np.asarray(t)
    hb, hv = np.isfinite(tb), np.isfinite(tv)
    assert hb.sum() > 30
    np.testing.assert_array_equal(hb, hv)
    np.testing.assert_allclose(tb[hb], tv[hv], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(brute.normal.y)[hb],
                               np.asarray(ny)[hv], atol=1e-4)
    assert np.asarray(chans[0])[hv].min() == 1.0


def test_padding_never_hits(bunny):
    # 200 tris block=128 -> 2 blocks, 56 padded entries with pid -1
    bt = pack_blocked_triangles(bunny, [(1.0,)], block=128)
    pid = np.asarray(bt.pid)
    assert (pid[-1, -56:] == -1).all()


@pytest.mark.slow
def test_compaction_overflow_falls_back(bunny):
    """When more rays hit the mesh AABB than the compaction capacity, the
    wavefront must fall back to the exact full sweep — no ray may silently
    skip the mesh (ADVICE r1 / VERDICT r1 #6)."""
    from nrenderer_tpu.ops.pt_core import _blocked_compacted

    bt = pack_blocked_triangles(bunny, [(1.0,)], block=64)
    bb_min = np.asarray(bt.bb_min).min(axis=0)
    bb_max = np.asarray(bt.bb_max).max(axis=0)
    center = 0.5 * (bb_min + bb_max)

    n = 8192  # cap = max(1024, n//4) = 2048 < n, so overflow is possible
    rng = np.random.default_rng(11)
    origins = center + np.array([0.0, 0.0, -900.0]) \
        + rng.uniform(-50, 50, (n, 3))
    targets = rng.uniform(bb_min, bb_max, (n, 3))
    d = (targets - origins).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origins = origins.astype(np.float32)
    o = V3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))

    # every ray is aimed inside the AABB -> n_hit == n > cap -> fallback
    t_dense = jnp.full((n,), jnp.inf)
    tc, *_ = _blocked_compacted(bt, o, dv, 1e-3, t_dense)
    tf, *_ = intersect_triangles_blocked(bt, o, dv, t_min=1e-3)
    tc, tf = np.asarray(tc), np.asarray(tf)
    hit = np.isfinite(tf)
    assert hit.sum() > n // 2  # the workload actually hits the bunny
    np.testing.assert_array_equal(np.isfinite(tc), hit)
    np.testing.assert_allclose(tc[hit], tf[hit], rtol=1e-5)
