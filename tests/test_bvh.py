"""BVH build + stackless traversal tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from nrenderer_tpu import build_scene_arrays, load_obj
from nrenderer_tpu.ops.bvh import (
    build_bvh, build_triangle_bvh, intersect_triangles_bvh, pack_triangles,
)
from nrenderer_tpu.ops.intersect import (
    intersect_scene_unrolled, make_static_scene,
)
from nrenderer_tpu.ops.soa import V3


@pytest.fixture(scope="module")
def bunny(resource_dir):
    s = load_obj(str(resource_dir / "obj" / "bunny_200_faces.obj"))
    s.models[0].scale = (600.0, 600.0, 600.0)
    s.models[0].translation = (40.0, -305.0, 920.0)
    s.mesh_buffer[0].material = 0
    from nrenderer_tpu.scene.model import Material
    s.materials.append(Material(name="White"))
    return build_scene_arrays(s)


def test_flat_bvh_structure(bunny):
    bvh = build_triangle_bvh(bunny)
    skip = np.asarray(bvh.skip)
    prim = np.asarray(bvh.prim)
    n = bvh.n_nodes
    assert n == 2 * 200 - 1  # 1-prim leaves, binary tree
    # every leaf holds a valid prim exactly once
    leaves = prim[prim >= 0]
    assert len(leaves) == 200
    assert len(set(leaves.tolist())) == 200
    # escape indices advance monotonically past each subtree
    assert (skip > np.arange(n)).all()
    assert (skip <= n).all()


def test_bvh_bounds_contain_children():
    rng = np.random.default_rng(0)
    mn = rng.uniform(-10, 10, (33, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 2.0, (33, 3)).astype(np.float32)
    bmn, bmx, skip, prim = build_bvh(mn, mx)
    # root bbox contains everything
    np.testing.assert_array_less(bmn[0] - 1e-5, mn.min(axis=0))
    np.testing.assert_array_less(mx.max(axis=0), bmx[0] + 1e-5)


def test_traversal_matches_brute_force(bunny):
    ss = make_static_scene(bunny)
    bvh = build_triangle_bvh(bunny)
    tp = pack_triangles(bunny, [(1.0,)])

    rng = np.random.default_rng(7)
    n = 256
    # rays aimed at the bunny's bounding region from random origins
    origins = rng.uniform(-400, 400, (n, 3)).astype(np.float32)
    origins[:, 2] -= 400.0
    targets = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    targets += np.array([40.0, -200.0, 920.0], np.float32)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))

    brute = intersect_scene_unrolled(ss, o, dv, mat_channels=[(1.0,)])
    t_bvh, nx, ny, nz, mat, pid, chans = intersect_triangles_bvh(bvh, tp, o,
                                                                 dv)
    tb = np.asarray(brute.t)
    tv = np.asarray(t_bvh)
    hit_b = np.isfinite(tb)
    hit_v = np.isfinite(tv)
    assert hit_b.sum() > 20  # the rays do hit the bunny
    np.testing.assert_array_equal(hit_b, hit_v)
    np.testing.assert_allclose(tb[hit_b], tv[hit_v], rtol=1e-4)
    # normals agree too
    np.testing.assert_allclose(np.asarray(brute.normal.x)[hit_b],
                               np.asarray(nx)[hit_v], atol=1e-4)


@pytest.mark.slow
def test_acc_pt_renders_bunny_with_bvh(resource_dir):
    import nrenderer_tpu
    nrenderer_tpu._register_builtin_renderers()
    from nrenderer_tpu import load_scn
    from nrenderer_tpu.server.manager import ComponentManager

    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    load_obj(str(resource_dir / "obj" / "bunny_200_faces.obj"), scene,
             material=0)
    m = scene.models[-1]
    m.scale = (600.0, 600.0, 600.0)
    m.translation = (40.0, -305.0, 920.0)
    scene.render_option.width = 32
    scene.render_option.height = 32
    scene.render_option.samples_per_pixel = 8
    scene.render_option.depth = 4
    mgr = ComponentManager()
    mgr.exec("AccPathTracer", scene)
    img = mgr.wait(timeout=900).pixels
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.05
