"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrenderer_tpu import load_scn, build_scene_arrays
from nrenderer_tpu.ops.camera import make_camera
from nrenderer_tpu.ops.intersect import make_static_scene
from nrenderer_tpu.parallel.mesh import (
    build_sharded_render, make_mesh, render_multichip,
)


@pytest.fixture(scope="module")
def setup(resource_dir):
    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    return ss, cam


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_runs(setup):
    ss, cam = setup
    mesh = make_mesh(8)
    img = np.asarray(render_multichip(ss, cam, 16, 16, 16, 3, mesh=mesh))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_sharded_matches_single_device_stats(setup):
    """8-device sample-parallel render must agree with a 1-device render of
    the same total spp within MC noise (the psum is just a sum of
    independent estimators)."""
    ss, cam = setup
    img8 = np.asarray(render_multichip(ss, cam, 24, 24, 64, 4,
                                       mesh=make_mesh(8), seed=0))
    img1 = np.asarray(render_multichip(ss, cam, 24, 24, 64, 4,
                                       mesh=make_mesh(1), seed=100))
    assert abs(img8.mean() - img1.mean()) < 0.05


def test_mesh_sizes(setup):
    ss, cam = setup
    for n in (1, 2, 4):
        img = np.asarray(render_multichip(ss, cam, 8, 8, n * 2, 2,
                                          mesh=make_mesh(n)))
        assert np.isfinite(img).all()


def test_spp_divisibility_checked(setup):
    ss, cam = setup
    mesh = make_mesh(8)
    with pytest.raises(AssertionError):
        build_sharded_render(ss, 8, 8, 12, 2, mesh)  # 12 % 8 != 0
