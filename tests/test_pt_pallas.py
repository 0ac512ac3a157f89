"""Pallas megakernel CI coverage (interpret mode on CPU).

The kernel shares its physics with the XLA engine (ops/pt_core); these tests
run it through the Mosaic interpreter and check statistical agreement with
the XLA wavefront (different RNG streams -> compare means, not pixels)."""
import numpy as np
import pytest

import jax
from jax.experimental.pallas import tpu as pltpu

from nrenderer_tpu import build_scene_arrays, load_scn
from nrenderer_tpu.ops.camera import make_camera
from nrenderer_tpu.ops.intersect import make_static_scene
from nrenderer_tpu.ops.sampling import make_base_key


@pytest.fixture(scope="module")
def setup(resource_dir):
    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    arr = build_scene_arrays(scene)
    return arr, make_static_scene(arr), make_camera(scene.camera)


def test_pallas_kernel_matches_xla_engine(setup):
    arr, ss, cam = setup
    w = h = 16
    spp, depth = 96, 3
    from nrenderer_tpu.ops.pt_pallas import render_simple_pt_pallas
    with pltpu.force_tpu_interpret_mode():
        img_p = np.asarray(render_simple_pt_pallas(ss, cam, w, h, spp, depth,
                                                   seed=0))
    from nrenderer_tpu.renderers.simple_pt import build_render_fn, pick_chunk
    chunk = pick_chunk(w, h, spp)
    fn = build_render_fn(ss, w, h, spp, depth, chunk, False, False)
    img_x = np.asarray(fn(cam, arr.env_map, make_base_key(0, "threefry2x32")))
    assert img_p.shape == img_x.shape == (h, w, 3)
    assert np.isfinite(img_p).all()
    # same estimator, independent RNG: means agree within MC noise
    assert abs(img_p.mean() - img_x.mean()) < 0.08
    # spatial structure agrees (tiny film + few spp -> noisy realizations;
    # 0.7 measured ~0.75 at 96 spp)
    corr = np.corrcoef(img_p.reshape(-1), img_x.reshape(-1))[0, 1]
    assert corr > 0.65


def test_pallas_bsdf_kernel_matches_xla_engine(setup):
    """The 4-BSDF megakernel (glass + conductor dispatch) agrees with the
    XLA wavefront statistically — same estimator, independent RNG."""
    _, _, _ = setup
    scene = load_scn("/root/reference/resource/pt_glass.scn")
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    from nrenderer_tpu.ops.pt_pallas import render_bsdf_pt_pallas
    w = h = 16
    spp, depth = 96, 4
    with pltpu.force_tpu_interpret_mode():
        img_p = np.asarray(render_bsdf_pt_pallas(ss, cam, w, h, spp, depth,
                                                 seed=0))
    assert np.isfinite(img_p).all()
    assert img_p.max() > 0.05
    from nrenderer_tpu.renderers.acc_pt import build_render_fn
    fn = build_render_fn(ss, w, h, spp, depth, 4, False, False)
    img_x = np.asarray(fn(cam, arr.env_map, make_base_key(0), None))
    assert abs(img_p.mean() - img_x.mean()) < 0.08
    corr = np.corrcoef(img_p.reshape(-1), img_x.reshape(-1))[0, 1]
    assert corr > 0.65  # specular paths are noisier than diffuse


def test_bin_env_map_identity_and_downsample():
    """(rows, lanes)-sized maps pass through exactly; larger maps bin to
    texel means."""
    from nrenderer_tpu.ops.env import bin_env_map

    rng = np.random.default_rng(0)
    e = rng.random((32, 128, 3)).astype(np.float32)
    t = bin_env_map(e, rows=32, lanes=128)
    assert t.shape == (3, 32, 128)
    assert np.allclose(t, e.transpose(2, 0, 1), atol=1e-6)

    big = rng.random((64, 256, 3)).astype(np.float32)
    t2 = bin_env_map(big, rows=32, lanes=128)
    # each bin = mean of its 2x2 source block
    blk = big.reshape(32, 2, 128, 2, 3).mean(axis=(1, 3))
    assert np.allclose(t2, blk.transpose(2, 0, 1), atol=1e-5)


def test_pallas_env_matches_xla_engine():
    """Env-map misses through the kernel (binned gather + exact bounce-0
    pass) vs the XLA wavefront.  The synthetic env is exactly (32, 128) so
    the kernel's bin table equals the map and both engines compute the same
    estimator (different RNG streams -> compare statistics)."""
    from nrenderer_tpu.ops.pt_pallas import render_bsdf_pt_pallas
    from nrenderer_tpu.ops.sampling import make_base_key
    from nrenderer_tpu.renderers.acc_pt import build_render_fn
    from nrenderer_tpu.scene.model import AmbientType, Texture

    scene = load_scn("/root/reference/resource/env_map_spheres.scn")
    he, we = 32, 128
    yy, xx = np.meshgrid(np.arange(he), np.arange(we), indexing="ij")
    px = np.stack([0.2 + 0.8 * xx / we, 0.1 + 0.6 * yy / he,
                   0.5 + 0.5 * np.sin(xx / we * 6.28)],
                  axis=-1).astype(np.float32)
    scene.ambient.environment_map = len(scene.textures)
    scene.textures.append(Texture(name="env", pixels=px))
    scene.ambient.type = AmbientType.ENVIRONMENT_MAP

    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    w = h = 16
    spp, depth = 64, 4

    fn = build_render_fn(ss, w, h, spp, depth, 4, False, True)
    img_x = np.asarray(fn(cam, arr.env_map, make_base_key(0), None))
    with pltpu.force_tpu_interpret_mode():
        img_p = np.asarray(render_bsdf_pt_pallas(
            ss, cam, w, h, spp, depth, seed=0, env_map=arr.env_map))
    assert np.isfinite(img_p).all()
    assert abs(img_p.mean() - img_x.mean()) < 0.08
    corr = np.corrcoef(img_p.reshape(-1), img_x.reshape(-1))[0, 1]
    assert corr > 0.9  # measured 0.999
