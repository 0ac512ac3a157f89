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


@pytest.mark.slow
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


def _mesh_test_scene(n_faces: int = 200):
    """Bunny mesh in a lit box-ish scene for the in-kernel sweep tests."""
    from nrenderer_tpu import load_obj
    from nrenderer_tpu.scene.model import (
        AreaLight, Material, Property, PropertyType)

    s = load_obj(f"/root/reference/resource/obj/bunny_{n_faces}_faces.obj")
    s.models[0].scale = (600.0, 600.0, 600.0)
    s.models[0].translation = (40.0, -305.0, 920.0)
    s.mesh_buffer[0].material = 0
    m = Material(name="W", type=0)
    m.register_property(Property("diffuseColor", PropertyType.RGB,
                                 (0.7, 0.7, 0.7)))
    s.materials.append(m)
    s.area_light_buffer.append(AreaLight(position=(-200.0, 300.0, 700.0),
                                         u=(400.0, 0.0, 0.0),
                                         v=(0.0, 0.0, 400.0),
                                         radiance=(3.0, 3.0, 3.0)))
    s.camera.position = (0.0, 0.0, -500.0)
    return s


@pytest.mark.slow
def test_pallas_inkernel_mesh_matches_brute_force():
    """The megakernel with the mesh sweep folded into its bounce loop
    (VERDICT r2 #2) must match the SAME kernel intersecting the triangles
    as unrolled dense prims: same hash RNG, same estimator, same sampling
    order -> per-pixel agreement up to float reassociation."""
    from nrenderer_tpu.ops.bvh import build_mesh_accel
    from nrenderer_tpu.ops.pt_core import make_mat_channels
    from nrenderer_tpu.ops.pt_pallas import render_bsdf_pt_pallas

    s = _mesh_test_scene(200)
    arr = build_scene_arrays(s)
    ss = make_static_scene(arr)
    cam = make_camera(s.camera)
    ma = build_mesh_accel(arr, make_mat_channels(ss))
    w = h = 16
    spp, depth = 2, 2
    with pltpu.force_tpu_interpret_mode():
        img_mesh = np.asarray(render_bsdf_pt_pallas(
            ss, cam, w, h, spp, depth, seed=0, mesh_accel=ma))
        img_brute = np.asarray(render_bsdf_pt_pallas(
            ss, cam, w, h, spp, depth, seed=0))
    assert np.isfinite(img_mesh).all()
    assert img_mesh.max() > 0.01
    np.testing.assert_allclose(img_mesh, img_brute, atol=2e-3)


def _lit_textured_quad(tmp_path, n: int = 1):
    """Textured quad scene (left-red / right-green map), n x n subdivided,
    with an area light and a head-on camera (borrowed from
    tests/test_texture.py)."""
    from nrenderer_tpu import load_obj
    from nrenderer_tpu.io.image import write_png
    from nrenderer_tpu.scene.model import AreaLight

    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = (1.0, 0.0, 0.0)
    img[:, 4:] = (0.0, 1.0, 0.0)
    write_png(str(tmp_path / "tex.png"), img)
    (tmp_path / "q.mtl").write_text("newmtl m\nKd 1 1 1\nmap_Kd tex.png\n")
    verts, uvs, faces = [], [], []
    for j in range(n + 1):
        for i in range(n + 1):
            verts.append((i / n * 2 - 1, j / n * 2 - 1, 0.0))
            uvs.append((i / n, j / n))
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i + 1
            b, c_, d_ = a + 1, a + n + 2, a + n + 1
            faces.append((a, b, c_))
            faces.append((a, c_, d_))
    lines = ["mtllib q.mtl"]
    lines += [f"v {x} {y} {z}" for x, y, z in verts]
    lines += [f"vt {u} {v}" for u, v in uvs]
    lines.append("usemtl m")
    lines += [f"f {a}/{a} {b}/{b} {c}/{c}" for a, b, c in faces]
    (tmp_path / "q.obj").write_text("\n".join(lines) + "\n")
    scene = load_obj(str(tmp_path / "q.obj"))
    scene.materials[0].type = 0
    scene.area_light_buffer.append(AreaLight(
        position=(-2.0, 2.5, 2.0), u=(4.0, 0.0, 0.0), v=(0.0, 0.0, 2.0),
        radiance=(6.0, 6.0, 6.0)))
    scene.camera.position = (0.0, 0.0, 4.0)
    scene.camera.look_at = (0.0, 0.0, 0.0)
    return scene


def test_pallas_textures_dense(tmp_path):
    """In-kernel binned texture resolve on the dense (unrolled) path:
    left half red-dominant, right half green-dominant (VERDICT r2 #4)."""
    from nrenderer_tpu.ops.pt_pallas import render_simple_pt_pallas

    scene = _lit_textured_quad(tmp_path, n=1)
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    w = h = 16
    with pltpu.force_tpu_interpret_mode():
        img = np.asarray(render_simple_pt_pallas(
            ss, cam, w, h, 8, 3, seed=0, textures=arr.textures))
    img = img[::-1]
    assert np.isfinite(img).all()
    left = img[4:12, 2:7]
    right = img[4:12, 9:14]
    assert left[..., 0].mean() > 2.0 * left[..., 1].mean()
    assert right[..., 1].mean() > 2.0 * right[..., 0].mean()


@pytest.mark.slow
def test_pallas_textures_through_mesh_sweep(tmp_path):
    """UVs interpolated DURING the in-kernel mesh sweep + binned texel
    resolve: the 128-face textured grid stays red/green through the
    megakernel mesh path (VERDICT r2 #4 'carry (u,v,tex) through
    _pt_kernel and _sweep_kernel')."""
    from nrenderer_tpu.ops.bvh import build_mesh_accel
    from nrenderer_tpu.ops.pt_core import make_mat_channels
    from nrenderer_tpu.ops.pt_pallas import render_bsdf_pt_pallas

    scene = _lit_textured_quad(tmp_path, n=8)
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    ma = build_mesh_accel(arr, make_mat_channels(ss))
    assert ma.bt.tex is not None
    w = h = 16
    with pltpu.force_tpu_interpret_mode():
        img = np.asarray(render_bsdf_pt_pallas(
            ss, cam, w, h, 4, 2, seed=0, mesh_accel=ma,
            textures=arr.textures))
    img = img[::-1]
    assert np.isfinite(img).all()
    left = img[4:12, 2:7]
    right = img[4:12, 9:14]
    assert left[..., 0].mean() > 2.0 * left[..., 1].mean()
    assert right[..., 1].mean() > 2.0 * right[..., 0].mean()


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


def test_env_exact_patch_matches_xla_primary(monkeypatch):
    """The in-kernel exact bounce-0 env path (per-pixel native-res PxP
    windows, lane-aligned selects) must reproduce the XLA primary pass
    BIT-EXACTLY: both read the same native texel for the same hash-RNG
    jittered ray, so the only tolerance needed is the kernel's polynomial
    atan2 (~1e-5 rad, far below a texel at this map size)."""
    from nrenderer_tpu.ops import pt_pallas
    from nrenderer_tpu.scene.model import AmbientType, Texture

    scene = load_scn("/root/reference/resource/env_map_spheres.scn")
    rng = np.random.default_rng(0)
    env = rng.uniform(0.0, 2.0, (64, 128, 3)).astype(np.float32)
    scene.ambient.environment_map = len(scene.textures)
    scene.textures.append(Texture(name="env", pixels=env))
    scene.ambient.type = AmbientType.ENVIRONMENT_MAP
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    w = h = 32
    spp, depth = 4, 3

    ct = pt_pallas._camera_tuple(cam)
    key, _ = pt_pallas._env_exact_args(arr.env_map, ct, w, h)
    assert key is not None, "patch build fell back; footprint check failed"

    with pltpu.force_tpu_interpret_mode():
        img_exact = np.asarray(pt_pallas.render_bsdf_pt_pallas(
            ss, cam, w, h, spp, depth, seed=3, env_map=arr.env_map))

    monkeypatch.setenv("NR_ENV_EXACT0", "0")
    pt_pallas._ENV_PATCH_CACHE.clear()
    pt_pallas._build_pallas_pt.cache_clear()
    with pltpu.force_tpu_interpret_mode():
        img_fb = np.asarray(pt_pallas.render_bsdf_pt_pallas(
            ss, cam, w, h, spp, depth, seed=3, env_map=arr.env_map))
    pt_pallas._ENV_PATCH_CACHE.clear()
    pt_pallas._build_pallas_pt.cache_clear()

    assert np.abs(img_exact - img_fb).max() < 5e-3  # measured 0.0


def test_megakernel_refuses_empty_scene():
    """A materials-only scene (stock conductors.scn ships no geometry)
    constant-folds the whole bounce loop and crashes Mosaic layout
    inference on real TPU — the megakernel must refuse it with a real
    error (the renderers route such scenes to the XLA wavefront)."""
    import pytest
    from nrenderer_tpu import load_scn, build_scene_arrays
    from nrenderer_tpu.ops.camera import make_camera
    from nrenderer_tpu.ops.intersect import make_static_scene
    from nrenderer_tpu.ops import pt_pallas

    scene = load_scn("/root/reference/resource/conductors.scn")
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    assert not ss.sph and not ss.tri and not ss.pln
    with pytest.raises(ValueError, match="at least one primitive"):
        pt_pallas.render_bsdf_pt_pallas(ss, cam, 16, 16, 2, 2, seed=0)
