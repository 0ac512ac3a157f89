"""SimplePathTracer tests (CPU): structure, energy, convergence."""
import numpy as np
import pytest

import nrenderer_tpu
from nrenderer_tpu import load_scn
from nrenderer_tpu.server.manager import ComponentManager

nrenderer_tpu._register_builtin_renderers()


def render(resource_dir, name="path_tracing_cornel.scn", w=48, h=48, spp=16,
           depth=6, mutate=None):
    scene = load_scn(str(resource_dir / name))
    scene.render_option.width = w
    scene.render_option.height = h
    scene.render_option.samples_per_pixel = spp
    scene.render_option.depth = depth
    if mutate:
        mutate(scene)
    mgr = ComponentManager()
    mgr.exec("SimplePathTracer", scene)
    return mgr.wait(timeout=600).pixels


@pytest.fixture(scope="module")
def cornel48(resource_dir):
    return render(resource_dir)


def test_shape_range(cornel48):
    assert cornel48.shape == (48, 48, 4)
    assert cornel48.min() >= 0.0 and cornel48.max() <= 1.0


def test_light_is_brightest(cornel48):
    """The area light at the top center must be the brightest region."""
    img = cornel48[..., :3].sum(axis=2)
    top_center = img[1:6, 18:30].mean()
    assert top_center > img.mean() * 1.5


def test_walls_colored(cornel48):
    img = cornel48[..., :3]
    left = img[20:30, 1:5].mean(axis=(0, 1))
    right = img[20:30, 43:47].mean(axis=(0, 1))
    assert left[0] > left[2] * 1.5    # red wall: R >> B
    assert right[1] > right[0] * 1.2  # green wall: G > R


def test_depth_zero_is_ambient_only(resource_dir):
    """depth=0 -> trace returns ambient.constant immediately (here 0)."""
    img = render(resource_dir, depth=0, spp=1)
    assert img[..., :3].max() == 0.0


def test_linear_estimator_consistency(resource_dir):
    """The LINEAR radiance estimator must agree across independent seeds
    within Monte Carlo error (the gamma'd image is biased by Jensen's
    inequality at low spp exactly like the reference, so the statistical
    test lives in linear space)."""
    import jax.numpy as jnp
    from nrenderer_tpu import build_scene_arrays
    from nrenderer_tpu.ops.camera import make_camera, shoot_v3
    from nrenderer_tpu.ops.intersect import make_static_scene
    from nrenderer_tpu.ops.sampling import make_base_key
    from nrenderer_tpu.renderers.simple_pt import trace_diffuse_wavefront

    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    cam = make_camera(scene.camera)
    n = 20000
    o, d = shoot_v3(cam, jnp.full((n,), 0.5), jnp.full((n,), 0.5))
    means, sems = [], []
    for seed in (0, 1):
        rad = trace_diffuse_wavefront(ss, o, d,
                                      make_base_key(seed, "threefry2x32"), 4)
        rx = np.asarray(rad.x)
        means.append(rx.mean())
        sems.append(rx.std() / np.sqrt(n))
    tol = 4.0 * np.hypot(sems[0], sems[1])
    assert abs(means[0] - means[1]) < tol


def test_ambient_constant_at_depth_cap(resource_dir):
    def add_ambient(scene):
        scene.ambient.constant = (1.0, 0.0, 0.0)
    img_amb = render(resource_dir, depth=2, spp=8, mutate=add_ambient)
    img_no = render(resource_dir, depth=2, spp=8)
    # ambient leaks red energy into surviving paths
    assert img_amb[..., 0].mean() > img_no[..., 0].mean()


def test_glass_scene_runs(resource_dir):
    """env_map_spheres has glass (type 2) materials; SimplePathTracer shades
    everything Lambertian like the reference's SPT ShaderCreator."""
    img = render(resource_dir, name="env_map_spheres.scn", spp=4, depth=3)
    assert np.isfinite(img).all()
