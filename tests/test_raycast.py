"""RayCast renderer integration tests on the stock cornel scene."""
import numpy as np
import pytest

import nrenderer_tpu
from nrenderer_tpu import load_scn
from nrenderer_tpu.server.manager import ComponentManager

nrenderer_tpu._register_builtin_renderers()


@pytest.fixture(scope="module")
def raycast_render(resource_dir):
    scene = load_scn(str(resource_dir / "ray_cast_cornel.scn"))
    scene.render_option.width = 64
    scene.render_option.height = 64
    mgr = ComponentManager()
    mgr.exec("RayCast", scene)
    return mgr.wait(timeout=300)


def test_shape_and_range(raycast_render):
    img = raycast_render.pixels
    assert img.shape == (64, 64, 4)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img[..., 3].min() == 1.0


def test_image_structure(raycast_render):
    """Structural properties of the cornel render: colored side walls, lit
    content in the center, dark where nothing is hit."""
    img = raycast_render.pixels[..., :3]
    # scene is lit: a good chunk of pixels nonzero
    assert (img.sum(axis=2) > 0.01).mean() > 0.5
    # camera at z=10 looking +z: u = cross(up, w) = (-1,0,0), so s=0 (screen
    # left) maps to world +x = the Red LeftWall; screen right to Green.
    left = img[28:36, 2:6].mean(axis=(0, 1))
    right = img[28:36, 58:62].mean(axis=(0, 1))
    assert left[0] > left[1]    # red dominates on screen-left
    assert right[1] > right[0]  # green dominates on screen-right


def test_shadows_present(raycast_render):
    """The pyramid/sphere cast shadows -> image contains fully black lit-region
    pixels besides the background."""
    img = raycast_render.pixels[..., :3]
    dark = (img.sum(axis=2) < 1e-6)
    assert dark.any()
    assert dark.mean() < 0.5


def test_no_point_light_black(resource_dir):
    scene = load_scn(str(resource_dir / "ray_cast_cornel.scn"))
    scene.render_option.width = 8
    scene.render_option.height = 8
    scene.point_light_buffer.clear()
    scene.lights.clear()
    mgr = ComponentManager()
    mgr.exec("RayCast", scene)
    img = mgr.wait(timeout=300).pixels
    assert img[..., :3].max() == 0.0


def _floor_scene():
    """A single big floor quad at y=0 viewed from above."""
    from nrenderer_tpu.scene.model import (
        Material, Plane, Property, PropertyType, Scene,
    )
    from nrenderer_tpu.scene.model import Node, NodeType

    s = Scene()
    m = Material(name="white", type=0)
    m.register_property(Property("diffuseColor", PropertyType.RGB,
                                 (0.8, 0.8, 0.8)))
    s.materials.append(m)
    s.nodes.append(Node(name="floor", type=NodeType.PLANE,
                        entity=len(s.plane_buffer)))
    s.plane_buffer.append(Plane(position=(-50.0, 0.0, -50.0),
                                u=(100.0, 0.0, 0.0), v=(0.0, 0.0, 100.0),
                                normal=(0.0, 1.0, 0.0), material=0))
    s.camera.position = (0.0, 40.0, 0.001)
    s.camera.look_at = (0.0, 0.0, 0.0)
    s.render_option.width = s.render_option.height = 24
    return s


def test_directional_light_shading():
    """Directional lights (declared `Light.hpp:52-57`, shaded by no
    reference renderer) illuminate uniformly from their direction."""
    from nrenderer_tpu.scene.model import DirectionalLight
    from nrenderer_tpu.renderers.raycast import RayCastRenderer

    s = _floor_scene()
    s.directional_light_buffer.append(DirectionalLight(
        direction=(0.0, -1.0, 0.0), irradiance=(1.0, 0.5, 0.25)))
    img = RayCastRenderer().render(s).pixels[..., :3]
    lit = img[img.sum(axis=2) > 0]
    assert lit.size > 0
    # head-on: cos = 1, so color = sqrt(diffuse * irradiance)
    assert np.allclose(lit[:, 0], np.sqrt(0.8 * 1.0), atol=1e-3)
    assert np.allclose(lit[:, 1], np.sqrt(0.8 * 0.5), atol=1e-3)
    assert np.allclose(lit[:, 2], np.sqrt(0.8 * 0.25), atol=1e-3)


def test_spot_light_cone():
    """Spot lights fall off between hotSpot and fallout angles."""
    from nrenderer_tpu.scene.model import SpotLight
    from nrenderer_tpu.renderers.raycast import RayCastRenderer

    s = _floor_scene()
    s.spot_light_buffer.append(SpotLight(
        position=(0.0, 20.0, 0.0), direction=(0.0, -1.0, 0.0),
        intensity=(1.0, 1.0, 1.0), hot_spot=0.15, fallout=0.35))
    img = RayCastRenderer().render(s).pixels[..., :3]
    h, w = img.shape[:2]
    center = img[h // 2 - 2:h // 2 + 2, w // 2 - 2:w // 2 + 2].mean()
    corner = img[:3, :3].mean()
    assert center > 0.2
    assert corner < 0.05 * max(center, 1e-6)


def test_wide_fov_no_nan(resource_dir):
    """Rays that leave the scene (miss everything) must shade to black, not
    NaN: miss hits carry t=inf and a masked 0*inf is NaN unless the hit
    point is folded to the origin (regression: editing fov past the box's
    frame filled 40% of the image with NaN)."""
    scene = load_scn(str(resource_dir / "ray_cast_cornel.scn"))
    scene.render_option.width = 32
    scene.render_option.height = 32
    scene.camera.fov = 120.0
    mgr = ComponentManager()
    mgr.exec("RayCast", scene)
    img = mgr.wait(timeout=300).pixels
    assert np.isfinite(img).all()
    # at fov 120 many rays exit the open front: those pixels are black
    assert (img[..., :3].sum(axis=2) < 1e-6).any()
