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
