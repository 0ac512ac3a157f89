"""SceneArrays flattening tests."""
import numpy as np
import pytest

from nrenderer_tpu import Scene, build_scene_arrays, load_obj, load_scn
from nrenderer_tpu.scene.arrays import (
    MAT_ABSORBED, MAT_DIFFUSE, MAT_ETA_I, MAT_ETA_R, MAT_IOR, MAT_SPECULAR_EX,
)


def test_cornel_arrays(cornel_scene):
    arr = build_scene_arrays(cornel_scene)
    assert arr.pln_pos.shape == (11, 3)
    assert arr.tri_v1.shape == (4, 3)
    assert arr.sph_pos.shape == (1, 3)
    assert bool(arr.sph_valid[0])
    # translation bake: sphere at (0,0,0) in model translated (-100,-228,800)
    np.testing.assert_allclose(np.asarray(arr.sph_pos[0]),
                               [-100.0, -228.0, 800.0])
    assert float(arr.sph_radius[0]) == pytest.approx(50.0)
    # wall plane position baked with translation z=1028
    np.testing.assert_allclose(np.asarray(arr.pln_pos[0]),
                               [278.0, 278.0, 278.0 + 1028.0])
    # area light arrays
    np.testing.assert_allclose(np.asarray(arr.al_radiance[0]),
                               [47.8384, 38.5664, 31.0808], rtol=1e-6)
    # plane inverse matrix: inv([u v uxv]) @ u == e_x (LeftWall u=(0,-556,0))
    u = np.array([0.0, -556.0, 0.0])
    res = np.asarray(arr.pln_inv[0]) @ u
    np.testing.assert_allclose(res, [1.0, 0.0, 0.0], atol=1e-5)


def test_material_table(resource_dir):
    s = load_scn(str(resource_dir / "pt_glass.scn"))
    arr = build_scene_arrays(s)
    assert arr.mat_type.shape == (4,)
    gold_idx = next(i for i, m in enumerate(s.materials) if m.name == "Gold")
    p = np.asarray(arr.mat_params[gold_idx])
    np.testing.assert_allclose(p[MAT_ETA_R], [0.142, 0.374, 1.439], rtol=1e-6)
    np.testing.assert_allclose(p[MAT_ETA_I], [3.974, 2.380, 1.599], rtol=1e-6)
    white = np.asarray(arr.mat_params[0])
    np.testing.assert_allclose(white[MAT_DIFFUSE], [0.725, 0.71, 0.68],
                               rtol=1e-6)
    # defaults
    assert white[MAT_IOR] == pytest.approx(1.5)
    assert white[MAT_SPECULAR_EX] == pytest.approx(1.0)


def test_glass_material(resource_dir):
    s = load_scn(str(resource_dir / "env_map_spheres.scn"))
    arr = build_scene_arrays(s)
    glass_idx = next(i for i, m in enumerate(s.materials)
                     if m.name == "Glass")
    p = np.asarray(arr.mat_params[glass_idx])
    assert p[MAT_IOR] == pytest.approx(1.5)
    np.testing.assert_allclose(p[MAT_ABSORBED], [1.0, 1.0, 1.0])


def test_empty_scene_padding():
    arr = build_scene_arrays(Scene())
    # all buffers padded to 1 with valid=False
    assert arr.sph_pos.shape == (1, 3)
    assert not bool(arr.sph_valid[0])
    assert not bool(arr.tri_valid[0])
    assert not bool(arr.pln_valid[0])
    assert not bool(arr.al_valid[0])
    assert arr.mat_params.shape[0] == 1


def test_mesh_expansion_with_model_transform(resource_dir):
    s = load_obj(str(resource_dir / "obj" / "bunny_200_faces.obj"))
    # place the bunny the way acc's VertexTransformer hard-codes it
    # (`acc_path_tracing/src/VertexTransformer.cpp:38-44`), but as config
    s.models[0].scale = (600.0, 600.0, 600.0)
    s.models[0].translation = (40.0, -305.0, 920.0)
    s.mesh_buffer[0].material = 0
    arr = build_scene_arrays(s)
    assert arr.tri_v1.shape == (200, 3)
    # normals are unit length
    n = np.asarray(arr.tri_normal)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
    # transform applied: vertex range moved near translation
    v = np.asarray(arr.tri_v1)
    assert v[:, 2].mean() == pytest.approx(920.0, abs=100.0)


def test_triangle_stored_normal_not_normalized():
    text = """Begin Material
Material A
End
Begin Model
Model M
Triangle T A
N 0 2 0
V1 0 0 0
V2 1 0 0
V3 0 0 1
End
"""
    from nrenderer_tpu import parse_scn
    arr = build_scene_arrays(parse_scn(text))
    # stored (scene-file) normal is used verbatim, like the PT intersections
    np.testing.assert_allclose(np.asarray(arr.tri_normal[0]), [0.0, 2.0, 0.0])


def test_explicit_zero_float_props_respected():
    # an explicit 0.0 ior/specularEx must not be replaced by the default
    # (the falsy-`or` bug, ADVICE r1)
    from nrenderer_tpu import parse_scn
    from nrenderer_tpu.scene.arrays import MAT_IOR, MAT_SPECULAR_EX
    text = """Begin Material
Material Z 2
Prop ior Float 0.0
Prop specularEx Float 0.0
End
Begin Model
Model m
Sphere s Z
P 0 0 0
R 1
End
"""
    arr = build_scene_arrays(parse_scn(text))
    assert float(arr.mat_params[0, MAT_IOR]) == 0.0
    assert float(arr.mat_params[0, MAT_SPECULAR_EX]) == 0.0
