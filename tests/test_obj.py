"""OBJ importer tests against the stock bunny meshes."""
import numpy as np
import pytest

from nrenderer_tpu import NodeType, ObjParseError, Scene, load_obj
from nrenderer_tpu.io.obj import _parse_face_vertex


def test_bunny_200(resource_dir):
    s = load_obj(str(resource_dir / "obj" / "bunny_200_faces.obj"))
    assert len(s.mesh_buffer) == 1
    mesh = s.mesh_buffer[0]
    assert mesh.position_indices.shape[0] == 200 * 3
    assert mesh.positions.shape[1] == 3
    # index compaction: every index in range
    assert mesh.position_indices.max() < mesh.positions.shape[0]
    assert s.nodes[0].type == NodeType.MESH


def test_bunny_5k(resource_dir):
    s = load_obj(str(resource_dir / "obj" / "bunny_5k_faces.obj"))
    # the "5k" bunny actually has 4968 faces
    assert s.mesh_buffer[0].position_indices.shape[0] == 4968 * 3


def test_face_vertex_variants():
    assert _parse_face_vertex("7") == (7, -1, -1)
    assert _parse_face_vertex("7/2") == (7, 2, -1)
    assert _parse_face_vertex("7//3") == (7, -1, 3)
    assert _parse_face_vertex("7/2/3") == (7, 2, 3)


def test_non_triangulated_rejected(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    with pytest.raises(ObjParseError, match="Triangulated"):
        load_obj(str(p))


def test_mtl_parsing(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl shiny\nKd 0.2 0.3 0.4\nKs 1 1 1\nNs 12\n")
    (tmp_path / "t.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl shiny\nf 1 2 3\n")
    s = load_obj(str(tmp_path / "t.obj"))
    assert len(s.materials) == 1
    assert s.materials[0].type == 1  # Phong-typed (ObjImporter.cpp:52-61)
    assert s.materials[0].get_property("diffuseColor") == \
        pytest.approx((0.2, 0.3, 0.4))
    assert s.mesh_buffer[0].material == 0


def test_shared_vertices_compacted(tmp_path):
    p = tmp_path / "two.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n")
    s = load_obj(str(p))
    mesh = s.mesh_buffer[0]
    assert mesh.positions.shape[0] == 4  # shared verts stored once
    assert mesh.position_indices.shape[0] == 6
