"""Native C++ component tests: equality with the pure-python fallbacks."""
import numpy as np
import pytest

from nrenderer_tpu import native
from nrenderer_tpu.ops.bvh import build_bvh

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_bvh_native_matches_python():
    rng = np.random.default_rng(5)
    mn = rng.uniform(-50, 50, (513, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.01, 5.0, (513, 3)).astype(np.float32)
    a = build_bvh(mn, mx, use_native=True)
    b = build_bvh(mn, mx, use_native=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_obj_scan_bunny(resource_dir):
    r = native.obj_scan(str(resource_dir / "obj" / "bunny_5k_faces.obj"))
    assert r is not None
    v, vt, vn, fv, ft, fn = r
    assert fv.shape == (4968, 3)
    assert fv.min() >= 1  # 1-based
    assert fv.max() <= v.shape[0]


def test_obj_native_path_matches_python(resource_dir):
    from nrenderer_tpu.io.obj import load_obj, _load_obj_native
    from nrenderer_tpu.scene.model import Scene

    path = str(resource_dir / "obj" / "bunny_200_faces.obj")
    s_native = Scene()
    assert _load_obj_native(path, s_native, material=0) is not None
    import os
    os.environ["NR_NO_NATIVE"] = "0"
    # python path: force by parsing through load_obj on a copy with usemtl
    s_python = Scene()
    # call the python parser directly by bypassing the native fast path
    import nrenderer_tpu.io.obj as objmod
    orig = objmod._load_obj_native
    objmod._load_obj_native = lambda *a, **k: None
    try:
        load_obj(path, s_python, material=0)
    finally:
        objmod._load_obj_native = orig

    mn = s_native.mesh_buffer[0]
    mp = s_python.mesh_buffer[0]
    # same triangles in same order (native keeps the raw pool; python
    # compacts — compare resolved vertex coordinates)
    tn = mn.positions[mn.position_indices.reshape(-1, 3)]
    tp = mp.positions[mp.position_indices.reshape(-1, 3)]
    np.testing.assert_allclose(tn, tp, rtol=1e-6)


def test_film_to_rgba8():
    film = np.array([[[0.0, 0.25, 1.5], [-1.0, 1.0, 0.5]]], np.float32)
    out = native.film_to_rgba8(film, apply_gamma=False)
    assert out.shape == (1, 2, 4)
    np.testing.assert_array_equal(out[0, 0], [0, 64, 255, 255])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 128, 255])
    out_g = native.film_to_rgba8(film, apply_gamma=True)
    assert out_g[0, 0, 1] == int(np.sqrt(0.25) * 255 + 0.5)
