"""Analytic intersection tests for both the dense-SoA and unrolled kernels.

Cases chosen to pin the reference's conventions
(`simple_path_tracing/src/intersections/intersections.cpp`):
epsilon boundaries, det-sign folding, both sphere roots, parallelogram uv."""
import numpy as np
import pytest

import jax.numpy as jnp

from nrenderer_tpu import Scene, Material, parse_scn, build_scene_arrays
from nrenderer_tpu.ops.intersect import (
    intersect_area_lights, intersect_area_lights_unrolled, intersect_scene,
    intersect_scene_unrolled, make_scene_soa, make_static_scene,
)
from nrenderer_tpu.ops.soa import V3


SCENE_TEXT = """Begin Material
Material M0
Prop diffuseColor RGB 0.5 0.5 0.5
Material M1
Prop diffuseColor RGB 0.9 0.1 0.1
End
Begin Model
Model All
Sphere S M0
P 0 0 5
R 1
Triangle T M1
N 0 0 -1
V1 -1 -1 10
V2 1 -1 10
V3 0 1 10
Plane P M0
N 0 0 -1
P -2 -2 20
U 4 0 0
V 0 4 0
End
Begin Light
Area L
IRV 5 5 5
P -1 -1 15
U 2 0 0
V 0 2 0
End
"""


@pytest.fixture(scope="module")
def arrays():
    return build_scene_arrays(parse_scn(SCENE_TEXT))


def rays(*dirs_origins):
    o = np.array([a for a, _ in dirs_origins], np.float32)
    d = np.array([b for _, b in dirs_origins], np.float32)
    return (V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
            V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])))


CASES = [
    # (origin, dir, expected_t, expected_kind)
    (( 0.0,  0.0, 0.0), (0.0, 0.0, 1.0), 4.0, "sphere"),   # front sphere hit
    (( 0.0,  0.0, 4.5), (0.0, 0.0, 1.0), 1.5, "sphere-inside"),  # 2nd root
    (( 0.0,  0.0, 8.0), (0.0, 0.0, 1.0), 2.0, "triangle"),
    ((-1.5,  1.5, 0.0), (0.0, 0.0, 1.0), 20.0, "plane"),
    (( 0.0,  0.0, 0.0), (0.0, 0.0, -1.), np.inf, "miss"),
    ((-3.9, -3.9, 0.0), (0.0, 0.0, 1.0), np.inf, "outside-plane-patch"),
]


def run_both(arrays, o, d):
    soa = make_scene_soa(arrays)
    ss = make_static_scene(arrays)
    h1 = intersect_scene(soa, o, d)
    h2 = intersect_scene_unrolled(ss, o, d,
                                  mat_channels=[(0.5,), (0.9,)])
    return h1, h2


def test_analytic_cases(arrays):
    o, d = rays(*[(c[0], c[1]) for c in CASES])
    h1, h2 = run_both(arrays, o, d)
    expect = np.array([c[2] for c in CASES], np.float32)
    np.testing.assert_allclose(np.asarray(h1.t), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h2.t), expect, rtol=1e-5)


def test_normals_and_materials(arrays):
    o, d = rays(((0.0, 0.0, 0.0), (0.0, 0.0, 1.0)),
                ((0.0, 0.0, 8.0), (0.0, 0.0, 1.0)))
    h1, h2 = run_both(arrays, o, d)
    # sphere normal = (p - c)/r = (0,0,-1); triangle stored normal (0,0,-1)
    np.testing.assert_allclose(np.asarray(h1.normal.z), [-1.0, -1.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2.normal.z), [-1.0, -1.0],
                               atol=1e-6)
    # dense path: material one-hot (M=2)
    np.testing.assert_allclose(np.asarray(h1.mat_oh),
                               [[1.0, 0.0], [0.0, 1.0]], atol=1e-6)
    # unrolled path: tracked channel (0.5 for M0, 0.9 for M1)
    np.testing.assert_allclose(np.asarray(h2.channels[0]), [0.5, 0.9],
                               atol=1e-6)


def test_epsilon_self_hit(arrays):
    # origin exactly on the plane, shooting along it -> no hit (t_min)
    o, d = rays(((0.0, 0.0, 20.0), (0.0, 0.0, 1.0)))
    h1, h2 = run_both(arrays, o, d)
    assert not bool(h1.valid[0])
    assert not bool(h2.valid[0])


def test_area_light(arrays):
    soa = make_scene_soa(arrays)
    ss = make_static_scene(arrays)
    o, d = rays(((0.0, 0.0, 12.0), (0.0, 0.0, 1.0)),   # hits light at t=3
                ((3.0, 3.0, 12.0), (0.0, 0.0, 1.0)))   # misses patch
    t1, r1 = intersect_area_lights(soa, o, d)
    t2, r2 = intersect_area_lights_unrolled(ss, o, d)
    np.testing.assert_allclose(np.asarray(t1), [3.0, np.inf], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), [3.0, np.inf], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.x), [5.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2.x), [5.0, 0.0], atol=1e-6)


def test_dense_vs_unrolled_random(arrays):
    """Fuzz: both paths agree on random rays."""
    rng = np.random.default_rng(42)
    n = 512
    o_np = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o_np[:, 2] = rng.uniform(-2, 2, n)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = V3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    h1, h2 = run_both(arrays, o, d)
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    both_finite = np.isfinite(t1) & np.isfinite(t2)
    assert (np.isfinite(t1) == np.isfinite(t2)).all()
    np.testing.assert_allclose(t1[both_finite], t2[both_finite], rtol=1e-4)
