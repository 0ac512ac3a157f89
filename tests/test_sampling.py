"""Sampler distribution tests (reference samplers, SURVEY §2.5)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrenderer_tpu.ops.pt_core import hash_uniform, hemisphere_from_uv, onb_local
from nrenderer_tpu.ops.sampling import (
    cosine_hemisphere, hemisphere, sphere, uniform_circle, uniform_square,
)
from nrenderer_tpu.ops.soa import V3, dot3

KEY = jax.random.PRNGKey(7)
N = 50000


def test_uniform_square_range_and_mean():
    s = np.asarray(uniform_square(KEY, (N,)))
    assert s.min() >= -1.0 and s.max() <= 1.0
    assert abs(s.mean()) < 0.02
    assert abs(s.var() - 1.0 / 3.0) < 0.01  # Var of U[-1,1]


def test_uniform_circle_in_disk():
    c = np.asarray(uniform_circle(KEY, (N,)))
    r2 = (c ** 2).sum(axis=1)
    assert r2.max() <= 1.0 + 1e-6
    # uniform on the disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 0.01


def test_hemisphere_uniform():
    h = np.asarray(hemisphere(KEY, (N,)))
    norms = np.linalg.norm(h, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    z = h[:, 2]
    assert z.min() >= 0.0
    # uniform hemisphere: E[cos] = 1/2 (z uniform in [0,1])
    assert abs(z.mean() - 0.5) < 0.01


def test_cosine_hemisphere():
    h = np.asarray(cosine_hemisphere(KEY, (N,)))
    assert abs(h[:, 2].mean() - 2.0 / 3.0) < 0.01  # E[cos] = 2/3


def test_sphere_uniform():
    s = np.asarray(sphere(KEY, (N,)))
    np.testing.assert_allclose(np.linalg.norm(s, axis=1), 1.0, atol=1e-5)
    assert abs(s.mean(axis=0)).max() < 0.02


def test_onb_local_preserves_length_and_aligns():
    n = V3(jnp.full((N,), 0.6), jnp.full((N,), 0.8), jnp.zeros((N,)))
    local = hemisphere_from_uv(jax.random.uniform(KEY, (N,)),
                               jax.random.uniform(jax.random.fold_in(KEY, 1),
                                                  (N,)))
    world = onb_local(n, local)
    lens = np.asarray(dot3(world, world))
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    # hemisphere about n: all samples on n's side
    assert np.asarray(dot3(world, n)).min() >= -1e-5


def test_hash_uniform_statistics():
    pid = jnp.arange(N, dtype=jnp.int32)
    u = np.asarray(hash_uniform(pid, jnp.int32(3), 5, jnp.int32(11)))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    # neighboring pixels are decorrelated
    corr = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(corr) < 0.02
    # different draw sites give different values
    u2 = np.asarray(hash_uniform(pid, jnp.int32(3), 6, jnp.int32(11)))
    assert abs(np.corrcoef(u, u2)[0, 1]) < 0.02
