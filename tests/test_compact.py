"""ops/compact.pack_indices: bit-equality with jnp.nonzero(size, fill)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrenderer_tpu.ops.compact import pack_indices


@pytest.mark.parametrize("frac", [0.0, 0.05, 0.5, 1.0])
@pytest.mark.parametrize("cap", [16, 128, 1000])
def test_matches_nonzero(frac, cap):
    n = 1000
    mask = jax.random.uniform(jax.random.PRNGKey(7), (n,)) < frac
    (want,) = jnp.nonzero(mask, size=cap, fill_value=n)
    got = pack_indices(mask, cap)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_scatter_roundtrip_under_jit():
    """The documented consumer pattern: gather by the pack, transform,
    scatter back with the sorted/unique hints — identity on packed lanes,
    fill elsewhere."""
    n, cap = 512, 64
    mask = jax.random.uniform(jax.random.PRNGKey(3), (n,)) < 0.08
    vals = jnp.arange(n, dtype=jnp.float32) * 2.0

    @jax.jit
    def roundtrip(mask, vals):
        ridx = pack_indices(mask, cap)
        g = jnp.clip(ridx, 0, n - 1)
        packed = jnp.take(vals, g, mode="clip")
        return jnp.full((n,), -1.0).at[ridx].set(
            packed, mode="drop", indices_are_sorted=True,
            unique_indices=True)

    out = np.asarray(roundtrip(mask, vals))
    m = np.asarray(mask)
    np.testing.assert_array_equal(out[m], np.asarray(vals)[m])
    assert (out[~m] == -1.0).all()
