"""Compaction-pipe variants at 8M rays, 13% live (realistic bounce-1 rate).
Measures pack+gather+scatter WITHOUT the sweep (dummy transform), so the
pipe cost is isolated."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 8_000_000
CAP = 1_048_576  # N/8 tile-aligned
REP = 10
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
cols = [jax.random.uniform(k, (N,)) for k in ks[:7]]
m = jax.random.uniform(ks[7], (N,)) < 0.13
inf = jnp.float32(jnp.inf)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REP
    print(f"{name}: {dt*1e3:.1f} ms/iter", flush=True)


def scanned(body):
    def outer(c0, *args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, c0, None, length=REP)
        return c
    return outer


def pipe_nonzero(c, m, *cols):
    mm = m & (cols[0] + c < 2.0)
    (ridx,) = jnp.nonzero(mm, size=CAP, fill_value=N)
    g = jnp.clip(ridx, 0, N - 1)
    packed = [jnp.take(a, g, mode="clip") for a in cols]
    outs = [jnp.full((N,), inf).at[ridx].set(
        p * 2.0, mode="drop", indices_are_sorted=True, unique_indices=True)
        for p in packed[:6]]
    return c + outs[0][0] * 0


def pipe_cumsum(c, m, *cols):
    mm = m & (cols[0] + c < 2.0)
    pos = jnp.cumsum(mm.astype(jnp.int32)) - 1
    slot = jnp.where(mm & (pos < CAP), pos, CAP)
    ridx = jnp.full((CAP,), N, jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    g = jnp.clip(ridx, 0, N - 1)
    packed = [jnp.take(a, g, mode="clip") for a in cols]
    outs = [jnp.full((N,), inf).at[ridx].set(
        p * 2.0, mode="drop", indices_are_sorted=True, unique_indices=True)
        for p in packed[:6]]
    return c + outs[0][0] * 0


def pipe_cumsum_stacked(c, m, *cols):
    mm = m & (cols[0] + c < 2.0)
    pos = jnp.cumsum(mm.astype(jnp.int32)) - 1
    slot = jnp.where(mm & (pos < CAP), pos, CAP)
    ridx = jnp.full((CAP,), N, jnp.int32).at[slot].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    g = jnp.clip(ridx, 0, N - 1)
    stacked = jnp.stack(cols)                       # (7, N)
    packed = jnp.take(stacked, g, axis=1, mode="clip")  # (7, CAP)
    vals = packed[:6] * 2.0
    outs = jnp.full((6, N), inf).at[:, ridx].set(
        vals, mode="drop", indices_are_sorted=True, unique_indices=True)
    return c + outs[0, 0] * 0


timeit("A nonzero pack (current)", scanned(pipe_nonzero),
       jnp.float32(0), m, *cols)
timeit("B cumsum pack", scanned(pipe_cumsum), jnp.float32(0), m, *cols)
timeit("C cumsum + stacked g/s", scanned(pipe_cumsum_stacked),
       jnp.float32(0), m, *cols)
