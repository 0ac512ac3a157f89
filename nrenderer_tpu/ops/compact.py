"""Shared wavefront-compaction index builder.

One idiom, three hot users: the Pallas mesh sweep's ray compaction
(`mesh_pallas.intersect_triangles_mesh`), the XLA blocked sweep's
(`pt_core._blocked_compacted`), and the staged wavefront's RR pack
(`renderers/_wavefront.build_staged_wavefront_fn`).
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_indices(mask: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Indices of the first `cap` True lanes of `mask`, n-filled past the
    last hit — bit-identical to `jnp.nonzero(mask, size=cap,
    fill_value=n)[0]` but 1.6x faster at 8M lanes (88 -> 55 ms/bounce
    measured on v5e: XLA lowers `nonzero` through a sort; this is one
    exclusive cumsum + one scatter).

    The result is sorted ascending, unique below n, and safe to use with
    `jnp.take(..., mode="clip")` + `.at[ridx].set(..., mode="drop",
    indices_are_sorted=True, unique_indices=True)` for the scatter-back.
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (pos < cap), pos, cap)
    return jnp.full((cap,), n, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
