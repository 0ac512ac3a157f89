"""Pallas TPU megakernel for the diffuse path tracer.

The entire render — camera ray generation, per-bounce closest-hit over the
unrolled scene, area-light hits, Lambertian sampling with the hardware PRNG,
and film accumulation — runs as ONE `pallas_call`.  Ray state lives in VMEM
tiles for the whole spp x depth loop; HBM sees exactly one film write per
pixel tile.  This removes the per-scan-step dispatch overhead and the
carry-state HBM round trips that bound the XLA wavefront (measured ~1.4 ms
per bounce step on the axon backend).  Uniforms come from a stateless
counter-based hash (`pt_core.hash_uniform`) — the hardware PRNG stream
(`pltpu.prng_random_bits`) showed visible ring correlations in the film.

Grid: one program per tile of SUB x 128 pixels; each program loops spp and
depth internally (`jax.lax.fori_loop`), accumulating its film tile in VMEM.
Scene primitives and camera basis are baked into the kernel as constants
(offline rendering: one compile per scene+camera, cached).

The physics is the exact same shape-agnostic `ops.pt_core.diffuse_bounce`
the XLA engine uses — tested for equality in tests/test_pt_pallas.py."""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import StaticScene
from .pt_core import (
    bsdf_bounce, diffuse_bounce, finish_ambient, hash_uniform,
    make_mat_channels,
)
from .soa import V3

# Tile height: SUB x 128 rays per grid step.  Kept small so the bounce
# loop's carried state (13 arrays x SUB/8 vregs) stays in vector registers —
# large tiles make Mosaic carry hundreds of vregs through the fori_loop and
# fail.  SUB=32 (52 carried vregs) measured fastest on v5e: 230 spp/s at
# 512x512 depth 20 on the Cornell box (2048 spp in 8.9 s).
SUB = 32
LANES = 128


def _camera_tuple(cam) -> Tuple[float, ...]:
    """CameraParams -> hashable tuple of floats for kernel baking."""
    f = lambda a: tuple(float(x) for x in np.asarray(a).reshape(-1))
    return (f(cam.position) + f(cam.lower_left) + f(cam.horizontal)
            + f(cam.vertical) + f(cam.u) + f(cam.v)
            + (float(cam.lens_radius),))


def _pt_kernel(seed_ref, film_r, film_g, film_b, *, ss: StaticScene,
               cam: Tuple[float, ...], width: int, height: int, spp: int,
               depth: int, t_min: float, bsdf: bool = False):
    """`bsdf=False`: SimplePathTracer (diffuse-only).  `bsdf=True`:
    AccPathTracer's 4-lobe dispatch (pt_core.bsdf_bounce) — same kernel
    skeleton, one extra uniform per bounce."""
    seed = seed_ref[0]

    (px0, py0, pz0, llx, lly, llz, hx, hy, hz, vx, vy, vz,
     ux, uy, uz, cvx, cvy, cvz, lens_r) = cam
    if bsdf:
        mat_ch = make_mat_channels(ss)
    else:
        albedo_ch = [tuple(float(v) for v in m["diffuse"]) for m in ss.mats]

    pid = (pl.program_id(0) * (SUB * LANES)
           + jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1))
    pyi = pid // width
    pxi = pid - pyi * width
    pxf = pxi.astype(jnp.float32)
    pyf = pyi.astype(jnp.float32)

    inv_w = jnp.float32(1.0 / width)
    inv_h = jnp.float32(1.0 / height)

    def sample_body(sp, film):
        fr, fg, fb = film

        def rnd(draw):
            # stateless hash RNG: independent per (pixel, sample, site)
            return hash_uniform(pid, sp, draw, seed)

        # pixel jitter in [-1, 1] (UniformInSquare)
        rx = rnd(0) * 2.0 - 1.0
        ry = rnd(1) * 2.0 - 1.0
        s = (pxf + rx) * inv_w
        t = (pyf + ry) * inv_h
        if lens_r > 0.0:
            # thin-lens: uniform disk via polar map
            lr = jnp.sqrt(rnd(2)) * lens_r
            phi = rnd(3) * jnp.float32(2.0 * np.pi)
            du = lr * jnp.cos(phi)
            dv = lr * jnp.sin(phi)
            ox = px0 + du * ux + dv * cvx
            oy = py0 + du * uy + dv * cvy
            oz = pz0 + du * uz + dv * cvz
        else:
            ox = jnp.full((SUB, LANES), px0, jnp.float32)
            oy = jnp.full((SUB, LANES), py0, jnp.float32)
            oz = jnp.full((SUB, LANES), pz0, jnp.float32)
        dx = llx + s * hx + t * vx - ox
        dy = lly + s * hy + t * vy - oy
        dz = llz + s * hz + t * vz - oz
        inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        d = V3(dx * inv_len, dy * inv_len, dz * inv_len)
        o = V3(ox, oy, oz)

        ones = jnp.ones((SUB, LANES), jnp.float32)
        zeros = jnp.zeros((SUB, LANES), jnp.float32)
        # alive is carried as a float mask: the remote Mosaic build rejects
        # vector<i1> loop carries through scf.for
        state = (o, d, V3(ones, ones, ones), V3(zeros, zeros, zeros), ones)

        def bounce_body(b, st):
            o, d, thr, rad, alive_f = st
            bseed = seed + b * jnp.int32(-1640531535)
            u1 = hash_uniform(pid, sp, 4, bseed)
            u2 = hash_uniform(pid, sp, 5, bseed)
            if bsdf:
                u3 = hash_uniform(pid, sp, 6, bseed)
                o, d, thr, rad, alive = bsdf_bounce(
                    ss, mat_ch, o, d, thr, rad, alive_f > 0.5, u1, u2, u3,
                    t_min=t_min)
            else:
                o, d, thr, rad, alive = diffuse_bounce(
                    ss, albedo_ch, o, d, thr, rad, alive_f > 0.5, u1, u2,
                    t_min=t_min)
            return (o, d, thr, rad, alive.astype(jnp.float32))

        o, d, thr, rad, alive_f = jax.lax.fori_loop(0, depth, bounce_body,
                                                    state)
        rad = finish_ambient(ss, thr, rad, alive_f > 0.5)
        return (fr + rad.x, fg + rad.y, fb + rad.z)

    zeros = jnp.zeros((SUB, LANES), jnp.float32)
    fr, fg, fb = jax.lax.fori_loop(0, spp, sample_body,
                                   (zeros, zeros, zeros))
    inv_spp = jnp.float32(1.0 / spp)
    film_r[0] = fr * inv_spp
    film_g[0] = fg * inv_spp
    film_b[0] = fb * inv_spp


@functools.lru_cache(maxsize=32)
def _build_pallas_pt(ss: StaticScene, cam: Tuple[float, ...], width: int,
                     height: int, spp: int, depth: int, t_min: float,
                     bsdf: bool = False, linear: bool = False):
    n_pix = width * height
    tile = SUB * LANES
    n_tiles = pl.cdiv(n_pix, tile)

    kernel = functools.partial(_pt_kernel, ss=ss, cam=cam, width=width,
                               height=height, spp=spp, depth=depth,
                               t_min=t_min, bsdf=bsdf)
    film_shape = jax.ShapeDtypeStruct((n_tiles, SUB, LANES), jnp.float32)
    block = pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def run(seed: jnp.ndarray) -> jnp.ndarray:
        fr, fg, fb = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=(film_shape, film_shape, film_shape),
            out_specs=(block, block, block),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(seed.reshape(1).astype(jnp.int32))
        film = jnp.stack([fr.reshape(-1)[:n_pix], fg.reshape(-1)[:n_pix],
                          fb.reshape(-1)[:n_pix]], axis=-1)
        if linear:
            # the kernel divides by its own spp; undo for a SUM film
            return film * float(spp)
        return jnp.sqrt(jnp.maximum(film, 0.0)).reshape(height, width, 3)

    return run


def render_simple_pt_pallas(ss: StaticScene, cam, width: int, height: int,
                            spp: int, depth: int, seed: int = 0,
                            t_min: float = None) -> jnp.ndarray:
    """Full diffuse-PT render via the Pallas megakernel.

    Returns (H, W, 3) gamma'd image, row 0 = BOTTOM (same contract as
    renderers.simple_pt.build_render_fn)."""
    if t_min is None:
        from .pt_core import scene_epsilon
        t_min = scene_epsilon(ss)
    run = _build_pallas_pt(_hashable_static_scene(ss), _camera_tuple(cam),
                           width, height, spp, depth, t_min)
    return run(jnp.asarray([seed], jnp.int32))


def render_pt_pallas_linear(ss: StaticScene, cam, width: int, height: int,
                            spp: int, depth: int, seed: int = 0,
                            t_min: float = None,
                            bsdf: bool = False) -> jnp.ndarray:
    """One progressive pass on the Pallas engine: LINEAR film SUM over
    `spp` samples, (n_pix, 3).  Distinct seeds give independent passes."""
    if t_min is None:
        from .pt_core import scene_epsilon
        t_min = scene_epsilon(ss)
    run = _build_pallas_pt(_hashable_static_scene(ss), _camera_tuple(cam),
                           width, height, spp, depth, t_min, bsdf=bsdf,
                           linear=True)
    return run(jnp.asarray([seed], jnp.int32))


def render_bsdf_pt_pallas(ss: StaticScene, cam, width: int, height: int,
                          spp: int, depth: int, seed: int = 0,
                          t_min: float = None) -> jnp.ndarray:
    """AccPathTracer's 4-BSDF estimator via the Pallas megakernel (no mesh
    BVH path inside the kernel yet — the acc renderer uses this engine only
    for brute-force-size scenes).  Same output contract as
    render_simple_pt_pallas."""
    if t_min is None:
        from .pt_core import scene_epsilon
        t_min = scene_epsilon(ss)
    run = _build_pallas_pt(_hashable_static_scene(ss), _camera_tuple(cam),
                           width, height, spp, depth, t_min, bsdf=True)
    return run(jnp.asarray([seed], jnp.int32))


class _HashableScene:
    """StaticScene wrapper with structural hashing for the lru_cache."""

    def __init__(self, ss: StaticScene):
        self.ss = ss
        self._key = repr(ss)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableScene) and self._key == other._key

    def __getattr__(self, name):
        return getattr(self.ss, name)


def _hashable_static_scene(ss: StaticScene):
    if isinstance(ss, _HashableScene):
        return ss
    return _HashableScene(ss)
