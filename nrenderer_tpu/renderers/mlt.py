"""MetropolisLightTransport: Kelemen-style primary-sample-space MLT over a
bidirectional path tracer.

Rebuild of the metropolis_light_transport plugin (the reference's flagship,
`components/metropolis_light_transport/`, structure after smallpt-MLT):

  - primary sample space chains: a vector u of NumStates uniforms drives the
    whole bidirectional sample (`TMarkovChian.hpp:9-29`)
  - mutations: `large_step` = fresh uniforms w.p. 0.3, else `perturb` with
    exponential-scale wraparound; pixel dims use (2/(w+h), 0.1), the rest
    (1/1024, 1/64) (`Metropolis.hpp:103-147`)
  - bidirectional path generation: eye path from a pinhole `SampleCamera`,
    light path from the first area light with a g=999 cosine-power lobe (the
    "area-laser"); diffuse-only bounces via `VecCosine(n, 1, ...)`
    (`Metropolis.hpp:443-525`, `src/Metropolis.cpp:188-214`)
  - CombinePaths: all (eye prefix, light prefix) connections for path lengths
    3..20, each weighted by the balance heuristic over
    `PathProbablityDensity` sums (`Metropolis.hpp:544-608,349-441`)
  - Kelemen accumulation: both proposal and current splat every mutation with
    weights (a+isLarge)/(sc/b+pL) and (1-a)/(sc/b+pL) (`Metropolis.cpp:49-57`)
  - exposure tone map pow(1-exp(-x*s), 1/2.2) (`Metropolis.cpp:110-124`)

TPU-native redesign (vs 8 std::threads x 2M serial mutations with shared
xorshift state and racy splats, SURVEY.md §2.9):

  - thousands of chains run in lockstep as (C,)-lane arrays; the mutation
    loop is ONE `lax.scan`; every chain has its own counter-based PRNG stream
  - the (s,t) connection enumeration is an inner scan over a static combo
    table with fixed-length masked vertex loops (no data-dependent shapes)
  - splats are DEFERRED: a retained path accumulates its Kelemen weight and
    is scattered once when replaced (identical totals, half the scatter
    traffic, bounded storage)
  - scene coordinates are normalized to unit scale inside this renderer so
    the ~20-edge pdf products stay inside float32 range (the reference uses
    doubles); per-path contributions are scale-invariant (throughput and pdf
    powers of the scale factor cancel)

Reference quirks preserved for parity (each marked REFQUIRK below): the light
sample's position and direction reuse the same two uniforms; connections to
the light SAMPLE vert (t=1) always fail the id-equality visibility test;
emitted radiance is 2x the scene's area-light radiance (`Metropolis.hpp:34`);
`getColor` returns the emitted radiance for light verts, which is what makes
the light quad glow.  Deliberate fixes (marked DIVERGENCE): the hard-coded
cornel albedo table (`Metropolis.hpp:204-236`) is replaced by the scene's
material colors; the hard-coded light normal {0,-1,0} by the light's actual
normalized cross(u,v); and light-hit verts store the NORMALIZED normal
instead of the raw cross (see _trace_path)."""
from __future__ import annotations

import hashlib
from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import make_camera
from ..ops.intersect import (
    StaticScene, intersect_area_lights_unrolled, intersect_scene_unrolled,
    make_static_scene,
)
from ..ops.sampling import make_base_key
from ..ops.soa import V3, cross3, dot3, normalize3, where3
from ..scene.arrays import SceneArrays, build_scene_arrays
from ..scene.model import Scene
from ..server.component import RenderComponent, RenderResult
from ..server.registry import get_server, register_renderer

PI = np.pi
LIGHT_ID = -3.0
CAMERA_ID = -2.0
UNSET_ID = -1.0
MIN_PATH_LENGTH = 3      # `PathContribution.hpp:13`
LARGE_STEP_PROB = 0.3
T_MIN = 1e-4  # scene is unit-normalized; ~0.05mm in cornel units
MLT_BVH_THRESHOLD = 64   # tri pools past this route through the blocked
# Pallas sweep instead of the unrolled intersect (mirrors
# acc_pt.BVH_THRESHOLD; an unrolled 5k-tri program is uncompilable)


class MLTCamera(NamedTuple):
    """The double-precision MLT camera view (`mlt/include/Camera.hpp:16-73`):
    position + (u, v, w) basis + tan(vfov/2).  The reference's pixel-space
    screen distance is `height / (2 * half_height)` — height stays OUT of
    this tuple so the camera (and everything compiled against it) is
    resolution-independent; the kernel derives dist from the traced height
    (VERDICT r2 #3)."""
    pos: tuple      # (3,) floats
    u: tuple
    v: tuple
    w: tuple
    half_height: float  # tan(vfov / 2)


def _mlt_camera(camera, width: int = None, height: int = None) -> MLTCamera:
    """(width/height args kept for call-site compatibility; unused.)"""
    position = np.asarray(camera.position, np.float64)
    look_at = np.asarray(camera.look_at, np.float64)
    up = np.asarray(camera.up, np.float64)
    vfov = float(np.clip(camera.fov, 20.0, 160.0))
    half_height = np.tan(np.radians(vfov) / 2.0)
    w = position - look_at
    w /= np.linalg.norm(w)
    u = np.cross(up, w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    return MLTCamera(pos=tuple(position), u=tuple(u), v=tuple(v),
                     w=tuple(w), half_height=half_height)


def _onb_pixar(n: V3) -> tuple:
    """The reference's `onb(base, n)` basis (`Metropolis.hpp:186-200`):
    base.x*u + base.y*n + base.z*w with the z<-0.9999999 branch."""
    flip = n.z < -0.9999999
    a = 1.0 / (1.0 + jnp.where(flip, 1.0, n.z))  # guarded; masked when flip
    b = -n.x * n.y * a
    ux = jnp.where(flip, 0.0, 1.0 - n.x * n.x * a)
    uy = jnp.where(flip, -1.0, b)
    uz = jnp.where(flip, 0.0, -n.x)
    wx = jnp.where(flip, -1.0, b)
    wy = jnp.where(flip, 0.0, 1.0 - n.y * n.y * a)
    wz = jnp.where(flip, 0.0, -n.y)
    return (V3(ux, uy, uz), V3(wx, wy, wz))


def vec_cosine(n: V3, g: float, r1, r2) -> V3:
    """`VecCosine` (`src/Metropolis.cpp:217-224`): cosine-power lobe about n,
    exponent g (g=1 diffuse, g=999 the area-laser)."""
    temp1 = 2.0 * PI * r1
    temp2 = jnp.power(r2, 1.0 / (g + 1.0))
    s = jnp.sin(temp1)
    c = jnp.cos(temp1)
    t = jnp.sqrt(jnp.maximum(1.0 - temp2 * temp2, 0.0))
    u, w = _onb_pixar(n)
    bx, by, bz = s * t, temp2, c * t
    return V3(bx * u.x + by * n.x + bz * w.x,
              bx * u.y + by * n.y + bz * w.y,
              bx * u.z + by * n.z + bz * w.z)


class PathBatch(NamedTuple):
    """SoA batch of paths: (V, C) arrays, row i = vertex i.

    cr/cg/cb carry the vertex's `getColor` value resolved at TRACE time
    (hit channel tracking): diffuse color for prim hits, the emitted
    radiance for light verts (REFQUIRK `Metropolis.hpp:210-212`), zero for
    camera/unset.  This replaces a per-prim where-chain over every
    primitive x combo in CombinePaths (the reference's `getColor` switch,
    `Metropolis.hpp:204-236`) — O(1) instead of O(n_prims) per vertex, so
    MLT scales to mesh scenes."""
    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    pid: jnp.ndarray   # float ids; LIGHT_ID/CAMERA_ID/UNSET_ID or prim id
    cr: jnp.ndarray    # vertex getColor (see above)
    cg: jnp.ndarray
    cb: jnp.ndarray
    count: jnp.ndarray  # (C,) float — number of valid verts


def _trace_path(ss: StaticScene, mat_ch, o: V3, d: V3, u_rows: jnp.ndarray,
                v_max: int, depth: int, first_vert,
                light_normal_raw, emitted, first_color=None,
                tri_bvh=None) -> PathBatch:
    """Shared eye/light path tracer (`src/Metropolis.cpp:188-214`): diffuse
    bounces with PSS uniforms; light hits terminate the path.

    DIVERGENCE: the reference stores the RAW (unnormalized) cross(u,v) as
    the light-hit vert normal (`Metropolis.cpp:203` via `xAreaLight`), which
    injects |u x v| (~14400 for the stock scene) into the MIS pdfs and the
    geometry term of paths through the light — a scale-DEPENDENT bug.  We
    store the normalized normal: the estimator stays unbiased (MIS weights
    remain a partition of unity) and becomes invariant under the unit
    rescaling this renderer applies; only the variance weighting differs.

    `first_vert` = (p V3, n V3, id float-or-(C,)-array) rows; `u_rows` the
    (2*(min(depth,v_max)-1), C) PSS uniforms for the bounce directions
    (pre-sliced by the caller — lets `generate_paths` trace the eye AND
    light subpaths as one 2C-lane batch, halving the unrolled program)."""
    c = o.x.shape[0]
    rows_p = [first_vert[0]]
    rows_n = [first_vert[1]]
    fid = first_vert[2]
    rows_id = [jnp.broadcast_to(jnp.asarray(fid, jnp.float32), (c,))]
    # first-vert color: emitted for the light sample, zero for the camera
    if first_color is None:
        fc = emitted if first_vert[2] == LIGHT_ID else (0.0, 0.0, 0.0)
        first_color = V3(jnp.full((c,), fc[0]), jnp.full((c,), fc[1]),
                         jnp.full((c,), fc[2]))
    rows_c = [first_color]
    count = jnp.ones((c,))
    alive = jnp.ones((c,), jnp.bool_)

    for cur_depth in range(1, min(depth, v_max)):
        if tri_bvh is None:
            hit = intersect_scene_unrolled(ss, o, d, t_min=T_MIN,
                                           mat_channels=mat_ch)
        else:
            # mesh scenes: triangle pool through the blocked Pallas sweep
            # (reference brute force `Metropolis.cpp:135-166`, but fast);
            # unique_pids keeps the visibility check's id-equality exact
            from ..ops.pt_core import closest_hit
            hit = closest_hit(ss, o, d, T_MIN, mat_ch, tri_bvh=tri_bvh,
                              alive=alive, unique_pids=True)
        t_l, _ = intersect_area_lights_unrolled(ss, o, d, t_min=T_MIN)
        obj_first = alive & hit.valid & (hit.t < t_l)
        light_hit = alive & ~obj_first & (t_l < jnp.inf)

        n_hit = normalize3(hit.normal, eps=1e-20)
        # flip against the ray (`Metropolis.cpp:196`)
        flip = dot3(n_hit, d) < 0
        n_hit = where3(flip, n_hit, -n_hit)

        lp = V3(o.x + t_l * d.x, o.y + t_l * d.y, o.z + t_l * d.z)
        vert_p = where3(obj_first, hit.point, lp)
        vert_n = where3(obj_first, n_hit, light_normal_raw)
        vert_id = jnp.where(obj_first, hit.prim_id,
                            jnp.where(light_hit, LIGHT_ID, UNSET_ID))
        dr, dg, db = hit.channels  # diffuse rgb tracked through the hit
        vert_c = where3(obj_first, V3(dr, dg, db),
                        V3(jnp.full((c,), emitted[0]),
                           jnp.full((c,), emitted[1]),
                           jnp.full((c,), emitted[2])))
        appended = obj_first | light_hit
        zeros3 = V3(*(jnp.zeros((c,)),) * 3)
        rows_p.append(where3(appended, vert_p, zeros3))
        rows_n.append(where3(appended, vert_n, zeros3))
        rows_id.append(jnp.where(appended, vert_id, UNSET_ID))
        rows_c.append(where3(appended, vert_c, zeros3))
        count = count + appended.astype(jnp.float32)

        r0 = u_rows[(cur_depth - 1) * 2]
        r1 = u_rows[(cur_depth - 1) * 2 + 1]
        new_d = vec_cosine(n_hit, 1.0, r0, r1)
        o = where3(obj_first, hit.point, o)
        d = where3(obj_first, new_d, d)
        alive = obj_first

    while len(rows_p) < v_max:
        rows_p.append(V3(*(jnp.zeros((c,)),) * 3))
        rows_n.append(V3(*(jnp.zeros((c,)),) * 3))
        rows_id.append(jnp.full((c,), UNSET_ID))
        rows_c.append(V3(*(jnp.zeros((c,)),) * 3))

    stack = lambda rows, f: jnp.stack([f(r) for r in rows])
    return PathBatch(
        px=stack(rows_p, lambda r: r.x), py=stack(rows_p, lambda r: r.y),
        pz=stack(rows_p, lambda r: r.z),
        nx=stack(rows_n, lambda r: r.x), ny=stack(rows_n, lambda r: r.y),
        nz=stack(rows_n, lambda r: r.z),
        pid=jnp.stack(rows_id),
        cr=stack(rows_c, lambda r: r.x), cg=stack(rows_c, lambda r: r.y),
        cb=stack(rows_c, lambda r: r.z), count=count)


class MLTKernel:
    """Closes over the (static) scene/camera/shape config and builds the
    jittable pieces of the Kelemen chain."""

    def __init__(self, ss: StaticScene, cam: MLTCamera, width: int,
                 height: int, max_path: int, emitted, light_pos, light_u,
                 light_v, light_area: float, tri_bvh=None):
        self.ss = ss
        self.tri_bvh = tri_bvh  # MeshAccel for big triangle pools, or None
        self.cam = cam
        self.width = width
        self.height = height
        self.max_path = max_path
        self.v_max = max_path + 1
        nss = (self.v_max + 2) * 2          # NumStatesSubpath
        self.nss = nss
        self.n_states = nss * 2
        self.emitted = emitted              # (3,) floats (2x radiance)
        self.light_pos = light_pos
        self.light_u = light_u
        self.light_v = light_v
        self.light_area = light_area
        ln = np.cross(light_u, light_v)
        self.light_normal_raw = tuple(ln)
        self.light_normal = tuple(ln / np.linalg.norm(ln))
        self.mat_ch = [tuple(m["diffuse"]) for m in ss.mats]
        # combo table: (path length L, NumEyeVertices s), s >= 1
        self.combos = np.array(
            [(L, s) for L in range(MIN_PATH_LENGTH, max_path + 1)
             for s in range(1, L + 2)], np.int32)

    # -- path generation ----------------------------------------------------

    def _eye_start(self, u: jnp.ndarray, wh):
        """Camera-sample ray + first-vertex rows (`SampleCamera`,
        `Metropolis.hpp:490-499`)."""
        c = u.shape[1]
        cam = self.cam
        w_, h_ = wh if wh is not None else (float(self.width),
                                            float(self.height))
        dist = h_ / (2.0 * cam.half_height)
        r1, r2 = u[0], u[1]
        sx = -(0.5 - r1) * w_
        sy = (0.5 - r2) * h_
        dx = cam.u[0] * sx + cam.v[0] * sy - cam.w[0] * dist
        dy = cam.u[1] * sx + cam.v[1] * sy - cam.w[1] * dist
        dz = cam.u[2] * sx + cam.v[2] * sy - cam.w[2] * dist
        d = normalize3(V3(dx, dy, dz), eps=1e-20)
        o = V3(jnp.full((c,), cam.pos[0]), jnp.full((c,), cam.pos[1]),
               jnp.full((c,), cam.pos[2]))
        n = V3(jnp.full((c,), cam.w[0]), jnp.full((c,), cam.w[1]),
               jnp.full((c,), cam.w[2]))
        return o, d, n

    def _light_start(self, u: jnp.ndarray):
        """Light-sample ray + first-vertex rows.  REFQUIRK: the direction
        reuses the SAME uniforms as the position (`Metropolis.hpp:443-463`
        advances PathRndsOffset after reading)."""
        c = u.shape[1]
        r1, r2 = u[self.nss], u[self.nss + 1]
        lp, lu, lv = self.light_pos, self.light_u, self.light_v
        o = V3(lp[0] + r1 * lu[0] + r2 * lv[0],
               lp[1] + r1 * lu[1] + r2 * lv[1],
               lp[2] + r1 * lu[2] + r2 * lv[2])
        n = V3(jnp.full((c,), self.light_normal[0]),
               jnp.full((c,), self.light_normal[1]),
               jnp.full((c,), self.light_normal[2]))
        d = vec_cosine(n, 999.0, r1, r2)
        return o, d, n

    def _u_rows(self, u: jnp.ndarray, base: int) -> jnp.ndarray:
        return u[base:base + 2 * (min(self.max_path, self.v_max) - 1)]

    def generate_eye_path(self, u: jnp.ndarray, wh=None) -> PathBatch:
        o, d, n = self._eye_start(u, wh)
        c = u.shape[1]
        ln = V3(jnp.full((c,), self.light_normal[0]),
                jnp.full((c,), self.light_normal[1]),
                jnp.full((c,), self.light_normal[2]))
        return _trace_path(self.ss, self.mat_ch, o, d, self._u_rows(u, 2),
                           self.v_max, self.max_path, (o, n, CAMERA_ID), ln,
                           self.emitted, tri_bvh=self.tri_bvh)

    def generate_light_path(self, u: jnp.ndarray) -> PathBatch:
        o, d, n = self._light_start(u)
        return _trace_path(self.ss, self.mat_ch, o, d,
                           self._u_rows(u, self.nss + 4), self.v_max,
                           self.max_path, (o, n, LIGHT_ID), n, self.emitted,
                           tri_bvh=self.tri_bvh)

    def generate_paths(self, u: jnp.ndarray, wh=None):
        """Trace the eye AND light subpaths as ONE 2C-lane `_trace_path`
        batch (round 4, VERDICT r3 #3): the two subpaths run identical
        bounce physics, so concatenating them along the chain axis halves
        the number of unrolled intersect graphs in the compiled sample —
        path generation was the largest piece of the MLT program after the
        combine factorization.  Per-lane math is unchanged, so the split
        halves equal `generate_eye_path`/`generate_light_path` exactly."""
        c = u.shape[1]
        oe, de, ne = self._eye_start(u, wh)
        ol, dl, nl = self._light_start(u)
        cat = lambda a, b: jnp.concatenate([a, b])
        cat3 = lambda a, b: V3(cat(a.x, b.x), cat(a.y, b.y), cat(a.z, b.z))
        o = cat3(oe, ol)
        d = cat3(de, dl)
        first_id = cat(jnp.full((c,), CAMERA_ID), jnp.full((c,), LIGHT_ID))
        zc = jnp.zeros((c,))
        first_color = V3(cat(zc, jnp.full((c,), self.emitted[0])),
                         cat(zc, jnp.full((c,), self.emitted[1])),
                         cat(zc, jnp.full((c,), self.emitted[2])))
        u_rows = jnp.concatenate(
            [self._u_rows(u, 2), self._u_rows(u, self.nss + 4)], axis=1)
        ln = V3(jnp.full((2 * c,), self.light_normal[0]),
                jnp.full((2 * c,), self.light_normal[1]),
                jnp.full((2 * c,), self.light_normal[2]))
        both = _trace_path(self.ss, self.mat_ch, o, d, u_rows, self.v_max,
                           self.max_path, (o, cat3(ne, nl), first_id), ln,
                           self.emitted, first_color=first_color,
                           tri_bvh=self.tri_bvh)
        eye = PathBatch(*(f[..., :c] for f in both))
        light = PathBatch(*(f[..., c:] for f in both))
        return eye, light

    # -- per-combo evaluation ------------------------------------------------


    @staticmethod
    def _edge_tables(p: PathBatch):
        """Per-edge physics for ONE subpath, computed ONCE per sample
        (factorization round 4, VERDICT r3 #3/#4): every quantity the
        combined-path evaluation needs at an edge that lies fully inside
        the eye or light segment depends only on that subpath's own
        vertices, so it is hoisted out of the unrolled path-length loop.
        All arrays (V-1, C); edge i connects vertex i -> i+1.

        `fwd`  = Lambert pdf at the TAIL vert x the D2A factor toward the
                 HEAD vert — the pdf of sampling head FROM tail (the
                 reference's per-edge `PathProbablityDensity` factor,
                 `Metropolis.hpp:349-441`).
        `bwd`  = the reverse traversal's factor (pdf at head, D2A to tail).
        On the COMBINED path a light-segment edge appears reversed, so its
        forward factor is the light table's `bwd` and vice versa."""
        dvx = p.px[1:] - p.px[:-1]
        dvy = p.py[1:] - p.py[:-1]
        dvz = p.pz[1:] - p.pz[:-1]
        d2 = dvx * dvx + dvy * dvy + dvz * dvz
        d2s = jnp.where(d2 < 1e-20, 1e-20, d2)
        inv_len = jax.lax.rsqrt(d2s)
        dup = d2 == 0.0
        cos_tail = p.nx[:-1] * dvx + p.ny[:-1] * dvy + p.nz[:-1] * dvz
        cos_head = p.nx[1:] * dvx + p.ny[1:] * dvy + p.nz[1:] * dvz
        pdf_tail = jnp.abs(cos_tail) * inv_len / PI
        pdf_head = jnp.abs(cos_head) * inv_len / PI
        d2a_head = jnp.abs(cos_head) * inv_len / d2s
        d2a_tail = jnp.abs(cos_tail) * inv_len / d2s
        return dict(dvx=dvx, dvy=dvy, dvz=dvz, d2s=d2s, inv_len=inv_len,
                    dup=dup, cos_tail=cos_tail, cos_head=cos_head,
                    fwd=pdf_tail * d2a_head, bwd=pdf_head * d2a_tail,
                    d2a_head=d2a_head)

    def _conn_triangle(self):
        """Static index maps for the packed (s-1, t-1) connection triangle:
        pairs with (s-1) + (t-1) = L-1 <= v-2 are the only ones any L ever
        gathers.  Returns (A_IDX, B_IDX, FLAT) numpy arrays: row r of the
        packed grid pairs eye vert A_IDX[r] with light vert B_IDX[r], and
        FLAT[a, b] is r (-1 for unused pairs)."""
        v = self.v_max
        if getattr(self, "_tri_cache", None) is None:
            pairs = [(a, b) for a in range(v) for b in range(v - 1 - a)]
            A = np.array([p[0] for p in pairs], np.int32)
            B = np.array([p[1] for p in pairs], np.int32)
            flat = np.full((v, v), -1, np.int32)
            flat[A, B] = np.arange(len(pairs), dtype=np.int32)
            self._tri_cache = (A, B, flat)
        return self._tri_cache

    def combine_paths(self, eye: PathBatch, light: PathBatch, wh=None):
        """All BPT connections (`CombinePaths`, `Metropolis.hpp:544-608`).
        Returns (px, py, c_rgb, valid) splat rows and the scalar
        contribution sc (C,).  Row i < n_L is the s=1 connection of path
        length MIN+i; the LAST row carries the pre-summed s >= 2
        connections (they all land on the chain's eye pixel, so summing
        before the film scatter is exact and cuts scatter traffic 12x).

        TPU-native schedule: the reference evaluates the ~227 (L, s)
        combos serially per thread; a straight `lax.scan` port of that left
        the chip idle (~230 sequential steps of C-lane work per sample,
        measured 68 ms/sample at C=4096).  Round 2: the path-length loop L
        is UNROLLED in Python (static, ~18 values) and all s = 1..L+1
        combos of each L are vectorized as a G axis next to the chain
        axis, so every index is a compile-time constant (a traced-index
        variant measured ~10x SLOWER: TPU dynamic gathers along the major
        axis serialize).

        Round 4 FACTORIZATION (VERDICT r3 #3/#4): a combined path's edges
        are eye-path edges below the connection, light-path edges (reversed)
        above it, and ONE connection edge — so all per-edge physics is
        computed ONCE per sample (`_edge_tables` per subpath + a
        triangle-packed (s, t) connection grid).  Every alternative-split
        pdf product then factorizes as (pure-segment prefix) x (connection
        row) x (boundary row) x (a contiguous run of reversed-segment
        terms), so the balance-heuristic sum p_all collapses to per-sample
        prefix tables plus two first-order recurrences (QE/QL below) — the
        per-L body is ~20 (G, C) table lookups, with NO (V, G, C) arrays
        and NO cumprods.  The throughput product collapses the same way
        (eye-middle x connection x light-middle prefix tables).  Per-edge
        values are bit-identical to the round-2/3 form (same formulas on
        the same inputs); only multiplication ORDER/grouping changes
        (~1e-6 relative; equivalence-tested against the materialized
        reference implementation in tests/test_mlt_combine.py).  Combined
        with the fused eye+light path generation this cut the unrolled
        program ~6x (compile time, VERDICT #3) and the steady-state
        combine cost ~4x (VERDICT #4)."""
        v = self.v_max
        c = eye.px.shape[1]
        cam = self.cam
        # w/h may be TRACED scalars: one compile then serves every
        # resolution at a given (depth, chains) — they only enter pixel
        # projection and normalization, never a shape (VERDICT r2 #3)
        w_, h_ = wh if wh is not None else (float(self.width),
                                            float(self.height))
        dist = h_ / (2.0 * cam.half_height)

        n_eye = eye.count
        n_light = light.count
        d_cam = normalize3(V3(eye.px[1] - eye.px[0], eye.py[1] - eye.py[0],
                              eye.pz[1] - eye.pz[0]), eps=1e-20)
        # every s >= 2 connection of a sample projects through d_cam, i.e.
        # to the SAME pixel — their contributions are pre-summed into one
        # splat row (12x less film-scatter traffic; identical totals)
        ddw_c = (d_cam.x * -cam.w[0] + d_cam.y * -cam.w[1]
                 + d_cam.z * -cam.w[2])
        k_c = dist / jnp.where(jnp.abs(ddw_c) < 1e-12, 1e-12, ddw_c)
        spx_c = d_cam.x * k_c + cam.w[0] * dist
        spy_c = d_cam.y * k_c + cam.w[1] * dist
        spz_c = d_cam.z * k_c + cam.w[2] * dist
        px_cam = (cam.u[0] * spx_c + cam.u[1] * spy_c + cam.u[2] * spz_c
                  + w_ * 0.5)
        py_cam = (-cam.v[0] * spx_c - cam.v[1] * spy_c - cam.v[2] * spz_c
                  + h_ * 0.5)

        # ================= per-sample tables (hoisted, round 4) ============
        E = self._edge_tables(eye)
        Lt = self._edge_tables(light)
        inv_wh = 1.0 / (w_ * h_)

        # camera term on the eye path's own first edge (combined edge 0
        # whenever s >= 2); the reference's `Metropolis.hpp:249-258` /
        # eye_t0 of `PathProbablityDensity` — numerically the SAME
        # expression serves the throughput's f0 and the pdf prefix's
        # first factor (f0 = w_cam * d2a_fwd[0] = eye_t0).
        cos0 = -(E["dvx"][0] * cam.w[0] + E["dvy"][0] * cam.w[1]
                 + E["dvz"][0] * cam.w[2]) * E["inv_len"][0]
        ds2 = (dist / jnp.where(jnp.abs(cos0) < 1e-12, 1e-12, cos0)) ** 2
        camE = (inv_wh / (cos0 / ds2)) * E["d2a_head"][0]       # (C,)

        # dup-guarded pair tables (guard = this edge's dup OR its combined
        # NEIGHBOR's — interior edges only; boundary rows near the
        # connection use the per-combo guards built in the L loop)
        zrow = jnp.zeros((1, c), jnp.bool_)
        dupE_next = jnp.concatenate([E["dup"][1:], zrow])
        dupL_prev = jnp.concatenate([zrow, Lt["dup"][:-1]])
        dupL_next = jnp.concatenate([Lt["dup"][1:], zrow])
        # eye-prefix interior terms (both combined edges eye-side)
        gfwdE = jnp.where(E["dup"][1:] | E["dup"][:-1], 1.0, E["fwd"][1:])
        # eye-prefix continuation through the light part: combined-fwd at a
        # light edge = the light path's bwd (edges appear reversed)
        gbwdL = jnp.where(Lt["dup"] | dupL_next, 1.0, Lt["bwd"])
        # light-prefix interior (in-light): combined-bwd = light fwd
        gfwdL = jnp.where(Lt["dup"] | dupL_prev, 1.0, Lt["fwd"])
        # light-prefix continuation through the eye part
        gbwdE = jnp.where(E["dup"] | dupE_next, 1.0, E["bwd"])

        # ---- pdf prefix tables (v3, round 4): every alternative-split pdf
        # product factorizes as (pure-eye prefix) x (connection row) x
        # (boundary row) x (contiguous run of reversed-segment edge terms),
        # so p_all collapses to per-sample prefix tables + two first-order
        # recurrences, and the per-L (V, G, C) term arrays + cumprods of
        # the v2 form disappear entirely (measured: they were ~0.8 ms of
        # the 2.2 ms combine at C=4096; the rectangular connection grid
        # was the rest — now triangle-packed below). ----
        # EYEF[k] = prod_{i=1..k} gfwdE_i
        EYEF = jnp.concatenate([jnp.ones((1, c)),
                                jnp.cumprod(gfwdE, axis=0)])     # (V-1, C)
        # PEterm[s'] = eye_prefix at split s' while inside the eye segment:
        # 1 for s' <= 1, camE * EYEF[s'-2] for s' >= 2
        PEterm = jnp.concatenate([jnp.ones((2, c)),
                                  camE[None] * EYEF[:v - 1]])    # (V+1, C)
        # LF[t'] = light_prefix at t' while inside the light segment:
        # LF[0]=1, LF[1]=1/area, LF[t'>=2] = (1/area) * lt1 * interior
        # terms (lt1 = fwdL_0 UNguarded, like the reference's)
        LF = jnp.concatenate([
            jnp.ones((1, c)), jnp.full((1, c), 1.0 / self.light_area),
            (1.0 / self.light_area) * Lt["fwd"][0][None]
            * jnp.concatenate([jnp.ones((1, c)),
                               jnp.cumprod(gfwdL[1:v - 2], axis=0)])])
        # first-order recurrences for the run sums (collision-free with
        # exact zero semantics — no ratios, logs, or sentinels):
        #   QE[m] = sum_{s'=1}^{m} PEterm[s'] * prod_{e=s'}^{m} gbwdE_e
        #   QL[m] = sum_{t'=0}^{m} LF[t']     * prod_{j=t'}^{m} gbwdL_j
        qe = [jnp.zeros((c,))]
        ql = [gbwdL[0] * LF[0]]
        for m in range(1, v - 1):
            qe.append(gbwdE[m] * (qe[-1] + PEterm[m]))
            ql.append(gbwdL[m] * (ql[-1] + LF[m]))
        QE = jnp.stack(qe)                                       # (V-1, C)
        QL = jnp.stack(ql)

        # throughput middle-term prefix tables (`PathThroughput`,
        # `Metropolis.hpp:239-293`): vertex i's term = color_i/pi * G with
        # the reference's quirky G = cos^2 at the SAME vertex / d2^2.
        # Eye-side vertex i rides eye edge i (tail cos); light-side vertex
        # j+1 rides light edge j REVERSED (head cos).
        geoE = (E["cos_tail"] * E["cos_tail"]) / (E["d2s"] * E["d2s"])
        okE = jnp.isfinite(geoE) & (geoE > 1e-30)
        geoL = (Lt["cos_head"] * Lt["cos_head"]) / (Lt["d2s"] * Lt["d2s"])
        okL = jnp.isfinite(geoL) & (geoL > 1e-30)
        ones2 = jnp.ones((2, c))
        # MEtab[s-1] = prod_{i=1..s-2} m_i ; MLtab[t] = prod_{j=0..t-2}
        me = lambda col: jnp.concatenate([ones2, jnp.cumprod(
            jnp.where(okE, col[:-1] * (1.0 / PI) * geoE, 1.0)[1:], axis=0)])
        ml = lambda col: jnp.concatenate([ones2, jnp.cumprod(
            jnp.where(okL, col[1:] * (1.0 / PI) * geoL, 1.0),
            axis=0)[:v - 2]])
        MEtab = (me(eye.cr), me(eye.cg), me(eye.cb))
        MLtab = (ml(light.cr), ml(light.cg), ml(light.cb))

        # ---- (s, t) connection grid, TRIANGLE-PACKED: everything that
        # depends on BOTH subpaths, for eye vert a = s-1 x light vert
        # b = t-1 pairs.  Only pairs with a + b = L - 1 <= v-2 are ever
        # gathered, so the grid computes the packed triangle (v(v-1)/2 =
        # 210 rows at v=21) instead of the v^2 rectangle — the grid (and
        # its unrolled shadow batch) was the largest piece of the combine
        # at C=4096 (~1.4 of 2.2 ms). ----
        A_IDX, B_IDX, FLAT = self._conn_triangle()
        epx, epy, epz = eye.px[A_IDX], eye.py[A_IDX], eye.pz[A_IDX]
        cx = light.px[B_IDX] - epx                               # (F, C)
        cy = light.py[B_IDX] - epy
        cz = light.pz[B_IDX] - epz
        d2c = cx * cx + cy * cy + cz * cz
        d2cs = jnp.where(d2c < 1e-20, 1e-20, d2c)
        invc = jax.lax.rsqrt(d2cs)
        dupcF = d2c == 0.0
        cosO = (eye.nx[A_IDX] * cx + eye.ny[A_IDX] * cy
                + eye.nz[A_IDX] * cz)                   # n at the eye end
        cosT = (light.nx[B_IDX] * cx + light.ny[B_IDX] * cy
                + light.nz[B_IDX] * cz)                 # n at the light end
        connFwdF = ((jnp.abs(cosO) * invc / PI)
                    * (jnp.abs(cosT) * invc / d2cs))
        connBwdF = ((jnp.abs(cosT) * invc / PI)
                    * (jnp.abs(cosO) * invc / d2cs))
        geoC = (cosO * cosO) / (d2cs * d2cs)
        okC = jnp.isfinite(geoC) & (geoC > 1e-30)
        mCF = tuple(jnp.where(okC, col[A_IDX] * (1.0 / PI) * geoC, 1.0)
                    for col in (eye.cr, eye.cg, eye.cb))
        # visibility (`isConnectable`): one shadow batch over the whole
        # triangle replaces the per-L (G, C) batches.  REFQUIRK: id
        # equality — a t=1 connection targets the light sample vert
        # (id -3) and always fails.
        conn_d = normalize3(V3(cx, cy, cz), eps=1e-20)
        if self.tri_bvh is None:
            shadow = intersect_scene_unrolled(self.ss, V3(epx, epy, epz),
                                              conn_d, t_min=T_MIN)
            sh_valid, sh_pid = shadow.valid, shadow.prim_id
        else:
            # mesh scenes: the (F, C) connection grid flattens through the
            # blocked sweep (same engine + id space as the path tracer)
            from ..ops.pt_core import closest_hit
            fl = lambda a: a.reshape(-1)
            sh = closest_hit(self.ss, V3(fl(epx), fl(epy), fl(epz)),
                             V3(fl(conn_d.x), fl(conn_d.y), fl(conn_d.z)),
                             T_MIN, self.mat_ch, tri_bvh=self.tri_bvh,
                             unique_pids=True)
            sh_valid = sh.valid.reshape(epx.shape)
            sh_pid = sh.prim_id.reshape(epx.shape)
        visF = sh_valid & (sh_pid == light.pid[B_IDX])
        # s=1 extras: camera term + pixel projection through the
        # connection direction (the a=0 block is the triangle's first
        # v-1 rows: eye vert 0 = camera)
        c0 = slice(0, v - 1)
        cos0c = -(cx[c0] * cam.w[0] + cy[c0] * cam.w[1]
                  + cz[c0] * cam.w[2]) * invc[c0]
        ds2c = (dist / jnp.where(jnp.abs(cos0c) < 1e-12, 1e-12,
                                 cos0c)) ** 2
        camConn = ((inv_wh / (cos0c / ds2c))
                   * (jnp.abs(cosT[c0]) * invc[c0] / d2cs[c0]))  # (T, C)
        ddw1 = (conn_d.x[c0] * -cam.w[0] + conn_d.y[c0] * -cam.w[1]
                + conn_d.z[c0] * -cam.w[2])
        k1 = dist / jnp.where(jnp.abs(ddw1) < 1e-12, 1e-12, ddw1)
        spx1 = conn_d.x[c0] * k1 + cam.w[0] * dist
        spy1 = conn_d.y[c0] * k1 + cam.w[1] * dist
        spz1 = conn_d.z[c0] * k1 + cam.w[2] * dist
        pxconn = (cam.u[0] * spx1 + cam.u[1] * spy1 + cam.u[2] * spz1
                  + w_ * 0.5)                                    # (T, C)
        pyconn = (-cam.v[0] * spx1 - cam.v[1] * spy1 - cam.v[2] * spz1
                  + h_ * 0.5)
        in_cam = ((px_cam >= 0) & (px_cam < w_)
                  & (py_cam >= 0) & (py_cam < h_))               # (C,)

        # ================= per-L assembly (static arrangement only) ========
        outs = []
        red_r = jnp.zeros((c,))
        red_g = jnp.zeros((c,))
        red_b = jnp.zeros((c,))
        red_any = jnp.zeros((c,), jnp.bool_)
        sc = jnp.zeros((c,))
        for L in range(MIN_PATH_LENGTH, self.max_path + 1):
            s_arr = np.arange(1, L + 2)                         # (G,)
            t_arr = (L + 1) - s_arr
            fi = FLAT[s_arr - 1, t_arr - 1]                      # (G,) flat

            ok0 = ((s_arr[:, None] <= n_eye[None, :])
                   & (t_arr[:, None] <= n_light[None, :]))

            # boundary rows near the connection (they see its dup flag)
            dupc_g = dupcF[fi]                                   # (G, C)
            dupE_s2 = E["dup"][np.clip(s_arr - 2, 0, v - 2)]
            dupL_t2 = Lt["dup"][np.clip(t_arr - 2, 0, v - 2)]
            bwdE_s2 = E["bwd"][np.clip(s_arr - 2, 0, v - 2)]
            bwdL_t2 = Lt["bwd"][np.clip(t_arr - 2, 0, v - 2)]
            s_ge = lambda k: (s_arr >= k)[:, None]
            t_ge = lambda k: (t_arr >= k)[:, None]

            # ---- p(s') sums via the factorized prefixes.  An alternative
            # split s' != s crosses the connection on exactly one side:
            #   s' < s: p = PEterm[s'] x LF[t] x C1 x [C2 x run(s'..s-3)]
            #   s' > s: p = LF[t']    x EPc  x D1 x [D2 x run(t'..t-3)]
            # where C1/C2 (D1/D2) are the connection and boundary rows of
            # the light-side (eye-side) prefix, and the runs collapse into
            # the per-sample Q recurrences. ----
            # light-side rows t and t+1 (C1 row semantics shift with t:
            # t>=2 guarded conn, t==1 the UNguarded lt1 conn
            # (`Metropolis.hpp:395-399`), t==0 the 1/area row itself)
            C1 = jnp.where(
                t_ge(2), jnp.where(dupc_g | dupL_t2, 1.0, connBwdF[fi]),
                jnp.where(t_ge(1), connBwdF[fi], 1.0 / self.light_area))
            C2 = jnp.where(t_ge(1),
                           jnp.where(dupE_s2 | dupc_g, 1.0, bwdE_s2),
                           bwdE_s2)  # t=0: the raw lt1 = bwdE_{L-1} row
            # eye-side rows s-1 and s (D1 for s=1 IS the camera term,
            # already inside EPc; D2 needs t >= 2 to exist)
            D1 = jnp.where(s_ge(2),
                           jnp.where(dupc_g | dupE_s2, 1.0, connFwdF[fi]),
                           1.0)
            D2 = jnp.where(dupL_t2 | dupc_g, 1.0, bwdL_t2)

            pe_s = PEterm[np.clip(s_arr, 0, v)]                  # (G, C)
            pe_s1 = PEterm[np.clip(s_arr - 1, 0, v)]
            pe_s2 = PEterm[np.clip(s_arr - 2, 0, v)]
            qe_s3 = QE[np.clip(s_arr - 3, 0, v - 2)]
            lf_t = LF[np.clip(t_arr, 0, v - 1)]
            lf_t1 = LF[np.clip(t_arr - 1, 0, v - 1)]
            lf_t2 = LF[np.clip(t_arr - 2, 0, v - 1)]
            ql_t3 = QL[np.clip(t_arr - 3, 0, v - 2)]
            EPc = jnp.where(s_ge(2), pe_s, camConn[L - 1])

            p_st = pe_s * lf_t
            sum_lt = jnp.where(s_ge(2), lf_t * C1 * (
                pe_s1 + jnp.where(s_ge(3), C2 * (
                    pe_s2 + jnp.where(s_ge(4), qe_s3, 0.0)), 0.0)), 0.0)
            sum_gt = jnp.where(t_ge(1), EPc * D1 * (
                lf_t1 + jnp.where(t_ge(2), D2 * (
                    lf_t2 + jnp.where(t_ge(3), ql_t3, 0.0)), 0.0)), 0.0)
            p_all = sum_lt + p_st + sum_gt

            w_mis = jnp.where((p_st > 0) & (p_all > 0),
                              jnp.clip(p_st / p_all, 0.0, 1.0), 0.0)

            # ---- throughput: pure prefix-table lookups ----
            cam_g = jnp.where(s_ge(2), camE, camConn[L - 1])
            has_conn = ((s_arr >= 2) & (s_arr <= L))[:, None]
            # last vertex must be the light; for t >= 1 it is the light
            # sample vert by construction, for t = 0 the eye path must
            # have ENDED on the light (`cp.pid[L] == LIGHT_ID`)
            end_ok = jnp.where((t_arr >= 1)[:, None], True,
                               eye.pid[L] == LIGHT_ID)
            me_g = tuple(tab[np.clip(s_arr - 1, 0, v - 1)] for tab in MEtab)
            ml_g = tuple(tab[np.clip(t_arr, 0, v - 1)] for tab in MLtab)
            mc_g = tuple(jnp.where(has_conn, tab[fi], 1.0)
                         for tab in mCF)
            f_r = cam_g * me_g[0] * mc_g[0] * ml_g[0] * jnp.where(
                end_ok, self.emitted[0] / PI, 0.0)
            f_g = cam_g * me_g[1] * mc_g[1] * ml_g[1] * jnp.where(
                end_ok, self.emitted[1] / PI, 0.0)
            f_b = cam_g * me_g[2] * mc_g[2] * ml_g[2] * jnp.where(
                end_ok, self.emitted[2] / PI, 0.0)

            # ---- visibility + pixel location ----
            eyepid_g = eye.pid[np.clip(s_arr - 1, 0, v - 1)]
            vis = jnp.where((t_arr == 0)[:, None], eyepid_g == LIGHT_ID,
                            visF[fi])
            px = jnp.where((s_arr == 1)[:, None], pxconn[L - 1], px_cam)
            py = jnp.where((s_arr == 1)[:, None], pyconn[L - 1], py_cam)
            vis = vis & jnp.where((s_arr == 1)[:, None],
                                  (px >= 0) & (px < w_)
                                  & (py >= 0) & (py < h_), in_cam)

            inv_p = jnp.where(p_st > 0, 1.0 / p_st, 0.0)
            cr = f_r * w_mis * inv_p
            cgc = f_g * w_mis * inv_p
            cb = f_b * w_mis * inv_p
            cmax = jnp.maximum(cr, jnp.maximum(cgc, cb))
            valid = (ok0 & vis & (w_mis > 0) & (p_st > 0) & (cmax > 0)
                     & jnp.isfinite(cmax))
            cr = jnp.where(valid, cr, 0.0)
            cgc = jnp.where(valid, cgc, 0.0)
            cb = jnp.where(valid, cb, 0.0)
            sc = jnp.maximum(sc, jnp.max(jnp.where(valid, cmax, 0.0),
                                         axis=0))
            # row 0 is the s=1 connection (its own pixel); rows 1..L are
            # the s>=2 connections, all landing on the chain's eye pixel
            outs.append((px[0], py[0], cr[0], cgc[0], cb[0], valid[0]))
            red_r = red_r + jnp.sum(cr[1:], axis=0)
            red_g = red_g + jnp.sum(cgc[1:], axis=0)
            red_b = red_b + jnp.sum(cb[1:], axis=0)
            red_any = red_any | jnp.any(valid[1:], axis=0)

        outs.append((px_cam, py_cam, red_r, red_g, red_b, red_any))
        contribs = tuple(jnp.stack([o[i] for o in outs])
                         for i in range(6))
        return contribs, sc

    # -- full sample: PSS vector -> contributions ---------------------------

    def sample(self, u: jnp.ndarray, wh=None):
        eye, light = self.generate_paths(u, wh)
        return self.combine_paths(eye, light, wh)

    # -- PSS mutation (`Metropolis.hpp:103-147`) -----------------------------

    def perturb(self, value, r, s1, s2):
        lo = r < 0.5
        r1 = jnp.where(lo, r * 2.0, (r - 0.5) * 2.0)
        delta = s2 * jnp.exp(-jnp.log(s2 / s1) * r1)  # jnp: s1 may be traced
        up = value + delta
        up = jnp.where(up > 1.0, up - 1.0, up)
        down = value - delta
        down = jnp.where(down < 0.0, down + 1.0, down)
        return jnp.where(lo, up, down)

    def mutate(self, u, key, wh=None):
        r = jax.random.uniform(key, u.shape)
        w_, h_ = wh if wh is not None else (float(self.width),
                                            float(self.height))
        s1_pix = 2.0 / (w_ + h_)
        pix = self.perturb(u[:2], r[:2], s1_pix, 0.1)
        rest = self.perturb(u[2:], r[2:], 1.0 / 1024.0, 1.0 / 64.0)
        return jnp.concatenate([pix, rest])


def _scaled_arrays(arrays: SceneArrays, f: float) -> SceneArrays:
    """Uniformly scale scene geometry by f (unit-normalizing for f32 pdf
    products; per-path contributions are scale-invariant, see module doc).

    PURE NUMPY throughout (round 4): each eager jnp op here paid a remote
    tiny-kernel compile through the axon relay — 12 of them cost ~65 s of
    every cold MLT start (the same per-op-compile disease the r3 scene-prep
    fix removed from build_scene_arrays).  `make_static_scene` only reads
    the fields via np.asarray, so host arrays are the natural form."""
    a = arrays
    n = lambda x: np.asarray(x)
    inv_scaled = n(a.pln_inv).copy()
    inv_scaled[:, 0:2, :] /= f
    inv_scaled[:, 2, :] /= f * f
    al_inv_scaled = n(a.al_inv).copy()
    al_inv_scaled[:, 0:2, :] /= f
    al_inv_scaled[:, 2, :] /= f * f
    return a._replace(
        sph_pos=n(a.sph_pos) * f, sph_radius=n(a.sph_radius) * f,
        tri_v1=n(a.tri_v1) * f, tri_e1=n(a.tri_e1) * f,
        tri_e2=n(a.tri_e2) * f,
        pln_pos=n(a.pln_pos) * f, pln_inv=inv_scaled,
        al_pos=n(a.al_pos) * f, al_u=n(a.al_u) * f, al_v=n(a.al_v) * f,
        al_normal=n(a.al_normal) * (f * f), al_inv=al_inv_scaled,
    )


def _scaled_static(arrays: SceneArrays, f: float) -> StaticScene:
    return make_static_scene(_scaled_arrays(arrays, f))


def _scene_extent(a: SceneArrays) -> float:
    """Max |coordinate| over ALL scene geometry (mirrors
    `pt_core.scene_epsilon`'s coverage): sphere bounds, triangle vertices
    (incl. mesh-expanded), plane corners, and area-light corners.  Using only
    plane/sphere positions under-normalized triangle-heavy scenes, leaving
    ~20-edge f32 pdf products free to overflow (ADVICE r1)."""
    pts = [np.zeros((1, 3))]
    sv = np.asarray(a.sph_valid)
    sph = np.asarray(a.sph_pos)[sv]
    if sph.size:
        rad = np.asarray(a.sph_radius)[sv][:, None]
        pts += [sph + rad, sph - rad]
    tv = np.asarray(a.tri_valid)
    v1 = np.asarray(a.tri_v1)[tv]
    if v1.size:
        e1 = np.asarray(a.tri_e1)[tv]
        e2 = np.asarray(a.tri_e2)[tv]
        pts += [v1, v1 + e1, v1 + e2]
    pv = np.asarray(a.pln_valid)
    pp = np.asarray(a.pln_pos)[pv]
    if pp.size:
        pts.append(pp)
        try:  # columns of pln_inv^-1 are [u, v, u x v]: far corner = pos+u+v
            m = np.linalg.inv(np.asarray(a.pln_inv)[pv])
            pts.append(pp + m[:, :, 0] + m[:, :, 1])
        except np.linalg.LinAlgError:
            pass
    av = np.asarray(a.al_valid)
    ap = np.asarray(a.al_pos)[av]
    if ap.size:
        pts += [ap, ap + np.asarray(a.al_u)[av] + np.asarray(a.al_v)[av]]
    return max(1.0, float(np.abs(np.concatenate(pts, axis=0)).max()))


def _prepare_mlt(scene: Scene, max_path: int = None):
    """Scene prep shared by the single-chip and chain-sharded MLT drivers:
    unit-scale normalization, light extraction, kernel construction.
    Returns (kern, width, height) or None when the scene has no area light
    (the reference renders black then too, `Metropolis.hpp:63`)."""
    ro = scene.render_option
    width, height = ro.width, ro.height
    max_path = max_path if max_path is not None else min(ro.depth, 20)

    arrays = build_scene_arrays(scene)
    if not scene.area_light_buffer:
        return None
    f = 1.0 / _scene_extent(arrays)
    scaled = _scaled_arrays(arrays, f)
    ss = make_static_scene(scaled)

    # mesh capability (round 5, VERDICT r4 missing #3): the reference MLT
    # brute-forces ANY scene, mesh-expanded triangles included
    # (`Metropolis.cpp:135-166`); an unrolled 5k-triangle intersect is
    # uncompilable, so big triangle pools route through the same blocked
    # Pallas sweep the AccPT renderer uses (threshold mirrors
    # acc_pt.BVH_THRESHOLD).  Built from the SCALED arrays — the whole
    # MLT pipeline runs at unit scale.
    tri_bvh = None
    n_tri = int(np.sum(np.asarray(arrays.tri_valid)))
    if n_tri > MLT_BVH_THRESHOLD:
        from ..ops.bvh import build_mesh_accel
        mat_ch = [tuple(m["diffuse"]) for m in ss.mats]
        tri_bvh = build_mesh_accel(scaled, mat_ch)

    al = scene.area_light_buffer[0]
    light_pos = tuple(np.asarray(al.position, np.float64) * f)
    light_u = tuple(np.asarray(al.u, np.float64) * f)
    light_v = tuple(np.asarray(al.v, np.float64) * f)
    light_area = float(np.linalg.norm(np.cross(light_u, light_v)))
    # REFQUIRK: emitted = 2x the scene radiance (`Metropolis.hpp:34`)
    emitted = tuple(2.0 * np.asarray(al.radiance, np.float64))

    camera = _mlt_camera(scene.camera, width, height)
    camera = camera._replace(pos=tuple(np.asarray(camera.pos) * f))

    kern = MLTKernel(ss, camera, width, height, max_path, emitted,
                     light_pos, light_u, light_v, light_area,
                     tri_bvh=tri_bvh)
    return kern, width, height


def film_bucket(n_pix: int) -> int:
    """Static film capacity for a pixel count: next power of two (>= 1024).
    The film buffer is the ONLY resolution-shaped array in the chain
    pipeline; bucketing it makes the expensive block compile serve every
    resolution in the bucket (500^2 and 512^2 share 2^18) — VERDICT r2 #3."""
    return max(1024, 1 << (int(n_pix) - 1).bit_length())


def render_mlt(scene: Scene, chains: int = 1024, mutations: int = 256,
               n_init: int = 10000, seed: int = 0,
               max_path: int = None, checkpoint_path: str = None
               ) -> np.ndarray:
    """Full MLT render; returns (H, W, 4) float RGBA, row 0 = TOP (the MLT
    reference never flips its film).

    `checkpoint_path`: snapshot the full chain carry (film + PSS states +
    Kelemen weights) + the brightness estimate after every mutation block,
    so an interrupted render resumes EXACTLY (block i re-keys with
    fold_in(k_loop, i) either way) — SURVEY §5.4 for the flagship renderer."""
    prep = _prepare_mlt(scene, max_path)
    if prep is None:
        ro = scene.render_option
        return np.zeros((ro.height, ro.width, 4), np.float32)
    kern, width, height = prep
    ss, camera, max_path = kern.ss, kern.cam, kern.max_path
    emitted, light_pos, light_u, light_v = (kern.emitted, kern.light_pos,
                                            kern.light_u, kern.light_v)
    ns = kern.n_states
    n_pix = width * height
    cap = film_bucket(n_pix)
    key = make_base_key(seed)

    # the mutation budget is split into fixed-size compiled blocks so any
    # budget reuses one compile (the block fn is resumable: carry in/out);
    # width/height are TRACED arguments of every compiled fn below, so the
    # cache key carries only the film bucket — one compile per
    # (scene, depth, chains, block, bucket), shared across resolutions
    block = min(mutations, int(__import__("os").environ.get(
        "NR_MLT_BLOCK", "128")))
    cache_key = hashlib.sha1(repr(
        (ss, camera, max_path, emitted, light_pos, light_u,
         light_v, chains, n_init, block, cap)).encode()).hexdigest()
    # resume-compat fingerprint: the compile key (scene content, depth,
    # chains, block, bucket) + everything else that shapes the estimator
    ck_fp = hashlib.sha1(repr(
        (cache_key, width, height, chains, mutations, block, seed)
    ).encode()).hexdigest()
    cached = _MLT_FN_CACHE.get(cache_key)
    if cached is not None:
        return _finish_mlt(*cached, key, width, height, chains, mutations,
                           block, checkpoint_path, ck_fp)

    # ONE compiled sample serves both the brightness phase and the chain
    # init (round 4, VERDICT r3 #3): each used to embed its own copy of the
    # full sample graph (paths + combine), tripling cold compile time with
    # run_block.  The b phase host-loops the shared executable instead —
    # steps is 1-3 at production chain counts, so dispatch cost is nil.
    @jax.jit
    def sample_fresh(key, wh):
        u = jax.random.uniform(key, (ns, chains))
        contribs, sc = kern.sample(u, wh)
        return u, contribs, sc

    def estimate_b(key, wh):
        steps = max(1, n_init // chains)
        total = 0.0
        for i in range(steps):
            _, _, sc = sample_fresh(jax.random.fold_in(key, i), wh)
            total += float(jnp.sum(sc))
        return total / (steps * chains)

    def splat(film, contribs, weight, wh):
        w_, h_ = wh
        wi = w_.astype(jnp.int32)
        hi = h_.astype(jnp.int32)
        px, py, cr, cg, cb, valid = contribs
        ix = px.astype(jnp.int32)
        iy = py.astype(jnp.int32)
        ok = (valid & (ix >= 0) & (ix < wi) & (iy >= 0)
              & (iy < hi))
        flat = jnp.where(ok, iy * wi + ix, cap)  # cap = out of bounds
        w = weight[None, :]
        vals = jnp.stack([cr * w, cg * w, cb * w], axis=-1)
        return film.at[flat.reshape(-1)].add(
            vals.reshape(-1, 3), mode="drop")

    def init_chains(key, wh):
        u_cur, contribs, sc_cur = sample_fresh(key, wh)
        film = jnp.zeros((cap, 3))
        w_acc = jnp.zeros((chains,))
        return (film, u_cur, contribs, sc_cur, w_acc)

    @jax.jit
    def run_block(key, b, carry, wh):
        """One compiled block of `block` mutations; resumable carry."""

        def step(carry, i):
            film, u_cur, cur_contribs, sc_cur, w_acc = carry
            k = jax.random.fold_in(key, i)
            k1, k2, k3 = jax.random.split(k, 3)
            is_large = jax.random.uniform(k1, (chains,)) <= LARGE_STEP_PROB
            u_fresh = jax.random.uniform(k2, (ns, chains))
            u_mut = kern.mutate(u_cur, k3, wh)
            u_prop = jnp.where(is_large[None, :], u_fresh, u_mut)
            prop_contribs, sc_prop = kern.sample(u_prop, wh)

            a = jnp.where(sc_cur > 0,
                          jnp.clip(sc_prop / jnp.where(sc_cur > 0, sc_cur,
                                                       1.0), 0.0, 1.0), 1.0)
            ilf = is_large.astype(jnp.float32)
            w_prop = jnp.where(sc_prop > 0,
                               (a + ilf) / (sc_prop / b + LARGE_STEP_PROB),
                               0.0)
            w_cur_step = jnp.where(sc_cur > 0,
                                   (1.0 - a) / (sc_cur / b
                                                + LARGE_STEP_PROB), 0.0)
            w_acc = w_acc + w_cur_step

            k4 = jax.random.fold_in(k, 777)
            accept = jax.random.uniform(k4, (chains,)) <= a

            # deferred splat: replaced current (accept) or rejected proposal
            aw = accept.astype(jnp.float32)
            splat_weight = aw * w_acc + (1.0 - aw) * w_prop
            splat_contribs = tuple(
                jnp.where(accept[None, :], c, p)
                for c, p in zip(cur_contribs, prop_contribs))
            film = splat(film, splat_contribs, splat_weight, wh)

            new_contribs = tuple(
                jnp.where(accept[None, :], p, c)
                for c, p in zip(cur_contribs, prop_contribs))
            u_cur = jnp.where(accept[None, :], u_prop, u_cur)
            sc_cur = jnp.where(accept, sc_prop, sc_cur)
            w_acc = jnp.where(accept, w_prop, w_acc)
            return (film, u_cur, new_contribs, sc_cur, w_acc), None

        carry, _ = jax.lax.scan(step, carry,
                                jnp.arange(block, dtype=jnp.int32))
        return carry

    @jax.jit
    def flush_film(carry, wh):
        film, u_cur, cur_contribs, sc_cur, w_acc = carry
        return splat(film, cur_contribs, w_acc, wh)

    _MLT_FN_CACHE[cache_key] = (estimate_b, init_chains, run_block,
                                flush_film)
    return _finish_mlt(estimate_b, init_chains, run_block, flush_film, key,
                       width, height, chains, mutations, block,
                       checkpoint_path, ck_fp)


_MLT_FN_CACHE: Dict[str, tuple] = {}


def _save_mlt_checkpoint(path: str, carry, b: float, blocks_done: int,
                         fingerprint: str) -> None:
    """Atomic snapshot of the full chain carry (pytree leaves in
    tree-flatten order) + the brightness estimate."""
    import os
    import jax
    leaves = jax.tree_util.tree_leaves(carry)
    tmp = path + ".tmp"
    np.savez(tmp, b=np.float64(b), blocks_done=np.int64(blocks_done),
             fingerprint=np.bytes_(fingerprint.encode()),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def _load_mlt_checkpoint(path: str, fingerprint: str, treedef, n_leaves):
    """Returns (carry, b, blocks_done) if `path` holds a matching snapshot,
    None otherwise (missing / unreadable / different fingerprint)."""
    import os
    import jax
    import jax.numpy as _jnp
    if not path or not os.path.exists(path):
        return None
    try:
        data = np.load(path)
    except (OSError, ValueError):
        return None
    if bytes(data["fingerprint"]).decode(errors="replace") != fingerprint:
        return None
    leaves = [_jnp.asarray(data[f"leaf_{i}"]) for i in range(n_leaves)]
    carry = jax.tree_util.tree_unflatten(treedef, leaves)
    return carry, float(data["b"]), int(data["blocks_done"])


def _finish_mlt(estimate_b, init_chains, run_block, flush_film, key, width,
                height, chains, mutations, block, checkpoint_path=None,
                fingerprint=None) -> np.ndarray:
    import os
    import time as _time
    from ..utils.device_warm import warm_device_async
    from ..utils.timing import GLOBAL_TIMER, PhaseTimer
    import jax as _jax
    warm_device_async()  # claim the TPU concurrently with the compiles
    debug = os.environ.get("NR_MLT_DEBUG") == "1"
    timer = PhaseTimer()
    # resolution enters ONLY as these traced scalars (+ the slice below)
    wh = (jnp.float32(width), jnp.float32(height))
    k_init, k_loop = _jax.random.split(key)

    # overlap the BLOCK compile with the b phase (round 4): the two big
    # compiles (sample ~40-60 s, mutation block ~50 s through the remote
    # relay) used to serialize; AOT-compiling run_block against the
    # carry's eval_shape in a daemon thread lets them proceed concurrently
    # where the compile service allows it.  The AOT executable is used
    # directly (an explicit lower().compile() does not feed the jit
    # dispatch cache).  Best-effort: any failure falls back to the normal
    # jit-at-first-call path.
    import threading

    aot = {}

    def _precompile():
        try:
            shapes = _jax.eval_shape(init_chains, k_init, wh)
            b_aval = _jax.ShapeDtypeStruct((), jnp.float32)
            aot["block"] = run_block.lower(shapes_key(k_loop), b_aval,
                                           shapes, wh_avals(wh)).compile()
        except Exception:
            aot["block"] = None
        try:
            shapes = _jax.eval_shape(init_chains, k_init, wh)
            aot["flush"] = flush_film.lower(shapes,
                                            wh_avals(wh)).compile()
        except Exception:
            aot["flush"] = None

    def shapes_key(k):
        return _jax.ShapeDtypeStruct(k.shape, k.dtype)

    def wh_avals(wh):
        return tuple(_jax.ShapeDtypeStruct(x.shape, x.dtype) for x in wh)

    warm = threading.Thread(target=_precompile, daemon=True)
    warm.start()

    def call_block(k, b, carry, wh):
        warm.join()
        fn = aot.get("block")
        if fn is not None:
            try:
                return fn(k, jnp.float32(b), carry, wh)
            except Exception:  # aval/sharding mismatch -> normal jit path
                aot["block"] = None
        return run_block(k, b, carry, wh)

    loaded = None
    if checkpoint_path:
        # the carry's pytree structure, without running the init
        shapes = _jax.eval_shape(init_chains, k_init, wh)
        treedef = _jax.tree_util.tree_structure(shapes)
        loaded = _load_mlt_checkpoint(checkpoint_path, fingerprint, treedef,
                                      treedef.num_leaves)
    if loaded is not None:
        carry, b, start = loaded
        get_server().logger.log(
            f"MLT: resumed at block {start}/{max(1, mutations // block)} "
            f"(b = {b:.6g}) from {checkpoint_path}")
    else:
        start = 0
        with timer.phase("b-estimate"):
            b = float(estimate_b(key, wh))
        if debug:
            print(f"MLT: b-phase {timer.get('b-estimate').total_s:.1f}s",
                  flush=True)
        if not np.isfinite(b) or b <= 0:
            get_server().logger.warning("MLT: brightness estimate b <= 0")
            return np.zeros((height, width, 4), np.float32)
        get_server().logger.log(f"MLT: b = {b:.6g}")
        with timer.phase("chain-init"):
            carry = init_chains(k_init, wh)

    def do_flush(carry):
        warm.join()
        fn = aot.get("flush")
        if fn is not None:
            try:
                return np.asarray(fn(carry, wh))
            except Exception:
                aot["flush"] = None
        return np.asarray(flush_film(carry, wh))

    def tonemap(film, mut_done):
        # exposure tone map (`Metropolis.cpp:110-124`): s = w*h / samples,
        # so a PARTIAL film normalizes by the mutations done so far and
        # previews at full brightness from the first block
        s = float(width * height) / float(max(1, chains * mut_done))
        rgb = np.power(np.clip(1.0 - np.exp(-film * s), 0.0, 1.0), 1.0 / 2.2)
        return np.concatenate(
            [rgb, np.ones((height, width, 1), np.float32)],
            axis=2).astype(np.float32)

    # progressive preview (`--serve` composition): post the tone-mapped
    # partial film to the Screen after each mutation block — the headless
    # analogue of the reference UI blitting mid-render updates
    # (`ScreenView.cpp:168-178`).  NR_MLT_PREVIEW_BLOCKS=k posts every
    # k-th block; each post flushes the ASYNC block pipeline and fetches
    # the film to host (measured ~1.6x slower headless steady rate), so
    # the default is 0 (off) and the CLI sets 1 when `--serve` attaches
    # a viewer.
    preview_every = int(os.environ.get("NR_MLT_PREVIEW_BLOCKS", "0"))

    n_blocks = max(1, mutations // block)
    for i in range(start, n_blocks):
        with timer.phase("mutate-blocks"):
            carry = call_block(_jax.random.fold_in(k_loop, i), b, carry, wh)
        if checkpoint_path:
            # forces the async block (materializes the carry) — only paid
            # when the user asked for resumability
            _save_mlt_checkpoint(checkpoint_path, carry, b, i + 1,
                                 fingerprint)
        if (preview_every > 0 and i + 1 < n_blocks
                and (i + 1 - start) % preview_every == 0):
            with timer.phase("preview"):
                part = do_flush(carry)[:width * height]
                get_server().screen.set(
                    tonemap(part.reshape(height, width, 3),
                            (i + 1) * block),
                    width, height)
    with timer.phase("film-flush"):
        film = do_flush(carry)
        film = film[:width * height].reshape(height, width, 3)
    total_mut = n_blocks * block
    # run_block dispatches are async; the film flush forces them, so the
    # honest steady mutation rate is (dispatch + flush) wall time
    dt = (timer.get("mutate-blocks").total_s
          + timer.get("film-flush").total_s)
    GLOBAL_TIMER.add("MLT.mutate", dt)
    get_server().logger.log(
        f"phases: {timer.summary()} "
        f"({chains * total_mut / max(dt, 1e-9) / 1e3:.1f} Kmut/s)")
    if debug:
        print(f"MLT: chain-phase {dt:.1f}s "
              f"({chains * total_mut / dt / 1e3:.1f} Kmut/s)", flush=True)
        print(f"MLT: phases {timer.summary()}", flush=True)
    return tonemap(film, total_mut)


@register_renderer("MetropolisLightTransport", description=(
    "Metropolis Light Transport.\n"
    "Kelemen primary-sample-space MLT over bidirectional path tracing with "
    "MIS, as thousands of parallel lax.scan Markov chains."))
class MetropolisRenderer(RenderComponent):
    def __init__(self, seed: int = 0, chains: int = None,
                 mutations: int = None, checkpoint_path: str = None):
        self.seed = seed
        self.chains = chains
        self.mutations = mutations
        self.checkpoint_path = checkpoint_path

    def render(self, scene: Scene) -> RenderResult:
        import os
        ro = scene.render_option
        chains = self.chains or int(os.environ.get("NR_MLT_CHAINS", "1024"))
        mutations = self.mutations or int(
            os.environ.get("NR_MLT_MUTATIONS", "256"))
        pixels = render_mlt(scene, chains=chains, mutations=mutations,
                            seed=self.seed,
                            checkpoint_path=self.checkpoint_path)
        get_server().logger.log("Done...")
        return RenderResult(pixels=pixels, width=ro.width, height=ro.height)
