"""Automated TPU smoke tier (VERDICT r3 #6): one command that exercises
every Pallas/Mosaic kernel family on the REAL chip at small shapes and
asserts correctness bars + minimum rates.  Replaces the reference's manual
eyeball loop (SURVEY §4) for hardware regressions that the CPU
interpret-mode suite cannot see.

    python tools/tpu_smoke.py          # full tier, < 5 min warm
    python tools/tpu_smoke.py pt mesh  # named checks only

Checks (failure names the kernel):
  compact   log-shift pack/unpack vs boolean indexing — exact
  stream    Pallas streaming compactor roundtrip (the default engine) — exact
  mesh      Pallas blocked sweep vs XLA blocked sweep on bunny-5k — rtol 1e-5
  pt        Pallas PT megakernel vs XLA wavefront (Cornell) — statistical
  glass     Pallas BSDF kernel on pt_glass — statistical vs XLA
  env       env-map render, in-kernel exact bounce-0 vs XLA fallback
  mlt       one MLT block on Metropolis.scn — structure + rate

Exit code 0 = all green; each line prints PASS/FAIL, the measured rate,
and the bar it was held to.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nrenderer_tpu  # noqa: E402
nrenderer_tpu.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RES = "/root/reference/resource"
FAILED = []

# Recorded WARM rates for each check's own shape, measured on v5e-1
# (round 5, post windowed-sort defaults; re-record when a check's shape
# or engine default changes).  The regression bar is 0.7x the recorded
# rate (VERDICT r4 #9): a failure names the kernel AND prints measured
# vs recorded, so "what regressed and by how much" is one line.
RECORDED = {  # re-recorded late r5 on the dispatch-robust check forms
    "compact": 1000.0,   # Mlane/s, 1M-lane pack+unpack (K-delta rate)
    "stream": 84.0,      # Mlane/s, 2M-lane streaming pack+unpack
    "mesh": 8.0,         # Mray/s, 256k box-interior rays (union-saturated)
    "pt": 4000.0,        # spp/s, 128^2 x 1024spp x depth8 megakernel
    "glass": 430.0,      # spp/s, 128^2 x 128spp x depth12 BSDF kernel
    "env": 1100.0,       # spp/s, 128^2 x 256spp x depth6 in-kernel env
    "mlt": 1570.0,       # Kmut/s, 1024x512 block, warm
}
BAR_FRAC = 0.7


def rate_bar(name, rate, unit):
    """(ok, detail-fragment) for a measured rate vs the recorded one."""
    rec = RECORDED[name]
    bar = rec * BAR_FRAC
    return rate > bar, (f"{rate:.0f} {unit} (recorded {rec:.0f}, "
                        f"bar {bar:.0f})")


def check(name, ok, detail):
    tag = "PASS" if ok else "FAIL"
    print(f"[{tag}] {name:8s} {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def timed(fn, *a, reps=2, **k):
    out = jax.block_until_ready(fn(*a, **k))  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a, **k))
        best = min(best, time.perf_counter() - t0)
    return out, best


def blur(img, k=4):
    """k x k box filter: kills per-pixel MC noise so corr compares the
    IMAGE, not two independent noise fields (a real kernel break — ring
    artifacts, wrong shading — survives the blur)."""
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    return img[:h, :w].reshape(h // k, k, w // k, k, -1).mean(axis=(1, 3))


def smoke_compact():
    from nrenderer_tpu.ops.compact import (shift_pack_channels,
                                           shift_unpack_channels)
    n, cap = 1 << 20, 1 << 18
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (n,)) < 0.15
    vals = jax.random.normal(jax.random.fold_in(key, 1), (n,))

    @jax.jit
    def roundtrip(mask, vals):
        (packed,), ridx, n_hit = shift_pack_channels(mask, (vals,), cap)
        (back,) = shift_unpack_channels(mask, (packed,),
                                        (jnp.zeros((n,)),), ridx=ridx)
        return packed, back, n_hit

    # rate from the K2-K1 DELTA of two in-scan repeat counts: a single
    # 1M-lane roundtrip is ~1 ms of kernel under ~25 ms of axon relay
    # dispatch, so any single-call rate measures the session tunnel's
    # latency (44 / 268 / 1208 "Mlane/s" for the SAME kernel across
    # sessions); the delta cancels dispatch exactly
    K1, K2 = 4, 20

    def chained(k):
        @jax.jit
        def fn(mask, vals):
            def step(v, _):
                (p,), ridx, _ = shift_pack_channels(mask, (v,), cap)
                (b,) = shift_unpack_channels(
                    mask, (p,), (jnp.zeros((n,)),), ridx=ridx)
                return b + 1e-7, None  # depend on the result: no hoisting
            out, _ = jax.lax.scan(step, vals, xs=None, length=k)
            return out
        return fn

    packed, back, n_hit = roundtrip(mask, vals)
    _, dt1 = timed(chained(K1), mask, vals)
    _, dt2 = timed(chained(K2), mask, vals)
    m = np.asarray(mask)
    want = np.asarray(vals)[m][:cap]
    got = np.asarray(packed)[:int(n_hit)]
    ok = (got.shape == want.shape and np.array_equal(got, want)
          and np.array_equal(np.asarray(back)[m][:cap], want)
          and not np.asarray(back)[~m].any())
    rok, rdet = rate_bar(
        "compact", n * (K2 - K1) / max(dt2 - dt1, 1e-9) / 1e6, "Mlane/s")
    check("compact", ok and rok, f"1M-lane pack+unpack exact, {rdet}")


def smoke_stream():
    from nrenderer_tpu.ops.stream_compact import (
        stream_pack_channels, stream_rows_needed, stream_unpack_channels)
    n = 1 << 21
    cap = n // 4
    t = np.linspace(0, 60, n).astype(np.float32)
    wave = np.sin(t) * 0.5 + 0.5
    m = wave < np.quantile(wave, 0.16)
    tcap = jnp.asarray(np.where(m, 1.5, 0.0).astype(np.float32))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)

    @jax.jit
    def roundtrip(tc, v):
        sp = stream_pack_channels((v, tc), cap, mask_from=1)
        (out,) = stream_unpack_channels(tc, (sp.packed[0] * 2.0 + 1.0,),
                                        [-5.0], sp)
        return out, sp.n_rows

    (out, n_rows), dt = timed(roundtrip, tcap, xj)
    want = np.where(m, x * 2.0 + 1.0, np.float32(-5.0))
    rows_ok = int(n_rows) == int(stream_rows_needed(jnp.asarray(m)))
    ok = np.array_equal(np.asarray(out), want) and rows_ok
    rok, rdet = rate_bar("stream", n / dt / 1e6, "Mlane/s")
    check("stream", ok and rok,
          f"2M-lane streaming pack+unpack exact, {rdet}")


def _bunny_accel():
    from nrenderer_tpu import load_scn, load_obj, build_scene_arrays
    from nrenderer_tpu.ops.intersect import make_static_scene, T_MIN_PT
    from nrenderer_tpu.ops.bvh import build_mesh_accel
    from nrenderer_tpu.ops.pt_core import make_mat_channels, scene_epsilon
    scene = load_scn(f"{RES}/path_tracing_cornel.scn")
    load_obj(f"{RES}/obj/bunny_5k_faces.obj", scene, material=0)
    m = scene.models[-1]
    m.scale = (600.0,) * 3
    m.translation = (40.0, -305.0, 920.0)
    arr = build_scene_arrays(scene)
    ss = make_static_scene(arr)
    mat_ch = make_mat_channels(ss)
    ma = build_mesh_accel(arr, mat_ch)
    return ma, mat_ch, float(scene_epsilon(ss, T_MIN_PT))


def smoke_mesh():
    from nrenderer_tpu.ops.bvh import intersect_triangles_blocked
    from nrenderer_tpu.ops.mesh_pallas import sweep_mesh_full
    from nrenderer_tpu.ops.soa import V3
    ma, mat_ch, t_min = _bunny_accel()
    n = 1 << 18
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    o = V3(jax.random.uniform(k1, (n,), minval=50.0, maxval=500.0),
           jax.random.uniform(k2, (n,), minval=50.0, maxval=500.0),
           jax.random.uniform(k3, (n,), minval=300.0, maxval=900.0))
    dv = jax.random.normal(k4, (n, 3))
    dv = dv / jnp.linalg.norm(dv, axis=1, keepdims=True)
    d = V3(dv[:, 0], dv[:, 1], dv[:, 2])

    run_p = jax.jit(lambda o, d: sweep_mesh_full(ma.bt, o, d, t_min)[:2])
    (tp, ip), dt = timed(run_p, o, d)
    tx, *_rest = jax.jit(
        lambda o, d: intersect_triangles_blocked(ma.bt, o, d, t_min))(o, d)
    tp, tx, ip = np.asarray(tp), np.asarray(tx), np.asarray(ip)
    hit_p = ip >= 0
    hit_x = np.isfinite(tx)
    ok = (hit_p == hit_x).all() and np.allclose(
        tp[hit_p], tx[hit_x], rtol=1e-5)
    # box-interior random rays SATURATE the per-tile block unions by
    # construction (every tile enters most blocks) — the bar is a
    # regression floor for that worst case, not render throughput
    rok, rdet = rate_bar("mesh", n / dt / 1e6, "Mray/s")
    check("mesh", ok and rok,
          f"5k-tri sweep == XLA sweep ({int(hit_p.sum())} hits), "
          f"{rdet}, saturated-union worst case")


def _render(scn, renderer, w, h, spp, depth, setup=None, **kw):
    """Render twice: the first call pays fn build + compile, the second
    is the rate measurement (regression bars are on WARM throughput)."""
    from nrenderer_tpu import load_scn
    scene = load_scn(f"{RES}/{scn}")
    ro = scene.render_option
    ro.width, ro.height = w, h
    ro.samples_per_pixel = spp
    ro.depth = depth
    if setup is not None:
        setup(scene)
    renderer(seed=0, **kw).render(scene)
    t0 = time.perf_counter()
    img = renderer(seed=0, **kw).render(scene).pixels[..., :3]
    return np.asarray(img), time.perf_counter() - t0


def smoke_pt():
    from nrenderer_tpu.renderers.simple_pt import SimplePathTracerRenderer
    w = h = 128
    spp, depth = 1024, 8  # ~1 s of kernel: dispatch round-trips stay noise
    img_p, dt = _render("path_tracing_cornel.scn", SimplePathTracerRenderer,
                        w, h, spp, depth)
    os.environ["NR_ENGINE"] = "xla"
    try:
        img_x, _ = _render("path_tracing_cornel.scn",
                           SimplePathTracerRenderer, w, h, spp, depth)
    finally:
        os.environ.pop("NR_ENGINE")
    # independent RNG streams: 8x8 blur puts the MC-noise corr floor
    # well above a structural break's (raw-pixel corr of two GOOD 256spp
    # renders is only ~0.6; blur4 ~0.96; blur8 ~0.99)
    corr = np.corrcoef(blur(img_p, 8).reshape(-1),
                       blur(img_x, 8).reshape(-1))[0, 1]
    rok, rdet = rate_bar("pt", spp / dt, "spp/s")
    ok = (np.isfinite(img_p).all()
          and abs(float(img_p.mean() - img_x.mean())) < 0.05
          and corr > 0.97 and rok)
    check("pt", ok, f"megakernel vs XLA: dmean "
          f"{abs(float(img_p.mean() - img_x.mean())):.4f} (bar .05), "
          f"blur8 corr {corr:.3f} (bar .97), {rdet}")


def smoke_glass():
    from nrenderer_tpu.renderers.acc_pt import AccPathTracerRenderer
    img, dt = _render("pt_glass.scn", AccPathTracerRenderer, 128, 128,
                      128, 12)
    rok, rdet = rate_bar("glass", 128 / dt, "spp/s")
    ok = (np.isfinite(img).all() and img.max() > 0.3
          and 0.05 < img.mean() < 0.9 and rok)
    check("glass", ok, f"BSDF kernel mean {img.mean():.3f}, {rdet}")


def smoke_env():
    from nrenderer_tpu.renderers.acc_pt import AccPathTracerRenderer
    from nrenderer_tpu.scene.model import AmbientType, Texture

    def setup(scene):
        # the .scn file carries no texture payload — attach a synthetic
        # sky/ground map (the CLI does this via --env-map)
        px = np.zeros((64, 128, 3), np.float32)
        px[:32] = (0.25, 0.45, 1.0)
        px[32:] = (0.35, 0.3, 0.22)
        px[8:16, 40:60] = (4.0, 3.8, 3.4)  # a bright sun patch
        scene.ambient.environment_map = len(scene.textures)
        scene.textures.append(Texture(name="env", pixels=px))
        scene.ambient.type = AmbientType.ENVIRONMENT_MAP

    # 256 spp: ~1 s of kernel, so the handful of per-render dispatch
    # round-trips (which vary with the session tunnel) stay noise
    img_e, dt = _render("env_map_spheres.scn", AccPathTracerRenderer,
                        128, 128, 256, 6, setup=setup)
    os.environ["NR_ENV_EXACT0"] = "0"
    try:
        img_x, _ = _render("env_map_spheres.scn", AccPathTracerRenderer,
                           128, 128, 256, 6, setup=setup)
    finally:
        os.environ.pop("NR_ENV_EXACT0")
    corr = np.corrcoef(blur(img_e).reshape(-1),
                       blur(img_x).reshape(-1))[0, 1]
    rok, rdet = rate_bar("env", 256 / dt, "spp/s")
    ok = (np.isfinite(img_e).all()
          and abs(float(img_e.mean() - img_x.mean())) < 0.02
          and corr > 0.98 and rok)
    check("env", ok, f"exact-bounce0 vs XLA fallback: blur4 corr "
          f"{corr:.4f} (bar .98), {rdet}")


def smoke_mlt():
    from nrenderer_tpu import load_scn
    from nrenderer_tpu.renderers.mlt import render_mlt
    scene = load_scn(f"{RES}/Metropolis.scn")
    scene.render_option.width = 64
    scene.render_option.height = 64
    scene.render_option.depth = 8
    # 512 muts/chain: ~0.5 s of kernel so per-block dispatch (session-
    # dependent, ~25 ms) stays noise.  Warm render first: the rate bar
    # is on WARM throughput — with a cold persistent cache
    # (relay/libtpu restarts invalidate it between sessions) a single
    # timed call measures compiles, not the kernel (3 vs 564 Kmut/s
    # across two sessions of the same code)
    chains, muts = 1024, 512
    render_mlt(scene, chains=chains, mutations=muts, n_init=4096, seed=0)
    t0 = time.perf_counter()
    img = render_mlt(scene, chains=chains, mutations=muts, n_init=4096,
                     seed=0)[..., :3]
    dt = time.perf_counter() - t0
    left = img[24:40, 2:7].mean(axis=(0, 1))
    right = img[24:40, 57:62].mean(axis=(0, 1))
    rok, rdet = rate_bar("mlt", chains * muts / dt / 1e3, "Kmut/s")
    ok = (np.isfinite(img).all() and img.max() > 0.3
          and left[0] > left[2] and right[1] > right[0] and rok)
    check("mlt", ok, f"64x64 block: mean {img.mean():.3f}, walls "
          f"r/g ok, {rdet} warm")


ALL = {"compact": smoke_compact, "stream": smoke_stream,
       "mesh": smoke_mesh, "pt": smoke_pt, "glass": smoke_glass,
       "env": smoke_env, "mlt": smoke_mlt}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    t0 = time.perf_counter()
    from nrenderer_tpu.utils.device_warm import warm_device_async
    warm_device_async()  # claim the TPU pool chip during the first compile
    print(f"devices: {jax.devices()}", flush=True)
    for nm in names:
        try:
            ALL[nm]()
        except Exception as exc:  # a crash is a failure that names itself
            check(nm, False, f"EXCEPTION {type(exc).__name__}: {exc}")
    print(f"\n{'OK' if not FAILED else 'FAILED: ' + ', '.join(FAILED)} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    sys.exit(1 if FAILED else 0)
