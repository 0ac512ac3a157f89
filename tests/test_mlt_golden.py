"""MLT golden-image regression vs the reference's published render.

`/root/reference/results/MLT.png` is a UI screenshot of the reference's
500x500 / depth-20 / 16.8M-mutation MLT run (19573 s); the render panel is
the fixed crop below.  Comparison is alignment-tolerant (downsample both
to a small grid, like tests/test_golden.py) and BRIGHTNESS-NORMALIZED:
the reference image is ~3.5x darker in linear radiance than an unbiased
path-trace of its own scene, while our MLT lands within 14% of that
ground truth — see docs/architecture.md divergence #9 for the full
analysis.  Structure (wall colors, caustic cube glow, light quad) must
correlate; absolute exposure must match only after mean-scaling.

TPU reference-scale verification (500x500, 4096x1024 mutations): tone
mean 0.489 vs 0.497 at 96x96 (resolution-independent), recorded in
BENCH.md.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~10 min golden renders

from nrenderer_tpu import load_scn
from nrenderer_tpu.io.image import read_png

MLT_SCREENSHOT = "/root/reference/results/MLT.png"
RENDER_CROP = (slice(85, 585), slice(65, 562))  # the Result panel's image


def _down(a, size=32):
    from PIL import Image
    im = Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8))
    return np.asarray(im.resize((size, size), Image.BILINEAR),
                      np.float32) / 255.0


@pytest.fixture(scope="module")
def images():
    from nrenderer_tpu.renderers.mlt import render_mlt
    ref = read_png(MLT_SCREENSHOT)[RENDER_CROP]
    scene = load_scn("/root/reference/resource/Metropolis.scn")
    # depth 8 keeps the unrolled combo compile CPU-affordable (measured:
    # corr 0.82, normalized RMSE 0.085, mean 0.46 at this budget)
    scene.render_option.width = 64
    scene.render_option.height = 64
    scene.render_option.depth = 8
    img = render_mlt(scene, chains=384, mutations=64, n_init=3072,
                     seed=0)[..., :3]
    return _down(img), _down(ref)


def test_mlt_structure_matches_reference(images):
    ours, ref = images
    corr = np.corrcoef(ours.reshape(-1), ref.reshape(-1))[0, 1]
    assert corr > 0.7, corr  # 0.85 measured at 96x96/512x96; CPU budget


def test_mlt_normalized_rmse(images):
    ours, ref = images
    # exposure-normalize (deliberate brightness divergence, docs #9)
    scaled = ours * (ref.mean() / max(ours.mean(), 1e-6))
    rmse = float(np.sqrt(((scaled - ref) ** 2).mean()))
    assert rmse < 0.16, rmse  # ~0.10 measured at CI budget


def test_mlt_brightness_tracks_unbiased_pt(images):
    """Our MLT's tone-mapped brightness tracks the unbiased PT ground
    truth of this scene — 0.47 at the converged TPU budget (the reference
    image sits at 0.30; docs #9).  Band is wide for the CI chain budget."""
    ours, _ = images
    assert 0.35 < ours.mean() < 0.62, ours.mean()


def test_mlt_linear_radiance_vs_unbiased_pt():
    """VERDICT r3 #7: the ground-truth cross-check asserted as a test.
    Render `Metropolis.scn` with SimplePathTracer (unbiased, golden-tested
    against `rdm_10.png`) and assert our MLT's LINEAR radiance tracks it.

    The tone map `pow(1 - exp(-x*s), 1/2.2)` is inverted to recover the
    per-pixel linear estimate.  The top band containing the light quad is
    excluded: MinPathLength=3 removes the direct camera->light path from
    MLT (`PathContribution.hpp:13`) so the two estimators legitimately
    differ there.  Two preserved REFQUIRKs keep the agreement from being
    exact anywhere (docs/architecture.md #9): emitted = 2x the scene
    radiance (`Metropolis.hpp:34`) and light-vert getColor returning
    emitted — the latter produces the reference's signature "cube glow"
    that the unbiased render does not have (visible in the reference's own
    `results/MLT.png`).  Calibrated at 2x this budget: masked mean ratio
    1.08, per-channel r 1.23 / g 1.01 / b 0.79, tone corr 0.87 full-image.
    A broken MIS weight, palette, or splat path moves these far outside
    the bands."""
    import jax  # noqa: F401  (forces backend init before both renders)
    from nrenderer_tpu.renderers.mlt import render_mlt
    from nrenderer_tpu.renderers.simple_pt import SimplePathTracerRenderer

    W = H = 48
    DEPTH = 8

    def scene():
        s = load_scn("/root/reference/resource/Metropolis.scn")
        s.render_option.width = W
        s.render_option.height = H
        s.render_option.depth = DEPTH
        return s

    s = scene()
    s.render_option.samples_per_pixel = 512
    pt = SimplePathTracerRenderer(seed=0).render(s).pixels[..., :3]
    pt_lin = pt.astype(np.float64) ** 2  # sqrt gamma undone

    img = render_mlt(scene(), chains=1024, mutations=256, n_init=8192,
                     seed=0)
    rgb = img[..., :3].astype(np.float64)
    mlt_lin = -np.log1p(-np.clip(rgb, 0.0, 0.999999) ** 2.2)

    band = H // 6  # the light quad's rows
    a, b = mlt_lin[band:], pt_lin[band:]
    ratio = a.mean() / b.mean()
    assert 0.85 < ratio < 1.30, ratio  # 1.08 calibrated
    for i, (lo, hi) in enumerate([(0.95, 1.55), (0.8, 1.3), (0.6, 1.05)]):
        r = a[..., i].mean() / b[..., i].mean()
        assert lo < r < hi, (i, r)
    # full-image structure (light + walls + floor): tone-domain corr
    dn = _down(rgb, 12).reshape(-1)
    dp = _down(pt, 12).reshape(-1)
    corr = np.corrcoef(dn, dp)[0, 1]
    assert corr > 0.75, corr  # 0.87 calibrated at 2x budget


def test_mlt_mesh_scene_vs_unbiased_pt():
    """MLT mesh capability (VERDICT r4 missing #3 / next #3): the reference
    MLT brute-forces ANY scene, mesh-expanded triangles included
    (`Metropolis.cpp:135-166`); here triangle pools past MLT_BVH_THRESHOLD
    route through the blocked Pallas sweep, so a bunny mesh + area light
    scene must compile AND track the unbiased path-trace of the same
    scene.  Ground truth is AccPathTracer (identical estimator to
    SimplePathTracer on this all-Lambertian scene — their agreement is
    golden-tested separately — and its mesh path is equality-tested
    against brute force), at the same depth.  Bands account for the two
    preserved REFQUIRKs (emitted = 2x radiance, light-vert getColor =
    emitted) exactly like test_mlt_linear_radiance_vs_unbiased_pt."""
    from nrenderer_tpu.io.obj import load_obj
    from nrenderer_tpu.renderers.mlt import render_mlt, _prepare_mlt
    from nrenderer_tpu.renderers.acc_pt import AccPathTracerRenderer

    W = H = 32
    DEPTH = 6

    def scene():
        s = load_scn("/root/reference/resource/Metropolis.scn")
        load_obj("/root/reference/resource/obj/bunny_200_faces.obj", s,
                 material=0)
        m = s.models[-1]
        m.scale = (400.0,) * 3
        m.translation = (40.0, -305.0, 920.0)
        s.render_option.width = W
        s.render_option.height = H
        s.render_option.depth = DEPTH
        return s

    # the mesh path actually engages (200 tris > threshold 64)
    kern, _, _ = _prepare_mlt(scene(), DEPTH)
    assert kern.tri_bvh is not None

    s = scene()
    s.render_option.samples_per_pixel = 256
    pt = AccPathTracerRenderer(seed=0).render(s).pixels[..., :3]
    pt_lin = pt.astype(np.float64) ** 2  # sqrt gamma undone

    img = render_mlt(scene(), chains=512, mutations=128, n_init=4096,
                     seed=0)
    rgb = img[..., :3].astype(np.float64)
    assert np.isfinite(rgb).all()
    mlt_lin = -np.log1p(-np.clip(rgb, 0.0, 0.999999) ** 2.2)

    band = H // 6  # exclude the light quad's rows (MinPathLength=3)
    a, b = mlt_lin[band:], pt_lin[band:]
    ratio = a.mean() / b.mean()
    assert 0.8 < ratio < 1.4, ratio
    # structure: the bunny occludes/bounces where the PT says it does
    dn = _down(rgb, 12).reshape(-1)
    dp = _down(pt, 12).reshape(-1)
    corr = np.corrcoef(dn, dp)[0, 1]
    assert corr > 0.7, corr
