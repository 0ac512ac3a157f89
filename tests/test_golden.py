"""Golden-image regression tests against the reference's published renders.

The reference images (`doc/image/rdm_*.png`) are UI screenshots (~506x509,
off-size, with window borders), so comparison is alignment-tolerant: crop the
borders, downsample both to a small grid, compare RMSE.  The RayCast image is
deterministic and should match tightly; the PT image at CPU-affordable spp is
a looser regression guard (full parity verified on TPU at 2048 spp:
RMSE 0.039, means 0.455 vs 0.435 — see docs/architecture.md)."""
import numpy as np
import pytest

import nrenderer_tpu
from nrenderer_tpu import load_scn
from nrenderer_tpu.io.image import read_png

nrenderer_tpu._register_builtin_renderers()

REF_DIR = "/root/reference/doc/image"


def _down(a, crop, size=64):
    from PIL import Image
    a = a[crop:-crop, crop:-crop]
    im = Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8))
    return np.asarray(im.resize((size, size), Image.BILINEAR),
                      np.float32) / 255.0


def _rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean()))


def test_raycast_matches_rdm9(resource_dir):
    from nrenderer_tpu.renderers.raycast import RayCastRenderer
    scene = load_scn(str(resource_dir / "ray_cast_cornel.scn"))
    scene.render_option.width = 500
    scene.render_option.height = 500
    img = RayCastRenderer().render(scene).pixels[..., :3]
    ref = read_png(f"{REF_DIR}/rdm_9.png")
    a, b = _down(img, 4), _down(ref, 4)
    rmse = _rmse(a, b)
    assert rmse < 0.08, rmse
    assert abs(a.mean() - b.mean()) < 0.02


def test_pt_cornell_tracks_rdm10(resource_dir):
    """Loose structural guard at CPU-affordable spp (Jensen-dark at 64 spp)."""
    from nrenderer_tpu.renderers.simple_pt import SimplePathTracerRenderer
    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    ro = scene.render_option
    ro.width = ro.height = 96
    ro.samples_per_pixel = 64
    ro.depth = 20
    img = SimplePathTracerRenderer().render(scene).pixels[..., :3]
    ref = read_png(f"{REF_DIR}/rdm_10.png")
    a, b = _down(img, 1, 32), _down(ref, 5, 32)
    assert _rmse(a, b) < 0.22
    # structure: correlation between the two images is high (0.88 measured
    # at 64 spp / 96px; noise + Jensen darkening bound it below TPU parity)
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.85
