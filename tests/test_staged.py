"""Staged (compacting) wavefront: unbiasedness vs the plain wavefront.

The staged wavefront (`renderers/_wavefront.build_staged_wavefront_fn`)
packs the whole ray state into smaller buffers at scheduled bounce
boundaries, resolving overflow by russian roulette with 1/q reweighting.
These tests drive it through the real renderer wiring (NR_STAGED=1) and
check the estimator against the plain wavefront within MC noise.

A closed Cornell box at depth 13 keeps the alive fraction far above the
1/2 and 1/4 stage capacities, so the RR overflow path (not just the
happy packing path) is what's being validated.
"""
import numpy as np

import nrenderer_tpu
from nrenderer_tpu import load_scn
from nrenderer_tpu.server.manager import ComponentManager

nrenderer_tpu._register_builtin_renderers()


def render(resource_dir, w=48, h=48, spp=64, depth=13):
    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    scene.render_option.width = w
    scene.render_option.height = h
    scene.render_option.samples_per_pixel = spp
    scene.render_option.depth = depth
    mgr = ComponentManager()
    mgr.exec("AccPathTracer", scene)
    return mgr.wait(timeout=600).pixels[..., :3]


def test_staged_matches_plain_wavefront(resource_dir, monkeypatch):
    monkeypatch.delenv("NR_STAGED", raising=False)
    plain = render(resource_dir)
    monkeypatch.setenv("NR_STAGED", "1")
    staged = render(resource_dir)
    assert np.isfinite(staged).all()
    assert (staged >= 0).all()
    # same estimator, different sample sequence (packing re-slots the RNG
    # lanes) -> agree in expectation; RR reweighting adds variance, so the
    # bound is on the image MEAN, not per-pixel
    assert abs(staged.mean() - plain.mean()) < 0.02
    # and per-pixel agreement at MC-noise scale (sqrt(64) averaging)
    assert np.abs(staged - plain).mean() < 0.06


def test_staged_stage_plan_boundaries():
    from nrenderer_tpu.renderers._wavefront import stage_plan
    # absolute bounce boundaries, clipped to depth
    assert stage_plan(20) == [(0, 1), (6, 2), (11, 4), (16, 8)]
    assert stage_plan(8) == [(0, 1), (6, 2)]
    assert stage_plan(5) == [(0, 1)]
