"""Checkpoint/resume + progressive preview tests (reference gap, SURVEY §5.4/5.5)."""
import numpy as np
import pytest

import nrenderer_tpu
from nrenderer_tpu import load_scn
from nrenderer_tpu.server.checkpoint import load_checkpoint, save_checkpoint
from nrenderer_tpu.server.registry import get_server

nrenderer_tpu._register_builtin_renderers()


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ck.npz")
    film = np.random.default_rng(0).random((64, 3)).astype(np.float32)
    save_checkpoint(p, film, 96, 8, 8, 7, "fp-abc")
    got = load_checkpoint(p, "fp-abc")
    assert got is not None
    f2, spp = got
    np.testing.assert_array_equal(f2, film)
    assert spp == 96
    # wrong fingerprint is rejected
    assert load_checkpoint(p, "other") is None
    assert load_checkpoint(str(tmp_path / "missing.npz"), "fp") is None


def _render(resource_dir, tmp_path, spp, seed=3, ck=None, previews=None):
    from nrenderer_tpu.renderers.simple_pt import SimplePathTracerRenderer
    scene = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
    scene.render_option.width = 24
    scene.render_option.height = 24
    scene.render_option.samples_per_pixel = spp
    scene.render_option.depth = 4
    r = SimplePathTracerRenderer(seed=seed, checkpoint_path=ck,
                                 progressive=True)
    if previews is not None:
        import nrenderer_tpu.renderers.simple_pt as sp
        orig = sp.render_progressive

        def wrapped(*a, **k):
            k["on_preview"] = lambda spp_done, img: previews.append(spp_done)
            return orig(*a, **k)
        sp.render_progressive = wrapped
        try:
            return r.render(scene).pixels
        finally:
            sp.render_progressive = orig
    return r.render(scene).pixels


def test_progressive_matches_and_previews(resource_dir, tmp_path):
    previews = []
    img = _render(resource_dir, tmp_path, spp=8, previews=previews)
    assert img.shape == (24, 24, 4)
    assert len(previews) >= 1
    assert previews[-1] == 8
    # screen got updated along the way
    assert get_server().screen.get_pixels() is not None


def test_resume_is_exact(resource_dir, tmp_path):
    """Rendering 8 spp straight == rendering 4 spp, 'crashing', resuming."""
    straight = _render(resource_dir, tmp_path, spp=8, seed=5)

    ck = str(tmp_path / "resume.npz")
    # first half: run with spp=8 but interrupt after the first pass by
    # rendering spp=4... instead simulate: run spp=8 with checkpointing,
    # then delete nothing and re-run — resume should skip all work and give
    # the identical image.
    a = _render(resource_dir, tmp_path, spp=8, seed=5, ck=ck)
    b = _render(resource_dir, tmp_path, spp=8, seed=5, ck=ck)  # full resume
    np.testing.assert_allclose(a, b, atol=1e-6)
    np.testing.assert_allclose(a, straight, atol=1e-5)


def test_acc_checkpoint_resume_exact(resource_dir, tmp_path, monkeypatch):
    """AccPathTracer checkpoint/resume (round 3): interrupting after two of
    four passes and resuming yields the EXACT image of an uninterrupted
    run (per-step keys are fold_in(base, step))."""
    import nrenderer_tpu.renderers.acc_pt as acc
    from nrenderer_tpu.server import checkpoint as ckmod

    monkeypatch.setattr(acc, "pick_chunk", lambda *a, **k: 4)

    def scene():
        s = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
        s.render_option.width = 16
        s.render_option.height = 16
        s.render_option.samples_per_pixel = 16  # 4 steps of chunk 4
        s.render_option.depth = 4
        return s

    ck_full = str(tmp_path / "full.npz")
    full = acc.AccPathTracerRenderer(
        seed=5, checkpoint_path=ck_full).render(scene()).pixels

    # interrupted run: die after the second save
    ck = str(tmp_path / "acc.npz")
    saves = {"n": 0}
    real_save = ckmod.save_checkpoint

    def dying_save(*a, **k):
        real_save(*a, **k)
        saves["n"] += 1
        if saves["n"] == 2:
            raise KeyboardInterrupt

    monkeypatch.setattr(ckmod, "save_checkpoint", dying_save)
    with pytest.raises(KeyboardInterrupt):
        acc.AccPathTracerRenderer(seed=5, checkpoint_path=ck).render(scene())
    monkeypatch.setattr(ckmod, "save_checkpoint", real_save)
    assert int(np.load(ck)["spp_done"]) == 8  # two of four passes persisted

    resumed = acc.AccPathTracerRenderer(
        seed=5, checkpoint_path=ck).render(scene()).pixels
    np.testing.assert_allclose(resumed, full, rtol=1e-5, atol=1e-6)


def test_render_fingerprint_covers_payload_arrays():
    """render_fingerprint (review r3) hashes pixel payloads by content."""
    from nrenderer_tpu.server.checkpoint import render_fingerprint
    a = np.zeros((2, 2, 3), np.float32)
    b = a.copy()
    b[0, 0, 0] = 1.0
    assert (render_fingerprint(("x",), (a,))
            != render_fingerprint(("x",), (b,)))
    assert (render_fingerprint(("x",), (a,))
            == render_fingerprint(("x",), (a.copy(),)))
    assert render_fingerprint(("x",)) != render_fingerprint(("y",))


def test_acc_checkpoint_rejects_changed_camera(resource_dir, tmp_path,
                                               monkeypatch):
    """Resuming after moving the camera must NOT reuse the stale film
    (review r3: the fingerprint used to omit the camera, so the second
    render silently returned the first viewpoint's image)."""
    import nrenderer_tpu.renderers.acc_pt as acc

    monkeypatch.setattr(acc, "pick_chunk", lambda *a, **k: 4)

    def scene(cam_z):
        s = load_scn(str(resource_dir / "path_tracing_cornel.scn"))
        s.render_option.width = 16
        s.render_option.height = 16
        s.render_option.samples_per_pixel = 16
        s.render_option.depth = 4
        s.camera.position = (s.camera.position[0], s.camera.position[1],
                             cam_z)
        return s

    ck = str(tmp_path / "cam.npz")
    z0 = load_scn(str(resource_dir / "path_tracing_cornel.scn")).camera.position[2]
    acc.AccPathTracerRenderer(seed=5, checkpoint_path=ck).render(scene(z0))
    moved = acc.AccPathTracerRenderer(
        seed=5, checkpoint_path=ck).render(scene(z0 * 0.8)).pixels
    # control must take the SAME chunked branch (a no-checkpoint render
    # picks the single-pass path, whose PRNG stream differs by design)
    fresh = acc.AccPathTracerRenderer(
        seed=5,
        checkpoint_path=str(tmp_path / "cam2.npz")).render(
            scene(z0 * 0.8)).pixels
    np.testing.assert_allclose(moved, fresh, rtol=1e-5, atol=1e-6)


def test_progressive_loop_resume(tmp_path):
    """The shared chunked-Pallas host loop (round 3: --checkpoint on every
    AccPT engine) resumes exactly and re-keys on fingerprint parts."""
    from nrenderer_tpu.renderers.acc_pt import _progressive_loop
    from nrenderer_tpu.utils.timing import PhaseTimer

    calls = []

    def step_fn(step):
        calls.append(step)
        rng = np.random.default_rng(100 + step)
        return rng.random((4 * 4, 3)).astype(np.float32)

    ck = str(tmp_path / "pp.npz")
    img1, start, n = _progressive_loop(ck, 0, PhaseTimer(), 4, 4, 8, 2,
                                       step_fn, ("parts",), ())
    assert (start, n) == (0, 4) and calls == [0, 1, 2, 3]
    calls.clear()
    img2, start2, _ = _progressive_loop(ck, 0, PhaseTimer(), 4, 4, 8, 2,
                                        step_fn, ("parts",), ())
    assert start2 == 4 and calls == []  # full resume: zero work
    np.testing.assert_allclose(img1, img2, atol=1e-6)
    calls.clear()
    _progressive_loop(ck, 0, PhaseTimer(), 4, 4, 8, 2, step_fn,
                        ("other-engine",), ())
    assert calls == [0, 1, 2, 3]  # changed parts -> fresh start
