"""Registry, logger, screen, and executor tests (reference L2/L3 layers)."""
import numpy as np
import pytest

from nrenderer_tpu.server.logger import Logger, LogType
from nrenderer_tpu.server.registry import (
    ComponentFactory, DuplicateComponentError, UnknownComponentError,
    get_server,
)
from nrenderer_tpu.server.screen import Screen


def test_factory_register_create_info():
    f = ComponentFactory()
    f.register_component("Render", "X", "desc", lambda: "instance")
    assert f.create_component("Render", "X") == "instance"
    infos = f.get_components_info("Render")
    assert len(infos) == 1
    assert infos[0].id == "NR.Render.X"
    assert infos[0].description == "desc"


def test_factory_duplicate_raises():
    f = ComponentFactory()
    f.register_component("Render", "X", "", lambda: 1)
    with pytest.raises(DuplicateComponentError):
        f.register_component("Render", "X", "", lambda: 2)


def test_factory_unknown_raises():
    f = ComponentFactory()
    with pytest.raises(UnknownComponentError):
        f.create_component("Render", "Nope")


def test_factory_unregister():
    f = ComponentFactory()
    f.register_component("Render", "X", "", lambda: 1)
    f.unregister_component("Render", "X")
    assert f.get_components_info() == []
    f.register_component("Render", "X", "", lambda: 2)  # re-register ok


def test_logger_tail_cap():
    lg = Logger()
    for i in range(120):
        lg.log(f"m{i}")
    tail = lg.get()
    assert len(tail) == 50
    assert tail[-1].content == "m119"
    assert tail[0].content == "m70"
    lg.error("boom")
    assert lg.get()[-1].type == LogType.ERROR


def test_screen_clamps_and_dirty_flag():
    s = Screen()
    img = np.full((4, 4, 3), 2.0, np.float32)
    img[0, 0] = [-1.0, 0.5, 3.0]
    s.set(img, 4, 4)
    assert s.is_updated
    px = s.get_pixels()
    assert not s.is_updated  # consumed
    assert px.shape == (4, 4, 4)
    np.testing.assert_allclose(px[0, 0], [0.0, 0.5, 1.0, 1.0])
    assert px.max() <= 1.0


def test_builtin_renderers_registered():
    import nrenderer_tpu
    nrenderer_tpu._register_builtin_renderers()
    names = {i.name for i in
             get_server().component_factory.get_components_info("Render")}
    assert {"Example", "RayCast"} <= names


def test_manager_executes_example():
    import nrenderer_tpu
    nrenderer_tpu._register_builtin_renderers()
    from nrenderer_tpu.server.manager import ComponentManager, State
    from nrenderer_tpu.scene.model import Scene

    scene = Scene()
    scene.render_option.width = 16
    scene.render_option.height = 8
    mgr = ComponentManager()
    mgr.exec("Example", scene)
    result = mgr.wait(timeout=30)
    assert mgr.state == State.IDLING
    assert result.pixels.shape == (8, 16, 4)
    assert mgr.exec_seconds >= 1.0  # the example sleeps 1s
    # screen got the frame
    assert get_server().screen.get_pixels().shape == (8, 16, 4)


def test_manager_captures_errors():
    import nrenderer_tpu
    nrenderer_tpu._register_builtin_renderers()
    from nrenderer_tpu.server.component import RenderComponent
    from nrenderer_tpu.server.manager import ComponentManager
    from nrenderer_tpu.scene.model import Scene

    class Boom(RenderComponent):
        def render(self, scene):
            raise ValueError("kaput")

    mgr = ComponentManager()
    mgr.exec("ignored", Scene(), component=Boom())
    with pytest.raises(ValueError, match="kaput"):
        mgr.wait(timeout=30)
