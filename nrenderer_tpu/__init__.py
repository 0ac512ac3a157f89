"""nrenderer_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of NRenderer.

A pluggable offline rendering framework with the capabilities of
civilizwa/nrenderer: the `.scn` scene DSL and OBJ importers, the renderer
registry ("RenderComponent" plugin surface), and the four renderers — RayCast
Phong, SimplePathTracer, AccPathTracer (BVH + conductor/dielectric/microfacet
BSDFs + env maps), and MetropolisLightTransport — each implemented as a
jit-compiled wavefront megakernel over SoA ray batches instead of per-pixel
C++ thread loops.
"""
__version__ = "0.1.0"

from .scene.model import (  # noqa: F401
    Ambient, AmbientType, AreaLight, Camera, DirectionalLight, Light,
    LightType, Material, Mesh, Model, Node, NodeType, Plane, PointLight,
    Property, PropertyType, RenderOption, Scene, Sphere, SpotLight, Texture,
)
from .scene.arrays import SceneArrays, build_scene_arrays  # noqa: F401
from .scene.builder import SceneBuildError, build_scene, validate_scene  # noqa: F401
from .scene.templates import make_material, template_names  # noqa: F401
from .io.scn import load_scn, parse_scn, ScnParseError  # noqa: F401
from .io.obj import load_obj, ObjParseError  # noqa: F401


def _register_builtin_renderers() -> None:
    """Import renderer modules for their registration side effects (the
    analogue of the reference's DLL scan + static-initializer registration,
    `ComponentManager.cpp:15-30`)."""
    from .renderers import (example, raycast, simple_pt, acc_pt, mlt,  # noqa: F401
                            preview)  # noqa: F401


def enable_compilation_cache(path: str = None) -> None:
    """Persist XLA compilations across processes (mesh-scene kernels compile
    for minutes; the cache makes re-renders of the same scene shape instant).
    Called by the CLI/bench entry points; library users opt in."""
    import os
    import jax
    path = path or os.environ.get(
        "NR_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nrenderer_tpu",
                     "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
