import sys, time
import numpy as np
import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj
from nrenderer_tpu.renderers.acc_pt import AccPathTracerRenderer
RES = "/root/reference/resource"

size = int(sys.argv[1]); spp = int(sys.argv[2]); depth = int(sys.argv[3])
scene = load_scn(f"{RES}/path_tracing_cornel.scn")
load_obj(f"{RES}/obj/bunny_5k_faces.obj", scene, material=0)
m = scene.models[-1]
m.scale = (600.0,) * 3
m.translation = (40.0, -305.0, 920.0)
ro = scene.render_option
ro.width = ro.height = size
ro.samples_per_pixel = spp
ro.depth = depth
t0 = time.perf_counter()
res = AccPathTracerRenderer(seed=0).render(scene)
dt = time.perf_counter() - t0
img = res.pixels[..., :3]
print(f"bunny-5k {size}x{size} {spp}spp depth{depth}: {dt:.1f}s "
      f"(incl compile), mean {img.mean():.4f}", flush=True)
t0 = time.perf_counter()
AccPathTracerRenderer(seed=1).render(scene)
dt = time.perf_counter() - t0
print(f"steady: {dt:.1f}s  ({spp/dt:.2f} spp/s)", flush=True)
