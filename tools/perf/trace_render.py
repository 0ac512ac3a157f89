"""Profiler-trace the REAL AccPT staged render (bunny-5k, one warm render
at reduced spp) and rank device ops by total duration — finds the gap
between the per-bounce microbench sum and the whole-render wall clock.

Usage: trace_render.py [size] [spp] [depth]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn, load_obj
from nrenderer_tpu.renderers.acc_pt import AccPathTracerRenderer

RES = "/root/reference/resource"
size = int(sys.argv[1]) if len(sys.argv) > 1 else 500
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
depth = int(sys.argv[3]) if len(sys.argv) > 3 else 20

scene = load_scn(f"{RES}/path_tracing_cornel.scn")
load_obj(f"{RES}/obj/bunny_5k_faces.obj", scene, material=0)
m = scene.models[-1]
m.scale = (600.0,) * 3
m.translation = (40.0, -305.0, 920.0)
ro = scene.render_option
ro.width = ro.height = size
ro.samples_per_pixel = spp
ro.depth = depth

AccPathTracerRenderer(seed=0).render(scene)  # compile
t0 = time.perf_counter()
AccPathTracerRenderer(seed=1).render(scene)
warm = time.perf_counter() - t0
print(f"warm render: {warm:.2f}s", flush=True)

LOG = "/tmp/nr_trace_render"
with jax.profiler.trace(LOG):
    AccPathTracerRenderer(seed=2).render(scene)

files = sorted(glob.glob(f"{LOG}/plugins/profile/*/*.trace.json.gz"))
print(f"trace files: {files}", flush=True)
with gzip.open(files[-1], "rt") as fh:
    tr = json.load(fh)
events = tr.get("traceEvents", [])
by_name = defaultdict(float)
cnt = defaultdict(int)
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, nm in pids.items()
            if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm}
for e in events:
    if e.get("ph") != "X":
        continue
    if dev_pids and e.get("pid") not in dev_pids:
        continue
    by_name[e["name"]] += e.get("dur", 0.0)
    cnt[e["name"]] += 1
total = sum(by_name.values())
print(f"\nprocesses: {pids}")
print(f"total device event time: {total/1e3:.1f} ms (render {warm:.2f}s)\n")
for nm, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{dur/1e3:9.1f} ms x{cnt[nm]:5d}  {nm[:110]}")
