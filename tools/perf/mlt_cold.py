"""Measure MLT COLD-start and steady-state at the reference workload shape
(VERDICT r3 #3: cold Metropolis.scn 500x500 / 16.8M mutations < 120 s).

Phase timings are printed separately so compile cost (b-estimate, init,
first block) is attributable.  Run with a CLEAN compilation cache dir to
measure a true cold start:

    JAX_COMPILATION_CACHE_DIR=/tmp/nr_cc_fresh python tools/perf/mlt_cold.py
"""
import sys
import time

import numpy as np

import nrenderer_tpu; nrenderer_tpu.enable_compilation_cache()
from nrenderer_tpu import load_scn
from nrenderer_tpu.renderers.mlt import render_mlt

CHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TOTAL = int(sys.argv[2]) if len(sys.argv) > 2 else 16_800_000
# render_mlt's `mutations` is PER-CHAIN steps; the reference workload is
# 16.8M TOTAL mutations (8 threads x 2.1M, `Metropolis.cpp:25-64`)
MUTS = max(128, TOTAL // CHAINS)

scene = load_scn("/root/reference/resource/Metropolis.scn")
scene.render_option.width = 500
scene.render_option.height = 500

t0 = time.perf_counter()
img = render_mlt(scene, chains=CHAINS, mutations=MUTS, n_init=10000, seed=0)
cold = time.perf_counter() - t0
print(f"cold (compile + {CHAINS * MUTS} mutations): {cold:.1f}s", flush=True)

t0 = time.perf_counter()
img = render_mlt(scene, chains=CHAINS, mutations=MUTS, n_init=10000, seed=1)
steady = time.perf_counter() - t0
rate = CHAINS * MUTS / steady / 1e3
print(f"steady {CHAINS * MUTS} mutations: {steady:.1f}s  "
      f"({rate:.0f} Kmut/s)", flush=True)
print(f"mean {np.asarray(img[..., :3]).mean():.4f}", flush=True)
