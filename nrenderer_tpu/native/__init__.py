"""Native (C++) runtime components, loaded via ctypes.

The compute path is XLA/Pallas; these are the host-side runtime hot paths —
OBJ scanning (data loader), BVH building (accelerator structure), and film
quantization (the Screen handoff) — implemented in `native/nrnative.cpp` and
compiled on first use.  Every entry point has a pure-python fallback, so the
package works without a toolchain; `available()` reports which is active.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "nrnative.cpp"
_LIB_DIR = pathlib.Path(__file__).resolve().parent
_LIB = _LIB_DIR / "libnrnative.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not _SRC.exists():
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
           "-o", str(_LIB)]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and _LIB.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NR_NO_NATIVE") == "1":
            return None
        if not _LIB.exists() or (_SRC.exists()
                                 and _SRC.stat().st_mtime
                                 > _LIB.stat().st_mtime):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.nr_obj_count.argtypes = [ctypes.c_char_p, i64p, i64p, i64p, i64p]
        lib.nr_obj_count.restype = ctypes.c_int
        lib.nr_obj_parse.argtypes = [ctypes.c_char_p, f32p, f32p, f32p,
                                     i64p, i64p, i64p]
        lib.nr_obj_parse.restype = ctypes.c_int64
        lib.nr_build_bvh.argtypes = [f32p, f32p, ctypes.c_int64, f32p, f32p,
                                     i32p, i32p]
        lib.nr_build_bvh.restype = ctypes.c_int64
        lib.nr_film_to_rgba8.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                         u8p]
        lib.nr_film_to_rgba8.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def obj_scan(path: str):
    """Native OBJ scan: returns (positions (V,3) f32, uvs (T,2) f32,
    normals (N,3) f32, face_v (F,3) i64, face_t, face_n) with 1-based
    indices (0 = absent), or None if unavailable / not plainly triangulated.
    """
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    nn = ctypes.c_int64()
    nf = ctypes.c_int64()
    if lib.nr_obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nt),
                        ctypes.byref(nn), ctypes.byref(nf)) != 0:
        return None
    v = np.zeros((max(nv.value, 1), 3), np.float32)
    vt = np.zeros((max(nt.value, 1), 2), np.float32)
    vn = np.zeros((max(nn.value, 1), 3), np.float32)
    fv = np.zeros((max(nf.value, 1), 3), np.int64)
    ft = np.zeros_like(fv)
    fn = np.zeros_like(fv)
    n_faces = lib.nr_obj_parse(
        path.encode(), _ptr(v, ctypes.c_float), _ptr(vt, ctypes.c_float),
        _ptr(vn, ctypes.c_float), _ptr(fv, ctypes.c_int64),
        _ptr(ft, ctypes.c_int64), _ptr(fn, ctypes.c_int64))
    if n_faces < 0:
        return None
    return (v[:nv.value], vt[:nt.value], vn[:nn.value], fv[:n_faces],
            ft[:n_faces], fn[:n_faces])


def build_bvh(bb_min: np.ndarray, bb_max: np.ndarray):
    """Native median-split BVH; same output contract as ops.bvh.build_bvh.
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = bb_min.shape[0]
    if n == 0:
        return None
    n_nodes = 2 * n - 1
    mn = np.ascontiguousarray(bb_min, np.float32)
    mx = np.ascontiguousarray(bb_max, np.float32)
    out_min = np.zeros((n_nodes, 3), np.float32)
    out_max = np.zeros((n_nodes, 3), np.float32)
    skip = np.zeros((n_nodes,), np.int32)
    prim = np.zeros((n_nodes,), np.int32)
    got = lib.nr_build_bvh(
        _ptr(mn, ctypes.c_float), _ptr(mx, ctypes.c_float), n,
        _ptr(out_min, ctypes.c_float), _ptr(out_max, ctypes.c_float),
        _ptr(skip, ctypes.c_int32), _ptr(prim, ctypes.c_int32))
    if got != n_nodes:
        return None
    return out_min, out_max, skip, prim


def film_to_rgba8(film: np.ndarray, apply_gamma: bool = False):
    """Native clamp(+sqrt gamma)+quantize; film (..., 3) f32 -> (..., 4) u8.
    Returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(film.reshape(-1, 3), np.float32)
    out = np.empty((flat.shape[0], 4), np.uint8)
    lib.nr_film_to_rgba8(_ptr(flat, ctypes.c_float), flat.shape[0],
                         1 if apply_gamma else 0,
                         _ptr(out, ctypes.c_uint8))
    return out.reshape(film.shape[:-1] + (4,))
