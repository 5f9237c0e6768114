"""ctypes bindings for grtcore.so, with transparent NumPy fallbacks.

The shared library is built on demand with g++ (see build()); nothing in the
framework *requires* it — pure-Python paths exist for every function — but
scene loading and spatial-sort preprocessing are markedly faster native,
mirroring the reference's use of C++ (happly/tinyobjloader) for host IO.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgrtcore.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile grtcore.cpp -> libgrtcore.so. Returns True on success."""
    if os.path.exists(_SO) and not force:
        return True
    src = os.path.join(_DIR, "grtcore.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_i64, c_i32, c_char_p = ctypes.c_int64, ctypes.c_int32, ctypes.c_char_p
    p_i64 = ctypes.POINTER(c_i64)
    p_i32 = ctypes.POINTER(c_i32)
    p_f32 = ctypes.POINTER(ctypes.c_float)
    p_u64 = ctypes.POINTER(ctypes.c_uint64)

    lib.grt_ply_header.argtypes = [c_char_p, p_i64, p_i32, c_char_p, c_i64, p_i64]
    lib.grt_ply_header.restype = c_i32
    lib.grt_ply_read.argtypes = [c_char_p, c_i64, p_f32, c_i64, c_i32]
    lib.grt_ply_read.restype = c_i32
    lib.grt_ply_write.argtypes = [c_char_p, c_char_p, p_f32, c_i64, c_i32]
    lib.grt_ply_write.restype = c_i32
    lib.grt_obj_count.argtypes = [c_char_p, p_i64]
    lib.grt_obj_count.restype = c_i32
    lib.grt_obj_load.argtypes = [c_char_p, p_f32, p_f32, c_i64, c_i32]
    lib.grt_obj_load.restype = c_i32
    lib.grt_morton3d.argtypes = [p_f32, c_i64, p_f32, p_f32, p_u64]
    lib.grt_morton3d.restype = None
    lib.grt_argsort_u64.argtypes = [p_u64, c_i64, p_i64]
    lib.grt_argsort_u64.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ply_read_native(path: str):
    """Read an all-float32 binary_little_endian PLY vertex element.

    Returns dict name -> float32 column, or None if the native path cannot
    handle this file (caller uses the Python reader).
    """
    lib = _load()
    if lib is None:
        return None
    count = ctypes.c_int64()
    n_props = ctypes.c_int32()
    names_buf = ctypes.create_string_buffer(1 << 16)
    off = ctypes.c_int64()
    rc = lib.grt_ply_header(
        path.encode(), ctypes.byref(count), ctypes.byref(n_props), names_buf,
        len(names_buf), ctypes.byref(off),
    )
    if rc != 0:
        return None
    n, p = count.value, n_props.value
    data = np.empty((n, p), np.float32)
    rc = lib.grt_ply_read(path.encode(), off.value, _fptr(data), n, p)
    if rc != 0:
        return None
    names = names_buf.value.decode().split("\n")
    return {nm: np.ascontiguousarray(data[:, i]) for i, nm in enumerate(names)}


def ply_write_native(path: str, columns: dict[str, np.ndarray]) -> bool:
    lib = _load()
    if lib is None:
        return False
    names = "\n".join(columns.keys())
    data = np.ascontiguousarray(
        np.stack([np.asarray(v, np.float32) for v in columns.values()], axis=1)
    )
    rc = lib.grt_ply_write(path.encode(), names.encode(), _fptr(data),
                           data.shape[0], data.shape[1])
    return rc == 0


def obj_load_native(path: str, y_flip: bool = True):
    """Load an OBJ as an unindexed triangle soup. Returns (verts, norms)
    arrays of shape (n_tris*3, 3), or None to fall back."""
    lib = _load()
    if lib is None:
        return None
    n_tris = ctypes.c_int64()
    if lib.grt_obj_count(path.encode(), ctypes.byref(n_tris)) != 0:
        return None
    n = n_tris.value
    verts = np.empty((n * 3, 3), np.float32)
    norms = np.empty((n * 3, 3), np.float32)
    rc = lib.grt_obj_load(path.encode(), _fptr(verts), _fptr(norms), n, 1 if y_flip else 0)
    if rc != 0:
        return None
    return verts, norms


def morton3d(pos: np.ndarray, lo=None, hi=None) -> np.ndarray:
    """63-bit morton codes of (N, 3) positions (native or NumPy fallback)."""
    pos = np.ascontiguousarray(pos, np.float32)
    lo = np.asarray(pos.min(0) if lo is None else lo, np.float32)
    hi = np.asarray(pos.max(0) if hi is None else hi, np.float32)
    lib = _load()
    n = pos.shape[0]
    if lib is not None:
        out = np.empty(n, np.uint64)
        lib.grt_morton3d(
            _fptr(pos), n, _fptr(lo), _fptr(hi),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out
    # NumPy fallback
    span = np.where(hi > lo, hi - lo, 1.0)
    q = np.clip((pos - lo) / span, 0.0, 1.0)
    q = (q * ((1 << 21) - 1)).astype(np.uint64)

    def expand(v):
        v &= np.uint64((1 << 21) - 1)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return (
        (expand(q[:, 0]) << np.uint64(2))
        | (expand(q[:, 1]) << np.uint64(1))
        | expand(q[:, 2])
    )


_REF_SO = os.path.join(_DIR, "librefmarch.so")
_ref_lib: Optional[ctypes.CDLL] = None
_ref_tried = False


def _load_ref() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the independent C++ re-derivation of the
    reference march semantics (refmarch.cpp) — the cross-check oracle."""
    global _ref_lib, _ref_tried
    if _ref_lib is not None or _ref_tried:
        return _ref_lib
    _ref_tried = True
    src = os.path.join(_DIR, "refmarch.cpp")
    if not os.path.exists(_REF_SO) or (
        os.path.getmtime(_REF_SO) < os.path.getmtime(src)
    ):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _REF_SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_REF_SO)
    except OSError:
        return None
    c_i64, c_i32, c_f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
    p_f32 = ctypes.POINTER(c_f32)
    lib.grt_ref_render.argtypes = [
        p_f32, p_f32, p_f32, p_f32, p_f32, c_i64, c_i32,
        p_f32, p_f32, c_i64, p_f32, p_f32,
        c_f32, c_f32, c_f32, c_i32, c_i32, p_f32, p_f32,
    ]
    lib.grt_ref_render.restype = c_i32
    _ref_lib = lib
    return _ref_lib


def ref_render_native(scene, origins, dirs, config, t_lo=None, t_hi=None):
    """Render rays through the C++ reference re-derivation (refmarch.cpp).

    Returns (rgb (R, 3), alpha (R,)) float32, or None when the native
    library cannot be built. Used only by the cross-validation tests."""
    lib = _load_ref()
    if lib is None:
        return None
    origins = np.ascontiguousarray(origins, np.float32).reshape(-1, 3)
    dirs = np.ascontiguousarray(dirs, np.float32).reshape(-1, 3)
    r = origins.shape[0]
    cvt = lambda a: np.ascontiguousarray(np.asarray(a), np.float32)
    means = cvt(scene.means)
    scales = cvt(scene.scales)
    quats = cvt(scene.quats)
    opac = cvt(scene.opacities)
    sh = cvt(scene.sh)
    n, K = sh.shape[0], sh.shape[1]
    lo = np.full(r, config.t_min if t_lo is None else t_lo, np.float32)
    hi = np.full(r, config.t_max if t_hi is None else t_hi, np.float32)
    rgb = np.empty((r, 3), np.float32)
    alpha = np.empty((r,), np.float32)
    rc = lib.grt_ref_render(
        _fptr(means), _fptr(scales), _fptr(quats), _fptr(opac), _fptr(sh),
        n, K, _fptr(origins), _fptr(dirs), r, _fptr(lo), _fptr(hi),
        config.alpha_min, config.alpha_clamp, config.min_transmittance,
        config.hit_multiplicity, config.sh_degree, _fptr(rgb), _fptr(alpha),
    )
    if rc != 0:
        return None
    return rgb, alpha


def argsort_u64(keys: np.ndarray) -> np.ndarray:
    keys = np.ascontiguousarray(keys, np.uint64)
    lib = _load()
    if lib is not None:
        n = keys.shape[0]
        out = np.empty(n, np.int64)
        lib.grt_argsort_u64(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    return np.argsort(keys, kind="stable")
