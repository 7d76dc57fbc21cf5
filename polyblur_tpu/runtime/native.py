"""ctypes bindings + build for the native host runtime (csrc/host_runtime.cpp).

The shared library is compiled on first use with g++ (no pybind11; plain C
ABI). Every entry point has a NumPy fallback, so the package works even
where no compiler is available — the native path is a host-throughput
optimization, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["load_library", "native_available", "extract_tiles",
           "overlap_add_host", "decode_image", "batch_decode"]

_CSRC = os.path.join(os.path.dirname(__file__), "csrc", "host_runtime.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_host_runtime.so")
_lock = threading.Lock()
_lib = None
_tried = False

_I64P = ctypes.POINTER(ctypes.c_int64)
_F32P = ctypes.POINTER(ctypes.c_float)


_HASH_PATH = _LIB_PATH + ".srchash"


def _src_hash() -> str:
    import hashlib

    with open(_CSRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _CSRC, "-o", _LIB_PATH, "-lpng", "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        with open(_HASH_PATH, "w") as f:
            f.write(_src_hash())
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _cached_binary_fresh() -> bool:
    """A cached .so is used only if its recorded source hash matches the
    reviewed C++ source. (mtimes are meaningless after a clone, and a
    foreign/committed binary must never be dlopen'd — ADVICE r1.)"""
    if not os.path.exists(_LIB_PATH) or not os.path.exists(_HASH_PATH):
        return False
    try:
        with open(_HASH_PATH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _cached_binary_fresh():
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.extract_tiles_f32.argtypes = [_F32P, _F32P] + [ctypes.c_int64] * 8 \
            + [_I64P] + [ctypes.c_int64] * 3
        lib.extract_tiles_f32.restype = None
        lib.overlap_add_f32.argtypes = [_F32P, _F32P, _F32P] \
            + [ctypes.c_int64] * 8 + [_I64P] + [ctypes.c_int64] * 3
        lib.overlap_add_f32.restype = None
        lib.image_probe.argtypes = [ctypes.c_char_p, _I64P, _I64P, _I64P]
        lib.image_probe.restype = ctypes.c_int
        lib.image_decode.argtypes = [ctypes.c_char_p, _F32P] \
            + [ctypes.c_int64] * 3
        lib.image_decode.restype = ctypes.c_int
        lib.batch_decode.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int64, _F32P] \
            + [ctypes.c_int64] * 3
        lib.batch_decode.restype = ctypes.c_int
        lib.omp_max_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


def extract_tiles(img: np.ndarray, grid) -> np.ndarray:
    """(B, C, H, W) f32 -> (T*B, C, ph, pw) tile batch for a PatchGrid.

    Native-threaded version of patches.extract_patches for host-side
    staging (identical output, tested)."""
    lib = load_library()
    b, c, h, w = img.shape
    ph, pw = grid.patch_size
    hp, wp = grid.padded_size
    pt, _, pl_, _ = grid.pad
    coords = np.asarray(grid.coords, np.int64).reshape(-1, 2)
    n_tiles = len(coords)
    if lib is None:
        from ..patches import extract_patches
        import jax.numpy as jnp

        return np.asarray(extract_patches(jnp.asarray(img), grid))
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty((n_tiles * b, c, ph, pw), np.float32)
    lib.extract_tiles_f32(_f32p(img), _f32p(out), b, c, h, w, hp, wp,
                          pt, pl_, _i64p(coords), n_tiles, ph, pw)
    return out


def overlap_add_host(tiles: np.ndarray, grid, batch: int,
                     window: np.ndarray) -> np.ndarray:
    """(T*B, C, ph, pw) f32 -> (B, C, h, w) windowed overlap-add."""
    lib = load_library()
    ph, pw = grid.patch_size
    hp, wp = grid.padded_size
    h, w = grid.orig_size
    pt, _, pl_, _ = grid.pad
    coords = np.asarray(grid.coords, np.int64).reshape(-1, 2)
    c = tiles.shape[1]
    if lib is None:
        from ..patches import overlap_add
        import jax.numpy as jnp

        return np.asarray(overlap_add(jnp.asarray(tiles), grid, batch))
    tiles = np.ascontiguousarray(tiles, np.float32)
    window = np.ascontiguousarray(window, np.float32)
    out = np.empty((batch, c, h, w), np.float32)
    lib.overlap_add_f32(_f32p(tiles), _f32p(window), _f32p(out), batch, c,
                        h, w, hp, wp, pt, pl_, _i64p(coords),
                        len(coords), ph, pw)
    return out


def decode_image(path: str, gray: bool = False) -> np.ndarray:
    """PNG/JPEG -> float32 (H, W, C) in [0, 1]; native with PIL fallback."""
    lib = load_library()
    if lib is None:
        from ..utils.io import imread_float

        img = imread_float(path)
        if gray and img.ndim == 3:
            img = img.mean(axis=-1)
        return img
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    c = ctypes.c_int64()
    rc = lib.image_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c))
    if rc != 0:
        raise IOError(f"cannot probe image {path!r} (rc={rc})")
    ch = 1 if gray else c.value
    out = np.empty((h.value, w.value, ch), np.float32)
    rc = lib.image_decode(path.encode(), _f32p(out), h.value, w.value, ch)
    if rc != 0:
        raise IOError(f"cannot decode image {path!r} (rc={rc})")
    return out[..., 0] if ch == 1 else out


def batch_decode(paths, h: int, w: int, c: int = 3) -> np.ndarray:
    """Decode n same-shaped images in parallel -> (n, h, w, c) f32."""
    lib = load_library()
    if lib is None:
        return np.stack([decode_image(p) for p in paths])
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    out = np.empty((len(paths), h, w, c), np.float32)
    failures = lib.batch_decode(arr, len(paths), _f32p(out), h, w, c)
    if failures:
        raise IOError(f"{failures} images failed to decode")
    return out
