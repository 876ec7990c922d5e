"""ctypes bindings for the native (C++) ray-store builder / cache packer.

Builds ``libraystore.so`` from raystore.cpp on first use (g++, one-time,
cached next to the source) and exposes:

  - :func:`build_ray_store_native`   — threaded ray expansion for N images
  - :func:`pack_ray_cache` / :func:`load_ray_cache_native` — single-file
    binary ray cache (fixed little-endian layout, one read per array)
  - :data:`available` — False when no toolchain is present; callers
    (nerf_tpu.data.rays_store) fall back to the numpy implementation.

The reference has no native data path (its one native piece is the
torchsearchsorted CUDA extension, requirements.txt:9, replaced here by the
Pallas/XLA sampler); this module is the framework's native-IO runtime
component for multi-GB caches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "raystore.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libraystore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", _LIB_PATH,
                    ],
                    check=True,
                    capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError, OSError):
                # A stale-but-loadable library is still usable; only give up
                # when there is nothing to load at all.
                if not os.path.exists(_LIB_PATH):
                    _build_failed = True
                    return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # Incompatible binary (foreign arch/libc from a checkout) —
            # fall back to the numpy path instead of raising.
            _build_failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.nerf_build_ray_store.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, f32p, f32p, f32p, ctypes.c_int,
        ]
        lib.nerf_build_ray_store.restype = None
        lib.nerf_pack_ray_cache.argtypes = [
            ctypes.c_char_p, f32p, f32p, f32p, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.nerf_pack_ray_cache.restype = ctypes.c_int
        lib.nerf_ray_cache_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            f32p, f32p, f32p,
        ]
        lib.nerf_ray_cache_info.restype = ctypes.c_int
        lib.nerf_load_ray_cache.argtypes = [
            ctypes.c_char_p, f32p, f32p, f32p, ctypes.c_uint64,
        ]
        lib.nerf_load_ray_cache.restype = ctypes.c_int
        _lib = lib
        return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    """True when the native library is (or can be) built and loaded."""
    return _load() is not None


def build_ray_store_native(
    poses: np.ndarray,
    images: Optional[np.ndarray],
    height: int,
    width: int,
    focal: float,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Threaded C++ ray expansion.

    poses: (N, 3, 4) float32 c2w; images: (N, H, W, 3) float32 or None.
    Returns (ray_origins, ray_directions, targets) each (N*H*W, 3) float32
    (targets None when images is None).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native raystore library unavailable")
    poses = np.ascontiguousarray(poses[:, :3, :4], np.float32)
    n = poses.shape[0]
    total = n * height * width
    ro = np.empty((total, 3), np.float32)
    rd = np.empty((total, 3), np.float32)
    rgb = None
    img_ptr = None
    if images is not None:
        images = np.ascontiguousarray(images[..., :3], np.float32)
        rgb = np.empty((total, 3), np.float32)
        img_ptr = _f32p(images)
    lib.nerf_build_ray_store(
        _f32p(poses), img_ptr, n, height, width, float(focal),
        _f32p(ro), _f32p(rd), None if rgb is None else _f32p(rgb),
        int(num_threads),
    )
    return ro, rd, rgb


def pack_ray_cache(
    path: str,
    ray_origins: np.ndarray,
    ray_directions: np.ndarray,
    targets: np.ndarray,
    height: int,
    width: int,
    focal: float,
    near: float,
    far: float,
) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native raystore library unavailable")
    ro = np.ascontiguousarray(ray_origins, np.float32)
    rd = np.ascontiguousarray(ray_directions, np.float32)
    rgb = np.ascontiguousarray(targets, np.float32)
    rc = lib.nerf_pack_ray_cache(
        path.encode(), _f32p(ro), _f32p(rd), _f32p(rgb),
        ro.shape[0], height, width, float(focal), float(near), float(far),
    )
    if rc != 0:
        raise IOError(f"nerf_pack_ray_cache failed with code {rc} for {path}")


def load_ray_cache_native(path: str):
    """Load a binary ray cache. Returns (ro, rd, targets, meta dict)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native raystore library unavailable")
    num_rays = ctypes.c_uint64()
    height = ctypes.c_uint32()
    width = ctypes.c_uint32()
    focal = ctypes.c_float()
    near = ctypes.c_float()
    far = ctypes.c_float()
    rc = lib.nerf_ray_cache_info(
        path.encode(), ctypes.byref(num_rays), ctypes.byref(height),
        ctypes.byref(width), ctypes.byref(focal), ctypes.byref(near),
        ctypes.byref(far),
    )
    if rc != 0:
        raise IOError(f"invalid ray cache {path} (code {rc})")
    n = int(num_rays.value)
    ro = np.empty((n, 3), np.float32)
    rd = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    rc = lib.nerf_load_ray_cache(path.encode(), _f32p(ro), _f32p(rd), _f32p(rgb), n)
    if rc != 0:
        raise IOError(f"nerf_load_ray_cache failed with code {rc} for {path}")
    meta = {
        "height": int(height.value),
        "width": int(width.value),
        "focal": float(focal.value),
        "near": float(near.value),
        "far": float(far.value),
    }
    return ro, rd, rgb, meta
