"""ctypes bindings for the native (C++) host data-path.

Builds hashnerf_tpu/native/raypool.cpp into a cached shared object on first
use (g++ -O3, no external deps) and exposes:

  build_ray_pool(poses, images, K, seed, shuffle)  -> (N*H*W, 3, 3) float32
  shuffle_rows(pool, seed)                         -> permuted copy

Falls back to the numpy implementations when no C++ toolchain is available
(native_available() reports which path is active).
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "raypool.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return None
    so_path = os.path.join(_HERE, "_raypool.so")
    if (not os.path.exists(so_path)) or (
        os.path.getmtime(so_path) < os.path.getmtime(_SRC)
    ):
        with tempfile.TemporaryDirectory() as td:
            tmp_so = os.path.join(td, "_raypool.so")
            cmd = [
                gxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, "-o", tmp_so,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            shutil.move(tmp_so, so_path)
    lib = ctypes.CDLL(so_path)
    i64, u64, i32 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_int
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.hn_build_ray_pool.argtypes = [fp, fp, fp, i64, i64, i64, fp, u64, i32, i32]
    lib.hn_build_ray_pool.restype = None
    lib.hn_shuffle_rows.argtypes = [fp, fp, i64, i64, u64, i32]
    lib.hn_shuffle_rows.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_lib()
            except Exception:
                _LIB = None
        return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def build_ray_pool(
    poses: np.ndarray,  # (N, 3, 4)
    images: np.ndarray,  # (N, H, W, 3)
    K: np.ndarray,  # (3, 3)
    seed: int = 0,
    shuffle: bool = True,
    threads: int = 0,
) -> np.ndarray:
    """Fused [origin, direction, rgb] pool over all pixels of all images."""
    n, h, w = images.shape[:3]
    poses = np.ascontiguousarray(poses[:, :3, :4], np.float32)
    images = np.ascontiguousarray(images[..., :3], np.float32)
    K = np.ascontiguousarray(K, np.float32)
    lib = _get_lib()
    if lib is None:
        return _numpy_build(poses, images, K, seed, shuffle)
    out = np.empty((n * h * w, 3, 3), np.float32)
    threads = threads or (os.cpu_count() or 1)
    lib.hn_build_ray_pool(
        poses, images, K, n, h, w, out.reshape(-1), seed, int(shuffle), threads
    )
    return out


def shuffle_rows(pool: np.ndarray, seed: int = 0, threads: int = 0) -> np.ndarray:
    lib = _get_lib()
    flat = np.ascontiguousarray(pool.reshape(pool.shape[0], -1), np.float32)
    if lib is None:
        rng = np.random.default_rng(seed)
        return flat[rng.permutation(flat.shape[0])].reshape(pool.shape)
    out = np.empty_like(flat)
    threads = threads or (os.cpu_count() or 1)
    lib.hn_shuffle_rows(
        flat.reshape(-1), out.reshape(-1), flat.shape[0], flat.shape[1], seed, threads
    )
    return out.reshape(pool.shape)


def _numpy_build(poses, images, K, seed, shuffle):
    from hashnerf_tpu.ops.rays import get_rays_np

    n, h, w = images.shape[:3]
    rays = np.stack([np.stack(get_rays_np(h, w, K, p), 0) for p in poses], 0)
    pool = np.concatenate([rays, images[:, None]], 1)
    pool = np.transpose(pool, [0, 2, 3, 1, 4]).reshape(-1, 3, 3).astype(np.float32)
    if shuffle:
        rng = np.random.default_rng(seed)
        pool = pool[rng.permutation(pool.shape[0])]
    return pool
