"""ctypes bindings for the native host-preprocessing library (csrc/).

The TPU compute path is JAX/XLA; this module accelerates host-side dataset
synthesis — KL diffusivity-field batches (reference
DiffNet/datasets/parametric/klsum.py:11-45 loops generate_diffusivity_tensor
over up to 65536 Sobol samples at load time) and host-side generalized
winding numbers (reference IBN_2D.py:89-104).

The shared library is built on first use with g++ (-O3 -fopenmp) and cached
next to the source; every entry point has a pure-numpy fallback with
identical semantics (pinned by tests/test_native.py), so the package works
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "gather_batch", "kl_diffusivity_batch",
           "winding_number_2d_host", "winding_number_3d_host"]

_SRC = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "csrc", "diffnet_host.cpp"))
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "_build", "libdiffnet_host.so")
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    # compile to a private temp path and rename into place (atomic on the
    # same filesystem): a concurrent first-use in another process must
    # never CDLL a half-written .so
    tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DIFFNET_NO_NATIVE"):
        return None
    try:
        fresh = (os.path.exists(_LIB_PATH)
                 and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC))
        if not fresh and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, dbl = ctypes.c_int64, ctypes.c_double
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.dn_kl_diffusivity_2d.argtypes = [f64p, dbl, f64p, i64, i64, i64, f32p]
    lib.dn_winding_2d.argtypes = [f32p, f32p, f32p, i64, i64, f32p, i64, f32p]
    lib.dn_winding_3d.argtypes = [f32p, f32p, f32p, i64, i64, f32p, i64, f32p]
    lib.dn_gather_rows.argtypes = [u8p, i64p, i64, i64, u8p]
    lib.dn_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def kl_diffusivity_batch(coeffs, n: int, eta: float = 0.5,
                         n_sum_nu: int = 6) -> np.ndarray:
    """Batched ``exp(KL_sum_2D)`` diffusivity fields: ``[B, 6ish] -> [B,n,n]``
    float32. Semantics of :func:`data.gen_input.generate_diffusivity_tensor`
    applied per row (coeffs padded/truncated to 6 terms, terms beyond
    `n_sum_nu` zeroed); native OpenMP path when available, numpy fallback."""
    from ..data.gen_input import (calculate_omega_based_on_eta,
                                  construct_KL_sum_2D, grid2D)

    coeffs = np.atleast_2d(np.asarray(coeffs, np.float64))
    B = coeffs.shape[0]
    c6 = np.zeros((B, 6))
    k = min(6, coeffs.shape[1], n_sum_nu)
    c6[:, :k] = coeffs[:, :k]
    lib = _load()
    if lib is None:
        # same math, numpy — including eta (generate_diffusivity_tensor
        # hardcodes eta=0.5, so it cannot serve as the fallback here)
        xv, yv = grid2D(n, n)
        return np.stack([
            np.exp(construct_KL_sum_2D(xv, yv, c, eta_x=eta, eta_y=eta))
            for c in c6]).astype(np.float32)
    omega = np.ascontiguousarray(
        calculate_omega_based_on_eta(float(eta))[:6], np.float64)
    assert c6.shape[1] <= 16, "dn_kl_diffusivity_2d supports <= 16 terms"
    out = np.empty((B, n, n), np.float32)
    lib.dn_kl_diffusivity_2d(omega, float(eta), np.ascontiguousarray(c6),
                             B, n, 6, out)
    return out


def gather_batch(src: np.ndarray, idx) -> np.ndarray:
    """Batched sample gather ``src[idx]`` for a contiguous row-major sample
    store — the loader's batch-assembly hot path (one threaded memcpy per
    sample instead of a Python per-item ``__getitem__`` loop + np.stack;
    the reference delegates this to torch DataLoader workers, base.py:18).
    Any dtype/trailing shape; numpy fancy-index fallback."""
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(np.asarray(idx, np.int64))
    assert idx.ndim == 1
    if idx.size and (idx.min() < 0 or idx.max() >= src.shape[0]):
        raise IndexError("gather_batch index out of range")
    lib = _load()
    if lib is None or src.shape[0] == 0 or idx.size == 0:
        return src[idx]
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    out = np.empty((idx.size,) + src.shape[1:], src.dtype)
    lib.dn_gather_rows(src.view(np.uint8).reshape(src.shape[0], -1),
                       idx, idx.size, row_bytes,
                       out.view(np.uint8).reshape(idx.size, -1))
    return out


def _as_batched(points, normals, areas, nsd):
    p = np.asarray(points, np.float32)
    if p.ndim == 2:
        p = p[None]
    nrm = np.asarray(normals, np.float32).reshape(p.shape)
    a = np.asarray(areas, np.float32).reshape(p.shape[:2])
    assert p.shape[-1] == nsd
    return (np.ascontiguousarray(p), np.ascontiguousarray(nrm),
            np.ascontiguousarray(a))


def _winding_host(points, normals, areas, queries, nsd):
    p, nrm, a = _as_batched(points, normals, areas, nsd)
    q = np.ascontiguousarray(np.asarray(queries, np.float32))
    B, P = p.shape[:2]
    Q = q.shape[0]
    lib = _load()
    out = np.empty((B, Q), np.float32)
    if lib is not None:
        fn = lib.dn_winding_2d if nsd == 2 else lib.dn_winding_3d
        fn(p, nrm, a, B, P, q, Q, out)
        return out
    # numpy fallback — same chunked math as core/geometry.py
    eps = np.float32(1e-8)
    for b in range(B):
        d = p[b][None, :, :] - q[:, None, :]            # [Q, P, nsd]
        dot = np.sum(d * nrm[b][None], axis=-1)
        r2 = np.sum(d * d, axis=-1)
        if nsd == 2:
            out[b] = np.sum(a[b][None] * dot / (2 * np.pi * (r2 + eps)), -1)
        else:
            r = np.sqrt(r2 + eps)
            out[b] = np.sum(a[b][None] * dot / (4 * np.pi * r**3), -1)
    return out


def winding_number_2d_host(points, normals, areas, queries) -> np.ndarray:
    """Host-side generalized winding number (2D); same math as
    :func:`core.geometry.winding_number_2d` but on CPU threads — for dataset
    precomputation without occupying the TPU. ``[B?,P,2] x [Q,2] -> [B,Q]``."""
    return _winding_host(points, normals, areas, queries, 2)


def winding_number_3d_host(points, normals, areas, queries) -> np.ndarray:
    """Host-side generalized winding number (3D / solid angle)."""
    return _winding_host(points, normals, areas, queries, 3)
