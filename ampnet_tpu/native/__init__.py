"""Native (C++) host components, loaded via ctypes.

Provides the exact min-cost-flow balanced assignment (parity with the reference's
``KMeansConstrained`` solver), a full balanced k-means driver, and O(N·S) farthest
point sampling — the host-side counterparts of ops/kmeans.py and ops/sampling.py
for offline preprocessing where exactness and single-core speed matter more than
device residency.

The shared library builds on demand with the bundled Makefile (g++ only, no
external deps). Every entry point has a NumPy fallback so the framework works even
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libampnet_native.so")
_lib = None
_build_attempted = False


def _build() -> None:
    """Serialized on-demand build: an flock keeps concurrent processes (e.g.
    preprocess worker pools on a fresh clone) from racing g++ over the same
    output file and dlopen'ing a half-written .so."""
    import fcntl

    with open(os.path.join(_DIR, ".build.lock"), "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            if not os.path.exists(_LIB_PATH):  # a peer may have built it already
                subprocess.run(
                    ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
                )
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            _build()
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # corrupt/truncated .so: degrade to the NumPy fallbacks, never crash
        return None
    # a stale .so built before a newer symbol was added must degrade to the
    # NumPy fallbacks (return None), not crash every native entry point —
    # try one rebuild first
    try:
        return _bind(lib)
    except AttributeError:
        if not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "clean", "all"],
                    check=True, capture_output=True, timeout=120,
                )
                return _bind(ctypes.CDLL(_LIB_PATH))
            except Exception:
                return None
        return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    global _lib
    lib.ampnet_balanced_assign.restype = ctypes.c_int
    lib.ampnet_balanced_assign.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ampnet_balanced_kmeans.restype = ctypes.c_int
    lib.ampnet_balanced_kmeans.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ampnet_fps.restype = None
    lib.ampnet_fps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ampnet_fps_grid.restype = None
    lib.ampnet_fps_grid.argtypes = lib.ampnet_fps.argtypes
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def balanced_assign(cost: np.ndarray, capacities: np.ndarray) -> np.ndarray:
    """Exact min-cost assignment of N points to k capacitated clusters.
    cost: [N, k] float32; capacities: [k] with sum >= N. Returns [N] int32."""
    cost = np.ascontiguousarray(cost, np.float32)
    caps = np.ascontiguousarray(capacities, np.int32)
    n, k = cost.shape
    lib = _load()
    if lib is None:
        return _assign_fallback(cost, caps)
    out = np.empty(n, np.int32)
    rc = lib.ampnet_balanced_assign(
        _ptr(cost, ctypes.c_float), n, k, _ptr(caps, ctypes.c_int32),
        _ptr(out, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError(f"balanced_assign failed rc={rc}")
    return out


def balanced_kmeans_native(
    points: np.ndarray, k: int, capacities: np.ndarray, iters: int = 10, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Lloyd + exact balanced assignment, fully in C++. Returns (assign, centroids)."""
    pts = np.ascontiguousarray(points, np.float32)
    caps = np.ascontiguousarray(capacities, np.int32)
    n, d = pts.shape
    lib = _load()
    if lib is None:
        return _kmeans_fallback(pts, k, caps, iters, seed)
    assign = np.empty(n, np.int32)
    cents = np.empty((k, d), np.float32)
    rc = lib.ampnet_balanced_kmeans(
        _ptr(pts, ctypes.c_float), n, d, k, _ptr(caps, ctypes.c_int32), iters,
        seed, _ptr(assign, ctypes.c_int32), _ptr(cents, ctypes.c_float),
    )
    if rc != 0:
        raise RuntimeError(f"balanced_kmeans failed rc={rc}")
    return assign, cents


def mcf_balanced_assign(points: np.ndarray, k: int, size: int, seed: int = 0) -> np.ndarray:
    """Tiling entry point used by preproc/tiling.py: equal clusters of ``size``."""
    caps = np.full(k, size, np.int32)
    assign, _ = balanced_kmeans_native(points, k, caps, iters=10, seed=seed)
    return assign


def fps_native(points: np.ndarray, n_samples: int, method: str = "auto") -> np.ndarray:
    """Farthest-point-sampling indices (reference utils/utils.py:889-933 semantics).

    ``method``: 'naive' = O(N·S) scan; 'grid' = bbox-pruned bucketed scan with
    bit-identical results (FlashFPS-style pruning, PAPERS.md); 'auto' picks 'grid'
    for large offline tiles where pruning pays for its bucketing."""
    pts = np.ascontiguousarray(points, np.float32)
    n, d = pts.shape
    lib = _load()
    out = np.empty(n_samples, np.int32)
    if lib is None:
        from ampnet_tpu.ops.sampling import farthest_point_sampling
        import jax.numpy as jnp

        return np.asarray(farthest_point_sampling(jnp.asarray(pts), n_samples))
    if method == "auto":
        method = "grid" if n >= 16384 else "naive"
    fn = lib.ampnet_fps_grid if method == "grid" else lib.ampnet_fps
    fn(_ptr(pts, ctypes.c_float), n, d, n_samples, _ptr(out, ctypes.c_int32))
    return out


# ----------------------------- NumPy fallbacks --------------------------------


def _assign_fallback(cost: np.ndarray, caps: np.ndarray) -> np.ndarray:
    """Greedy regret-ordered feasible assignment + pairwise-swap refinement
    (near-optimal; used only when the C++ library can't be built)."""
    n, k = cost.shape
    if k == 1:  # np.partition(cost, 1) needs >= 2 columns; k=1 is trivial
        return np.zeros(n, np.int32)
    order = np.argsort(np.partition(cost, 1, axis=1)[:, 1] - cost.min(axis=1))[::-1]
    load = np.zeros(k, np.int64)
    assign = np.full(n, -1, np.int32)
    for i in order:
        for c in np.argsort(cost[i]):
            if load[c] < caps[c]:
                assign[i] = c
                load[c] += 1
                break
    for _ in range(20):  # 2-opt refinement
        improved = False
        for c1 in range(k):
            for c2 in range(c1 + 1, k):
                i1 = np.flatnonzero(assign == c1)
                i2 = np.flatnonzero(assign == c2)
                if not len(i1) or not len(i2):
                    continue
                gain1 = cost[i1, c2] - cost[i1, c1]
                gain2 = cost[i2, c1] - cost[i2, c2]
                a, b = np.argmin(gain1), np.argmin(gain2)
                if gain1[a] + gain2[b] < -1e-9:
                    assign[i1[a]], assign[i2[b]] = c2, c1
                    improved = True
        if not improved:
            break
    return assign


def _kmeans_fallback(pts, k, caps, iters, seed):
    rng = np.random.default_rng(seed)
    cents = pts[rng.permutation(len(pts))[:k]].copy()
    assign = None
    for _ in range(iters):
        cost = ((pts[:, None, :] - cents[None]) ** 2).sum(-1).astype(np.float32)
        assign = _assign_fallback(cost, caps)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = pts[m].mean(axis=0)
    return assign, cents
