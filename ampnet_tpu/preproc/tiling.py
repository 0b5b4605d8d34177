"""Stage 3 — offline balanced k-means tiling into exactly-``n_points`` windows
(``data_proc/3_kmeans.py:27-116``).

Reference semantics: k = ceil(N / n_points) capped at 9; if over the cap, random
sample down to 9·n_points; if under k·n_points, duplicate random points up; then
KMeansConstrained(size_min = size_max = n_points) on features (x, y, NDVI) — cols
[0, 1, 9] of the 13-column schema; output tensor [n_points, dims, k]. Clouds below
2·n_points become a single window (randomly sampled down to n_points if larger).

The constrained solve itself is our jitted balanced k-means (Lloyd + annealed
Sinkhorn + exact rounding, ops/kmeans.py) — replacing the host MCF solver with
device matmuls. The native C++ min-cost-flow solver (ampnet_tpu/native) is plugged in
via ``assigner='exact_mcf'`` when bit-faithful reference parity is wanted.
"""

from __future__ import annotations

import numpy as np

from ampnet_tpu.ops.kmeans import num_tiles_train

KMEANS_COLS = (0, 1, 9)  # x, y, NDVI of the 13-col schema (3_kmeans.py:81)


def kmeans_tile_cloud(
    pc: np.ndarray,  # [N, 13] canonical cloud
    n_points: int = 2048,
    max_clusters: int = 9,
    seed: int = 0,
    assigner: str = "sinkhorn",
) -> np.ndarray:
    """Returns the windowed tensor [n_points, dims, k] (reference artifact layout)."""
    rng = np.random.default_rng(seed)
    n = pc.shape[0]

    if n < 2 * n_points:  # single window (3_kmeans.py:108-115)
        if n > n_points:
            pc = pc[rng.permutation(n)[:n_points]]
        return np.ascontiguousarray(pc[:, :, None])

    k = num_tiles_train(n, n_points, max_clusters)
    target = k * n_points
    if n > target and k == max_clusters:  # over the cap: sample down (:57-62)
        pc = pc[rng.permutation(n)[:target]]
    elif n < target:  # duplicate up (:64-69)
        extra = rng.integers(0, n, target - n)
        pc = np.concatenate([pc, pc[extra]], axis=0)
    elif n > target:  # ceil() makes this impossible, but keep the reference's
        pc = pc[:target]  # trailing-points trim for safety (:71-73)

    feats = pc[:, KMEANS_COLS].astype(np.float32)
    if assigner == "exact_mcf":
        from ampnet_tpu.native import mcf_balanced_assign

        assign = mcf_balanced_assign(feats, k, n_points, seed=seed)
    else:
        import jax
        import jax.numpy as jnp

        from ampnet_tpu.ops.kmeans import balanced_kmeans

        assign, _ = balanced_kmeans(
            jnp.asarray(feats), k, jax.random.PRNGKey(seed), capacities=(n_points,) * k
        )
        assign = np.asarray(assign)

    order = np.argsort(assign, kind="stable")
    windows = pc[order].reshape(k, n_points, pc.shape[1])  # [k, n_points, dims]
    return np.ascontiguousarray(windows.transpose(1, 2, 0))  # [n_points, dims, k]
