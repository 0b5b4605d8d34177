"""Sequential (non-k-means) window tiling — the legacy tilers of
``utils/utils.py:30-419`` (``split4classif_point_cloud``, ``split4segmen_point_cloud``,
``split4segmen_test``, ``split4cls_kmeans``, ``split4cls_rdm``), superseded in the
reference by the offline k-means stage but still part of its API surface.

One vectorized function replaces the whole family: a batch of clouds is chopped into
consecutive fixed-size windows along the point axis, with the reference's fill
policies for ragged tails ("duplicate" random points from the cloud, or "zero"
padding with −1 targets). No per-batch Python loops — everything is one reshape +
gather, jit-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sequential_tiling(
    points: jnp.ndarray,  # [B, N, F]
    targets: jnp.ndarray,  # [B, N] with −1 marking pre-padded slots
    n_points: int,
    key: Optional[jax.Array] = None,
    fill: str = "duplicate",  # 'duplicate' | 'zero' (reference duplicate=True/False)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (windows [B, W, n_points, F], window_targets [B, W, n_points]) where
    W = N // n_points (the reference drops the last unfillable window,
    utils.py:115-117)."""
    b, n, f = points.shape
    w = n // n_points
    if w == 0:
        raise ValueError(f"cloud of {n} points smaller than one {n_points} window")
    m = w * n_points

    pts = points[:, :m]
    tgt = targets[:, :m]
    pad = tgt == -1

    if fill == "duplicate":
        if key is None:
            key = jax.random.PRNGKey(0)
        # replace padded slots with random real points of the same cloud
        n_valid = jnp.maximum((targets != -1).sum(axis=1), 1)  # [B]
        rand = jax.random.randint(key, (b, m), 0, n)
        rand = rand % n_valid[:, None]  # indices into the valid prefix
        repl_pts = jnp.take_along_axis(points, rand[..., None], axis=1)
        repl_tgt = jnp.take_along_axis(targets, rand, axis=1)
        pts = jnp.where(pad[..., None], repl_pts, pts)
        tgt = jnp.where(pad, repl_tgt, tgt)
    elif fill == "zero":
        pts = jnp.where(pad[..., None], 0.0, pts)
        # targets stay −1 → loss-ignored (reference utils.py:139-141)
    else:
        raise ValueError(f"unknown fill {fill!r}")

    return pts.reshape(b, w, n_points, f), tgt.reshape(b, w, n_points)
