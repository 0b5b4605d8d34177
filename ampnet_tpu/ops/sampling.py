"""Point resampling ops: fixed-size random resampling and farthest-point sampling.

Replaces the host-side NumPy paths of the reference:

* random sample / duplicate to a fixed point count — ``datasets.py:80-89`` and
  ``collate_fns.py:33-41``;
* O(N·S) farthest-point-sampling loop — ``utils/utils.py:889-933``.

FPS is expressed as a ``lax.fori_loop`` over S steps with an O(N) distance update per
step — the whole loop compiles into one XLA program (no host round-trips), and the
distance update is a fused VPU kernel. For very large N the dominant cost is HBM
bandwidth on the [N, 3] distance sweep, which this formulation reads exactly once per
step — the same asymptotics as the best published TPU-side FPS variants.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def resample_to_fixed_size(
    points: jnp.ndarray,  # [N, F]
    n_out: int,
    key: jax.Array,
    valid_mask: Optional[jnp.ndarray] = None,  # [N] True = real point
) -> jnp.ndarray:
    """Random-sample down / duplicate up to exactly ``n_out`` points (jit-safe).

    Matches the reference's semantics (sample without replacement when N > n_out,
    duplicate random points when N < n_out) on a static-shape input with an optional
    validity mask for padded inputs.

    Contract: ``valid_mask`` must mark at least one point. An all-False mask
    cannot raise under jit (data-dependent) — it would return ``n_out`` copies
    of an arbitrary padding point, so callers must guard it host-side (this
    repo's batchers never emit empty clouds).
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)
    n_valid = valid_mask.sum()

    # scores: valid points get random priority, invalid -inf → never picked first
    scores = jnp.where(valid_mask, jax.random.uniform(key, (n,)), -jnp.inf)
    order = jnp.argsort(-scores)  # valid points in random order, then invalid
    # index i picks order[i % n_valid]: downsample = first n_out random valids,
    # upsample = wrap around (duplicates random valid points)
    pick = order[jnp.arange(n_out) % jnp.maximum(n_valid, 1)]
    return points[pick]


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    points: jnp.ndarray,  # [N, >=3] — first 3 columns are xyz (utils.py:894)
    n_samples: int,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Indices of ``n_samples`` farthest points; deterministic, starts at index 0
    like the reference (utils/utils.py:907-908)."""
    xyz = points[:, :3].astype(jnp.float32)
    n = xyz.shape[0]
    big = jnp.asarray(jnp.inf, jnp.float32)
    dists = jnp.full((n,), big)
    if valid_mask is not None:
        dists = jnp.where(valid_mask, dists, -big)
    start = 0 if valid_mask is None else jnp.argmax(valid_mask).astype(jnp.int32)

    def body(i, carry):
        dists, selected, last = carry
        # distance of every point to the most recently selected point
        d = jnp.sum(jnp.square(xyz - xyz[last]), axis=-1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists).astype(jnp.int32)
        selected = selected.at[i].set(nxt)
        return dists, selected, nxt

    selected = jnp.zeros((n_samples,), jnp.int32).at[0].set(start)
    _, selected, _ = jax.lax.fori_loop(1, n_samples, body, (dists, selected, start))
    return selected


def fps_points(points: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Gathered FPS subset, mirroring the reference's return-points API
    (utils/utils.py:933)."""
    return points[farthest_point_sampling(points, n_samples)]
