"""Device-side data augmentation (replaces the host NumPy loops of
``utils/utils.py:582-645``).

All ops are pure functions of a PRNG key and jit-safe: the reference rotates each
window in a Python loop on the host every step (``train_pointnet-attention.py:403``);
here rotation is one fused elementwise program inside the train step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rotation_matrix_z(angle: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplied z-rotation matrix matching rotate_point_cloud_z
    (utils/utils.py:582-604: ``pc @ [[c, s, 0], [-s, c, 0], [0, 0, 1]]``)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def rotate_z(
    points: jnp.ndarray,  # [..., N, F] with xyz in the first 3 features
    key: Optional[jax.Array] = None,
    angle: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rotate xyz about the z axis by a single shared angle (the reference draws one
    angle per batch, train_pointnet-attention.py:393)."""
    if angle is None:
        angle = jax.random.uniform(key, ()) * 2 * jnp.pi
    rot = rotation_matrix_z(angle).astype(points.dtype)
    xyz = points[..., :3] @ rot
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def shuffle_points(
    points: jnp.ndarray,  # [..., N, F]
    labels: jnp.ndarray,  # [..., N]
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permute the point axis with one shared permutation (shuffle_data,
    utils/utils.py:607-617). A no-op for the permutation-invariant encoder; kept for
    order-sensitive consumers (FPS seeding, visual diffing)."""
    n = points.shape[-2]
    idx = jax.random.permutation(key, n)
    return jnp.take(points, idx, axis=-2), jnp.take(labels, idx, axis=-1)


def jitter(points: jnp.ndarray, key: jax.Array, sigma: float = 0.01,
           clip: float = 0.05) -> jnp.ndarray:
    """Per-point Gaussian jitter on xyz (reference jitter_point_cloud,
    utils/utils.py:957-974 — unused there, first-class here)."""
    noise = jnp.clip(sigma * jax.random.normal(key, points[..., :3].shape), -clip, clip)
    return points.at[..., :3].add(noise.astype(points.dtype))


def random_scale(points: jnp.ndarray, key: jax.Array, lo: float = 0.8,
                 hi: float = 1.25) -> jnp.ndarray:
    """Shared random xyz scale (reference random_scale_point_cloud,
    utils/utils.py:995-1011)."""
    s = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return points.at[..., :3].multiply(s.astype(points.dtype))


def random_shift(points: jnp.ndarray, key: jax.Array, rng: float = 0.1) -> jnp.ndarray:
    """Shared random xy/z translation (reference shift_point_cloud,
    utils/utils.py:977-992)."""
    shift = jax.random.uniform(key, (3,), minval=-rng, maxval=rng)
    return points.at[..., :3].add(shift.astype(points.dtype))


def random_point_dropout(
    points: jnp.ndarray,  # [..., N, F]
    key: jax.Array,
    max_dropout: float = 0.875,
    labels: Optional[jnp.ndarray] = None,  # [..., N]
):
    """Randomly replace a fraction of points with the first point — static-shape
    dropout matching reference random_point_dropout (utils/utils.py:940-954).

    For per-point tasks pass ``labels``: dropped points take the FIRST point's
    label along with its coordinates (supervising a duplicated point with the
    replaced point's label would corrupt segmentation training); returns
    ``(points, labels)`` in that case."""
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, ()) * max_dropout
    drop = jax.random.uniform(k2, points.shape[:-1]) < ratio
    first = jnp.broadcast_to(points[..., :1, :], points.shape)
    out = jnp.where(drop[..., None], first, points)
    if labels is None:
        return out
    first_lbl = jnp.broadcast_to(labels[..., :1], labels.shape)
    return out, jnp.where(drop, first_lbl, labels)


def shuffle_windows(
    points: jnp.ndarray,  # [B, W, N, F]
    labels: jnp.ndarray,  # [B, W, N]
    key: jax.Array,
    centroids: Optional[jnp.ndarray] = None,  # [B, W, 2]
):
    """Permute the window axis with one shared permutation (shuffle_clusters,
    utils/utils.py:620-632). Order matters for the GRU context variant."""
    w = points.shape[1]
    idx = jax.random.permutation(key, w)
    out = (jnp.take(points, idx, axis=1), jnp.take(labels, idx, axis=1))
    if centroids is not None:
        out = out + (jnp.take(centroids, idx, axis=1),)
    return out
