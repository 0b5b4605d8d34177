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
