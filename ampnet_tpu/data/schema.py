"""Canonical point-cloud schema and label remapping.

The reference preprocessing emits a 13-column float array per point
(``data_proc/2_preprocessing_filter_norm.py:76-86``)::

    0 x        normalized to [0,1] within the window (later re-scaled to [-1,1])
    1 y        normalized to [0,1]
    2 z        HeightAboveGround / max_height (clipped to [0,1])
    3 class    raw ASPRS-ish class id (15 tower, 14 lines, 3/4/5 vegetation, ...)
    4 I        intensity / 5000, clipped to [0,1]
    5 R        red   / 65536
    6 G        green / 65536
    7 B        blue  / 65536
    8 NIR      nir / 65535
    9 NDVI     (NIR - R) / (NIR + R), clipped to [0,1]
   10 x_raw    original easting  (metres)
   11 y_raw    original northing (metres)
   12 z_raw    original HeightAboveGround (metres)

Model input is 9 features ``[x,y,z,I,R,G,B,NIR,NDVI]`` — columns [0:3] + [4:10]
(``pointNet/datasets.py:359,186``).

Segmentation label remap (``pointNet/datasets.py:432-460``, done with a ×100 trick in
the reference; here a vectorized table lookup):

    15 → 1 (tower)   14 → 2 (power lines)   3,4 → 3 (low/med veg)   5 → 4 (high veg)
    everything else → 0 (background)

Classification label: 1 iff class 15 or 14 present (``datasets.py:417-429``).
"""

from __future__ import annotations

from typing import Union

import numpy as np

try:  # jax optional here: the data layer also runs in pure-NumPy host pipelines
    import jax.numpy as jnp

    _JNP_TYPES: tuple = (jnp.ndarray,)
except Exception:  # pragma: no cover
    jnp = None
    _JNP_TYPES = ()

Array = Union[np.ndarray, "jnp.ndarray"]


class COL:
    """Column indices of the canonical 13-column schema."""

    X, Y, Z, CLASS, I, R, G, B, NIR, NDVI, X_RAW, Y_RAW, Z_RAW = range(13)


NUM_CANONICAL_COLS = 13
MODEL_FEATURE_COLS = (COL.X, COL.Y, COL.Z, COL.I, COL.R, COL.G, COL.B, COL.NIR, COL.NDVI)

# classes the datasets drop at load time. The reference's LidarKmeansDataset /
# LidarDatasetExpanded additionally drop class 14 — POWER LINES — from TRAINING data
# (datasets.py:339-350) while the test loader keeps and evaluates it
# (datasets.py:503): a model trained through that path can never learn the cables
# class. We default to keeping 14 (the obviously intended behavior; measured: cables
# IoU goes from 0.00 to nonzero) and expose REFERENCE_NOISE_CLASSES for
# bug-compatible loading (SURVEY.md §7 hard-part 6: document, don't silently copy).
DATASET_NOISE_CLASSES = (30, 7, 2, 8, 13)
REFERENCE_NOISE_CLASSES = (30, 7, 2, 8, 13, 14)
# classes dropped in offline preprocessing (2_preprocessing_filter_norm.py:41-48)
PREPROC_DROP_CLASSES = (2, 7, 8, 13, 24, 30)

SEG_CLASS_NAMES = ("background", "tower", "lines", "low_med_veg", "high_veg")
NUM_SEG_CLASSES = 5

# raw-class → segmentation-class lookup (dense table over raw ids 0..255)
_REMAP_TABLE = np.zeros(256, dtype=np.int32)
_REMAP_TABLE[15] = 1
_REMAP_TABLE[14] = 2
_REMAP_TABLE[3] = 3
_REMAP_TABLE[4] = 3
_REMAP_TABLE[5] = 4


def _xp(a: Array):
    if _JNP_TYPES and isinstance(a, _JNP_TYPES):
        return jnp
    return np


def remap_segmentation_labels(raw_class: Array) -> Array:
    """Vectorized remap of raw class ids to the 5 segmentation classes.

    Negative ids (padding sentinels) are preserved so the loss's ignore_index=-1
    semantics survive remapping.
    """
    xp = _xp(raw_class)
    ids = xp.asarray(raw_class)
    ids_int = xp.clip(ids, 0, 255).astype(xp.int32)
    table = xp.asarray(_REMAP_TABLE)
    out = xp.take(table, ids_int, axis=0)
    return xp.where(xp.asarray(ids) < 0, xp.full_like(out, -1), out)


def classification_label(raw_class: Array) -> int:
    """Binary tower-presence label: 1 iff any point has class 15 or 14
    (datasets.py:424-429)."""
    xp = _xp(raw_class)
    ids = xp.asarray(raw_class)
    has = xp.any((ids == 15) | (ids == 14))
    return has.astype(xp.int32)


def select_model_features(pc: Array, extra_features: int = 0) -> Array:
    """Drop the class + raw-coordinate columns → the 9 model features
    [x,y,z,I,R,G,B,NIR,NDVI] (datasets.py:359).

    ``extra_features > 0`` additionally appends that many columns from 13
    onward — the offline geometric eigenfeatures (preproc/geomfeat.py), a
    beyond-reference feature set. Raises if the artifact was preprocessed
    without them."""
    xp = _xp(pc)
    parts = [pc[..., 0:3], pc[..., 4:10]]
    if extra_features:
        end = NUM_CANONICAL_COLS + extra_features
        if pc.shape[-1] < end:
            raise ValueError(
                f"artifact has {pc.shape[-1]} columns but the model wants "
                f"{extra_features} geometric feature columns (13..{end - 1}) — "
                "re-run `ampnet preprocess --geom_features` on this dataset"
            )
        parts.append(pc[..., NUM_CANONICAL_COLS:end])
    return xp.concatenate(parts, axis=-1)


def normalize_xy_neg_one(pc: Array) -> Array:
    """x,y ∈ [0,1] → [-1,1] (pc_normalize_neg_one, datasets.py:372-384). Returns a new
    array (no in-place mutation — jit-safe)."""
    xp = _xp(pc)
    scale = xp.asarray([2.0, 2.0] + [1.0] * (pc.shape[-1] - 2), dtype=pc.dtype)
    shift = xp.asarray([-1.0, -1.0] + [0.0] * (pc.shape[-1] - 2), dtype=pc.dtype)
    return pc * scale + shift


def drop_noise_points(pc: np.ndarray, noise_classes=DATASET_NOISE_CLASSES) -> np.ndarray:
    """Host-side removal of noise-class points from an [N, 13] (or [N, C, W]) array.
    For windowed arrays the reference deletes the whole point row if ANY window copy
    has a noise class (datasets.py:339-350) — we match that."""
    cls = pc[:, COL.CLASS]
    if cls.ndim == 2:  # [N, W] windowed layout
        bad = np.isin(cls, noise_classes).any(axis=1)
    else:
        bad = np.isin(cls, noise_classes)
    return pc[~bad]
