"""Synthetic ALS-like scene generator.

The reference repo's LiDAR data is not distributable (its large blobs are absent from
the snapshot), so the framework ships a procedural generator producing clouds with the
same canonical 13-column schema and class structure: ground-level background, vertical
pylon clusters (class 15), catenary power-line arcs between pylons (class 14), and two
vegetation strata (3/4/5). Used by unit tests, benchmarks and the end-to-end demo
pipeline; real LAS tiles drop into the exact same code path via data/las_io.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ampnet_tpu.data.schema import COL, NUM_CANONICAL_COLS


def synthetic_scene(
    rng: np.random.Generator,
    n_points: int = 20000,
    extent_m: float = 100.0,
    n_pylons: int = 2,
    with_noise_classes: bool = False,
) -> np.ndarray:
    """One window-sized scene as a canonical [N, 13] array (normalized features)."""
    parts = []

    def feat_block(n, cls, x, y, z_m, nir_boost=0.0):
        pc = np.zeros((n, NUM_CANONICAL_COLS), np.float32)
        pc[:, COL.X] = x / extent_m
        pc[:, COL.Y] = y / extent_m
        pc[:, COL.Z] = np.clip(z_m, 0, 100.0) / 100.0
        pc[:, COL.CLASS] = cls
        pc[:, COL.I] = rng.uniform(0, 0.5, n)
        r = rng.uniform(0.1, 0.5, n)
        pc[:, COL.R] = r
        pc[:, COL.G] = rng.uniform(0.1, 0.5, n)
        pc[:, COL.B] = rng.uniform(0.1, 0.5, n)
        nir = np.clip(r + nir_boost + rng.normal(0, 0.05, n), 1e-3, 1.0)
        pc[:, COL.NIR] = nir
        pc[:, COL.NDVI] = np.clip((nir - r) / (nir + r), 0, 1)
        pc[:, COL.X_RAW] = x
        pc[:, COL.Y_RAW] = y
        pc[:, COL.Z_RAW] = np.clip(z_m, 0, 100.0)
        return pc

    n_bg = int(n_points * 0.35)
    n_low = int(n_points * 0.25)
    n_high = int(n_points * 0.25)
    n_tower = int(n_points * 0.08)
    n_lines = n_points - n_bg - n_low - n_high - n_tower
    if n_pylons == 0:
        # landscape scene (reference 'pc_' windows): no towers or lines — their
        # point budget folds into vegetation so classification datasets get
        # genuine negatives (LidarDataset.get_labels_cls semantics)
        n_low += n_tower
        n_high += n_lines
        n_tower = n_lines = 0

    # background clutter near ground
    parts.append(
        feat_block(
            n_bg,
            1,
            rng.uniform(0, extent_m, n_bg),
            rng.uniform(0, extent_m, n_bg),
            np.abs(rng.normal(0.5, 0.4, n_bg)),
        )
    )
    # low/medium vegetation: patchy, 0.5–6 m, high NDVI
    cx, cy = rng.uniform(0, extent_m, 8), rng.uniform(0, extent_m, 8)
    which = rng.integers(0, 8, n_low)
    parts.append(
        feat_block(
            n_low,
            rng.choice([3, 4], n_low),
            np.clip(cx[which] + rng.normal(0, 5, n_low), 0, extent_m),
            np.clip(cy[which] + rng.normal(0, 5, n_low), 0, extent_m),
            rng.uniform(0.5, 6.0, n_low),
            nir_boost=0.4,
        )
    )
    # high vegetation: tree crowns 8–25 m
    cx, cy = rng.uniform(0, extent_m, 6), rng.uniform(0, extent_m, 6)
    which = rng.integers(0, 6, n_high)
    parts.append(
        feat_block(
            n_high,
            5,
            np.clip(cx[which] + rng.normal(0, 4, n_high), 0, extent_m),
            np.clip(cy[which] + rng.normal(0, 4, n_high), 0, extent_m),
            rng.uniform(8.0, 25.0, n_high),
            nir_boost=0.5,
        )
    )
    # pylons: tight vertical columns up to ~30 m
    px = np.linspace(extent_m * 0.2, extent_m * 0.8, n_pylons)
    py = np.full(n_pylons, extent_m * 0.5)
    per = n_tower // max(n_pylons, 1)
    for i in range(n_pylons):
        k = per if i < n_pylons - 1 else n_tower - per * (n_pylons - 1)
        z = rng.uniform(0, 30.0, k)
        spread = 2.0 * (1.0 - z / 35.0)  # lattice narrows with height
        parts.append(
            feat_block(
                k,
                15,
                px[i] + rng.normal(0, 1, k) * spread,
                py[i] + rng.normal(0, 1, k) * spread,
                z,
            )
        )
    # power lines: catenary arcs between pylons (or a straight span if 1 pylon)
    t = rng.uniform(0, 1, n_lines)
    x0, x1 = (px[0], px[-1]) if n_pylons > 1 else (0.0, extent_m)
    sag = 4.0
    parts.append(
        feat_block(
            n_lines,
            14,
            x0 + t * (x1 - x0) + rng.normal(0, 0.2, n_lines),
            extent_m * 0.5 + rng.normal(0, 0.3, n_lines),
            28.0 - sag * 4 * t * (1 - t) + rng.normal(0, 0.2, n_lines),
        )
    )
    if with_noise_classes:
        n_noise = max(n_points // 50, 10)
        parts.append(
            feat_block(
                n_noise,
                rng.choice([7, 2, 8, 13, 30], n_noise),
                rng.uniform(0, extent_m, n_noise),
                rng.uniform(0, extent_m, n_noise),
                rng.uniform(0, 40, n_noise),
            )
        )
    pc = np.concatenate(parts, axis=0)
    return pc[rng.permutation(len(pc))]


def synthetic_batch(
    rng: np.random.Generator,
    batch_size: int = 2,
    max_windows: int = 9,
    n_points: int = 128,
    num_features: int = 9,
    real_windows: Optional[int] = None,
) -> dict:
    """A padded model-ready batch dict (float32/int32) with replicate-padded windows,
    −1-padded labels, centroids — the shape contract of data/pipeline.py."""
    pts = np.zeros((batch_size, max_windows, n_points, num_features), np.float32)
    lbl = np.full((batch_size, max_windows, n_points), -1, np.int32)
    cent = np.zeros((batch_size, max_windows, 2), np.float32)
    for b in range(batch_size):
        w_real = real_windows or int(rng.integers(1, max_windows + 1))
        for w in range(max_windows):
            src = min(w, w_real - 1)  # replicate-pad from the last real window
            if w < w_real:
                scene = synthetic_scene(rng, n_points=n_points + 7)
                sel = rng.permutation(len(scene))[:n_points]
                window = scene[sel]
                feats = np.concatenate([window[:, 0:3], window[:, 4:10]], axis=1)
                feats[:, 0] = feats[:, 0] * 2 - 1
                feats[:, 1] = feats[:, 1] * 2 - 1
                pts[b, w] = feats
                from ampnet_tpu.data.schema import remap_segmentation_labels

                lbl[b, w] = remap_segmentation_labels(window[:, 3])
                cent[b, w] = feats[:, :2].mean(axis=0)
            else:
                pts[b, w] = pts[b, src]
                cent[b, w] = cent[b, src]
                # labels stay −1: padding windows are masked from loss and attention
    return {"points": pts, "labels": lbl, "centroids": cent}
