"""Full-density local geometric (eigen) features — offline preprocessing stage.

No reference counterpart: the reference's model inputs are the 9 radiometric/
positional columns only (``data_proc/2_preprocessing_filter_norm.py:76-86``).
The round-3 error anatomy (BASELINE.md "Error anatomy") showed the remaining
benchmark errors are *geometric* — boundary points with two-way tower↔lines
confusion — and the offline tiler throws away most of the density the geometry
lives in (12k-point windows sample down to k·256, preproc/tiling.py). This
stage computes, per point, classic ALS covariance eigenfeatures (Weinmann et
al. 2015) over its k nearest neighbors **at full pre-subsampling density**, so
every surviving point carries a descriptor of the fine structure around it
(wires are 1-D/linear, tower lattices vertical/scattered, canopy 3-D) that the
256-point sketch cannot recover.

Appended to the canonical 13-column schema as columns 13..18; everything is
bounded [0, 1] so no further normalization is needed downstream.
"""

from __future__ import annotations

import numpy as np

GEOM_FEATURE_NAMES = (
    "linearity", "planarity", "scatter", "verticality", "axis_z", "radius"
)
N_GEOM_FEATURES = len(GEOM_FEATURE_NAMES)


def geometric_features(xyz: np.ndarray, k: int = 24,
                       radius_norm: str = "absolute") -> np.ndarray:
    """Per-point eigenfeatures over the k-NN neighborhood.

    xyz: [N, 3] METRIC coordinates (meters — not the normalized model columns;
    neighborhoods must be isotropic in space).

    Returns [N, 6] float32, each in [0, 1]:
      linearity   (λ1−λ2)/λ1   — 1-D structure (cables)
      planarity   (λ2−λ3)/λ1   — 2-D structure (ground, roofs)
      scatter      λ3/λ1       — 3-D structure (canopy, lattice towers)
      verticality 1−|n_z|      — n = normal (smallest-λ eigenvector); walls,
                                 tower faces → 1; horizontal surfaces → 0
      axis_z      |e1_z|       — z-component of the PRINCIPAL axis: for linear
                                 structures this is the tower↔lines
                                 discriminator (horizontal wire ≈ 0, vertical
                                 lattice edge ≈ 1) the anatomy calls for
      radius      — bounded local density proxy from r_k = distance to the
                    k-th neighbor; two normalizations (``radius_norm``):
          "absolute"  1/(1+r_k)          r_k in meters. Encodes absolute
                      structure scale but couples the column to acquisition
                      density: under a uniform density shift EVERY point's
                      r_k scales, a wholesale covariate shift in one input
                      column (measured: density÷2 costs geom −4.0 mIoU vs
                      plain −2.0, BASELINE.md shift table).
          "median"    1/(1+r_k/m), m = median r_k over this cloud. Invariant
                      to uniform density scaling (r_k and m scale together)
                      while keeping the informative within-cloud contrast
                      (wires sparse vs canopy dense RELATIVE to the tile).
    """
    if radius_norm not in ("absolute", "median"):
        raise ValueError(f"radius_norm must be 'absolute' or 'median', "
                         f"got {radius_norm!r}")
    xyz = np.asarray(xyz, np.float64)
    n = xyz.shape[0]
    if n == 0:
        return np.zeros((0, N_GEOM_FEATURES), np.float32)
    kk = int(min(k, n - 1))
    if kk < 2:
        out = np.zeros((n, N_GEOM_FEATURES), np.float32)
        out[:, -1] = 1.0
        return out

    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    # +1: the query point itself comes back as its own first neighbor
    dist, idx = tree.query(xyz, k=kk + 1)
    nbrs = xyz[idx]  # [N, kk+1, 3]
    mean = nbrs.mean(axis=1, keepdims=True)
    d = nbrs - mean
    cov = np.einsum("nkd,nke->nde", d, d) / (kk + 1)  # [N, 3, 3]
    evals, evecs = np.linalg.eigh(cov)  # ascending: λ3 ≤ λ2 ≤ λ1
    l3, l2, l1 = evals[:, 0], evals[:, 1], evals[:, 2]
    l1s = np.maximum(l1, 1e-12)

    linearity = np.clip((l1 - l2) / l1s, 0.0, 1.0)
    planarity = np.clip((l2 - l3) / l1s, 0.0, 1.0)
    scatter = np.clip(l3 / l1s, 0.0, 1.0)
    # normal = eigenvector of the smallest eigenvalue (column 0 of eigh output)
    verticality = 1.0 - np.abs(evecs[:, 2, 0])
    axis_z = np.abs(evecs[:, 2, 2])  # z of the largest-λ (principal) axis
    r_k = dist[:, -1]
    if radius_norm == "median":
        r_k = r_k / max(float(np.median(r_k)), 1e-9)
    radius = 1.0 / (1.0 + r_k)

    # degenerate neighborhoods (all points coincident): zeros, not NaN
    flat = l1 <= 1e-12
    for a in (linearity, planarity, scatter, verticality, axis_z):
        a[flat] = 0.0

    return np.stack(
        [linearity, planarity, scatter, verticality, axis_z, radius], axis=1
    ).astype(np.float32)
