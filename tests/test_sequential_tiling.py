"""Legacy sequential tiler tests (ops/sequential_tiling.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.ops.sequential_tiling import sequential_tiling


def make(b=2, n=100, f=4, n_pad=0, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.normal(size=(b, n, f)).astype(np.float32)
    tgt = rng.integers(0, 5, size=(b, n)).astype(np.int32)
    if n_pad:
        pts[:, -n_pad:] = 0
        tgt[:, -n_pad:] = -1
    return jnp.asarray(pts), jnp.asarray(tgt)


def test_exact_multiple_roundtrip():
    pts, tgt = make(n=96)
    w_pts, w_tgt = sequential_tiling(pts, tgt, 32)
    assert w_pts.shape == (2, 3, 32, 4)
    np.testing.assert_array_equal(np.asarray(w_pts).reshape(2, 96, 4), np.asarray(pts))
    np.testing.assert_array_equal(np.asarray(w_tgt).reshape(2, 96), np.asarray(tgt))


def test_tail_window_dropped():
    pts, tgt = make(n=100)
    w_pts, _ = sequential_tiling(pts, tgt, 32)
    assert w_pts.shape[1] == 3  # 100 // 32, last 4 points dropped


def test_duplicate_fill_replaces_padding():
    pts, tgt = make(n=96, n_pad=40)
    w_pts, w_tgt = sequential_tiling(pts, tgt, 32, key=jax.random.PRNGKey(1))
    assert (np.asarray(w_tgt) != -1).all()
    # filled points are real points from the same cloud
    flat = np.asarray(w_pts).reshape(2, 96, 4)
    src = np.asarray(pts)[:, :56]  # valid prefix
    for b in range(2):
        for i in range(56, 96):
            assert (np.abs(src[b] - flat[b, i]).sum(axis=1) < 1e-6).any()


def test_zero_fill_keeps_ignore_targets():
    pts, tgt = make(n=96, n_pad=40)
    w_pts, w_tgt = sequential_tiling(pts, tgt, 32, fill="zero")
    flat_t = np.asarray(w_tgt).reshape(2, 96)
    assert (flat_t[:, 56:] == -1).all()
    assert (np.asarray(w_pts).reshape(2, 96, 4)[:, 56:] == 0).all()


def test_too_small_cloud_raises():
    pts, tgt = make(n=10)
    with pytest.raises(ValueError):
        sequential_tiling(pts, tgt, 32)
