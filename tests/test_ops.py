"""Tests for device-side ops: augmentation, resampling, FPS, balanced k-means."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ampnet_tpu.ops.augment import rotate_z, shuffle_points, shuffle_windows
from ampnet_tpu.ops.kmeans import (
    balanced_kmeans,
    cluster_sizes,
    num_tiles_test,
    num_tiles_train,
)
from ampnet_tpu.ops.sampling import (
    farthest_point_sampling,
    fps_points,
    resample_to_fixed_size,
)


class TestAugment:
    def test_rotate_matches_reference_formula(self, rng):
        pts = rng.normal(size=(2, 4, 50, 9)).astype(np.float32)
        angle = 0.7
        out = np.asarray(rotate_z(jnp.asarray(pts), angle=jnp.asarray(angle)))
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
        expected = pts[..., :3] @ rot
        np.testing.assert_allclose(out[..., :3], expected, atol=1e-5)
        np.testing.assert_array_equal(out[..., 3:], pts[..., 3:])

    def test_rotate_preserves_norms(self, rng):
        pts = rng.normal(size=(1, 1, 100, 9)).astype(np.float32)
        out = np.asarray(rotate_z(jnp.asarray(pts), key=jax.random.PRNGKey(0)))
        np.testing.assert_allclose(
            np.linalg.norm(out[..., :2], axis=-1),
            np.linalg.norm(pts[..., :2], axis=-1),
            atol=1e-5,
        )
        np.testing.assert_allclose(out[..., 2], pts[..., 2], atol=1e-6)

    def test_shuffle_points_keeps_pairing(self, rng):
        pts = rng.normal(size=(2, 16, 9)).astype(np.float32)
        lbl = np.arange(32).reshape(2, 16)
        p2, l2 = shuffle_points(jnp.asarray(pts), jnp.asarray(lbl), jax.random.PRNGKey(1))
        # each label still refers to the same point row
        for b in range(2):
            for i in range(16):
                orig = int(l2[b, i]) % 16
                np.testing.assert_allclose(p2[b, i], pts[b, orig], atol=0)

    def test_shuffle_windows_consistent(self, rng):
        pts = rng.normal(size=(2, 5, 8, 9)).astype(np.float32)
        lbl = rng.integers(0, 5, size=(2, 5, 8))
        cent = rng.normal(size=(2, 5, 2)).astype(np.float32)
        p2, l2, c2 = shuffle_windows(
            jnp.asarray(pts), jnp.asarray(lbl), jax.random.PRNGKey(2), jnp.asarray(cent)
        )
        assert sorted(np.asarray(p2).sum(axis=(2, 3))[0].tolist()) == sorted(
            pts.sum(axis=(2, 3))[0].tolist()
        )


class TestResample:
    def test_downsample_no_duplicates(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 9)).astype(np.float32))
        out = resample_to_fixed_size(pts, 40, jax.random.PRNGKey(0))
        assert out.shape == (40, 9)
        assert len(np.unique(np.asarray(out), axis=0)) == 40

    def test_upsample_duplicates(self, rng):
        pts = jnp.asarray(rng.normal(size=(10, 9)).astype(np.float32))
        out = np.asarray(resample_to_fixed_size(pts, 25, jax.random.PRNGKey(0)))
        assert out.shape == (25, 9)
        # every output row exists in the input
        for row in out:
            assert (np.abs(pts - row).sum(axis=1) < 1e-6).any()

    def test_respects_valid_mask(self, rng):
        pts = np.zeros((20, 3), np.float32)
        pts[:5] = rng.normal(size=(5, 3))
        pts[5:] = 777.0  # garbage padding
        mask = np.zeros(20, bool)
        mask[:5] = True
        out = np.asarray(
            resample_to_fixed_size(jnp.asarray(pts), 8, jax.random.PRNGKey(1), jnp.asarray(mask))
        )
        assert (out != 777.0).all()


class TestFPS:
    def ref_fps(self, pts, n):
        """Independent NumPy re-derivation of FPS (utils/utils.py:889-933)."""
        xyz = pts[:, :3]
        sel = [0]
        d = np.full(len(pts), np.inf)
        for _ in range(1, n):
            d = np.minimum(d, ((xyz - xyz[sel[-1]]) ** 2).sum(1))
            cand = d.copy()
            cand[sel] = -1
            sel.append(int(np.argmax(cand)))
        return np.array(sel)

    def test_matches_reference(self, rng):
        pts = rng.normal(size=(200, 5)).astype(np.float32)
        ours = np.asarray(farthest_point_sampling(jnp.asarray(pts), 32))
        ref = self.ref_fps(pts, 32)
        np.testing.assert_array_equal(ours, ref)

    def test_spread(self, rng):
        """FPS picks well-spread points: pairwise min distance should beat random."""
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        sel = np.asarray(fps_points(jnp.asarray(pts), 20))

        def min_pdist(a):
            d = ((a[:, None] - a[None]) ** 2).sum(-1)
            np.fill_diagonal(d, np.inf)
            return d.min()

        rnd = pts[rng.permutation(500)[:20]]
        assert min_pdist(sel) > min_pdist(rnd)


class TestBalancedKMeans:
    def test_exact_sizes(self, rng):
        feats = rng.normal(size=(512, 3)).astype(np.float32)
        assign, cents = balanced_kmeans(jnp.asarray(feats), 4, jax.random.PRNGKey(0))
        sizes = np.asarray(cluster_sizes(assign, 4))
        np.testing.assert_array_equal(sizes, [128, 128, 128, 128])

    def test_uneven_n(self, rng):
        feats = rng.normal(size=(515, 3)).astype(np.float32)
        assign, _ = balanced_kmeans(jnp.asarray(feats), 4, jax.random.PRNGKey(0))
        sizes = sorted(np.asarray(cluster_sizes(assign, 4)).tolist())
        assert sizes == [128, 129, 129, 129]

    def test_spatial_coherence(self, rng):
        """Four well-separated blobs of equal size must be recovered exactly."""
        centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
        feats = np.concatenate(
            [c + rng.normal(scale=0.3, size=(64, 2)).astype(np.float32) for c in centers]
        )
        assign, _ = balanced_kmeans(jnp.asarray(feats), 4, jax.random.PRNGKey(1))
        a = np.asarray(assign)
        # each ground-truth blob maps to a single predicted cluster
        for g in range(4):
            blob = a[g * 64 : (g + 1) * 64]
            assert len(np.unique(blob)) == 1, f"blob {g} split: {np.unique(blob)}"

    def test_quality_vs_unconstrained(self, rng):
        """Balanced inertia should be within a modest factor of plain k-means."""
        from sklearn.cluster import KMeans

        feats = rng.normal(size=(600, 3)).astype(np.float32)
        assign, cents = balanced_kmeans(jnp.asarray(feats), 6, jax.random.PRNGKey(2))
        a, c = np.asarray(assign), np.asarray(cents)
        ours = ((feats - c[a]) ** 2).sum()
        km = KMeans(n_clusters=6, n_init=3, random_state=0).fit(feats)
        assert ours < km.inertia_ * 1.6, (ours, km.inertia_)

    def test_min_size_mode(self, rng):
        feats = rng.normal(size=(700, 3)).astype(np.float32)
        assign, _ = balanced_kmeans(
            jnp.asarray(feats), 3, jax.random.PRNGKey(0), exact=False
        )
        sizes = np.asarray(cluster_sizes(assign, 3))
        assert sizes.sum() == 700
        assert (sizes > 0.5 * 700 / 3).all(), sizes  # roughly balanced

    def test_point_mask(self, rng):
        feats = np.zeros((128, 2), np.float32)
        feats[:100] = rng.normal(size=(100, 2))
        feats[100:] = 1e6
        mask = np.zeros(128, bool)
        mask[:100] = True
        caps = (50, 50)
        assign, _ = balanced_kmeans(
            jnp.asarray(feats), 2, jax.random.PRNGKey(0), capacities=caps,
            point_mask=jnp.asarray(mask),
        )
        a = np.asarray(assign)
        assert (a[100:] == -1).all()
        assert sorted(np.bincount(a[:100]).tolist()) == [50, 50]


def test_num_tiles():
    assert num_tiles_train(2048, 2048) == 1
    assert num_tiles_train(2049, 2048) == 2
    assert num_tiles_train(2048 * 12, 2048) == 9  # capped
    assert num_tiles_test(4095, 2048) == 1  # < 2*n_points
    assert num_tiles_test(4096, 2048) == 2
    assert num_tiles_test(2048 * 30, 2048) == 18  # capped


def test_balanced_kmeans_argmin_mode_exact_sizes():
    """lloyd_mode='argmin' (plain Lloyd + one final balanced solve) must still
    produce exactly-capacity clusters and sane geometry."""
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.ops.kmeans import balanced_kmeans, cluster_sizes

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    k, cap = 4, 128
    a, cent = balanced_kmeans(feats, k, jax.random.PRNGKey(1),
                              capacities=(cap,) * k, exact=True,
                              lloyd_mode="argmin")
    sizes = np.asarray(cluster_sizes(a, k))
    np.testing.assert_array_equal(sizes, [cap] * k)
    # SSE should be within 2x of the sinkhorn-mode solution on this easy data
    a2, cent2 = balanced_kmeans(feats, k, jax.random.PRNGKey(1),
                                capacities=(cap,) * k, exact=True)
    f = np.asarray(feats)
    sse = ((f - np.asarray(cent)[np.asarray(a)]) ** 2).sum()
    sse2 = ((f - np.asarray(cent2)[np.asarray(a2)]) ** 2).sum()
    assert sse < 2.0 * sse2, (sse, sse2)


def test_point_dropout_labels_follow_points():
    """Dropped points take the FIRST point's label along with its coordinates —
    supervising a duplicate with the replaced point's label would corrupt
    per-point training."""
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.ops.augment import random_point_dropout

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 5, size=(2, 3, 64)).astype(np.int32)
    # encode each point's label into a feature so consistency is checkable
    points = np.zeros((2, 3, 64, 9), np.float32)
    points[..., 0] = labels
    out_p, out_l = random_point_dropout(
        jnp.asarray(points), jax.random.PRNGKey(3), labels=jnp.asarray(labels)
    )
    np.testing.assert_array_equal(np.asarray(out_p[..., 0]).astype(np.int32),
                                  np.asarray(out_l))
    # without labels: points-only return, same as before
    only_p = random_point_dropout(jnp.asarray(points), jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(only_p), np.asarray(out_p))
