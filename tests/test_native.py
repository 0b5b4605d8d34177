"""Native C++ component tests: exact MCF optimality, balanced k-means, FPS, and
fallback-path equivalence (skip solver-exactness when no toolchain)."""

import numpy as np
import pytest

from ampnet_tpu import native


def scipy_optimum(cost, caps):
    from scipy.optimize import linear_sum_assignment

    expanded = np.repeat(cost, caps.tolist(), axis=1)
    r, c = linear_sum_assignment(expanded)
    return expanded[r, c].sum()


@pytest.mark.skipif(not native.native_available(), reason="C++ library unavailable")
class TestNativeSolver:
    def test_exact_optimality(self, rng):
        for trial in range(3):
            n, k = 48, 4
            cost = rng.random((n, k)).astype(np.float32)
            caps = np.array([12, 12, 12, 12], np.int32)
            a = native.balanced_assign(cost, caps)
            np.testing.assert_array_equal(np.bincount(a, minlength=k), caps)
            ours = cost[np.arange(n), a].sum()
            assert ours == pytest.approx(scipy_optimum(cost, caps), abs=1e-4)

    def test_uneven_capacities(self, rng):
        cost = rng.random((30, 3)).astype(np.float32)
        caps = np.array([5, 10, 15], np.int32)
        a = native.balanced_assign(cost, caps)
        np.testing.assert_array_equal(np.bincount(a, minlength=3), caps)
        assert cost[np.arange(30), a].sum() == pytest.approx(
            scipy_optimum(cost, caps), abs=1e-4
        )

    def test_overcapacity_ok(self, rng):
        cost = rng.random((10, 2)).astype(np.float32)
        a = native.balanced_assign(cost, np.array([8, 8], np.int32))
        assert len(a) == 10 and (np.bincount(a, minlength=2) <= 8).all()

    def test_kmeans_exact_sizes(self, rng):
        pts = rng.random((1024, 3)).astype(np.float32)
        a, cents = native.balanced_kmeans_native(pts, 4, np.full(4, 256, np.int32))
        np.testing.assert_array_equal(np.bincount(a), [256] * 4)
        assert cents.shape == (4, 3)

    def test_fps_matches_jax(self, rng):
        from ampnet_tpu.ops.sampling import farthest_point_sampling
        import jax.numpy as jnp

        pts = rng.normal(size=(300, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            native.fps_native(pts, 24),
            np.asarray(farthest_point_sampling(jnp.asarray(pts), 24)),
        )


class TestFallback:
    def test_greedy_fallback_feasible(self, rng):
        cost = rng.random((60, 4)).astype(np.float32)
        caps = np.array([15, 15, 15, 15], np.int32)
        a = native._assign_fallback(cost, caps)
        np.testing.assert_array_equal(np.bincount(a, minlength=4), caps)
        # 2-opt refinement lands within a few percent of the optimum
        ours = cost[np.arange(60), a].sum()
        assert ours <= scipy_optimum(cost, caps) * 1.1


def test_tiling_exact_mcf_assigner(rng):
    from ampnet_tpu.preproc.tiling import kmeans_tile_cloud

    pc = rng.random((1000, 13)).astype(np.float32)
    out = kmeans_tile_cloud(pc, n_points=256, assigner="exact_mcf")
    assert out.shape == (256, 13, 4)


def test_fps_grid_bit_exact_and_large():
    """Grid-pruned FPS (ampnet_fps_grid) must match the naive scan bit-exactly —
    including tie-breaking — on uniform and clustered clouds, small and large."""
    from ampnet_tpu.native import fps_native, native_available

    if not native_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    clouds = [
        rng.normal(size=(500, 9)).astype(np.float32),
        rng.normal(size=(20000, 3)).astype(np.float32),
        np.concatenate(
            [rng.normal(size=(1000, 3)) + c for c in rng.normal(size=(20, 3)) * 10]
        ).astype(np.float32),
    ]
    for pts in clouds:
        m = min(512, len(pts) // 4)
        np.testing.assert_array_equal(
            fps_native(pts, m, method="naive"), fps_native(pts, m, method="grid")
        )


def test_fps_degenerate_extents():
    """All points on a line/plane (zero extent on some axes) must not crash the
    grid bucketing."""
    from ampnet_tpu.native import fps_native, native_available

    if not native_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(4)
    pts = np.zeros((1000, 3), np.float32)
    pts[:, 0] = rng.normal(size=1000)  # 1-D line
    np.testing.assert_array_equal(
        fps_native(pts, 64, method="naive"), fps_native(pts, 64, method="grid")
    )
