"""Offline geometric eigenfeatures (preproc/geomfeat.py) and their plumbing
through the schema/datasets — the full-density boundary-aware feature lever
(no reference counterpart; BASELINE.md "Error anatomy" motivates it)."""

import numpy as np
import pytest

from ampnet_tpu.data import schema as S
from ampnet_tpu.preproc.geomfeat import (
    GEOM_FEATURE_NAMES,
    N_GEOM_FEATURES,
    geometric_features,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestGeometricFeatures:
    def test_shapes_and_bounds(self, rng):
        xyz = rng.normal(0, 5, (500, 3))
        f = geometric_features(xyz, k=16)
        assert f.shape == (500, N_GEOM_FEATURES)
        assert f.dtype == np.float32
        assert np.isfinite(f).all()
        assert (f >= 0).all() and (f <= 1).all()

    def test_wire_vs_pole_axis_z(self, rng):
        """axis_z is THE tower↔lines discriminator: horizontal wire ≈ 0,
        vertical lattice edge ≈ 1."""
        i = GEOM_FEATURE_NAMES.index("axis_z")
        wire = np.stack([np.linspace(0, 20, 400), rng.normal(0, .02, 400),
                         10 + rng.normal(0, .02, 400)], 1)
        pole = np.stack([rng.normal(0, .02, 400), rng.normal(0, .02, 400),
                         np.linspace(0, 15, 400)], 1)
        fw = geometric_features(wire, k=16).mean(0)
        fp = geometric_features(pole, k=16).mean(0)
        il = GEOM_FEATURE_NAMES.index("linearity")
        assert fw[il] > 0.9 and fp[il] > 0.9  # both linear
        assert fw[i] < 0.1 and fp[i] > 0.9    # separated by axis orientation

    def test_plane_vs_blob(self, rng):
        ip, isc = (GEOM_FEATURE_NAMES.index("planarity"),
                   GEOM_FEATURE_NAMES.index("scatter"))
        plane = np.stack([rng.uniform(0, 10, 600), rng.uniform(0, 10, 600),
                          rng.normal(0, .03, 600)], 1)
        blob = rng.normal(0, 1, (600, 3))
        assert geometric_features(plane, k=16).mean(0)[ip] > 0.5
        assert geometric_features(blob, k=16).mean(0)[isc] > 0.25

    def test_degenerate_inputs(self):
        assert geometric_features(np.zeros((0, 3))).shape == (0, N_GEOM_FEATURES)
        one = geometric_features(np.zeros((1, 3)))
        assert one.shape == (1, N_GEOM_FEATURES) and np.isfinite(one).all()
        coincident = geometric_features(np.zeros((64, 3)), k=16)
        assert np.isfinite(coincident).all()
        assert (coincident[:, :5] == 0).all()  # eigen features zeroed, not NaN


class TestSchemaPlumbing:
    def _pc(self, rng, n=50, cols=S.NUM_CANONICAL_COLS + N_GEOM_FEATURES):
        return rng.uniform(0, 1, (n, cols)).astype(np.float32)

    def test_select_with_extra(self, rng):
        pc = self._pc(rng)
        f = S.select_model_features(pc, N_GEOM_FEATURES)
        assert f.shape == (50, 9 + N_GEOM_FEATURES)
        np.testing.assert_array_equal(f[:, 9:], pc[:, 13:13 + N_GEOM_FEATURES])

    def test_select_missing_columns_raises(self, rng):
        pc = self._pc(rng, cols=13)
        with pytest.raises(ValueError, match="geom"):
            S.select_model_features(pc, N_GEOM_FEATURES)

    def test_windowed_dataset_extra(self, tmp_path, rng):
        from ampnet_tpu.data.datasets import WindowedCloudDataset
        from ampnet_tpu.data.io_utils import save_cloud

        n, w = 32, 3
        arr = rng.uniform(0, 1, (n, 13 + N_GEOM_FEATURES, w)).astype(np.float32)
        arr[:, S.COL.CLASS, :] = 4  # mid/high veg — survives noise drop
        save_cloud(str(tmp_path / "kmeans_pc_t.npz"), arr)
        ds = WindowedCloudDataset(str(tmp_path), ["pc_t.pkl"],
                                  extra_features=N_GEOM_FEATURES)
        s = ds[0]
        assert s["points"].shape == (w, n, 9 + N_GEOM_FEATURES)
        # geom columns ride through unscaled (already [0,1])
        np.testing.assert_allclose(
            s["points"][:, :, 9:],
            arr[:, 13:, :].transpose(2, 0, 1), atol=1e-6)

        plain = WindowedCloudDataset(str(tmp_path), ["pc_t.pkl"])
        assert plain[0]["points"].shape == (w, n, 9)

        arr13 = arr[:, :13, :]
        save_cloud(str(tmp_path / "kmeans_pc_plain.npz"), arr13)
        bad = WindowedCloudDataset(str(tmp_path), ["pc_plain.pkl"],
                                   extra_features=N_GEOM_FEATURES)
        with pytest.raises(ValueError, match="geom"):
            bad[0]

    def test_preproc_appends_columns(self, rng, tmp_path):
        """process_tile with geom_features=True writes 13+G-column artifacts
        whose first 13 columns are byte-identical to the plain run."""
        from types import SimpleNamespace

        from ampnet_tpu.cli.main import cmd_synth
        from ampnet_tpu.data.io_utils import load_cloud
        from ampnet_tpu.preproc.pipeline import PreprocessParams, process_tile

        las_dir = tmp_path / "las"
        cmd_synth(SimpleNamespace(out_path=str(las_dir), n_tiles=1,
                                  windows_per_tile=1, points_per_window=3000,
                                  window_size=60.0, seed=3))
        import glob
        tile = sorted(glob.glob(str(las_dir / "*.las")))[0]
        kw = dict(window_size=60.0, min_points=256, n_points=128, max_windows=3)
        p_plain = PreprocessParams(out_path=str(tmp_path / "a"), **kw)
        p_geom = PreprocessParams(out_path=str(tmp_path / "b"),
                                  geom_features=True, geom_k=12, **kw)
        (tmp_path / "a").mkdir(), (tmp_path / "b").mkdir()
        names_a, err_a = process_tile(tile, p_plain)
        names_b, err_b = process_tile(tile, p_geom)
        assert err_a is None and err_b is None and names_a == names_b
        a = load_cloud(str(tmp_path / "a" / ("kmeans_" + names_a[0].replace(".pkl", ".npz"))))
        b = load_cloud(str(tmp_path / "b" / ("kmeans_" + names_a[0].replace(".pkl", ".npz"))))
        assert b.shape[1] == 13 + N_GEOM_FEATURES
        np.testing.assert_array_equal(a, b[:, :13, :])
        assert np.isfinite(b[:, 13:, :]).all()
        assert (b[:, 13:, :] >= 0).all() and (b[:, 13:, :] <= 1).all()


class TestRadiusNorm:
    """Density-conditioned radius normalization (radius_norm='median') —
    the density÷2 shift arm's fix (VERDICT r4 #5): under uniform density
    scaling the 'absolute' radius column shifts wholesale while 'median'
    stays distribution-stable."""

    def test_median_mode_density_invariant(self, rng):
        xyz = rng.normal(0, 10, (4000, 3))
        half = xyz[rng.permutation(4000)[:2000]]
        k = 16
        abs_full = geometric_features(xyz, k=k)[:, -1]
        abs_half = geometric_features(half, k=k)[:, -1]
        med_full = geometric_features(xyz, k=k, radius_norm="median")[:, -1]
        med_half = geometric_features(half, k=k, radius_norm="median")[:, -1]
        # absolute mode: r_k grows ~2^(1/3) at half density -> the column
        # mean moves measurably
        abs_shift = abs(abs_full.mean() - abs_half.mean())
        med_shift = abs(med_full.mean() - med_half.mean())
        assert abs_shift > 0.02
        assert med_shift < abs_shift / 4
        # median mode centers the column: median r_k/m = 1 -> radius 0.5
        assert abs(np.median(med_full) - 0.5) < 1e-6
        assert abs(np.median(med_half) - 0.5) < 1e-6

    def test_median_mode_only_changes_radius_column(self, rng):
        xyz = rng.normal(0, 5, (500, 3))
        a = geometric_features(xyz, k=12)
        b = geometric_features(xyz, k=12, radius_norm="median")
        np.testing.assert_array_equal(a[:, :-1], b[:, :-1])
        assert not np.array_equal(a[:, -1], b[:, -1])
        assert (b >= 0).all() and (b <= 1).all()

    def test_bad_mode_raises(self, rng):
        with pytest.raises(ValueError, match="radius_norm"):
            geometric_features(rng.normal(size=(50, 3)), radius_norm="huh")

    def test_pipeline_plumbs_mode(self, rng, tmp_path):
        """process_tile(geom_radius_norm='median') differs from 'absolute'
        ONLY in the radius column; first 18 columns byte-identical."""
        import glob
        from types import SimpleNamespace

        from ampnet_tpu.cli.main import cmd_synth
        from ampnet_tpu.data.io_utils import load_cloud
        from ampnet_tpu.preproc.pipeline import PreprocessParams, process_tile

        las_dir = tmp_path / "las"
        cmd_synth(SimpleNamespace(out_path=str(las_dir), n_tiles=1,
                                  windows_per_tile=1, points_per_window=3000,
                                  window_size=60.0, seed=3))
        tile = sorted(glob.glob(str(las_dir / "*.las")))[0]
        kw = dict(window_size=60.0, min_points=256, n_points=128,
                  max_windows=3, geom_features=True, geom_k=12)
        pa = PreprocessParams(out_path=str(tmp_path / "a"), **kw)
        pm = PreprocessParams(out_path=str(tmp_path / "b"),
                              geom_radius_norm="median", **kw)
        (tmp_path / "a").mkdir(), (tmp_path / "b").mkdir()
        names_a, _ = process_tile(tile, pa)
        names_b, _ = process_tile(tile, pm)
        assert names_a == names_b
        f = "kmeans_" + names_a[0].replace(".pkl", ".npz")
        a = load_cloud(str(tmp_path / "a" / f))
        b = load_cloud(str(tmp_path / "b" / f))
        np.testing.assert_array_equal(a[:, :-1, :], b[:, :-1, :])
        assert not np.array_equal(a[:, -1, :], b[:, -1, :])


class TestGeomKMeta:
    """--geom_k must survive the checkpoint-meta round trip: whole-tile LAS
    inference recomputes the eigenfeatures (infer/full_tile.py) and a k
    mismatch is a wholesale covariate shift in 6 input columns — same failure
    class as the geom_radius_norm recording (core/config.py DataConfig)."""

    def test_config_roundtrip_and_legacy_default(self):
        import dataclasses
        import json

        from ampnet_tpu.core.config import AMPNetConfig, DataConfig

        cfg = AMPNetConfig(data=DataConfig(geom_k=12))
        back = AMPNetConfig.from_json(cfg.to_json())
        assert back.data.geom_k == 12

        # legacy checkpoint meta written before the field existed: strip it
        raw = json.loads(cfg.to_json())
        del raw["data"]["geom_k"]
        legacy = AMPNetConfig.from_json(json.dumps(raw))
        assert legacy.data.geom_k == 24

    def test_build_cfg_threads_geom_k(self):
        from types import SimpleNamespace

        from ampnet_tpu.cli.main import _build_cfg

        args = SimpleNamespace(number_of_points=128, number_of_windows=3,
                               arch="attention", geom_features=True,
                               geom_k=12, batch_size=4, epochs=1,
                               learning_rate=1e-3, weighing_method="fixed",
                               seed=0)
        cfg = _build_cfg(args)
        assert cfg.data.geom_k == 12
        assert cfg.data.extra_features > 0
