"""Preprocessing pipeline tests: window split, HAG, filter/norm, offline tiling,
split lists, LAS codec roundtrip."""

import numpy as np
import pytest

from ampnet_tpu.data.las_io import LasCloud, read_las, write_las
from ampnet_tpu.preproc.filter_norm import filter_and_normalize
from ampnet_tpu.preproc.hag import height_above_ground_grid, height_above_ground_knn
from ampnet_tpu.preproc.splits import assign_by_blocks, generate_split_lists
from ampnet_tpu.preproc.tiling import kmeans_tile_cloud
from ampnet_tpu.preproc.window_split import remap_las_classes, split_tile_into_windows


class TestWindowSplit:
    def make_tile(self, rng, n=2000, extent=250.0):
        tile = np.zeros((9, n))
        tile[0] = rng.uniform(0, extent, n) + 430000  # easting
        tile[1] = rng.uniform(0, extent, n) + 4590000
        tile[2] = rng.uniform(0, 30, n)
        tile[3] = rng.choice([1, 3, 4, 5], n)
        tile[4] = rng.uniform(0, 3000, n)
        tile[5:9] = rng.uniform(0, 65535, (4, n))
        return tile

    def test_partition_is_complete_and_disjoint(self, rng):
        tile = self.make_tile(rng)
        windows = split_tile_into_windows(tile, (100.0, 100.0))
        total = sum(w["points"].shape[1] for w in windows)
        assert total == tile.shape[1]
        assert len(windows) >= 4  # 250m extent / 100m windows → 3x3 grid-ish

    def test_window_extent(self, rng):
        tile = self.make_tile(rng)
        for w in split_tile_into_windows(tile, (100.0, 100.0)):
            pts = w["points"]
            assert pts[0].max() - pts[0].min() <= 100.0
            assert pts[1].max() - pts[1].min() <= 100.0

    def test_tower_labeling_per_window(self, rng):
        tile = self.make_tile(rng, n=1000, extent=190.0)
        # plant a tower in the lower-left window only
        in_ll = (tile[0] < 430000 + 50) & (tile[1] < 4590000 + 50)
        tile[3, in_ll] = 15
        windows = split_tile_into_windows(tile, (100.0, 100.0))
        labels = {w["label"] for w in windows}
        assert "tower_" in labels and "pc_" in labels

    def test_class_remap(self):
        cls = np.array([135, 106, 15, 2])
        np.testing.assert_array_equal(remap_las_classes(cls), [30, 31, 15, 2])


class TestHAG:
    def test_flat_ground(self, rng):
        n = 500
        x, y = rng.uniform(0, 50, n), rng.uniform(0, 50, n)
        z = rng.uniform(5, 20, n)
        cls = np.full(n, 5)
        # ground plane at z=2
        gx, gy = rng.uniform(0, 50, 200), rng.uniform(0, 50, 200)
        x, y = np.concatenate([x, gx]), np.concatenate([y, gy])
        z = np.concatenate([z, np.full(200, 2.0)])
        cls = np.concatenate([cls, np.full(200, 2)])
        hag = height_above_ground_grid(x, y, z, cls, cell=5.0)
        np.testing.assert_allclose(hag[:n], z[:n] - 2.0, atol=1e-6)

    def test_sloped_ground_grid_close_to_knn(self, rng):
        n = 300
        x, y = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
        zg = 0.1 * x + 0.05 * y  # sloped terrain
        gx, gy = rng.uniform(0, 100, 400), rng.uniform(0, 100, 400)
        gz = 0.1 * gx + 0.05 * gy
        ax = np.concatenate([x, gx])
        ay = np.concatenate([y, gy])
        az = np.concatenate([zg + rng.uniform(1, 20, n), gz])
        cls = np.concatenate([np.full(n, 5), np.full(400, 2)])
        hag_g = height_above_ground_grid(ax, ay, az, cls, cell=4.0)
        hag_k = height_above_ground_knn(ax, ay, az, cls)
        # both approximate the true height; grid vs knn agree within a metre
        assert np.abs(hag_g[:n] - hag_k[:n]).mean() < 1.0

    def test_no_ground_fallback(self, rng):
        n = 50
        z = rng.uniform(3, 9, n)
        hag = height_above_ground_grid(rng.uniform(0, 9, n), rng.uniform(0, 9, n), z,
                                       np.full(n, 5))
        np.testing.assert_allclose(hag, z - z.min())


class TestFilterNorm:
    def make_window(self, rng, n=3000):
        kw = dict(
            x=rng.uniform(0, 100, n) + 430000,
            y=rng.uniform(0, 100, n) + 4590000,
            hag=rng.uniform(0, 40, n),
            classification=rng.choice([1, 3, 4, 5, 15, 14, 2, 7], n),
            intensity=rng.uniform(0, 6000, n),
            red=rng.uniform(0, 65535, n),
            green=rng.uniform(0, 65535, n),
            blue=rng.uniform(0, 65535, n),
            nir=rng.uniform(0, 65535, n),
        )
        return kw

    def test_thirteen_columns_and_ranges(self, rng):
        pc, prefix = filter_and_normalize(**self.make_window(rng), min_points=100)
        assert pc is not None and pc.shape[1] == 13
        assert pc[:, 0].min() >= 0 and pc[:, 0].max() <= 1
        assert pc[:, 2].min() >= 0 and pc[:, 2].max() <= 0.41
        for c in (4, 5, 6, 7, 8, 9):
            assert pc[:, c].min() >= 0 and pc[:, c].max() <= 1, c
        # raw coords preserved
        assert pc[:, 10].min() > 400000

    def test_drop_classes_and_outliers(self, rng):
        kw = self.make_window(rng)
        kw["hag"][:100] = 150.0  # outliers above max_z
        pc, _ = filter_and_normalize(**kw, min_points=10)
        kept_classes = set(np.unique(pc[:, 3].astype(int)))
        assert kept_classes.isdisjoint({2, 7, 8, 13, 24, 30})
        assert pc[:, 2].max() <= 1.0

    def test_naming(self, rng):
        kw = self.make_window(rng)
        kw["classification"][:] = 1
        assert filter_and_normalize(**kw, min_points=10)[1] == "pc_"
        kw["classification"][:20] = 15
        assert filter_and_normalize(**kw, min_points=10)[1] == "tower_"
        kw["classification"][:20] = 14
        assert filter_and_normalize(**kw, min_points=10)[1] == "powerline_"

    def test_min_points(self, rng):
        pc, _ = filter_and_normalize(**self.make_window(rng, n=50), min_points=10000)
        assert pc is None

    def test_ndvi_range_formula(self, rng):
        kw = self.make_window(rng, n=500)
        pc, _ = filter_and_normalize(**kw, min_points=10)
        # NDVI column equals ((nir-red)/(nir+red)+1)/2 for surviving points
        nir, red = pc[:, 8] * 65535.0, pc[:, 5] * 65536.0
        expect = np.clip(((nir - red) / np.maximum(nir + red, 1e-9) + 1) / 2, 0, 1)
        np.testing.assert_allclose(pc[:, 9], expect, atol=1e-5)


class TestOfflineTiling:
    def make_cloud(self, rng, n):
        pc = rng.uniform(0, 1, (n, 13)).astype(np.float32)
        pc[:, 3] = rng.choice([1, 3, 5, 15], n)
        return pc

    def test_small_cloud_single_window(self, rng):
        out = kmeans_tile_cloud(self.make_cloud(rng, 300), n_points=256)
        assert out.shape == (256, 13, 1)

    def test_tiny_cloud_kept_as_is(self, rng):
        out = kmeans_tile_cloud(self.make_cloud(rng, 200), n_points=256)
        assert out.shape == (200, 13, 1)

    def test_exact_tiling(self, rng):
        out = kmeans_tile_cloud(self.make_cloud(rng, 1000), n_points=256)
        # ceil(1000/256)=4 windows, duplicated up to 1024 points
        assert out.shape == (256, 13, 4)

    def test_cap(self, rng):
        out = kmeans_tile_cloud(self.make_cloud(rng, 5000), n_points=256, max_clusters=9)
        assert out.shape == (256, 13, 9)


class TestSplits:
    def test_blocks(self):
        files = ["tower_CAT3_b1_w0.pkl", "pc_CAT3_b2_w1.pkl", "pc_CAT3_b3_w2.pkl", "odd.pkl"]
        out = assign_by_blocks(files, {"train": ["b1"], "val": ["b2"], "test": ["b3"]})
        assert out["train"] == ["tower_CAT3_b1_w0.pkl"]
        assert out["val"] == ["pc_CAT3_b2_w1.pkl"]
        assert out["unmatched"] == ["odd.pkl"]

    def test_generate_writes_files(self, tmp_path):
        files = [f"pc_X_b{i}_w0.pkl" for i in range(20)]
        out = generate_split_lists(files, str(tmp_path), fractions={"train": 0.5, "val": 0.25, "test": 0.25})
        assert (tmp_path / "train_seg_files.txt").exists()
        total = sum(len(out[s]) for s in ("train", "val", "test"))
        assert total == 20


class TestLasCodec:
    def roundtrip(self, tmp_path, rng, fmt):
        n = 500
        cloud = LasCloud(
            x=rng.uniform(430000, 430100, n),
            y=rng.uniform(4590000, 4590100, n),
            z=rng.uniform(0, 60, n),
            intensity=rng.integers(0, 4000, n).astype(float),
            classification=rng.choice([1, 2, 3, 4, 5, 14, 15], n),
            red=rng.integers(0, 65535, n).astype(float),
            green=rng.integers(0, 65535, n).astype(float),
            blue=rng.integers(0, 65535, n).astype(float),
            nir=rng.integers(0, 65535, n).astype(float) if fmt == 8 else None,
        )
        p = str(tmp_path / f"t{fmt}.las")
        write_las(p, cloud, point_format=fmt)
        back = read_las(p)
        assert len(back) == n
        np.testing.assert_allclose(back.x, cloud.x, atol=1e-3)
        np.testing.assert_allclose(back.y, cloud.y, atol=1e-3)
        np.testing.assert_allclose(back.z, cloud.z, atol=1e-3)
        np.testing.assert_array_equal(back.classification, cloud.classification)
        np.testing.assert_array_equal(back.intensity, cloud.intensity)
        np.testing.assert_array_equal(back.red, cloud.red)
        if fmt == 8:
            np.testing.assert_array_equal(back.nir, cloud.nir)

    @pytest.mark.parametrize("fmt", [3, 8])
    def test_roundtrip(self, tmp_path, rng, fmt):
        self.roundtrip(tmp_path, rng, fmt)


class TestLasRobustness:
    def test_truncated_file_clean_error(self, tmp_path):
        p = tmp_path / "bad.las"
        p.write_bytes(b"LASF" + b"\x00" * 50)  # header cut short
        with pytest.raises(Exception):
            read_las(str(p))

    def test_non_las_rejected(self, tmp_path):
        p = tmp_path / "x.las"
        p.write_bytes(b"hello world")
        with pytest.raises(ValueError, match="not a LAS"):
            read_las(str(p))

    def test_laz_rejected(self, tmp_path, rng):
        # write a valid LAS then set the compression bit
        n = 10
        cloud = LasCloud(
            x=rng.uniform(0, 10, n), y=rng.uniform(0, 10, n), z=rng.uniform(0, 10, n),
            intensity=np.zeros(n), classification=np.ones(n, np.int64),
            red=np.zeros(n), green=np.zeros(n), blue=np.zeros(n),
        )
        p = str(tmp_path / "c.las")
        write_las(p, cloud, point_format=3)
        data = bytearray(open(p, "rb").read())
        data[104] |= 0x80
        open(p, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="LAZ"):
            read_las(p)


    def test_header_corruption_fuzz(self, tmp_path, rng):
        """Flipping bytes anywhere in the header must never crash the process
        or hang: read_las either raises a clean exception or returns a cloud
        whose field lengths are mutually consistent."""
        n = 50
        cloud = LasCloud(
            x=rng.uniform(0, 10, n), y=rng.uniform(0, 10, n), z=rng.uniform(0, 10, n),
            intensity=np.zeros(n), classification=np.ones(n, np.int64),
            red=np.zeros(n), green=np.zeros(n), blue=np.zeros(n),
        )
        base = str(tmp_path / "base.las")
        write_las(base, cloud, point_format=3)
        blob = open(base, "rb").read()
        fuzz_rng = np.random.default_rng(42)
        for trial in range(60):
            data = bytearray(blob)
            for _ in range(fuzz_rng.integers(1, 4)):
                pos = int(fuzz_rng.integers(4, min(250, len(data))))  # keep 'LASF'
                data[pos] = int(fuzz_rng.integers(0, 256))
            p = str(tmp_path / f"fuzz{trial}.las")
            open(p, "wb").write(bytes(data))
            try:
                out = read_las(p)
            except Exception:
                continue  # clean rejection is fine
            m = len(out)
            assert out.x.shape == out.y.shape == out.z.shape == (m,)
            assert out.classification.shape == (m,)


def test_read_las_mmap_matches(tmp_path, rng):
    n = 400
    cloud = LasCloud(
        x=rng.uniform(0, 100, n), y=rng.uniform(0, 100, n), z=rng.uniform(0, 50, n),
        intensity=rng.integers(0, 4000, n).astype(float),
        classification=rng.choice([1, 2, 5, 15], n),
        red=rng.integers(0, 65535, n).astype(float),
        green=rng.integers(0, 65535, n).astype(float),
        blue=rng.integers(0, 65535, n).astype(float),
        nir=rng.integers(0, 65535, n).astype(float),
    )
    p = str(tmp_path / "m.las")
    write_las(p, cloud, point_format=8)
    a = read_las(p)
    b = read_las(p, mmap=True)
    np.testing.assert_allclose(a.x, b.x)
    np.testing.assert_array_equal(a.classification, b.classification)
    np.testing.assert_array_equal(a.nir, b.nir)
