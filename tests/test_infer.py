"""Tiled-inference tests: stitching mechanics across cloud sizes + CSV output."""

import os

import numpy as np
import pytest
import jax

from ampnet_tpu.core.config import AMPNetConfig, DataConfig, ModelConfig
from ampnet_tpu.data.synthetic import synthetic_scene
from ampnet_tpu.data.schema import remap_segmentation_labels
from ampnet_tpu.infer.tiled import TiledInferencer, evaluate_cloud, evaluate_dataset
from ampnet_tpu.models.amp import AMPNetSegmenter


N_POINTS = 256  # small window size keeps CPU tests fast


@pytest.fixture(scope="module")
def inferencer():
    cfg = AMPNetConfig(
        data=DataConfig(n_points=N_POINTS, max_clusters_test=6),
        model=ModelConfig(),
    )
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 2, N_POINTS, 9)).astype(np.float32)
    cent = rng.normal(size=(1, 2, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts, cent, None)
    return TiledInferencer(model, variables, cfg)


def make_cloud(rng, n):
    sc = synthetic_scene(rng, n_points=n)[:n]
    feats = np.concatenate([sc[:, 0:3], sc[:, 4:10]], axis=1).astype(np.float32)
    feats[:, 0] = feats[:, 0] * 2 - 1
    feats[:, 1] = feats[:, 1] * 2 - 1
    labels = np.asarray(remap_segmentation_labels(sc[:, 3])).astype(np.int32)
    return feats, labels


@pytest.mark.parametrize(
    "n",
    [
        100,  # < n_points: single window, duplicate-padded
        300,  # between n_points and 2n: single window of 2*n_points
        1200,  # 4 clusters
        4000,  # > max_clusters*n_points: k capped at 6
    ],
)
def test_predict_covers_every_point(inferencer, n):
    rng = np.random.default_rng(n)
    feats, _ = make_cloud(rng, n)
    preds = inferencer.predict(feats, seed=1)
    assert preds.shape == (n,)
    assert ((preds >= 0) & (preds < 5)).all()


def test_return_probs_consistent_with_preds(inferencer):
    """Softmax confidences: valid distribution per point, argmax == preds, and
    predict/predict_many agree."""
    rng = np.random.default_rng(5)
    feats, _ = make_cloud(rng, 900)
    preds, probs = inferencer.predict(feats, seed=2, return_probs=True)
    assert probs.shape == (900, 5) and probs.dtype == np.float16
    np.testing.assert_allclose(probs.sum(-1).astype(np.float32), 1.0, atol=2e-3)
    assert (probs.argmax(-1) == preds).mean() > 0.999
    (preds2, probs2), = inferencer.predict_many([feats], seeds=[2], return_probs=True)
    np.testing.assert_array_equal(preds2, preds)
    np.testing.assert_array_equal(probs2, probs)
    # plain path unchanged
    np.testing.assert_array_equal(inferencer.predict(feats, seed=2), preds)


def test_huge_cloud_full_coverage(inferencer):
    """Clouds far beyond max_clusters*2*n_points are fully covered: the per-cluster
    capacity scales with N (reference size_min-only tiling, utils/utils.py:500-505),
    so every point gets a real model prediction — no subsample, no majority fill."""
    rng = np.random.default_rng(0)
    n = 6 * 2 * N_POINTS * 4 + 500  # would have been subsampled by a fixed cap
    feats, _ = make_cloud(rng, n)
    k = 6  # num_tiles_test caps at max_clusters_test
    cap = inferencer._cap_for(n, k)
    assert k * cap >= n, "capacity must cover the whole cloud"
    preds = inferencer.predict(feats, seed=0)
    assert preds.shape == (n,)
    assert ((preds >= 0) & (preds < 5)).all()
    # determinism: same seed → same tiling → same predictions
    np.testing.assert_array_equal(preds, inferencer.predict(feats, seed=0))


def test_cap_ladder_covers_and_bounds_programs(inferencer):
    """k*cap >= n for any n, and caps come from the geometric n_points*2^j ladder
    (bounded compiled-program count)."""
    from ampnet_tpu.ops.kmeans import num_tiles_test

    caps = set()
    for n in [10, 255, 256, 257, 511, 513, 4096, 10_000, 50_000, 300_000]:
        k = num_tiles_test(n, inferencer.n_points, inferencer.max_clusters)
        cap = inferencer._cap_for(n, k)
        assert k * cap >= n
        ratio = cap // inferencer.n_points
        assert cap % inferencer.n_points == 0 and (ratio & (ratio - 1)) == 0
        caps.add((k, cap))
    assert len(caps) <= 8  # log-bucketed


def test_bucket_fn_reuse(inferencer):
    rng = np.random.default_rng(1)
    feats, _ = make_cloud(rng, 1200)
    inferencer.predict(feats)
    before = len(inferencer._fns)
    feats, _ = make_cloud(rng, 1270)  # same (k, cap) bucket as 1200
    inferencer.predict(feats)
    assert len(inferencer._fns) == before


def test_evaluate_cloud_metrics():
    preds = np.array([0, 0, 1, 1, 2, 2])
    labels = np.array([0, 0, 1, 0, 2, 2])
    m = evaluate_cloud(preds, labels, 5)
    assert m["oa"] == pytest.approx(5 / 6)
    assert m["iou_background"] == pytest.approx(2 / 3)  # TP=2, FN=1, FP=0
    assert m["iou_tower"] == pytest.approx(1 / 2)  # TP=1, FP=1
    assert np.isnan(m["iou_low_med_veg"])  # class absent from preds+labels


class CloudListDataset:
    def __init__(self, clouds):
        self.clouds = clouds

    def __len__(self):
        return len(self.clouds)

    def __getitem__(self, i):
        f, l = self.clouds[i]
        return {"points": f, "labels": l, "name": f"cloud{i}"}


def test_evaluate_dataset_csv(inferencer, tmp_path):
    rng = np.random.default_rng(2)
    ds = CloudListDataset([make_cloud(rng, 700), make_cloud(rng, 1100)])
    csv_path = str(tmp_path / "iou_results.csv")
    out = evaluate_dataset(inferencer, ds, out_csv=csv_path)
    assert out["summary"]["n_clouds"] == 2
    assert 0.0 <= out["summary"]["oa"] <= 1.0
    assert os.path.exists(csv_path)
    header = open(csv_path).readline()
    for field in ("iou_tower", "miou", "oa", "inference_minutes"):
        assert field in header


def test_evaluate_dataset_streams_chunks(inferencer):
    """evaluate_dataset must not materialize the whole dataset: clouds are loaded
    chunk-by-chunk and earlier chunks become garbage before later ones load
    (bounded peak host memory on GB-scale test lists)."""
    import gc
    import weakref

    rng = np.random.default_rng(5)
    clouds = [make_cloud(rng, 300 + 50 * i) for i in range(5)]
    refs = {}

    class TrackingDataset(CloudListDataset):
        def __getitem__(self, i):
            # chunk_size=2: by the time cloud 4 loads, chunk {0,1} must be dead
            if i == 4:
                gc.collect()
                assert refs[0]() is None and refs[1]() is None, (
                    "first chunk still resident while loading cloud 4"
                )
            f, l = self.clouds[i]
            f = f.copy()  # fresh array per load so weakrefs track residency
            refs[i] = weakref.ref(f)
            return {"points": f, "labels": l, "name": f"cloud{i}"}

    ds = TrackingDataset(clouds)
    out = evaluate_dataset(inferencer, ds, chunk_size=2)
    assert out["summary"]["n_clouds"] == 5


def test_predict_many_matches_single(inferencer):
    rng = np.random.default_rng(9)
    clouds = [make_cloud(rng, n)[0] for n in (150, 700, 730, 1200)]
    singles = [inferencer.predict(c, seed=i) for i, c in enumerate(clouds)]
    batched = inferencer.predict_many(clouds)
    for s, b in zip(singles, batched):
        assert s.shape == b.shape
        # identical seeds → identical tiling & padding → identical predictions
        np.testing.assert_array_equal(s, b)


def test_mega_cloud_spatial_halving(inferencer):
    """Clouds beyond max_points_per_call split spatially and recurse — every
    point still predicted, no single device program beyond the budget."""
    import dataclasses

    rng = np.random.default_rng(7)
    feats, _ = make_cloud(rng, 3000)
    small = TiledInferencer(
        inferencer.model, inferencer.variables, inferencer.cfg,
        max_clusters=6, max_points_per_call=1000,
    )
    preds = small.predict(feats, seed=0)
    assert preds.shape == (3000,)
    assert ((preds >= 0) & (preds < 5)).all()
    # deterministic and consistent through predict_many's routing
    batched = small.predict_many([feats], seeds=[0])[0]
    np.testing.assert_array_equal(preds, batched)


def test_host_sharded_batcher_rejects_drop_last_false():
    from ampnet_tpu.data.pipeline import HostShardedBatcher

    class _DS:
        def __len__(self):
            return 10

    import pytest as _pytest

    with _pytest.raises(ValueError, match="drop_last"):
        HostShardedBatcher(_DS(), 4, host_id=0, host_count=2, drop_last=False)


def test_float16_transfer_dtype_predictions_close(inferencer):
    """transfer_dtype='float16' only changes the wire format (compute stays
    fp32): predictions agree with the fp32 transfer on all but a sliver of
    quantization-boundary points."""
    rng = np.random.default_rng(11)
    feats, _ = make_cloud(rng, 1200)
    f16 = TiledInferencer(inferencer.model, inferencer.variables, inferencer.cfg,
                          max_clusters=6, transfer_dtype="float16")
    a = inferencer.predict(feats, seed=3)
    b = f16.predict(feats, seed=3)
    assert (a == b).mean() > 0.97, (a != b).mean()


def test_int8_transfer_dtype_predictions_close(inferencer):
    """transfer_dtype='int8' affine-quantizes the wire per cloud per column
    (max error = column range / 254; decode on device — _encode_batch /
    _bucket_fn to_f32): predictions agree with the fp32 transfer on all but
    quantization-boundary points, at 1/4 the wire bytes."""
    rng = np.random.default_rng(17)
    feats, _ = make_cloud(rng, 1200)
    q8 = TiledInferencer(inferencer.model, inferencer.variables, inferencer.cfg,
                         max_clusters=6, transfer_dtype="int8")
    a = inferencer.predict(feats, seed=3)
    b = q8.predict(feats, seed=3)
    assert (a == b).mean() > 0.95, (a != b).mean()
    # routing through predict_many's batched path is consistent with predict
    batched = q8.predict_many([feats], seeds=[3])[0]
    np.testing.assert_array_equal(b, batched)


def test_int8_encode_roundtrip_error_bound():
    """Quantize→dequantize error is bounded by column range / 254 and
    constant columns decode exactly."""
    from ampnet_tpu.core.config import AMPNetConfig
    from ampnet_tpu.models.amp import AMPNetSegmenter

    cfg = AMPNetConfig()
    model = AMPNetSegmenter(cfg.model)
    inf = TiledInferencer(model, {}, cfg, max_clusters=4, transfer_dtype="int8")
    rng = np.random.default_rng(5)
    rows = rng.normal(size=(3, 64, 9)).astype(np.float32)
    rows[:, :, 4] = 0.7  # constant column
    q, scale, lo = inf._encode_batch(rows)
    assert q.dtype == np.int8
    dec = (q.astype(np.float32) + 127.0) * scale[:, None, :] + lo[:, None, :]
    bound = (rows.max(axis=1) - rows.min(axis=1)) / 254.0 * 0.5 + 1e-6
    assert (np.abs(dec - rows) <= bound[:, None, :]).all()
    np.testing.assert_array_equal(dec[:, :, 4], rows[:, :, 4])


def test_mesh_sharded_serving_matches_single_device(inferencer):
    """TiledInferencer(mesh=...) shards the cloud batch over the mesh with
    replicated variables; predictions must match single-device exactly."""
    from ampnet_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(13)
    clouds = [make_cloud(rng, n)[0] for n in (700, 730, 1200, 900, 760)]
    single = inferencer.predict_many(clouds)
    sharded = TiledInferencer(
        inferencer.model, inferencer.variables, inferencer.cfg,
        max_clusters=6, mesh=make_mesh(8),
    )
    multi = sharded.predict_many(clouds)
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a, b)


def test_mesh_sharded_ensemble_matches_single_device(inferencer):
    """EnsembleInferencer over mesh-sharded members: the cross-family wrapper
    composes with TiledInferencer(mesh=...) — per-member programs shard the
    cloud batch, the host-side mean is unchanged, so predictions must equal
    the single-device ensemble exactly."""
    from ampnet_tpu.infer.tiled import EnsembleInferencer
    from ampnet_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(14)
    cfg2 = AMPNetConfig(
        data=DataConfig(n_points=128, max_clusters_test=3),
        model=ModelConfig(dropout=0.0),
    )
    model2 = AMPNetSegmenter(cfg2.model)
    pts = rng.normal(size=(1, 2, 128, 9)).astype(np.float32)
    cent = rng.normal(size=(1, 2, 2)).astype(np.float32)
    v2 = model2.init(jax.random.PRNGKey(21), pts, cent, None)

    clouds = [make_cloud(rng, n)[0] for n in (700, 450, 900)]
    single = EnsembleInferencer(
        [inferencer, TiledInferencer(model2, v2, cfg2)]
    ).predict_many(clouds)
    mesh = make_mesh(8)
    sharded = EnsembleInferencer([
        TiledInferencer(inferencer.model, inferencer.variables, inferencer.cfg,
                        max_clusters=6, mesh=mesh),
        TiledInferencer(model2, v2, cfg2, mesh=mesh),
    ])
    multi = sharded.predict_many(clouds)
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a, b)


def test_whole_cloud_eval_for_single_window_models():
    """Non-windowed archs (baseline/classic/pointnet2) evaluate the WHOLE cloud
    (reference baseline tester semantics, test_segmentation.py batch-1 full
    cloud): max_clusters=1 gives one capacity-ladder bucket whose predictions
    equal a direct forward on the replicate-padded cloud."""
    import jax.numpy as jnp

    from ampnet_tpu.models.factory import build_model

    cfg = AMPNetConfig(
        data=DataConfig(n_points=64, max_clusters_test=1),
        model=ModelConfig(context="classic", dropout=0.0),
    )
    model = build_model(cfg, "classic", "segmentation")
    rng = np.random.default_rng(0)
    pts0 = rng.normal(size=(1, 1, 64, 9)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts0, None, None)
    inf = TiledInferencer(model, variables, cfg, n_points=64, max_clusters=1)

    cloud, _ = make_cloud(rng, 300)
    preds = inf.predict(cloud, seed=0)
    assert preds.shape == (300,)

    # manual whole-cloud forward on the same replicate padding
    cap = inf._cap_for(300, 1)
    dup = np.random.default_rng(0).integers(0, 300, cap - 300)
    padded = np.concatenate([cloud, cloud[dup]])[None, None]  # [1, 1, cap, 9]
    logits, _, _ = model.apply(variables, jnp.asarray(padded), None, None, train=False)
    manual = np.asarray(jnp.argmax(logits, -1))[0, 0, :300]
    np.testing.assert_array_equal(preds, manual)


def test_dihedral_xy_group_properties():
    from ampnet_tpu.infer.tiled import dihedral_xy

    rng = np.random.default_rng(7)
    pc = rng.normal(size=(50, 9)).astype(np.float32)
    # four 90-degree rotations compose to the identity
    out = pc
    for _ in range(4):
        out = dihedral_xy(out, 1)
    np.testing.assert_array_equal(out, pc)
    # a mirror is an involution
    np.testing.assert_array_equal(dihedral_xy(dihedral_xy(pc, 4), 4), pc)
    # non-coordinate features never change, z included
    for t in range(8):
        np.testing.assert_array_equal(dihedral_xy(pc, t)[:, 2:], pc[:, 2:])
    # rotation preserves radii exactly (integer swaps, no trig)
    r0 = pc[:, 0] ** 2 + pc[:, 1] ** 2
    r1 = dihedral_xy(pc, 1)[:, 0] ** 2 + dihedral_xy(pc, 1)[:, 1] ** 2
    np.testing.assert_array_equal(r0, r1)


def test_predict_tta_single_transform_matches_predict(inferencer):
    rng = np.random.default_rng(11)
    cloud, _ = make_cloud(rng, 900)
    np.testing.assert_array_equal(
        inferencer.predict_tta(cloud, seed=3, transforms=1),
        inferencer.predict(cloud, seed=3),
    )


def test_predict_tta_runs_and_is_deterministic(inferencer):
    rng = np.random.default_rng(12)
    cloud, _ = make_cloud(rng, 700)
    a = inferencer.predict_tta(cloud, seed=0, transforms=4)
    b = inferencer.predict_tta(cloud, seed=0, transforms=4)
    assert a.shape == (700,)
    np.testing.assert_array_equal(a, b)
    preds, probs = inferencer.predict_tta(cloud, seed=0, transforms=4,
                                          return_probs=True)
    np.testing.assert_array_equal(preds, a)
    assert probs.shape == (700, inferencer.cfg.model.num_classes)
    # averaged probabilities still sum to one per point
    np.testing.assert_allclose(probs.astype(np.float64).sum(-1), 1.0, atol=2e-2)


def test_evaluate_dataset_tta(inferencer):
    rng = np.random.default_rng(13)
    ds = CloudListDataset([make_cloud(rng, 700), make_cloud(rng, 1100)])
    out = evaluate_dataset(inferencer, ds, tta=2)
    assert out["summary"]["n_clouds"] == 2
    assert 0.0 <= out["summary"]["oa"] <= 1.0


def test_tile_votes_overlap_vote(inferencer):
    """Overlap-vote inference (tta_ensemble votes semantics): each vote uses a
    distinct prediction seed, which drives BOTH the balanced-k-means init and
    the replicate padding — so votes partition the cloud differently and the
    mean-probability ensemble differs from any single pass. Deterministic,
    composes with tta, exact expansion indexing vs a manual mean."""
    from ampnet_tpu.infer.tiled import dihedral_xy, tta_ensemble

    rng = np.random.default_rng(21)
    cloud, _ = make_cloud(rng, 1100)  # big enough for k > 1 (real tiling)
    a = inferencer.predict_tta(cloud, seed=0, transforms=1, votes=3)
    b = inferencer.predict_tta(cloud, seed=0, transforms=1, votes=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1100,)
    # votes=1 degenerates to plain predict
    np.testing.assert_array_equal(
        inferencer.predict_tta(cloud, seed=4, transforms=1, votes=1),
        inferencer.predict(cloud, seed=4),
    )
    # manual-mean parity for the (T=2, V=2) expansion indexing
    T, V, seeds = 2, 2, [7]
    ((preds, mean),) = tta_ensemble(
        lambda cs, sd: inferencer.predict_many(cs, seeds=sd, return_probs=True),
        [cloud], T, seeds=seeds, votes=V,
    )
    expanded = [dihedral_xy(cloud, t) for t in range(T) for _ in range(V)]
    eseeds = [seeds[0] * T * V + t * V + v for t in range(T) for v in range(V)]
    raw = inferencer.predict_many(expanded, seeds=eseeds, return_probs=True)
    want = np.mean([np.asarray(p, np.float32) for _, p in raw], axis=0)
    np.testing.assert_allclose(mean, want, atol=1e-6)
    np.testing.assert_array_equal(preds, np.argmax(want, -1))
    # evaluate_dataset plumbs tile_votes through (chunk shrinks by tta*votes)
    ds = CloudListDataset([make_cloud(rng, 700)])
    out = evaluate_dataset(inferencer, ds, tta=1, tile_votes=2)
    assert out["summary"]["n_clouds"] == 1
    with pytest.raises(ValueError, match="votes"):
        evaluate_dataset(inferencer, ds, tile_votes=0)


def test_tta_ensemble_rejects_out_of_range(inferencer):
    """dihedral_xy has period 8: T > 8 would silently average duplicate views
    (review finding), T < 1 is meaningless — both are loud errors everywhere."""
    from ampnet_tpu.infer.tiled import tta_ensemble

    rng = np.random.default_rng(14)
    cloud, _ = make_cloud(rng, 300)
    pm = lambda cs, sd: inferencer.predict_many(cs, seeds=sd, return_probs=True)
    for bad in (0, 9, -3, 12):
        with pytest.raises(ValueError, match="1..8"):
            tta_ensemble(pm, [cloud], bad)
    ds = CloudListDataset([(cloud, np.zeros(300, np.int32))])
    with pytest.raises(ValueError, match="1..8"):
        evaluate_dataset(inferencer, ds, tta=9)


def test_tta_ensemble_matches_manual_mean(inferencer):
    """The shared helper's expand/regroup indexing equals the hand-rolled
    ensemble it replaced at every former call site."""
    from ampnet_tpu.infer.tiled import dihedral_xy, tta_ensemble

    rng = np.random.default_rng(15)
    clouds = [make_cloud(rng, n)[0] for n in (300, 450)]
    T, seeds = 3, [5, 6]
    got = tta_ensemble(
        lambda cs, sd: inferencer.predict_many(cs, seeds=sd, return_probs=True),
        clouds, T, seeds=seeds,
    )
    expanded = [dihedral_xy(c, t) for c in clouds for t in range(T)]
    eseeds = [s * T + t for s in seeds for t in range(T)]
    raw = inferencer.predict_many(expanded, seeds=eseeds, return_probs=True)
    for ci, (preds, mean) in enumerate(got):
        want = np.mean(
            [np.asarray(raw[ci * T + t][1], np.float32) for t in range(T)], axis=0
        )
        np.testing.assert_allclose(mean, want, atol=1e-6)
        np.testing.assert_array_equal(preds, np.argmax(want, -1))


def _make_ensemble_parts():
    cfg = AMPNetConfig(
        data=DataConfig(n_points=N_POINTS, max_clusters_test=6),
        model=ModelConfig(dropout=0.0),
    )
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 2, N_POINTS, 9)).astype(np.float32)
    cent = rng.normal(size=(1, 2, 2)).astype(np.float32)
    v1 = model.init(jax.random.PRNGKey(0), pts, cent, None)
    v2 = model.init(jax.random.PRNGKey(7), pts, cent, None)
    return cfg, model, v1, v2


def test_ensemble_of_identical_checkpoints_matches_single():
    """M copies of the same checkpoint average to the checkpoint itself —
    the vmapped ensemble program must agree with the single-model program."""
    cfg, model, v1, _ = _make_ensemble_parts()
    single = TiledInferencer(model, v1, cfg)
    ens = TiledInferencer(model, [v1, v1], cfg)
    assert single.ensemble == 1 and ens.ensemble == 2
    rng = np.random.default_rng(31)
    cloud, _ = make_cloud(rng, 800)
    p1, pr1 = single.predict(cloud, seed=5, return_probs=True)
    p2, pr2 = ens.predict(cloud, seed=5, return_probs=True)
    np.testing.assert_array_equal(p1, p2)
    # fp16 wire both sides; identical members -> identical mean
    np.testing.assert_allclose(np.asarray(pr1, np.float32),
                               np.asarray(pr2, np.float32), atol=2e-3)


def test_cross_geometry_ensemble_alignment():
    """EnsembleInferencer members with DIFFERENT window geometry (n_points,
    max_clusters — so the same cloud tiles differently per member) still
    average index-exactly: each member's bucket program scatters back to
    original point order before the host-side mean."""
    from ampnet_tpu.infer.tiled import EnsembleInferencer

    rng = np.random.default_rng(2)
    members = []
    for n_pts, max_k, seed in ((N_POINTS, 6, 0), (128, 3, 7)):
        cfg = AMPNetConfig(
            data=DataConfig(n_points=n_pts, max_clusters_test=max_k),
            model=ModelConfig(dropout=0.0),
        )
        model = AMPNetSegmenter(cfg.model)
        pts = rng.normal(size=(1, 2, n_pts, 9)).astype(np.float32)
        cent = rng.normal(size=(1, 2, 2)).astype(np.float32)
        v = model.init(jax.random.PRNGKey(seed), pts, cent, None)
        members.append(TiledInferencer(model, v, cfg))
    assert members[0].n_points != members[1].n_points
    ens = EnsembleInferencer(members)
    assert ens.ensemble == 2

    clouds = [make_cloud(rng, n)[0] for n in (700, 450)]
    got = ens.predict_many(clouds, seeds=[3, 4], return_probs=True)
    per = [m.predict_many(clouds, seeds=[3, 4], return_probs=True)
           for m in members]
    for i in range(len(clouds)):
        want = np.mean([np.asarray(p[i][1], np.float32) for p in per], axis=0)
        np.testing.assert_allclose(np.asarray(got[i][1], np.float32), want,
                                   atol=2e-3)
        np.testing.assert_array_equal(got[i][0], np.argmax(want, -1))

    # wrapper guards: singletons and num_classes disagreements are errors
    with pytest.raises(ValueError):
        EnsembleInferencer(members[:1])
    bad_cfg = AMPNetConfig(data=DataConfig(n_points=128),
                           model=ModelConfig(num_classes=3, dropout=0.0))
    bad_model = AMPNetSegmenter(bad_cfg.model)
    bp = rng.normal(size=(1, 2, 128, 9)).astype(np.float32)
    bc = rng.normal(size=(1, 2, 2)).astype(np.float32)
    bad = TiledInferencer(
        bad_model, bad_model.init(jax.random.PRNGKey(1), bp, bc, None), bad_cfg
    )
    with pytest.raises(ValueError):
        EnsembleInferencer([members[0], bad])


def test_ensemble_averages_member_probabilities():
    """The 2-member ensemble's probabilities equal the mean of the members'
    (computed on device in float32; members' fetched fp16 probs bound atol)."""
    cfg, model, v1, v2 = _make_ensemble_parts()
    a = TiledInferencer(model, v1, cfg)
    b = TiledInferencer(model, v2, cfg)
    ens = TiledInferencer(model, [v1, v2], cfg)
    rng = np.random.default_rng(32)
    cloud, _ = make_cloud(rng, 700)
    _, pra = a.predict(cloud, seed=9, return_probs=True)
    _, prb = b.predict(cloud, seed=9, return_probs=True)
    pe, pre = ens.predict(cloud, seed=9, return_probs=True)
    want = (np.asarray(pra, np.float32) + np.asarray(prb, np.float32)) / 2
    np.testing.assert_allclose(np.asarray(pre, np.float32), want, atol=2e-3)
    # argmax of the mean (ties are vanishingly unlikely at random init)
    np.testing.assert_array_equal(pe, np.argmax(want, -1))
    # a singleton list unwraps to the plain single-model path
    assert TiledInferencer(model, [v1], cfg).ensemble == 1
