"""CLI-level tests: parser wiring, list loading, and the fast subcommands.

The heavy end-to-end paths (demo/train/test) are exercised by the project verify
skill on the real CLI; these tests cover the pure-host commands and error paths so
the suite stays fast.
"""

import json
import os

import numpy as np
import pytest

from ampnet_tpu.cli.main import build_parser, cmd_fps, cmd_preprocess, cmd_synth, main


def ns(**kw):
    import argparse

    return argparse.Namespace(**kw)


def test_parser_covers_all_subcommands():
    p = build_parser()
    for cmd in ("synth", "preprocess", "train", "test", "infer", "demo", "fps",
                "export"):
        args = p.parse_args([cmd] + {
            "synth": ["--out_path", "/tmp/x"],
            "preprocess": ["--in_path", "/tmp/a", "--out_path", "/tmp/b"],
            "train": ["/tmp/d"],
            "test": ["/tmp/d", "--model_checkpoint", "c", "--path_list_files", "l"],
            "infer": ["/tmp/d", "--model_checkpoint", "c"],
            "demo": [],
            "fps": ["--in_path", "/tmp/a", "--out_path", "/tmp/b"],
            "export": ["--model_checkpoint", "c", "--out", "/tmp/m.pth"],
        }[cmd])
        assert callable(args.fn)


def test_synth_and_preprocess_roundtrip(tmp_path):
    las_dir, out_dir = str(tmp_path / "las"), str(tmp_path / "out")
    rc = cmd_synth(ns(out_path=las_dir, n_tiles=1, windows_per_tile=2,
                      points_per_window=2000, window_size=50.0, seed=0))
    assert rc == 0
    assert len(os.listdir(las_dir)) == 1

    rc = cmd_preprocess(ns(in_path=las_dir, out_path=out_dir, dataset="T",
                           window_size=50.0, max_z=100.0, min_points=200,
                           n_points=256, max_windows=4, hag_cell=2.0, seed=0,
                           artifact_format="npz"))
    assert rc == 0
    files = os.listdir(out_dir)
    assert any(f.endswith(".pkl") for f in files)
    assert any(f.startswith("kmeans_") for f in files)
    assert "train_seg_files.txt" in files

    # canonical schema invariants on a produced artifact
    from ampnet_tpu.data.io_utils import load_cloud

    pkl = next(f for f in files if f.endswith(".pkl") and not f.startswith("kmeans"))
    pc = load_cloud(os.path.join(out_dir, pkl))
    assert pc.shape[1] == 13
    assert pc[:, 0].min() >= 0 and pc[:, 0].max() <= 1


def test_preprocess_blocks_json_splits(tmp_path):
    """--blocks_json assigns windows to splits by geographic block membership
    (generate_train_test_lists.py:106-210) instead of randomly."""
    las_dir, out_dir = str(tmp_path / "las"), str(tmp_path / "out")
    cmd_synth(ns(out_path=las_dir, n_tiles=3, windows_per_tile=2,
                 points_per_window=2000, window_size=50.0, seed=0))
    blocks = {"train": ["tile0", "tile1"], "val": ["tile2"], "test": []}
    bj = str(tmp_path / "blocks.json")
    with open(bj, "w") as f:
        json.dump(blocks, f)

    rc = cmd_preprocess(ns(in_path=las_dir, out_path=out_dir, dataset="T",
                           window_size=50.0, max_z=100.0, min_points=200,
                           n_points=256, max_windows=4, hag_cell=2.0, seed=0,
                           artifact_format="npz", blocks_json=[bj]))
    assert rc == 0
    train = open(os.path.join(out_dir, "train_seg_files.txt")).read()
    val = open(os.path.join(out_dir, "val_seg_files.txt")).read()
    assert train and val
    assert all("tile0" in ln or "tile1" in ln for ln in train.splitlines())
    assert all("tile2" in ln for ln in val.splitlines())
    # every produced window landed in exactly its block's split
    assert "tile2" not in train and "tile0" not in val


def test_preprocess_worker_pool_matches_serial(tmp_path):
    """--workers N must produce byte-identical artifacts and split lists to a
    serial run (reference parallelism: 2_preprocessing_filter_norm.py:145-152,
    3_kmeans.py:119-127). Same assigner on both sides isolates the pool."""
    las_dir = str(tmp_path / "las")
    cmd_synth(ns(out_path=las_dir, n_tiles=2, windows_per_tile=2,
                 points_per_window=1500, window_size=50.0, seed=1))
    outs = {}
    for label, workers in (("serial", 1), ("pooled", 2)):
        out_dir = str(tmp_path / label)
        rc = cmd_preprocess(ns(in_path=las_dir, out_path=out_dir, dataset="T",
                               window_size=50.0, max_z=100.0, min_points=200,
                               n_points=128, max_windows=3, hag_cell=2.0, seed=0,
                               artifact_format="npz", workers=workers,
                               assigner="exact_mcf"))
        assert rc == 0
        outs[label] = out_dir
    serial_files = sorted(os.listdir(outs["serial"]))
    assert serial_files == sorted(os.listdir(outs["pooled"]))
    for f in serial_files:
        a, b = os.path.join(outs["serial"], f), os.path.join(outs["pooled"], f)
        if f.endswith(".txt"):
            assert open(a).read() == open(b).read(), f
        elif f.endswith(".npz"):
            xa, xb = np.load(a), np.load(b)
            np.testing.assert_array_equal(xa[xa.files[0]], xb[xb.files[0]], err_msg=f)
        else:  # the .pkl windows — byte-identical
            assert open(a, "rb").read() == open(b, "rb").read(), f


def test_preprocess_skips_corrupt_tile(tmp_path, capsys):
    """A corrupt tile is skipped (reference imap_unordered robustness) as long
    as something was produced; an ALL-failed run exits non-zero so chained
    scripts stop at the diagnostic instead of an empty train list later."""
    las_dir, out_dir = tmp_path / "las", tmp_path / "out"
    las_dir.mkdir()
    (las_dir / "bad.las").write_bytes(b"NOT A LAS FILE")
    kw = dict(in_path=str(las_dir), out_path=str(out_dir), dataset="T",
              window_size=50.0, max_z=100.0, min_points=10,
              n_points=64, max_windows=2, hag_cell=2.0, seed=0,
              artifact_format="npz")
    rc = cmd_preprocess(ns(**kw))
    assert rc == 1  # nothing produced at all
    out = capsys.readouterr()
    assert "skipped" in out.err or "skipped" in out.out

    # with one good tile alongside, the bad one skips and the run succeeds
    from ampnet_tpu.cli.main import cmd_synth

    cmd_synth(ns(out_path=str(las_dir), n_tiles=1, windows_per_tile=1,
                 points_per_window=800, window_size=50.0, seed=0,
                 landscape_fraction=0.0))
    rc = cmd_preprocess(ns(**kw))
    assert rc == 0
    out = capsys.readouterr()
    assert "skipped" in out.err or "skipped" in out.out


def test_fps_command(tmp_path):
    from ampnet_tpu.data.io_utils import load_cloud, save_cloud

    ind, outd = tmp_path / "in", tmp_path / "out"
    ind.mkdir()
    rng = np.random.default_rng(0)
    save_cloud(str(ind / "a.pkl"), rng.random((300, 13)).astype(np.float32))
    rc = cmd_fps(ns(in_path=str(ind), out_path=str(outd), n_points=64))
    assert rc == 0
    assert load_cloud(str(outd / "a.pkl")).shape[0] == 64


def test_main_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])


def test_restore_model_honors_recorded_arch(tmp_path):
    """A checkpoint trained with --arch gru must restore through _restore_model
    without the caller repeating --arch (regression: the template was built from
    args.arch='attention' and orbax failed on the mismatched context tree).
    Mirrors the reference tester reading hyperparams out of the checkpoint
    (test_pointnet_att_segmen.py:87-94)."""
    from test_trainer import MemoryDataset

    from ampnet_tpu.cli.main import _restore_model
    from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
    from ampnet_tpu.data.pipeline import PaddedBatcher
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.trainer import Trainer

    cfg = AMPNetConfig(model=ModelConfig(context="gru"),
                       train=TrainConfig(batch_size=3, epochs=1))
    ds = MemoryDataset(n_items=3)
    batcher = PaddedBatcher(ds, 3, n_points=96, max_windows=4, seed=0, prefetch=0)
    model = build_model(cfg, "gru", "segmentation")
    tr = Trainer(cfg, model, batcher, batcher, str(tmp_path), name="gru_segmentation")
    tr.fit(epochs=1)
    ckpt = os.path.join(str(tmp_path), "checkpoints", "gru_segmentation_best")
    assert os.path.isdir(ckpt)

    # default --arch attention: must still build + restore the recorded gru model
    restored = _restore_model(
        ns(model_checkpoint=ckpt, arch="attention", task="segmentation"),
        "segmentation")
    assert restored is not None
    rcfg, _, state, _ = restored
    assert rcfg.model.context == "gru"
    assert "gru" in state.params["context"]


def test_restore_model_att_geom_tokens_checkpoint(tmp_path):
    """An --att_geom_tokens checkpoint must restore through _restore_model
    (regression, round 5: the template state was initialized with a 9-feature
    synthetic batch regardless of the recorded input width, and the attg
    model's trace-time feature-count validation rejected it BEFORE orbax
    could restore — every attg eval died in cmd_test while training worked)."""
    import dataclasses

    import numpy as np

    from test_trainer import MemoryDataset

    from ampnet_tpu.cli.main import _restore_model
    from ampnet_tpu.core.config import (AMPNetConfig, DataConfig, ModelConfig,
                                        TrainConfig)
    from ampnet_tpu.data.pipeline import PaddedBatcher
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.trainer import Trainer

    class GeomMemoryDataset(MemoryDataset):
        def __init__(self):
            super().__init__(n_items=3)
            rng = np.random.default_rng(1)
            for s in self.samples:  # append 6 stand-in eigenfeature columns
                g = rng.random((*s["points"].shape[:2], 6), np.float32)
                s["points"] = np.concatenate([s["points"], g], axis=2)

    cfg = AMPNetConfig(
        data=dataclasses.replace(DataConfig(), extra_features=6),
        model=dataclasses.replace(ModelConfig(), att_geom_tokens=True),
        train=TrainConfig(batch_size=3, epochs=1))
    batcher = PaddedBatcher(GeomMemoryDataset(), 3, n_points=96, max_windows=4,
                            seed=0, prefetch=0)
    model = build_model(cfg, "attention", "segmentation")
    tr = Trainer(cfg, model, batcher, batcher, str(tmp_path),
                 name="attention_segmentation")
    tr.fit(epochs=1)
    ckpt = os.path.join(str(tmp_path), "checkpoints",
                        "attention_segmentation_best")
    assert os.path.isdir(ckpt)

    restored = _restore_model(
        ns(model_checkpoint=ckpt, arch="attention", task="segmentation"),
        "segmentation")
    assert restored is not None
    rcfg, _, state, _ = restored
    assert rcfg.model.att_geom_tokens and rcfg.data.extra_features == 6


def test_seg_class_weights_from_histogram():
    """--seg_weighing computes CE weights from the train label histogram:
    rarer classes get strictly larger weights (INS/ISNS), unknown methods
    return None (reference get_weights4class semantics, get_metrics.py:54-77)."""
    from test_trainer import MemoryDataset

    from ampnet_tpu.cli.main import seg_class_weights

    ds = MemoryDataset(n_items=4)
    for method in ("INS", "ISNS", "sklearn", "EFS"):
        w, counts = seg_class_weights(ds, method, 5, beta=0.999)
        assert w is not None and len(w) == 5
        assert abs(float(np.sum(w)) - 1.0) < 1e-5
        assert counts.sum() > 0
    # INS weights are strictly inverse-monotone in the counts (ties → equal)
    w, counts = seg_class_weights(ds, "INS", 5, beta=0.999)
    w = np.asarray(w)
    for i in range(5):
        for j in range(5):
            if counts[i] < counts[j]:
                assert w[i] > w[j], (counts, w)
            elif counts[i] == counts[j]:
                assert abs(w[i] - w[j]) < 1e-6
    assert seg_class_weights(ds, "nope", 5, beta=0.999)[0] is None


def test_grad_accum_rejected_for_classification(capsys):
    from ampnet_tpu.cli.main import cmd_train

    rc = cmd_train(ns(dataset_path="/nonexistent", task="classification",
                      arch="baseline", path_list_files="/nonexistent",
                      out_path="/tmp/na", number_of_points=64,
                      number_of_windows=2, batch_size=8, epochs=1,
                      learning_rate=1e-3, weighing_method="EFS", seed=0,
                      model_checkpoint="", num_devices=1, bn_mode="batch",
                      dtype="float32", grad_accum=4))
    assert rc == 1
    assert "segmentation-only" in capsys.readouterr().err


def test_cls_test_without_arch_uses_recorded_config(tmp_path):
    """ampnet test --task classification on a baseline checkpoint without
    --arch must follow the checkpoint-recorded arch for BOTH the model AND the
    dataset/batcher (regression: the batcher gate read args.arch and fed
    multi-window batches to the single-window model)."""
    from ampnet_tpu.cli.main import cmd_preprocess, cmd_test, cmd_train

    las, proc = str(tmp_path / "las"), str(tmp_path / "proc")
    assert cmd_synth(ns(out_path=las, n_tiles=2, windows_per_tile=1,
                        points_per_window=1200, window_size=50.0, seed=0,
                        landscape_fraction=0.5)) == 0
    assert cmd_preprocess(ns(in_path=las, out_path=proc, dataset="T",
                             window_size=50.0, max_z=100.0, min_points=100,
                             n_points=64, max_windows=2, hag_cell=2.0, seed=0,
                             artifact_format="npz")) == 0
    run = str(tmp_path / "run")
    assert cmd_train(ns(dataset_path=proc, task="classification",
                        arch="baseline", path_list_files=proc, out_path=run,
                        number_of_points=64, number_of_windows=2, batch_size=2,
                        epochs=1, learning_rate=1e-3, weighing_method="EFS",
                        seed=0, model_checkpoint="", num_devices=1,
                        bn_mode="batch", dtype="float32", grad_accum=1,
                        device_cache="off", epoch_dispatch="off")) == 0
    ckpt = os.path.join(run, "checkpoints", "baseline_classification_best")
    assert os.path.isdir(ckpt)
    # NO --arch (defaults to attention): recorded config must win end to end
    assert cmd_test(ns(dataset_path=proc, task="classification", arch="attention",
                       model_checkpoint=ckpt, path_list_files=proc,
                       out_path=str(tmp_path / "res"), max_clusters=4,
                       plot=False)) == 0


def test_restore_variables_ensemble(tmp_path):
    """Comma-separated --model_checkpoint restores a checkpoint LIST whose
    TiledInferencer runs as an on-device probability-averaging ensemble;
    mismatched geometries are a clean error (no reference counterpart — its
    tester loads exactly one .pth)."""
    from test_trainer import MemoryDataset

    from ampnet_tpu.cli.main import _restore_variables
    from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
    from ampnet_tpu.data.pipeline import PaddedBatcher
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.trainer import Trainer

    ckpts = []
    for seed, name in ((0, "a"), (1, "b")):
        cfg = AMPNetConfig(model=ModelConfig(context="attention"),
                           train=TrainConfig(batch_size=3, epochs=1, seed=seed))
        ds = MemoryDataset(n_items=3)
        batcher = PaddedBatcher(ds, 3, n_points=96, max_windows=4, seed=seed,
                                prefetch=0)
        model = build_model(cfg, "attention", "segmentation")
        out = os.path.join(str(tmp_path), name)
        tr = Trainer(cfg, model, batcher, batcher, out,
                     name="attention_segmentation")
        tr.fit(epochs=1)
        ckpts.append(os.path.join(out, "checkpoints",
                                  "attention_segmentation_best"))

    restored = _restore_variables(
        ns(model_checkpoint=",".join(ckpts), arch="attention",
           task="segmentation"), "segmentation")
    assert restored is not None
    groups, name = restored
    # same signature -> ONE stacked group (the on-device vmap fast path)
    assert len(groups) == 1
    cfg, model, variables = groups[0]
    assert isinstance(variables, list) and len(variables) == 2
    assert name.count("+") == 1

    from ampnet_tpu.infer.tiled import TiledInferencer

    inf = TiledInferencer(model, variables, cfg)
    assert inf.ensemble == 2
    rng = np.random.default_rng(3)
    cloud = rng.normal(size=(300, 9)).astype(np.float32)
    preds, probs = inf.predict(cloud, return_probs=True)
    assert preds.shape == (300,) and probs.shape[0] == 300
    # ensemble mean is the mean of the two members' probabilities
    singles = [TiledInferencer(model, v, cfg) for v in variables]
    want = np.mean([np.asarray(s.predict(cloud, return_probs=True)[1],
                               np.float32) for s in singles], axis=0)
    np.testing.assert_allclose(np.asarray(probs, np.float32), want, atol=2e-3)


def test_restore_variables_cross_family_ensemble(tmp_path):
    """A gru member cannot stack leaf-wise with an attention member (different
    variable trees) — it lands in its OWN group, and _make_seg_inferencer
    wraps the groups in the cross-family EnsembleInferencer whose per-point
    probabilities are the mean of the members' (each member scatters back to
    original point order, so no resample alignment is needed)."""
    from test_trainer import MemoryDataset

    from ampnet_tpu.cli.main import _make_seg_inferencer, _restore_variables
    from ampnet_tpu.core.config import AMPNetConfig, ModelConfig, TrainConfig
    from ampnet_tpu.data.pipeline import PaddedBatcher
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.trainer import Trainer

    ckpts = []
    for arch in ("attention", "gru"):
        cfg = AMPNetConfig(model=ModelConfig(context=arch),
                           train=TrainConfig(batch_size=3, epochs=1))
        ds = MemoryDataset(n_items=3)
        batcher = PaddedBatcher(ds, 3, n_points=96, max_windows=4, prefetch=0)
        model = build_model(cfg, arch, "segmentation")
        out = os.path.join(str(tmp_path), arch)
        tr = Trainer(cfg, model, batcher, batcher, out,
                     name=f"{arch}_segmentation")
        tr.fit(epochs=1)
        ckpts.append(os.path.join(out, "checkpoints",
                                  f"{arch}_segmentation_best"))

    restored = _restore_variables(
        ns(model_checkpoint=",".join(ckpts), arch="attention",
           task="segmentation"), "segmentation")
    assert restored is not None
    groups, name = restored
    assert len(groups) == 2 and name.count("+") == 1
    assert {c.model.context for c, _, _ in groups} == {"attention", "gru"}

    from ampnet_tpu.infer.tiled import EnsembleInferencer, TiledInferencer

    ens = _make_seg_inferencer(groups, max_clusters_windowed=4)
    assert isinstance(ens, EnsembleInferencer) and ens.ensemble == 2
    rng = np.random.default_rng(3)
    cloud = rng.normal(size=(300, 9)).astype(np.float32)
    preds, probs = ens.predict(cloud, seed=5, return_probs=True)
    assert preds.shape == (300,) and probs.shape[0] == 300
    singles = [TiledInferencer(m, v, c, max_clusters=4) for c, m, v in groups]
    want = np.mean([np.asarray(s.predict(cloud, seed=5, return_probs=True)[1],
                               np.float32) for s in singles], axis=0)
    np.testing.assert_allclose(np.asarray(probs, np.float32), want, atol=2e-3)
    np.testing.assert_array_equal(preds, np.argmax(want, -1))
    # TTA composes through the wrapper exactly as through TiledInferencer
    pt = ens.predict_tta(cloud, seed=5, transforms=2)
    assert pt.shape == (300,)


def test_train_with_distillation_cli(tmp_path, capsys):
    """--distill_from: the student trains against a frozen teacher checkpoint
    restored through the ensemble grouping machinery; distill_loss shows up in
    the epoch metrics and a classification run is cleanly rejected."""
    from ampnet_tpu.cli.main import cmd_preprocess, cmd_train

    las, proc = str(tmp_path / "las"), str(tmp_path / "proc")
    assert cmd_synth(ns(out_path=las, n_tiles=2, windows_per_tile=1,
                        points_per_window=1200, window_size=50.0, seed=0)) == 0
    assert cmd_preprocess(ns(in_path=las, out_path=proc, dataset="T",
                             window_size=50.0, max_z=100.0, min_points=100,
                             n_points=64, max_windows=2, hag_cell=2.0, seed=0,
                             artifact_format="npz")) == 0
    base = dict(dataset_path=proc, task="segmentation", path_list_files=proc,
                number_of_points=64, number_of_windows=2, batch_size=2,
                epochs=1, learning_rate=1e-3, weighing_method="EFS",
                model_checkpoint="", num_devices=1, bn_mode="batch",
                dtype="float32", grad_accum=1, device_cache="off",
                epoch_dispatch="off")
    t_out = str(tmp_path / "teacher")
    assert cmd_train(ns(arch="attention", out_path=t_out, seed=0, **base)) == 0
    ckpt = os.path.join(t_out, "checkpoints", "attention_segmentation_best")
    assert os.path.isdir(ckpt)

    s_out = str(tmp_path / "student")
    rc = cmd_train(ns(arch="attention", out_path=s_out, seed=1,
                      distill_from=ckpt, distill_alpha=0.5, distill_temp=2.0,
                      **base))
    assert rc == 0
    err = capsys.readouterr().err
    assert "distilling from 1 teacher member(s) in 1 group(s)" in err
    # the student's train log carries the distillation scalar
    import csv as _csv
    log = os.path.join(s_out, "logs", "attention_segmentation_train",
                       "scalars.csv")
    with open(log) as f:
        kd_rows = [r for r in _csv.DictReader(f) if r["tag"] == "distill_loss"]
    assert kd_rows, "distill_loss missing from the train scalars"
    assert np.isfinite(float(kd_rows[-1]["value"]))

    # classification + distillation is a clean error
    rc = cmd_train(ns(arch="baseline", out_path=str(tmp_path / "c"), seed=0,
                      **{**base, "task": "classification",
                         "distill_from": ckpt}))
    assert rc == 1
    assert "segmentation-only" in capsys.readouterr().err


def test_rare_class_repeats_and_oversample_cli(tmp_path, capsys):
    """rare_class_repeats: auto mode flags classes under 5% of valid points
    and multiplies only the clouds containing them; the CLI flag trains with
    the oversampled epoch (more steps/epoch) and reports what it did."""
    from ampnet_tpu.cli.main import cmd_preprocess, cmd_train, rare_class_repeats

    class _DS:
        def __init__(self, labels):
            self.labels = labels

        def __len__(self):
            return len(self.labels)

        def __getitem__(self, i):
            return {"labels": np.asarray(self.labels[i])}

    # class 1 is 2/400 points -> rare in auto mode; only sample 1 carries it
    ds = _DS([np.zeros(200, np.int64),
              np.concatenate([np.zeros(198, np.int64), np.array([1, 1])])])
    reps, rare, n_over = rare_class_repeats(ds, 4, "auto", num_classes=5)
    assert rare == [1] and n_over == 1
    np.testing.assert_array_equal(reps, [1, 4])
    # explicit list; out-of-range ids rejected
    reps, rare, n_over = rare_class_repeats(ds, 3, "0", num_classes=5)
    assert rare == [0] and n_over == 2
    with pytest.raises(ValueError, match="out of range"):
        rare_class_repeats(ds, 3, "7", num_classes=5)

    las, proc = str(tmp_path / "las"), str(tmp_path / "proc")
    assert cmd_synth(ns(out_path=las, n_tiles=2, windows_per_tile=1,
                        points_per_window=1200, window_size=50.0, seed=0)) == 0
    assert cmd_preprocess(ns(in_path=las, out_path=proc, dataset="T",
                             window_size=50.0, max_z=100.0, min_points=100,
                             n_points=64, max_windows=2, hag_cell=2.0, seed=0,
                             artifact_format="npz")) == 0
    rc = cmd_train(ns(dataset_path=proc, task="segmentation", arch="attention",
                      path_list_files=proc, out_path=str(tmp_path / "run"),
                      number_of_points=64, number_of_windows=2, batch_size=2,
                      epochs=1, learning_rate=1e-3, weighing_method="EFS",
                      seed=0, model_checkpoint="", num_devices=1,
                      bn_mode="batch", dtype="float32", grad_accum=1,
                      device_cache="off", epoch_dispatch="off",
                      oversample_factor=3, oversample_classes="1"))
    assert rc == 0
    assert "oversampling x3" in capsys.readouterr().err
