"""Command-line surface mirroring the reference repo's entry points (README.md:20-46):

    ampnet synth       — generate a synthetic LAS dataset (demo / testing)
    ampnet preprocess  — windows → HAG → filter/norm → k-means tiling → split lists
                         (the reference's data_proc stages 1–4 + pdal_hag.sh)
    ampnet train       — train {attention, gru, baseline, classic} × {segmentation,
                         classification} (the reference's six train scripts)
    ampnet test        — arbitrary-scale tiled evaluation + IoU CSV
                         (test_pointnet_att_segmen.py / test_segmentation.py)
    ampnet infer       — label-free per-point predictions
    ampnet demo        — synthetic end-to-end: synth → preprocess → train → test
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def cmd_synth(args) -> int:
    """Write synthetic LAS tiles (with ground points so the HAG stage has work)."""
    from ampnet_tpu.data.las_io import LasCloud, write_las
    from ampnet_tpu.data.synthetic import synthetic_scene

    os.makedirs(args.out_path, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    landscape_frac = getattr(args, "landscape_fraction", 0.0)
    hard = getattr(args, "scene", "easy") == "hard"
    relief = float(getattr(args, "terrain_relief", 0.0) or 0.0)
    jitter = float(getattr(args, "point_jitter", 0.0) or 0.0)
    for i in range(args.n_tiles):
        parts = []
        for _ in range(args.windows_per_tile):
            # landscape windows (no towers/lines) give classification datasets
            # genuine negatives, like the reference's 'pc_' windows
            pylons = 0 if rng.uniform() < landscape_frac else 2
            npts = args.points_per_window
            if jitter > 0:
                # arbitrary-scale realism: per-window point counts vary lognormally
                npts = max(256, int(npts * rng.lognormal(0.0, jitter)))
            if hard:
                from ampnet_tpu.data.synthetic import synthetic_scene_hard

                pylons = 0 if pylons == 0 else int(rng.integers(2, 4))
                parts.append(synthetic_scene_hard(rng, n_points=npts,
                                                  extent_m=args.window_size,
                                                  n_pylons=pylons))
            else:
                parts.append(synthetic_scene(rng, n_points=npts,
                                             extent_m=args.window_size,
                                             n_pylons=pylons))
        # place windows side by side in raw coordinates
        clouds = []
        for w, sc in enumerate(parts):
            c = sc.copy()
            c[:, 10] = sc[:, 0] * args.window_size + 430000 + w * args.window_size
            c[:, 11] = sc[:, 1] * args.window_size + 4590000 + i * args.window_size
            clouds.append(c)
        sc = np.concatenate(clouds)
        n = len(sc)
        has_ground = bool((sc[:, 3] == 2).any())
        if has_ground:
            # hard scenes carry their own density-thinned ground returns
            gx = gy = np.zeros(0)
            n_g = 0
        else:
            # ground points at z=0 (class 2) so HAG has a terrain reference
            n_g = n // 4
            gx = rng.uniform(sc[:, 10].min(), sc[:, 10].max(), n_g)
            gy = rng.uniform(sc[:, 11].min(), sc[:, 11].max(), n_g)
        x = np.concatenate([sc[:, 10], gx])
        y = np.concatenate([sc[:, 11], gy])
        z = np.concatenate([sc[:, 12], np.zeros(n_g)])
        if relief > 0:
            # smooth random terrain under everything; the HAG stage must recover
            # the height-above-ground that the labels were generated in
            from ampnet_tpu.data.synthetic import make_terrain

            terr = make_terrain(rng, relief, args.window_size * max(args.windows_per_tile, 1))
            z = z + terr(x - x.min(), y - y.min())
        cloud = LasCloud(
            x=x,
            y=y,
            z=z,
            intensity=np.concatenate([sc[:, 4] * 5000, rng.uniform(0, 5000, n_g)]),
            classification=np.concatenate([sc[:, 3], np.full(n_g, 2)]).astype(np.int64),
            red=np.concatenate([sc[:, 5] * 65535, rng.uniform(0, 65535, n_g)]),
            green=np.concatenate([sc[:, 6] * 65535, rng.uniform(0, 65535, n_g)]),
            blue=np.concatenate([sc[:, 7] * 65535, rng.uniform(0, 65535, n_g)]),
            nir=np.concatenate([sc[:, 8] * 65535, rng.uniform(0, 65535, n_g)]),
        )
        write_las(os.path.join(args.out_path, f"tile{i}.las"), cloud, point_format=8)
    print(f"wrote {args.n_tiles} synthetic LAS tiles to {args.out_path}")
    return 0


def cmd_preprocess(args) -> int:
    from ampnet_tpu.preproc.pipeline import PreprocessParams, run_pipeline
    from ampnet_tpu.preproc.splits import generate_split_lists

    os.makedirs(args.out_path, exist_ok=True)
    tiles = sorted(glob.glob(os.path.join(args.in_path, "*.las")))
    if not tiles:
        print(f"no LAS tiles in {args.in_path}", file=sys.stderr)
        return 1

    # offline preprocessing defaults to the host min-cost-flow solver: it's the
    # exact reference semantics (KMeansConstrained), ~85 ms per full cloud on
    # one core, never touches (or compiles for) the accelerator, and is safe
    # under a worker pool. --assigner sinkhorn opts into the device path.
    workers = getattr(args, "workers", 1)
    assigner = getattr(args, "assigner", None) or "exact_mcf"
    params = PreprocessParams(
        out_path=args.out_path, dataset=args.dataset, window_size=args.window_size,
        max_z=args.max_z, min_points=args.min_points, n_points=args.n_points,
        max_windows=args.max_windows, hag_cell=args.hag_cell,
        artifact_format=args.artifact_format, assigner=assigner,
        geom_features=getattr(args, "geom_features", False),
        geom_k=getattr(args, "geom_k", 24),
        geom_radius_norm=getattr(args, "geom_radius_norm", "absolute")
        or "absolute",
    )
    produced, errors = run_pipeline(tiles, params, workers=workers)
    n_failed = len(errors)
    for e in errors:
        # skip-and-continue robustness like the reference's imap_unordered
        # pools (2_preprocessing_filter_norm.py:131-132)
        print(e, file=sys.stderr)

    # stage 4: split lists — geographic block JSONs (the reference's evaluation
    # protocol, generate_train_test_lists.py:106-210) or a seeded random split
    blocks = None
    if getattr(args, "blocks_json", None):
        blocks = {}
        for path in args.blocks_json:
            with open(path) as f:
                mapping = json.load(f)
            for split, names in mapping.items():
                blocks.setdefault(split, []).extend(names)
    assigned = generate_split_lists(
        produced, args.out_path, task="segmentation", blocks=blocks,
        fractions={"train": 0.7, "val": 0.15, "test": 0.15}, seed=args.seed,
    )
    if blocks and assigned.get("unmatched"):
        print(f"warning: {len(assigned['unmatched'])} windows matched no block in "
              f"{args.blocks_json} and joined no split", file=sys.stderr)
    msg = f"preprocessed {len(produced)} windows from {len(tiles)} tiles → {args.out_path}"
    if n_failed:
        msg += f" ({n_failed} unreadable tiles skipped)"
    print(msg)
    if not produced:
        print("no windows produced — every input tile failed", file=sys.stderr)
        return 1
    return 0


def _load_lists(path_list_files: str, task: str):
    from ampnet_tpu.data.io_utils import read_split_list

    tag = "seg_files" if task == "segmentation" else "files"
    out = {}
    for split in ("train", "val", "test"):
        p = os.path.join(path_list_files, f"{split}_{tag}.txt")
        if not os.path.exists(p) and task != "segmentation":
            p = os.path.join(path_list_files, f"{split}_seg_files.txt")
        out[split] = read_split_list(p) if os.path.exists(p) else []
    return out


def _build_cfg(args):
    from ampnet_tpu.core.config import AMPNetConfig, DataConfig, ModelConfig, TrainConfig

    from ampnet_tpu.preproc.geomfeat import N_GEOM_FEATURES

    return AMPNetConfig(
        data=DataConfig(
            n_points=args.number_of_points, max_windows=args.number_of_windows,
            extra_features=N_GEOM_FEATURES
            if getattr(args, "geom_features", False) else 0,
            geom_radius_norm=getattr(args, "geom_radius_norm", "absolute")
            or "absolute",
            geom_k=getattr(args, "geom_k", 24) or 24,
        ),
        model=ModelConfig(
            context="attention" if args.arch == "attention" else args.arch,
            bn_mode=getattr(args, "bn_mode", "batch"),
            dtype=None if getattr(args, "dtype", "float32") == "float32" else args.dtype,
            local_agg=getattr(args, "local_agg", "none") or "none",
            local_agg_k=getattr(args, "local_agg_k", 16) or 16,
            att_geom_tokens=getattr(args, "att_geom_tokens", False),
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            epochs=args.epochs,
            weighing_method=args.weighing_method,
            seed=args.seed,
            grad_accum=getattr(args, "grad_accum", 1) or 1,
            focal_gamma=getattr(args, "focal_gamma", 0.0) or 0.0,
            async_checkpoint=getattr(args, "ckpt_io", "async") != "sync",
            distill_alpha=(getattr(args, "distill_alpha", 0.0) or 0.0)
            if getattr(args, "distill_from", "") else 0.0,
            distill_temp=getattr(args, "distill_temp", 2.0) or 2.0,
        ),
    )


def seg_class_weights(train_ds, method: str, num_classes: int, beta: float,
                      max_samples: int = 512):
    """Data-driven CE class weights for segmentation from the train label
    histogram. The reference hardcodes [1,2,2,1,1]
    (train_pointnet-attention.py:127) and reserves its EFS/INS/ISNS machinery
    (get_metrics.py:34-77) for classification; on imbalanced data (tower/lines
    ~1-2 % of points) inverse-frequency weighting is a measured quality lever
    (BASELINE.md hard-benchmark study). Weights are sum-normalized and the loss
    divides by the weight-sum, so absolute scale cancels (train/losses.py:65-76).

    Returns (weights | None, per-class point counts)."""
    from ampnet_tpu.core.metrics import get_class_weights

    counts = np.zeros(num_classes, np.int64)
    for i in range(min(len(train_ds), max_samples)):
        lab = np.asarray(train_ds[i]["labels"]).ravel()
        lab = lab[lab >= 0]
        counts += np.bincount(lab, minlength=num_classes)[:num_classes]
    cw = get_class_weights(method, np.maximum(counts, 1).tolist(), beta=beta)
    return cw, counts


def rare_class_repeats(train_ds, factor: int, classes_spec: str,
                       num_classes: int, auto_share: float = 0.05):
    """Per-sample epoch multiplicities for rare-class window oversampling:
    samples containing any target class appear ``factor`` times per epoch
    (data/pipeline.py PaddedBatcher.repeats). ``classes_spec`` is a comma
    list of class ids or 'auto' (classes under ``auto_share`` of valid
    points). A DATA route to the rare-class frontier — the loss routes
    (inverse-frequency weights, focal) both measured negative on the hard
    benchmark (BASELINE.md). The reference has a cousin only on the
    classification side (its tower/landscape balancing, datasets.py:36-45);
    nothing for segmentation.

    Returns (repeats [len(ds)] | None, rare_classes, n_oversampled)."""
    labels = [np.asarray(train_ds[i]["labels"]).ravel() for i in range(len(train_ds))]
    if classes_spec == "auto":
        counts = np.zeros(num_classes, np.int64)
        for lab in labels:
            v = lab[(lab >= 0) & (lab < num_classes)]
            counts += np.bincount(v, minlength=num_classes)[:num_classes]
        share = counts / max(counts.sum(), 1)
        # absent classes are not "rare" — nothing to oversample toward
        rare = [c for c in range(num_classes) if 0 < share[c] < auto_share]
    else:
        rare = sorted({int(c) for c in classes_spec.split(",") if c.strip()})
        bad = [c for c in rare if not 0 <= c < num_classes]
        if bad:
            raise ValueError(f"--oversample_classes ids out of range: {bad}")
    if not rare:
        return None, [], 0
    repeats = np.ones(len(labels), np.int64)
    rare_arr = np.asarray(rare)
    for i, lab in enumerate(labels):
        if np.isin(lab, rare_arr).any():
            repeats[i] = factor
    n_over = int((repeats > 1).sum())
    return (repeats if n_over else None), rare, n_over


def cmd_train(args) -> int:
    from ampnet_tpu.core.metrics import get_class_weights
    from ampnet_tpu.data.datasets import CloudDataset, WindowedCloudDataset
    from ampnet_tpu.data.pipeline import PaddedBatcher, SingleCloudBatcher
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.trainer import Trainer

    cfg = _build_cfg(args)
    grad_accum = cfg.train.grad_accum
    if grad_accum > 1 and args.batch_size % grad_accum:
        print(f"--batch_size {args.batch_size} must be divisible by "
              f"--grad_accum {grad_accum} (equal micro-batches keep the "
              "accumulated gradient exact)", file=sys.stderr)
        return 1
    if grad_accum > 1 and args.task == "classification":
        # make_cls_step_fns has no accumulation path; failing loudly beats
        # silently ignoring the user's memory lever
        print("--grad_accum is segmentation-only (the classification step has "
              "no accumulation path; its residuals are tiny)", file=sys.stderr)
        return 1
    if cfg.train.focal_gamma > 0 and args.task == "classification":
        print("--focal_gamma is segmentation-only (make_cls_step_fns builds "
              "its own weighted-CE objective)", file=sys.stderr)
        return 1
    teacher = None
    if getattr(args, "distill_from", ""):
        # knowledge distillation: restore the teacher checkpoints through the
        # same grouping machinery as inference ensembles (cross-family OK);
        # the frozen teachers run inside the jitted train step
        # (train/distill.py)
        if args.task == "classification":
            print("--distill_from is segmentation-only (per-point soft "
                  "targets)", file=sys.stderr)
            return 1
        import copy

        ta = copy.copy(args)
        ta.model_checkpoint = args.distill_from
        restored = _restore_variables(ta, "segmentation")
        if restored is None:
            return 1
        teacher = restored[0]
        n_members = sum(
            len(v) if isinstance(v, (list, tuple)) else 1
            for _, _, v in teacher
        )
        print(f"distilling from {n_members} teacher member(s) in "
              f"{len(teacher)} group(s): alpha={cfg.train.distill_alpha}, "
              f"T={cfg.train.distill_temp}", file=sys.stderr)
    # short/ragged batches must stay divisible by grad_accum too — fold it
    # into the pad multiple alongside the device count
    import math

    pad_multiple = math.lcm(args.num_devices, grad_accum)
    lists = _load_lists(args.path_list_files, args.task)
    if not lists["train"]:
        print("empty train list", file=sys.stderr)
        return 1

    windowed = args.arch in ("attention", "gru")
    # the batch carries the WIDEST schema any consumer needs: a
    # --geom_features teacher distilling into a plain student widens the
    # loaded columns to 15 while the student slices its 9-column prefix
    # (train/step.py::_forward, train/distill.py) — the compress-the-geom-
    # ensemble recipe: teacher quality without the student's serving paying
    # for the extra columns
    batch_extra = cfg.data.extra_features
    if teacher is not None:
        teacher_extra = max(
            int(t_cfg.data.extra_features) for t_cfg, _, _ in teacher
        )
        if teacher_extra > batch_extra:
            batch_extra = teacher_extra
            print(f"teacher reads {teacher_extra} extra geom columns; loading "
                  f"them for the teacher while the student trains on its own "
                  f"{9 + cfg.data.extra_features}-column schema",
                  file=sys.stderr)
    mk_kw = dict(task=args.task, extra_features=batch_extra)
    if windowed and getattr(args, "reference_noise_compat", False):
        # reproduce the reference's training-data bug: class 14 (power lines)
        # dropped from TRAINING while still evaluated at test time
        # (datasets.py:339-350; data/schema.py documents the account)
        from ampnet_tpu.data.schema import REFERENCE_NOISE_CLASSES

        mk_kw["noise_classes"] = REFERENCE_NOISE_CLASSES
    if windowed:
        train_ds = WindowedCloudDataset(args.dataset_path, lists["train"], **mk_kw)
        val_ds = WindowedCloudDataset(args.dataset_path, lists["val"], **mk_kw) if lists["val"] else None
        mk_batch = lambda ds, seed, repeats=None: PaddedBatcher(
            ds, args.batch_size, n_points=args.number_of_points,
            max_windows=args.number_of_windows, seed=seed,
            drop_last=len(ds) >= args.batch_size,
            pad_to_multiple=pad_multiple, repeats=repeats,
        )
    else:
        train_ds = CloudDataset(args.dataset_path, lists["train"],
                                number_of_points=args.number_of_points, **mk_kw)
        val_ds = (
            CloudDataset(args.dataset_path, lists["val"],
                         number_of_points=args.number_of_points, **mk_kw)
            if lists["val"] else None
        )
        mk_batch = lambda ds, seed, repeats=None: SingleCloudBatcher(
            ds, args.batch_size, n_points=args.number_of_points, seed=seed,
            drop_last=len(ds) >= args.batch_size,
            pad_to_multiple=pad_multiple, repeats=repeats,
        )

    repeats = None
    osf = int(getattr(args, "oversample_factor", 1) or 1)
    if osf > 1:
        if args.task == "classification":
            print("--oversample_factor is segmentation-only (the cls trainer "
                  "already balances via class weights)", file=sys.stderr)
            return 1
        repeats, rare, n_over = rare_class_repeats(
            train_ds, osf, getattr(args, "oversample_classes", "auto"),
            cfg.model.num_classes)
        if repeats is None:
            print("oversampling: no rare classes found (or no cloud contains "
                  "one) — continuing without", file=sys.stderr)
        else:
            print(f"oversampling x{osf}: {n_over}/{len(train_ds)} train "
                  f"clouds contain rare classes {rare}", file=sys.stderr)

    if args.task == "segmentation" and getattr(args, "seg_weighing", ""):
        cw, counts = seg_class_weights(train_ds, args.seg_weighing,
                                       cfg.model.num_classes, cfg.train.beta)
        if cw is None:
            print(f"unknown --seg_weighing {args.seg_weighing!r} "
                  "(expected EFS|INS|ISNS|sklearn)", file=sys.stderr)
            return 1
        import dataclasses as _dc

        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, class_weights=tuple(float(x) for x in cw),
            weighing_method=args.seg_weighing))
        print(f"seg class weights ({args.seg_weighing}, counts {counts.tolist()}): "
              f"{[round(float(x), 5) for x in cw]}", file=sys.stderr)

    mesh = None
    if args.num_devices > 1:
        from ampnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)
    model = build_model(cfg, args.arch, args.task)
    from ampnet_tpu.data.device_cache import maybe_device_cache

    cache_mode = getattr(args, "device_cache", "auto")
    trainer = Trainer(
        cfg, model, maybe_device_cache(mk_batch(train_ds, cfg.train.seed, repeats), mesh, cache_mode),
        maybe_device_cache(mk_batch(val_ds, cfg.train.seed + 1), mesh, cache_mode)
        if val_ds is not None else None,
        args.out_path, name=f"{args.arch}_{args.task}", task=args.task, mesh=mesh,
        epoch_dispatch=getattr(args, "epoch_dispatch", "auto"),
        teacher=teacher,
    )
    if args.task == "classification":
        from ampnet_tpu.train.cls_step import make_cls_step_fns

        counts = [getattr(train_ds, "len_landscape", 1), getattr(train_ds, "len_towers", 1)]
        cw = get_class_weights(args.weighing_method, [max(c, 1) for c in counts],
                               beta=cfg.train.beta)
        trainer.train_step, trainer.eval_step = make_cls_step_fns(cfg, cw)
    if args.model_checkpoint:
        trainer.resume(args.model_checkpoint)
    history = trainer.fit(args.epochs)
    last = history["val"][-1] if history["val"] else history["train"][-1]
    print(json.dumps({k: v for k, v in last.items() if np.isfinite(v)}, indent=2))
    print(f"checkpoints + logs in {args.out_path}")
    return 0


def _restore_model(args, task: str):
    """Shared checkpoint-restore plumbing for test/infer commands."""
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.core.checkpoint import CheckpointManager
    from ampnet_tpu.core.config import AMPNetConfig
    from ampnet_tpu.data.synthetic import synthetic_batch
    from ampnet_tpu.models.factory import build_model
    from ampnet_tpu.train.state import create_train_state

    if args.model_checkpoint.endswith((".pth", ".pt")):
        # reference torch checkpoint: import directly (core/torch_import.py)
        from ampnet_tpu.core.torch_import import import_reference_checkpoint

        if task != "segmentation" or args.arch not in ("attention", "gru"):
            print("torch checkpoint import supports the attention/gru segmenters",
                  file=sys.stderr)
            return None
        variables, meta = import_reference_checkpoint(args.model_checkpoint)
        if meta.get("arch") and meta["arch"] != args.arch:
            print(f"checkpoint is a {meta['arch']} model; using --arch {meta['arch']}",
                  file=sys.stderr)
        # honor the hyperparameters the reference tester reads out of the
        # checkpoint (test_pointnet_att_segmen.py:87-94) — tiling at the wrong
        # n_points would evaluate the model on windows it never trained on —
        # and the model geometry inferred from the weights (the GRU trainer
        # uses point_dimension=2, train_pointnetGRU.py:121)
        from ampnet_tpu.core.config import DataConfig, ModelConfig

        arch = meta.get("arch", "attention")
        cfg = AMPNetConfig(model=ModelConfig(
            context=arch,
            point_dim=meta.get("point_dim", 3),
            global_feat=meta.get("global_feat", 256),
            gru_hidden=meta.get("gru_hidden", 64),
        ))
        if meta.get("number_of_points"):
            cfg = cfg.replace(data=DataConfig(n_points=int(meta["number_of_points"])))
        model = build_model(cfg, arch, "segmentation")

        class _VarState:  # minimal state shim for the shared downstream code
            params = variables["params"]
            batch_stats = variables["batch_stats"]

        return cfg, model, _VarState(), os.path.basename(args.model_checkpoint)

    ckpt_dir, ckpt_name = os.path.split(args.model_checkpoint.rstrip("/"))
    mgr = CheckpointManager(ckpt_dir)
    if not mgr.exists(ckpt_name):
        print(f"checkpoint not found: {args.model_checkpoint}", file=sys.stderr)
        return None
    meta = mgr.load_meta(ckpt_name)
    if meta.get("config"):
        cfg = AMPNetConfig.from_json(json.dumps(meta["config"]))
        # the recorded config knows what was trained (cmd_train stores
        # context=arch, _build_cfg above); trust it over --arch so a plain
        # `ampnet test --model_checkpoint <gru ckpt>` restores the right
        # template instead of failing on an attention-shaped tree — mirrors
        # the reference tester reading hyperparams out of the checkpoint
        # (test_pointnet_att_segmen.py:87-94)
        arch = cfg.model.context
        if args.arch != "attention" and args.arch != arch:
            print(f"checkpoint records arch {arch!r}; ignoring --arch {args.arch!r}",
                  file=sys.stderr)
    else:
        # no recorded config: derive the context from --arch so downstream
        # gates (whole-cloud eval, backend support) agree with the built model
        from ampnet_tpu.core.config import ModelConfig

        arch = args.arch
        cfg = AMPNetConfig(model=ModelConfig(
            context="attention" if args.arch == "attention" else args.arch
        ))
    model = build_model(cfg, arch, task)
    # template-init with the RECORDED input width: a geom checkpoint
    # (extra_features=6) restores fine over a 9-col template because orbax
    # replaces the tree wholesale, but att_geom_tokens models validate the
    # feature count at trace time and would reject the 9-col init batch
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(
                 np.random.default_rng(0), 1, 2, 64,
                 num_features=cfg.data.num_features + cfg.data.extra_features,
             ).items()}
    if task == "classification":
        batch["cls_label"] = jnp.zeros((1,), jnp.int32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    state, _ = mgr.restore(ckpt_name, state)
    return cfg, model, state, ckpt_name


def _restore_variables(args, task: str):
    """``_restore_model`` over a comma-separated ``--model_checkpoint``:
    returns ``(groups, name)`` where ``groups`` is a list of
    ``(cfg, model, variables_or_list)``. Members are grouped by variable-tree
    SIGNATURE (tree structure + leaf shapes + n_points — the real stacking
    requirement; cfg equality would reject inference-irrelevant differences
    like dropout, and a round-tripped ``.pth`` member whose imported config
    carries defaults). Same-signature members become ONE group whose variable
    list feeds TiledInferencer's stacked on-device ensemble; multiple groups
    feed a cross-family ``EnsembleInferencer`` (host-side probability
    averaging over e.g. attention + GRU members with different window
    geometry). No reference counterpart (its tester loads exactly one
    .pth, test_pointnet_att_segmen.py:87-94)."""
    import copy

    import jax

    paths = [p for p in args.model_checkpoint.split(",") if p]
    out = []
    for p in paths:
        a = copy.copy(args)
        a.model_checkpoint = p
        r = _restore_model(a, task)
        if r is None:
            return None
        out.append(r)

    def sig(v, c):
        shapes = tuple(tuple(getattr(l, "shape", ())) for l in jax.tree.leaves(v))
        return (jax.tree.structure(v), shapes, c.data.n_points)

    groups = []  # [signature, cfg, model, [variables, ...]]
    for cfg, model, state, _ in out:
        v = {"params": state.params, "batch_stats": state.batch_stats}
        s = sig(v, cfg)
        for g in groups:
            if g[0] == s:
                g[3].append(v)
                break
        else:
            groups.append([s, cfg, model, [v]])
    if len(groups) > 1:
        ncs = {c.model.num_classes for _, c, _, _ in groups}
        if len(ncs) != 1:
            print(f"ensemble members disagree on num_classes: {sorted(ncs)}",
                  file=sys.stderr)
            return None
    name = "+".join(n for _, _, _, n in out)
    return ([(c, m, vs if len(vs) > 1 else vs[0]) for _, c, m, vs in groups],
            name)


def _make_seg_inferencer(groups, backend="xla", max_clusters_windowed=None,
                         **kw):
    """One TiledInferencer per structural group (stacked variables when the
    group has several members); multiple groups wrap in EnsembleInferencer —
    the cross-family probability-averaging ensemble. Windowed archs
    (attention/gru) tile with ``max_clusters_windowed``; baseline/classic/
    pointnet2 groups evaluate the WHOLE cloud (the reference baseline tester
    feeds the full variable-N cloud batch-1, test_segmentation.py — a single
    capacity-ladder bucket reproduces that under static shapes: k=1,
    replicate-padding, duplicates dropped on output)."""
    from ampnet_tpu.infer.tiled import EnsembleInferencer, TiledInferencer

    members = [
        TiledInferencer(
            model, variables, cfg,
            max_clusters=(max_clusters_windowed
                          if cfg.model.context in ("attention", "gru") else 1),
            backend=backend,
            **kw,
        )
        for cfg, model, variables in groups
    ]
    return members[0] if len(members) == 1 else EnsembleInferencer(members)


def cmd_test(args) -> int:
    if "," in args.model_checkpoint and args.task == "classification":
        print("checkpoint ensembles support segmentation only", file=sys.stderr)
        return 1
    restored = _restore_variables(args, args.task)
    if restored is None:
        return 1
    groups, ckpt_name = restored
    cfg = groups[0][0]
    lists = _load_lists(args.path_list_files, args.task)
    files = lists["test"] or lists["val"]

    if args.task == "classification":
        from ampnet_tpu.data.datasets import CloudDataset, WindowedCloudDataset
        from ampnet_tpu.data.pipeline import PaddedBatcher, SingleCloudBatcher
        from ampnet_tpu.infer.classify import evaluate_classification
        from ampnet_tpu.train.cls_step import make_cls_step_fns

        # gate on the RESTORED arch, not --arch: _restore_model builds the
        # model from the checkpoint-recorded config, so the dataset/batcher
        # must follow it (a baseline cls checkpoint tested without --arch
        # would otherwise get multi-window batches for a single-window model)
        if cfg.model.context in ("attention", "gru"):
            ds = WindowedCloudDataset(args.dataset_path, files, task="classification",
                                      extra_features=cfg.data.extra_features)
            batcher = PaddedBatcher(ds, 4, n_points=cfg.data.n_points,
                                    max_windows=cfg.data.max_windows,
                                    shuffle=False, drop_last=False)
        else:
            ds = CloudDataset(args.dataset_path, files, task="classification",
                              number_of_points=cfg.data.n_points,
                              extra_features=cfg.data.extra_features)
            batcher = SingleCloudBatcher(ds, 4, n_points=cfg.data.n_points,
                                         shuffle=False, drop_last=False)
        _, eval_step = make_cls_step_fns(cfg)
        # the cls eval loop drives state.apply_fn directly — restore the full
        # train-state (single checkpoint; the ensemble guard above holds)
        _, _, state, _ = _restore_model(args, args.task)
        out = evaluate_classification(state, eval_step, batcher,
                                      out_dir=args.out_path, model_name=ckpt_name)
        print(json.dumps(out, indent=2))
        return 0

    from ampnet_tpu.data.datasets import EvalCloudDataset
    from ampnet_tpu.infer.tiled import evaluate_dataset

    if len({c.data.extra_features for c, _, _ in groups}) > 1:
        print("ensemble members disagree on extra_features (geom columns); "
              "mix only models trained on the same input schema", file=sys.stderr)
        return 1
    ds = EvalCloudDataset(args.dataset_path, files,
                          extra_features=cfg.data.extra_features)
    backend = getattr(args, "backend", "xla")
    if backend != "xla" and any(c.model.context != "attention"
                                for c, _, _ in groups):
        print("non-xla backends (folded/bf16/fused/int8) support the attention segmenter only; use --backend xla", file=sys.stderr)
        return 1
    inferencer = _make_seg_inferencer(
        groups, backend=backend, max_clusters_windowed=args.max_clusters,
        tiler=getattr(args, "tiler", "balanced"),
        transfer_dtype=getattr(args, "transfer_dtype", None),
    )
    if not 1 <= int(getattr(args, "tta", 1)) <= 8:
        print(f"--tta must be in 1..8 (dihedral period), got {args.tta}",
              file=sys.stderr)
        return 1
    if int(getattr(args, "tile_votes", 1)) < 1:
        print(f"--tile_votes must be >= 1, got {args.tile_votes}",
              file=sys.stderr)
        return 1
    out = evaluate_dataset(
        inferencer, ds,
        out_csv=os.path.join(args.out_path, "IoU-results.csv"),
        model_name=ckpt_name,
        plot_dir=os.path.join(args.out_path, "plots") if args.plot else None,
        tta=getattr(args, "tta", 1),
        tile_votes=getattr(args, "tile_votes", 1),
        analysis_dir=args.out_path if getattr(args, "analysis", False) else None,
    )
    print(json.dumps(out["summary"], indent=2))
    if "analysis" in out:
        print(f"error analysis -> {os.path.join(args.out_path, 'analysis.json')}",
              file=sys.stderr)
    return 0


def cmd_infer(args) -> int:
    from ampnet_tpu.data.datasets import InferenceCloudDataset
    from ampnet_tpu.data.schema import select_model_features, normalize_xy_neg_one

    # validate the view-ensemble flags BEFORE any work (including the whole-tile
    # LAS branch, which returns early): previously --tta 9 surfaced as a raw
    # ValueError traceback mid-run after tiles started processing, and
    # --tile_votes 0 silently disabled TTA via the tta*votes>1 gate
    tta = int(getattr(args, "tta", 1))
    if not 1 <= tta <= 8:
        print(f"--tta must be in 1..8 (dihedral period), got {tta}", file=sys.stderr)
        return 1
    votes = int(getattr(args, "tile_votes", 1))
    if votes < 1:
        print(f"--tile_votes must be >= 1, got {votes}", file=sys.stderr)
        return 1

    restored = _restore_variables(args, "segmentation")
    if restored is None:
        return 1
    groups, ckpt_name = restored
    if len({c.data.extra_features for c, _, _ in groups}) > 1:
        print("ensemble members disagree on extra_features (geom columns); "
              "mix only models trained on the same input schema", file=sys.stderr)
        return 1
    extra_features = groups[0][0].data.extra_features
    backend = getattr(args, "backend", "xla")
    if backend != "xla" and any(c.model.context != "attention"
                                for c, _, _ in groups):
        print("non-xla backends (folded/bf16/fused/int8) support the attention segmenter only; use --backend xla", file=sys.stderr)
        return 1
    inferencer = _make_seg_inferencer(
        groups, backend=backend, max_clusters_windowed=None,
        tiler=getattr(args, "tiler", "balanced"),
        transfer_dtype=getattr(args, "transfer_dtype", None),
    )

    os.makedirs(args.out_path, exist_ok=True)
    save_probs = getattr(args, "save_probs", False)
    las_tiles = sorted(glob.glob(os.path.join(args.dataset_path, "*.las")))
    if las_tiles:
        if save_probs:
            print("--save_probs is not supported in whole-tile LAS mode (the "
                  "output is a classified LAS); run on .pkl clouds instead",
                  file=sys.stderr)
            return 1
        # whole-tile mode: LAS in → classified LAS out
        from ampnet_tpu.infer.full_tile import classify_las_file

        results = {}
        for t in las_tiles:
            name = os.path.splitext(os.path.basename(t))[0]
            out_las = os.path.join(args.out_path, name + "_classified.las")
            results[name] = classify_las_file(
                inferencer, t, out_las, window_size=args.window_size,
                tta=tta, votes=votes,
            )
        with open(os.path.join(args.out_path, "tile_metrics.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(f"classified {len(las_tiles)} LAS tiles → {args.out_path}")
        return 0

    files = [os.path.basename(f) for f in sorted(glob.glob(os.path.join(args.dataset_path, "*.pkl")))]
    ds = InferenceCloudDataset(args.dataset_path, files)
    # chunked predict_many: same-bucket clouds batch into single device calls
    # and bucket fetches pipeline (infer/tiled.py), instead of one dispatch
    # round-trip per cloud (tta/votes validated at the top of cmd_infer)
    chunk_size = max(1, 16 // (tta * votes))
    for start in range(0, len(ds), chunk_size):
        chunk = [ds[i] for i in range(start, min(start + chunk_size, len(ds)))]
        feats = [normalize_xy_neg_one(select_model_features(s["points"], extra_features))
                 for s in chunk]
        if tta * votes > 1:
            from ampnet_tpu.infer.tiled import tta_ensemble

            outs = [
                (preds, mean.astype(np.float16)) if save_probs else preds
                for preds, mean in tta_ensemble(
                    lambda cs, sd: inferencer.predict_many(
                        cs, seeds=sd, return_probs=True
                    ),
                    feats, tta, seeds=list(range(start, start + len(chunk))),
                    votes=votes,
                )
            ]
        else:
            outs = inferencer.predict_many(
                feats, seeds=list(range(start, start + len(chunk))), return_probs=save_probs
            )
        for sample, out in zip(chunk, outs):
            stem = os.path.splitext(sample["name"])[0]
            if save_probs:
                preds, probs = out
                np.save(os.path.join(args.out_path, stem + "_probs.npy"), probs)
                # confidence histogram alongside the raw probabilities (the
                # reference's plot_hist surface, utils_plot.py:91-97)
                from ampnet_tpu.core.plotting import plot_class_histograms

                plot_class_histograms(
                    preds, probs,
                    save_to=os.path.join(args.out_path, stem + "_hist.png"),
                    title=stem,
                )
            else:
                preds = out
            np.save(os.path.join(args.out_path, stem + "_preds.npy"), preds)
    print(f"wrote predictions for {len(ds)} clouds to {args.out_path}")
    return 0


def cmd_serve(args) -> int:
    """Serve a trained model over HTTP (infer/server.py): resident model, warm
    bucket programs, micro-batched concurrent requests. The reference's only
    'serving' is re-running its evaluation CLI per file."""
    from ampnet_tpu.infer.server import InferenceServer

    task = getattr(args, "task", "segmentation")
    if "," in args.model_checkpoint and task == "classification":
        print("checkpoint ensembles support segmentation only", file=sys.stderr)
        return 1
    restored = _restore_variables(args, task)
    if restored is None:
        return 1
    groups, ckpt_name = restored
    cfg, model, variables = groups[0]
    if task == "classification":
        # per-cloud tower classification: same daemon, CloudClassifier engine
        from ampnet_tpu.infer.classify import CloudClassifier

        ignored = [
            f for f, default in (
                ("backend", "folded"), ("tiler", "balanced"),
                ("transfer_dtype", None), ("max_clusters", None), ("num_devices", 1),
            )
            if getattr(args, f) != default
        ]
        if ignored:
            print(f"--task classification ignores: {', '.join('--' + f for f in ignored)}",
                  file=sys.stderr)
        inferencer = CloudClassifier(model, variables, cfg)
    else:
        backend = args.backend
        any_non_attention = any(c.model.context != "attention"
                                for c, _, _ in groups)
        if backend not in ("xla", "folded") and any_non_attention:
            # covers gru too — every non-xla backend evaluates attention params
            print("non-xla backends (folded/bf16/fused/int8) support the attention "
                  "segmenter only; use --backend xla", file=sys.stderr)
            return 1
        if backend == "folded" and any_non_attention:
            # the default backend downgrades gracefully for non-attention models
            # (the folded head evaluates attention params)
            print("backend 'folded' is attention-only; serving with 'xla'",
                  file=sys.stderr)
            backend = "xla"
        mesh = None
        if args.num_devices > 1:
            from ampnet_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.num_devices)
        inferencer = _make_seg_inferencer(
            groups, backend=backend, max_clusters_windowed=args.max_clusters,
            tiler=args.tiler,
            transfer_dtype=args.transfer_dtype,
            mesh=mesh,
        )
    server = InferenceServer(
        inferencer,
        host=args.host,
        port=args.port,
        model_name=ckpt_name,
        batch_window_ms=args.batch_window_ms,
        max_batch_clouds=args.max_batch_clouds,
    )
    if args.warmup:
        sizes = [int(s) for s in args.warmup.split(",") if s]
        batches = [int(b) for b in
                   getattr(args, "warmup_batches", "1").split(",") if b] or [1]
        print(f"warming up bucket programs for sizes {sizes} "
              f"x micro-batches {batches}...", file=sys.stderr)
        server.warmup(sizes, batch_sizes=batches)
    host, port = server.address
    print(f"serving {ckpt_name} on http://{host}:{port}  "
          f"(POST /v1/predict, GET /healthz, GET /v1/stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()
    return 0


def cmd_export(args) -> int:
    """Export a trained checkpoint to the reference's torch .pth format
    (utils/utils.py:422-438 payload) so the reference's own scripts can run it."""
    from ampnet_tpu.core.torch_export import export_reference_checkpoint

    restored = _restore_model(args, "segmentation")
    if restored is None:
        return 1
    cfg, model, state, ckpt_name = restored
    # derive the export family from the parameter tree itself — ground truth
    # even when the checkpoint stored no config and --arch disagrees
    ctx = state.params.get("context", {})
    arch = "gru" if "gru" in ctx else ("attention" if "mha" in ctx else None)
    if arch is None:
        print("torch export supports the attention/gru segmenters (no "
              "context.mha/context.gru in the checkpoint's parameters)",
              file=sys.stderr)
        return 1
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    meta = {
        "number_of_points": cfg.data.n_points,
        "batch_size": cfg.train.batch_size,
        "lr": cfg.train.learning_rate,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    export_reference_checkpoint(variables, args.out, arch=arch, meta=meta)
    print(f"exported {ckpt_name} ({arch}) → {args.out}")
    return 0


def cmd_fps(args) -> int:
    """Offline FPS subsampling of large clouds (data_proc/sample_fps.py:12-34)."""
    from ampnet_tpu.data.io_utils import load_cloud, save_cloud
    from ampnet_tpu.native import fps_native

    files = sorted(glob.glob(os.path.join(args.in_path, "*.pkl")))
    os.makedirs(args.out_path, exist_ok=True)
    n_done = 0
    for f in files:
        pc = load_cloud(f)
        if pc.shape[0] > args.n_points:
            pc = pc[fps_native(pc[:, :3], args.n_points)]
        save_cloud(os.path.join(args.out_path, os.path.basename(f)), pc)
        n_done += 1
    print(f"fps-sampled {n_done} clouds to <= {args.n_points} points → {args.out_path}")
    return 0


def cmd_bench(args) -> int:
    import runpy

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    runpy.run_path(os.path.join(repo, "bench.py"), run_name="__main__")
    return 0


def cmd_demo(args) -> int:
    """End-to-end on synthetic data: synth → preprocess → train → test."""
    base = args.out_path
    a = argparse.Namespace(
        out_path=os.path.join(base, "las"), n_tiles=args.n_tiles,
        windows_per_tile=3, points_per_window=args.points_per_window,
        window_size=100.0, seed=0,
    )
    if cmd_synth(a):
        return 1
    b = argparse.Namespace(
        in_path=os.path.join(base, "las"), out_path=os.path.join(base, "data"),
        dataset="SYNTH", window_size=100.0, max_z=100.0, min_points=256,
        n_points=args.number_of_points, max_windows=5, hag_cell=2.0, seed=0,
        artifact_format="npz",
        geom_features=getattr(args, "geom_features", False),
    )
    if cmd_preprocess(b):
        return 1
    c = argparse.Namespace(
        dataset_path=os.path.join(base, "data"),
        path_list_files=os.path.join(base, "data"),
        out_path=os.path.join(base, "run"),
        task="segmentation", arch=args.arch, number_of_points=args.number_of_points,
        number_of_windows=5, batch_size=2, epochs=args.epochs,
        learning_rate=1e-3, weighing_method="EFS", seed=0, model_checkpoint="",
        num_devices=1,
        geom_features=getattr(args, "geom_features", False),
    )
    if cmd_train(c):
        return 1
    d = argparse.Namespace(
        dataset_path=os.path.join(base, "data"),
        path_list_files=os.path.join(base, "data"),
        out_path=os.path.join(base, "run"),
        model_checkpoint=os.path.join(base, "run", "checkpoints",
                                      f"{args.arch}_segmentation_best"),
        arch=args.arch, max_clusters=max(6, args.points_per_window // args.number_of_points + 1),
        task="segmentation", plot=False,
    )
    return cmd_test(d)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ampnet", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("synth", help="generate synthetic LAS tiles")
    s.add_argument("--out_path", required=True)
    s.add_argument("--n_tiles", type=int, default=4)
    s.add_argument("--windows_per_tile", type=int, default=3)
    s.add_argument("--points_per_window", type=int, default=8000)
    s.add_argument("--window_size", type=float, default=100.0)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--scene", choices=["easy", "hard"], default="easy",
                   help="hard: class imbalance, building/pole confusers, "
                        "lines-through-canopy, density gradients + dropout holes, "
                        "sensor noise (round-3 quality benchmark)")
    s.add_argument("--terrain_relief", type=float, default=0.0,
                   help="metres of smooth terrain relief under the scene "
                        "(exercises the HAG stage; labels stay in HAG space)")
    s.add_argument("--point_jitter", type=float, default=0.0,
                   help="lognormal sigma on per-window point counts")
    s.add_argument("--landscape_fraction", type=float, default=0.0,
                   help="fraction of windows generated WITHOUT towers/power "
                        "lines (negatives for classification)")
    s.set_defaults(fn=cmd_synth)

    s = sub.add_parser("preprocess", help="LAS tiles → windows → 13-col pkl + kmeans artifacts")
    s.add_argument("--in_path", required=True)
    s.add_argument("--out_path", required=True)
    s.add_argument("--dataset", default="DATA")
    s.add_argument("--window_size", type=float, default=100.0)
    s.add_argument("--max_z", type=float, default=100.0)
    s.add_argument("--min_points", type=int, default=1024)
    s.add_argument("--n_points", type=int, default=2048)
    s.add_argument("--max_windows", type=int, default=9)
    s.add_argument("--hag_cell", type=float, default=2.0)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--artifact_format", choices=["npz", "pt"], default="npz",
                   help="kmeans artifact format (.pt = reference-compatible torch)")
    s.add_argument("--geom_features", action="store_true",
                   help="append per-point covariance eigenfeatures (linearity/"
                        "planarity/scatter/verticality/axis_z/radius) computed "
                        "at FULL pre-subsampling density as columns 13..18 — "
                        "pair with `train --geom_features`")
    s.add_argument("--geom_k", type=int, default=24,
                   help="k-NN neighborhood size for --geom_features")
    s.add_argument("--geom_radius_norm", choices=["absolute", "median"],
                   default="absolute",
                   help="radius-column density normalization: 'median' "
                        "divides each point's k-th-NN distance by the "
                        "cloud's median, making the eigenfeature columns "
                        "invariant to uniform acquisition-density shifts "
                        "(density÷2 costs absolute-mode geom −4.0 mIoU, "
                        "BASELINE.md); pair with the same flag on `train`")
    s.add_argument("--workers", type=int, default=1,
                   help="host process-pool size over tiles (the reference's "
                        "mp.Pool preprocessing parallelism); pooled runs use "
                        "the host k-means assigner")
    s.add_argument("--assigner", choices=["sinkhorn", "exact_mcf"], default=None,
                   help="balanced k-means assigner (default exact_mcf: the host "
                        "min-cost-flow solver — exact KMeansConstrained "
                        "semantics, no accelerator dependency; sinkhorn = the "
                        "jitted device path)")
    s.add_argument("--blocks_json", nargs="+", default=None,
                   help="one or more {split: [block names]} JSONs (the reference's "
                        "dataset_blocks_partition_*.json geographic splits); window "
                        "names containing a block name join that split instead of "
                        "the random split")
    s.set_defaults(fn=cmd_preprocess)

    s = sub.add_parser("train", help="train a model")
    s.add_argument("dataset_path")
    s.add_argument("--task", choices=["segmentation", "classification"],
                   default="segmentation")
    s.add_argument("--arch", choices=["attention", "gru", "baseline", "classic", "pointnet2"],
                   default="attention")
    s.add_argument("--path_list_files", default="train_test_files/RGBN_100x100")
    s.add_argument("--out_path", default="results")
    s.add_argument("--number_of_points", type=int, default=2048)
    s.add_argument("--number_of_windows", type=int, default=9)
    s.add_argument("--batch_size", type=int, default=32)
    s.add_argument("--epochs", type=int, default=500)
    s.add_argument("--learning_rate", type=float, default=1e-3)
    s.add_argument("--weighing_method", default="EFS")
    s.add_argument("--seg_weighing", default="",
                   help="data-driven CE class weights for segmentation "
                        "(EFS|INS|ISNS|sklearn, from the train label histogram); "
                        "default: the reference's fixed [1,2,2,1,1]")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--model_checkpoint", default="")
    s.add_argument("--device_cache", choices=["auto", "on", "off"], default="auto",
                   help="keep the padded dataset resident in HBM and gather "
                        "batches on device (auto: when it fits in 4 GiB)")
    s.add_argument("--epoch_dispatch", choices=["auto", "off"], default="auto",
                   help="run each epoch as ONE lax.scan program over the device "
                        "cache (auto: whenever the cache is active)")
    s.add_argument("--num_devices", type=int, default=1,
                   help="data-parallel device count (batch axis sharded over a Mesh)")
    s.add_argument("--bn_mode", choices=["batch", "window"], default="batch",
                   help="'window' = per-window (instance-norm-style) statistics")
    s.add_argument("--local_agg", choices=["none", "edge"], default="none",
                   help="kNN edge-feature aggregation in the window encoder "
                        "('edge' = DGCNN-style residual block; boundary-aware "
                        "local context beyond the reference trunk)")
    s.add_argument("--local_agg_k", type=int, default=16,
                   help="neighbors per point for --local_agg edge")
    s.add_argument("--geom_features", action="store_true",
                   help="feed the offline geometric eigenfeature columns "
                        "(dataset must be preprocessed with `preprocess "
                        "--geom_features`); carried in checkpoint meta so "
                        "test/infer pick them up automatically")
    s.add_argument("--geom_radius_norm", choices=["absolute", "median"],
                   default="absolute",
                   help="record which radius normalization the dataset's geom "
                        "columns were preprocessed with (must match the "
                        "`preprocess --geom_radius_norm` used) — whole-tile "
                        "LAS inference recomputes the columns from this")
    s.add_argument("--geom_k", type=int, default=24,
                   help="record which k-NN neighborhood size the dataset's "
                        "geom columns were preprocessed with (must match the "
                        "`preprocess --geom_k` used) — whole-tile LAS "
                        "inference recomputes the columns from this")
    s.add_argument("--att_geom_tokens", action="store_true",
                   help="add a per-window [mean‖max] pool of the geom columns "
                        "to the attention tokens (requires --geom_features), "
                        "so window keys/queries carry structure, not just "
                        "centroid position (models/amp.py::GeomTokenEncoding)")
    s.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches per optimizer update (memory lever for "
                        "large batches; batch_size must divide evenly)")
    s.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32",
                   help="compute dtype (params stay fp32); bfloat16 measured "
                        "+57%% train throughput on one v5e")
    s.add_argument("--focal_gamma", type=float, default=0.0,
                   help="focal-loss exponent for segmentation CE (0 = plain "
                        "weighted CE; 2 = the standard focal setting — "
                        "concentrates gradient on hard/rare classes)")
    s.add_argument("--oversample_factor", type=int, default=1,
                   help="rare-class window oversampling: train clouds that "
                        "contain a rare class appear N times per epoch "
                        "(deterministic index repeats; 1 = off)")
    s.add_argument("--oversample_classes", default="auto",
                   help="comma list of class ids to oversample, or 'auto' = "
                        "classes under 5%% of valid train points")
    s.add_argument("--distill_from", default="",
                   help="teacher checkpoint(s) for knowledge distillation, "
                        "comma-separated like --model_checkpoint ensembles "
                        "(cross-family attention+gru teachers work); the "
                        "frozen teacher forward runs inside the jitted train "
                        "step on the augmented batch")
    s.add_argument("--distill_alpha", type=float, default=0.5,
                   help="weight of the T^2*KL teacher term in the data loss "
                        "(only with --distill_from): (1-a)*CE + a*KL")
    s.add_argument("--distill_temp", type=float, default=2.0,
                   help="distillation softmax temperature (Hinton et al.)")
    s.add_argument("--ckpt_io", choices=["async", "sync"], default="async",
                   help="best-val checkpoint writes: 'async' snapshots on "
                        "device and writes from a background thread; 'sync' "
                        "blocks the epoch loop (reference behavior)")
    s.add_argument("--reference_noise_compat", action="store_true",
                   help="reproduce the reference's training-data bug (drop class "
                        "14/power lines from TRAINING data, datasets.py:339-350) "
                        "for apples-to-apples parity runs")
    s.set_defaults(fn=cmd_train)

    s = sub.add_parser("test", help="tiled evaluation with IoU CSV")
    s.add_argument("dataset_path")
    s.add_argument("--model_checkpoint", required=True,
                   help="checkpoint path; comma-separate several for a "
                        "probability-averaging ensemble (same-geometry "
                        "members stack on device; mixed families, e.g. "
                        "attention+gru, average per point)")
    s.add_argument("--path_list_files", required=True)
    s.add_argument("--out_path", default="results")
    s.add_argument("--arch", default="attention")
    s.add_argument("--task", choices=["segmentation", "classification"],
                   default="segmentation")
    s.add_argument("--max_clusters", type=int, default=18)
    s.add_argument("--plot", action="store_true",
                   help="save pred-vs-GT 3D scatter PNGs for the first clouds")
    s.add_argument("--backend", choices=["xla", "folded", "bf16", "fused", "int8"],
                   default="xla",
                   help="inference backend (folded/bf16 = BN-folded XLA paths, "
                        "fused/int8 = Pallas kernels)")
    s.add_argument("--tiler", choices=["balanced", "fast"], default="balanced",
                   help="'fast' = plain-Lloyd + one balanced solve (~4x cheaper "
                        "tiling, -0.4 mIoU measured)")
    s.add_argument("--transfer_dtype", choices=["float32", "float16", "int8"], default=None,
                   help="host->device wire format; float16 halves transfer bytes "
                        "(measured quality-neutral, +44%% serving on a "
                        "transfer-bound link)")
    s.add_argument("--tta", type=int, default=1,
                   help="test-time augmentation: average class probabilities "
                        "over N dihedral transforms per cloud (4 = the 90-"
                        "degree rotations, 8 = + mirrors); 1 = off")
    s.add_argument("--tile_votes", type=int, default=1,
                   help="overlap-vote inference: predict each cloud (or "
                        "dihedral view, with --tta) under N different "
                        "balanced-k-means tilings and average per-point "
                        "probabilities — boundary points in one tiling are "
                        "interior in another; 1 = off")
    s.add_argument("--analysis", action="store_true",
                   help="write analysis.json + confusion.png: per-class "
                        "precision/recall, boundary-vs-interior error "
                        "attribution, worst clouds per class")
    s.set_defaults(fn=cmd_test)

    s = sub.add_parser("export", help="export a trained checkpoint to the "
                                      "reference's torch .pth format")
    s.add_argument("--model_checkpoint", required=True)
    s.add_argument("--out", required=True, help="output .pth path")
    s.add_argument("--arch", default="attention")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("fps", help="farthest-point-sample clouds to a fixed size "
                                   "(data_proc/sample_fps.py)")
    s.add_argument("--in_path", required=True)
    s.add_argument("--out_path", required=True)
    s.add_argument("--n_points", type=int, default=8192)
    s.set_defaults(fn=cmd_fps)

    s = sub.add_parser("infer", help="label-free predictions; with LAS tiles in the "
                                     "input dir, runs whole-tile LAS→LAS classification")
    s.add_argument("dataset_path")
    s.add_argument("--model_checkpoint", required=True,
                   help="checkpoint path; comma-separate several for a "
                        "probability-averaging ensemble (same-geometry "
                        "members stack on device; mixed families, e.g. "
                        "attention+gru, average per point)")
    s.add_argument("--out_path", default="predictions")
    s.add_argument("--arch", default="attention")
    s.add_argument("--window_size", type=float, default=100.0)
    s.add_argument("--backend", choices=["xla", "folded", "bf16", "fused", "int8"],
                   default="xla", help="inference backend (as in `ampnet test`)")
    s.add_argument("--tiler", choices=["balanced", "fast"], default="balanced")
    s.add_argument("--transfer_dtype", choices=["float32", "float16", "int8"], default=None,
                   help="host->device wire format (as in `ampnet test`)")
    s.add_argument("--save_probs", action="store_true",
                   help="also write per-point softmax confidences "
                        "(<name>_probs.npy, float16)")
    s.add_argument("--tta", type=int, default=1,
                   help="dihedral test-time-augmentation ensemble size "
                        "(as in `ampnet test`; applies per window in "
                        "whole-tile LAS mode)")
    s.add_argument("--tile_votes", type=int, default=1,
                   help="overlap-vote inference: N tilings per view, "
                        "probabilities averaged (as in `ampnet test`)")
    s.set_defaults(fn=cmd_infer)

    s = sub.add_parser("serve", help="long-lived HTTP inference server")
    s.add_argument("--model_checkpoint", required=True,
                   help="checkpoint path; comma-separate several for a "
                        "probability-averaging ensemble (same-geometry "
                        "members stack on device; mixed families, e.g. "
                        "attention+gru, average per point)")
    s.add_argument("--arch", default="attention")
    s.add_argument("--task", choices=["segmentation", "classification"],
                   default="segmentation",
                   help="segmentation: per-point labels; classification: one "
                        "tower/no-tower label (+probs) per cloud")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8421)
    s.add_argument("--max_clusters", type=int, default=None,
                   help="tiling cap (default: checkpoint config)")
    s.add_argument("--backend", choices=["xla", "folded", "bf16", "fused", "int8"],
                   default="folded")
    s.add_argument("--tiler", choices=["balanced", "fast"], default="balanced")
    s.add_argument("--transfer_dtype", choices=["float32", "float16", "int8"], default=None)
    s.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="micro-batching window for concurrent requests")
    s.add_argument("--max_batch_clouds", type=int, default=64)
    s.add_argument("--num_devices", type=int, default=1,
                   help="shard the cloud batch over a device mesh (replicated "
                        "params, zero collectives — clouds are independent)")
    s.add_argument("--warmup", default="",
                   help="comma-separated cloud sizes to pre-compile, e.g. 10000,50000")
    s.add_argument("--warmup_batches", default="1",
                   help="micro-batch cloud-counts to pre-compile per warmup size "
                        "(jit programs are per batch shape too), e.g. 1,2,4,8,16")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("bench", help="single-chip throughput benchmark (bench.py)")
    s.set_defaults(fn=cmd_bench)

    s = sub.add_parser("demo", help="synthetic end-to-end pipeline")
    s.add_argument("--out_path", default="/tmp/ampnet_demo")
    s.add_argument("--arch", default="attention")
    s.add_argument("--n_tiles", type=int, default=3)
    s.add_argument("--points_per_window", type=int, default=6000)
    s.add_argument("--number_of_points", type=int, default=512)
    s.add_argument("--epochs", type=int, default=3)
    s.add_argument("--geom_features", action="store_true",
                   help="drive the full-density eigenfeature lever end-to-end "
                        "(preprocess --geom_features + train --geom_features; "
                        "+11 mIoU on the hard benchmark, BASELINE.md)")
    s.set_defaults(fn=cmd_demo)
    return p


def main(argv=None) -> int:
    # honor AMPNET_PLATFORM=cpu|tpu|axon: environments whose plugins force-select a
    # platform via jax.config (overriding JAX_PLATFORMS) need an explicit knob
    platform = os.environ.get("AMPNET_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    _enable_compile_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


def _enable_compile_cache() -> None:
    """Opt-in persistent XLA compilation cache: ``AMPNET_COMPILE_CACHE=<dir>``.

    Worth it when the SAME program re-runs (identical shapes/config):
    cached recompiles land in seconds. Off by default because POPULATING the
    cache is not free on remote-compile transports — writing an entry means
    serializing the compiled executable back from the compile service (measured
    here: 83 s scan compile without the cache vs 418 s while writing it), so
    one-off runs pay heavily for a cache they never reuse. The env var
    JAX_COMPILATION_CACHE_DIR would be read too early in this process (the TPU
    plugin imports jax during interpreter startup), hence the runtime config
    update — same pattern as bench.py, which manages its own cache because the
    bench re-runs identical programs every round."""
    loc = os.environ.get("AMPNET_COMPILE_CACHE", "")
    if not loc or loc == "off":
        return
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a hard failure
        print(f"compilation cache disabled: {e}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
