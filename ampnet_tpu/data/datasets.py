"""Dataset classes over preprocessed artifacts.

TPU-first counterparts of the five reference dataset classes
(``pointNet/datasets.py:9,145,295,463,518``). Each returns plain NumPy samples; the
batching pipeline (data/pipeline.py) owns padding/resampling so every array that
reaches the device has a static shape.

| here                   | reference              | artifact                      |
|------------------------|------------------------|-------------------------------|
| WindowedCloudDataset   | LidarKmeansDataset     | kmeans_<f>.pt [N, dims, W]    |
| CloudDataset           | LidarDataset /         | <f>.pkl [N, 11..13]           |
|                        | LidarDatasetExpanded   |                               |
| EvalCloudDataset       | LidarDataset4Test      | <f>.pkl, variable N + labels  |
| InferenceCloudDataset  | LidarInferenceDataset  | <f>.pkl raw, no labels        |
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

from ampnet_tpu.data import schema as S
from ampnet_tpu.data.io_utils import load_cloud


def resample_points(pc: np.ndarray, n_points: int, rng: np.random.Generator) -> np.ndarray:
    """Fixed-size point resampling with the reference LidarDataset semantics
    (datasets.py:80-89): sample WITHOUT replacement above ``n_points``; below it
    keep every original point and append random duplicates."""
    n = pc.shape[0]
    if n > n_points:
        return pc[rng.choice(n, n_points, replace=False)]
    if n < n_points:
        extra = rng.integers(0, n, n_points - n)
        return np.concatenate([pc, pc[extra]], axis=0)
    return pc


class WindowedCloudDataset:
    """Pre-tiled clouds ``[N, dims, W]`` (the offline k-means artifacts).

    Mirrors LidarKmeansDataset (datasets.py:295-460): drops noise-class point rows,
    remaps labels, selects the 9 model features, rescales x/y to [-1, 1], computes
    per-window centroids. Samples come back window-major: points [W, N, 9].
    """

    def __init__(
        self,
        dataset_folder: str,
        files: Sequence[str],
        task: str = "segmentation",
        noise_classes: Sequence[int] = S.DATASET_NOISE_CLASSES,
        prefix: str = "kmeans_",
        suffix: str = ".pt",
        extra_features: int = 0,
    ):
        self.task = task
        self.noise_classes = tuple(noise_classes)
        # offline geometric eigenfeature columns 13.. (preproc --geom_features)
        self.extra_features = int(extra_features)
        names = [os.path.splitext(f)[0] for f in files]
        self.paths = [os.path.join(dataset_folder, prefix + n + suffix) for n in names]
        # tolerate artifacts saved in our npz format under the same naming scheme
        self.paths = [
            p if os.path.exists(p) else os.path.splitext(p)[0] + ".npz" for p in self.paths
        ]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pc = load_cloud(self.paths[index])  # [N, dims, W]
        pc = S.drop_noise_points(pc, self.noise_classes)

        raw_cls = pc[:, S.COL.CLASS, :]  # [N, W]
        labels = np.asarray(S.remap_segmentation_labels(raw_cls))  # [N, W]
        # [N, 9(+G), W] — same selection as schema.select_model_features but on
        # the windowed [N, dims, W] artifact layout
        parts = [pc[:, 0:3, :], pc[:, 4:10, :]]
        if self.extra_features:
            end = S.NUM_CANONICAL_COLS + self.extra_features
            if pc.shape[1] < end:
                raise ValueError(
                    f"{self.paths[index]}: artifact has {pc.shape[1]} columns but "
                    f"the model wants {self.extra_features} geometric feature "
                    "columns — re-run `ampnet preprocess --geom_features`"
                )
            parts.append(pc[:, S.NUM_CANONICAL_COLS:end, :])
        feats = np.concatenate(parts, axis=1)
        feats[:, 0, :] = feats[:, 0, :] * 2 - 1
        feats[:, 1, :] = feats[:, 1, :] * 2 - 1

        points = np.ascontiguousarray(feats.transpose(2, 0, 1))  # [W, N, 9]
        labels = np.ascontiguousarray(labels.T)  # [W, N]
        centroids = points[:, :, :2].mean(axis=1)  # [W, 2]
        sample = {
            "points": points.astype(np.float32),
            "labels": labels.astype(np.int32),
            "centroids": centroids.astype(np.float32),
            "name": os.path.basename(self.paths[index]),
        }
        if self.task == "classification":
            sample["cls_label"] = np.int32(S.classification_label(raw_cls))
        return sample


class CloudDataset:
    """Whole-cloud dataset with fixed-size resampling (baseline scripts).

    feature_mode='nine'  → [x,y,z,I,R,G,B,NIR,NDVI] with x,y→[-1,1] and noise-class
    dropping (LidarDatasetExpanded, datasets.py:145-292).
    feature_mode='seven' → [x,y,z,I,G,B,NDVI], labels/class from filename prefix for
    classification (LidarDataset, datasets.py:9-142).
    """

    def __init__(
        self,
        dataset_folder: str,
        files: Sequence[str],
        task: str = "segmentation",
        number_of_points: int = 4096,
        feature_mode: str = "nine",
        fixed_num_points: bool = True,
        constrained_sample: bool = False,
        seed: int = 0,
        extra_features: int = 0,
    ):
        self.folder = dataset_folder
        self.files = list(files)
        self.paths = [os.path.join(dataset_folder, f) for f in self.files]
        self.task = task
        self.n_points = number_of_points
        self.feature_mode = feature_mode
        self.extra_features = int(extra_features)
        self.fixed_num_points = fixed_num_points
        # legacy 11-column artifacts carry a sampling flag in column 10
        # (datasets.py:77 `pc[pc[:, 10] == 1]`); the 13-column schema stores
        # x_raw there, so this flag only applies to legacy data
        self.constrained_sample = constrained_sample
        self.rng = np.random.default_rng(seed)
        # filename-prefix class mapping (LidarDataset._init_mapping, datasets.py:36-45)
        self.class_of = {
            f: 1 if "tower_" in f else 0 for f in self.files
        }
        self.len_towers = sum(self.class_of.values())
        self.len_landscape = len(self.files) - self.len_towers

    def __len__(self) -> int:
        return len(self.paths)

    def _resample(self, pc: np.ndarray) -> np.ndarray:
        if not self.fixed_num_points:
            return pc
        return resample_points(pc, self.n_points, self.rng)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pc = load_cloud(self.paths[index])  # [N, >=10]
        if self.constrained_sample:
            pc = pc[pc[:, 10] == 1]
        if self.feature_mode == "nine":
            pc = S.drop_noise_points(pc, S.DATASET_NOISE_CLASSES)
        pc = self._resample(pc)
        raw_cls = pc[:, S.COL.CLASS]
        labels = np.asarray(S.remap_segmentation_labels(raw_cls))

        if self.feature_mode == "nine":
            feats = np.asarray(S.select_model_features(pc, self.extra_features))
            feats[:, 0] = feats[:, 0] * 2 - 1
            feats[:, 1] = feats[:, 1] * 2 - 1
        else:  # 'seven' (datasets.py:63)
            feats = np.concatenate(
                [pc[:, 0:3], pc[:, 4:5], pc[:, 6:8], pc[:, 9:10]], axis=1
            )
        sample = {
            "points": feats.astype(np.float32),
            "labels": labels.astype(np.int32),
            "name": self.files[index],
        }
        if self.task == "classification":
            if self.feature_mode == "seven":
                sample["cls_label"] = np.int32(self.class_of[self.files[index]])
            else:
                sample["cls_label"] = np.int32(S.classification_label(raw_cls))
        return sample


class EvalCloudDataset:
    """Variable-size clouds for evaluation: 9 normalized features + raw class column
    (LidarDataset4Test, datasets.py:463-515)."""

    def __init__(self, dataset_folder: str, files: Sequence[str],
                 extra_features: int = 0):
        self.files = list(files)
        self.paths = [os.path.join(dataset_folder, f) for f in self.files]
        self.extra_features = int(extra_features)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pc = load_cloud(self.paths[index])
        feats = np.asarray(S.select_model_features(pc, self.extra_features))
        feats[:, 0] = feats[:, 0] * 2 - 1
        feats[:, 1] = feats[:, 1] * 2 - 1
        labels = np.asarray(S.remap_segmentation_labels(pc[:, S.COL.CLASS]))
        return {
            "points": feats.astype(np.float32),
            "labels": labels.astype(np.int32),
            "raw_class": pc[:, S.COL.CLASS].astype(np.int32),
            "name": self.files[index],
        }


class InferenceCloudDataset:
    """Label-free raw clouds (LidarInferenceDataset, datasets.py:518-565)."""

    def __init__(self, dataset_folder: str, files: Sequence[str]):
        self.files = list(files)
        self.paths = [os.path.join(dataset_folder, f) for f in self.files]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pc = load_cloud(self.paths[index])
        return {"points": pc.astype(np.float32), "name": self.files[index]}
