"""Artifact loading: the framework reads the reference's on-disk formats
(pickled NumPy clouds, ``kmeans_*.pt`` torch tensors — ``datasets.py:72-73,335``) and
its own ``.npz`` format interchangeably. torch is only imported if a ``.pt`` file is
actually encountered."""

from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np


def load_cloud(path: str) -> np.ndarray:
    """Load a point-cloud array from .pkl/.pickle/.pt/.npy/.npz."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pkl", ".pickle"):
        with open(path, "rb") as f:
            arr = pickle.load(f)
        return np.asarray(arr, dtype=np.float32)
    if ext == ".pt":
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(t, dtype=np.float32)
    if ext == ".npy":
        return np.load(path).astype(np.float32)
    if ext == ".npz":
        with np.load(path) as z:
            return z[z.files[0]].astype(np.float32)
    raise ValueError(f"unsupported cloud format: {path}")


def save_cloud(path: str, arr: np.ndarray) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pkl", ".pickle"):
        with open(path, "wb") as f:
            pickle.dump(arr.astype(np.float32), f)
    elif ext == ".npz":
        np.savez_compressed(path, cloud=arr.astype(np.float32))
    elif ext == ".npy":
        np.save(path, arr.astype(np.float32))
    elif ext == ".pt":
        import torch

        torch.save(torch.from_numpy(arr.astype(np.float32)), path)
    else:
        raise ValueError(f"unsupported cloud format: {path}")


def read_split_list(path: str) -> List[str]:
    """Read a train/val/test file list (one filename per line), like the reference
    trainers (train_pointnet-attention.py:57-60)."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def write_split_list(path: str, names: List[str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for n in names:
            f.write(n + "\n")
