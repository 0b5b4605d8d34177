"""CPU-PyTorch baseline measurement harness.

The reference repo publishes no numbers (BASELINE.md), so the framework measures its
own baseline: an eager PyTorch AMP-Net built from the architecture spec (SURVEY.md
§2.3 — NOT imported from the reference), executed the way the reference test script
executes it (``test_pointnet_att_segmen.py:160-177``): batch-1 clouds, a sequential
Python loop over clusters through the encoder with torch.cat accumulation, then one
attention pass. Result is cached to ``.bench_baseline.json``.
"""

from __future__ import annotations

import time

import numpy as np


def build_torch_ampnet(global_feat=256, heads=8, num_classes=5, point_dim=3):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class TNet(nn.Module):
        def __init__(self, d):
            super().__init__()
            chans = [d, 64, 128, 256]
            self.convs = nn.ModuleList(
                nn.Conv1d(a, b, 1, bias=False) for a, b in zip(chans[:-1], chans[1:])
            )
            self.cbns = nn.ModuleList(nn.BatchNorm1d(c) for c in chans[1:])
            dims = [256, 256, 128]
            self.fcs = nn.ModuleList(
                nn.Linear(a, b, bias=False) for a, b in zip(dims[:-1], dims[1:])
            )
            self.fbns = nn.ModuleList(nn.BatchNorm1d(d_) for d_ in dims[1:])
            self.out = nn.Linear(dims[-1], d * d)
            self.d = d

        def forward(self, x):  # [B, N, d]
            h = x.transpose(2, 1)
            for c, b in zip(self.convs, self.cbns):
                h = F.relu(b(c(h)))
            h = h.max(dim=2).values
            for f, b in zip(self.fcs, self.fbns):
                h = F.relu(b(f(h)))
            m = self.out(h).view(-1, self.d, self.d)
            return m + torch.eye(self.d)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.t_in = TNet(point_dim)
            self.t_feat = TNet(64)
            ca = [9 + point_dim, 64, 64]
            cb = [64, 64, 128, 128, global_feat]
            self.mlp_a = nn.ModuleList(
                nn.Conv1d(a, b, 1, bias=False) for a, b in zip(ca[:-1], ca[1:])
            )
            self.bn_a = nn.ModuleList(nn.BatchNorm1d(c) for c in ca[1:])
            self.mlp_b = nn.ModuleList(
                nn.Conv1d(a, b, 1, bias=False) for a, b in zip(cb[:-1], cb[1:])
            )
            self.bn_b = nn.ModuleList(nn.BatchNorm1d(c) for c in cb[1:])

        def forward(self, x):  # [B, N, 9]
            coords = torch.bmm(x[:, :, :point_dim], self.t_in(x[:, :, :point_dim]))
            h = torch.cat([coords, x], dim=2).transpose(2, 1)
            for c, b in zip(self.mlp_a, self.bn_a):
                h = F.relu(b(c(h)))
            h = torch.bmm(h.transpose(2, 1), self.t_feat(h.transpose(2, 1)))
            local = h
            h = h.transpose(2, 1)
            for c, b in zip(self.mlp_b, self.bn_b):
                h = F.relu(b(c(h)))
            return local, h.max(dim=2).values

    class AttHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.pe1 = nn.Linear(2, 16)
            self.pe2 = nn.Linear(16, global_feat)
            self.att = nn.MultiheadAttention(global_feat, heads, dropout=0.0)
            dims = [64 + global_feat, global_feat // 2, 64]
            self.head = nn.ModuleList(nn.Conv1d(a, b, 1) for a, b in zip(dims[:-1], dims[1:]))
            self.hbns = nn.ModuleList(nn.BatchNorm1d(c) for c in dims[1:])
            self.out = nn.Conv1d(64, num_classes, 1)

        def forward(self, tokens, locals_, centroids, np_cluster):
            # tokens [W, B, G] seq-first like the reference
            pe = self.pe2(F.leaky_relu(self.pe1(centroids))).transpose(0, 1)
            tokens, _ = self.att(tokens + pe, tokens + pe, tokens + pe)
            reps = []
            for i in range(tokens.shape[0]):
                reps.append(tokens[i].unsqueeze(1).expand(-1, np_cluster[i], -1))
            glob = torch.cat(reps, dim=1)
            h = torch.cat([locals_, glob], dim=2).transpose(2, 1)
            for c, b in zip(self.head, self.hbns):
                h = F.relu(b(c(h)))
            return self.out(h)

    return Encoder(), AttHead()


def measure_reference_inference(
    n_clouds=4, n_windows=9, n_points=2048, warmup=1, threads=None, repeats=3
) -> dict:
    """Reference-style eager inference: per-cloud loop, per-window encoder passes.

    Takes the best of ``repeats`` timed sweeps: single-core CPU timing is
    noisy under host contention, and a slowed-down baseline would inflate the
    reported speedup — best-of is the honest (conservative) choice."""
    import os

    import torch

    torch.set_num_threads(threads or os.cpu_count() or 1)
    torch.manual_seed(0)
    enc, head = build_torch_ampnet()
    enc.eval()
    head.eval()

    rng = np.random.default_rng(0)
    clouds = [
        torch.from_numpy(rng.normal(size=(n_windows, n_points, 9)).astype(np.float32))
        for _ in range(n_clouds + warmup)
    ]
    cents = [
        torch.from_numpy(rng.normal(size=(1, n_windows, 2)).astype(np.float32))
        for _ in range(n_clouds + warmup)
    ]

    def run_cloud(windows, cent):
        locals_, tokens, np_cluster = [], [], []
        with torch.no_grad():
            for w in range(windows.shape[0]):  # sequential window loop, batch 1
                lo, gl = enc(windows[w : w + 1])
                locals_.append(lo)
                tokens.append(gl.unsqueeze(0))
                np_cluster.append(windows.shape[1])
            lo = torch.cat(locals_, dim=1)
            tok = torch.cat(tokens, dim=0)
            logits = head(tok, lo, cent, np_cluster)
        return logits

    for i in range(warmup):
        run_cloud(clouds[i], cents[i])
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(warmup, warmup + n_clouds):
            run_cloud(clouds[i], cents[i])
        dt = min(dt, time.perf_counter() - t0)

    total_windows = n_clouds * n_windows
    return {
        "windows_per_sec": total_windows / dt,
        "points_per_sec": total_windows * n_points / dt,
        "seconds": dt,
        "n_clouds": n_clouds,
        "n_windows": n_windows,
        "n_points": n_points,
        "torch_threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    print(measure_reference_inference())
