"""Reference-checkpoint importer test: build torch modules whose state-dict keys
match the reference's (SURVEY.md §2.3 naming), run the reference forward semantics
in eval mode, import the state dicts with core/torch_import, and require our
AMPNetSegmenter to reproduce the outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from ampnet_tpu.core.config import ModelConfig  # noqa: E402
from ampnet_tpu.core.torch_import import (  # noqa: E402
    convert_attention_head,
    convert_base_pointnet,
)
from ampnet_tpu.models.amp import AMPNetSegmenter  # noqa: E402


class RefTNet(tnn.Module):
    """Reference TransformationNet key layout (pointnetAtt.py:7-47)."""

    def __init__(self, d):
        super().__init__()
        self.d = d
        self.conv_1 = tnn.Conv1d(d, 64, 1, bias=False)
        self.conv_2 = tnn.Conv1d(64, 128, 1, bias=False)
        self.conv_3 = tnn.Conv1d(128, 256, 1, bias=False)
        self.bn_1, self.bn_2, self.bn_3 = (
            tnn.BatchNorm1d(64), tnn.BatchNorm1d(128), tnn.BatchNorm1d(256),
        )
        self.bn_4, self.bn_5 = tnn.BatchNorm1d(256), tnn.BatchNorm1d(128)
        self.fc_1 = tnn.Linear(256, 256, bias=False)
        self.fc_2 = tnn.Linear(256, 128, bias=False)
        self.fc_3 = tnn.Linear(128, d * d)

    def forward(self, x):
        n = x.shape[1]
        h = x.transpose(2, 1)
        h = tF.relu(self.bn_1(self.conv_1(h)))
        h = tF.relu(self.bn_2(self.conv_2(h)))
        h = tF.relu(self.bn_3(self.conv_3(h)))
        h = tnn.MaxPool1d(n)(h).squeeze(-1)
        h = tF.relu(self.bn_4(self.fc_1(h)))
        h = tF.relu(self.bn_5(self.fc_2(h)))
        return self.fc_3(h).view(-1, self.d, self.d) + torch.eye(self.d)


class RefBase(tnn.Module):
    """Reference BasePointNet key layout (pointnetAtt.py:50-112)."""

    def __init__(self, pd=3, g=256):
        super().__init__()
        self.pd = pd
        self.input_transform = RefTNet(pd)
        self.feature_transform = RefTNet(64)
        chans = [(9 + pd, 64), (64, 64), (64, 64), (64, 128), (128, 128), (128, g)]
        for i, (a, b) in enumerate(chans):
            setattr(self, f"conv_{i + 1}", tnn.Conv1d(a, b, 1, bias=False))
            setattr(self, f"bn_{i + 1}", tnn.BatchNorm1d(b))

    def forward(self, x):
        n = x.shape[1]
        coords = torch.bmm(x[:, :, : self.pd], self.input_transform(x[:, :, : self.pd]))
        h = torch.cat([coords, x], dim=2).transpose(2, 1)
        h = tF.relu(self.bn_1(self.conv_1(h)))
        h = tF.relu(self.bn_2(self.conv_2(h))).transpose(2, 1)
        ft = self.feature_transform(h)
        h = torch.bmm(h, ft)
        local = h
        h = h.transpose(2, 1)
        for i in (3, 4, 5, 6):
            h = tF.relu(getattr(self, f"bn_{i}")(getattr(self, f"conv_{i}")(h)))
        return local, tnn.MaxPool1d(n)(h).squeeze(-1), ft


class RefAttHead(tnn.Module):
    """Reference SegmentationWithAttention key layout (pointnetAtt.py:154-209)."""

    def __init__(self, e=256, heads=8, k=5, local=64):
        super().__init__()
        self.fc1 = tnn.Linear(2, 16)
        self.fc2 = tnn.Linear(16, e)
        self.attention = tnn.MultiheadAttention(e, heads, dropout=0.0)
        self.conv_2 = tnn.Conv1d(local + e, e // 2, 1)
        self.conv_3 = tnn.Conv1d(e // 2, 64, 1)
        self.conv_4 = tnn.Conv1d(64, k, 1)
        self.bn_2 = tnn.BatchNorm1d(e // 2)
        self.bn_3 = tnn.BatchNorm1d(64)

    def forward(self, gl, lo, cent, np_cluster):
        # gl [W, B, E] seq-first; lo [B, W*N, local]; cent [B, W, 2]
        pe = self.fc2(tF.leaky_relu(self.fc1(cent))).transpose(0, 1)
        gl = gl + pe
        gl, _ = self.attention(gl, gl, gl)
        reps = [gl[i].unsqueeze(1).expand(-1, np_cluster[i], -1) for i in range(gl.shape[0])]
        glob = torch.cat(reps, dim=1)
        h = torch.cat([lo, glob], dim=2).transpose(2, 1)
        h = tF.relu(self.bn_2(self.conv_2(h)))
        h = tF.relu(self.bn_3(self.conv_3(h)))
        return self.conv_4(h)


def randomize(module, rng):
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if "running_var" in k:
            sd[k] = torch.from_numpy(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
        else:
            sd[k] = torch.from_numpy(rng.normal(0, 0.2, v.shape).astype(np.float32))
    module.load_state_dict(sd)


def test_import_reproduces_reference_forward(rng):
    B, W, N = 2, 3, 64
    base, head = RefBase(), RefAttHead()
    randomize(base, rng)
    randomize(head, rng)
    base.eval()
    head.eval()

    pts = rng.normal(size=(B, W, N, 9)).astype(np.float32)
    cent = rng.normal(size=(B, W, 2)).astype(np.float32)

    with torch.no_grad():
        locals_, tokens = [], []
        for w in range(W):  # reference's sequential window loop
            lo, gl, _ = base(torch.from_numpy(pts[:, w]))
            locals_.append(lo)
            tokens.append(gl.unsqueeze(0))
        lo = torch.cat(locals_, dim=1)
        tok = torch.cat(tokens, dim=0)
        ref_logits = head(tok, lo, torch.from_numpy(cent), [N] * W)
    # [B, k, W*N] → [B, W, N, k]
    ref = ref_logits.numpy().transpose(0, 2, 1).reshape(B, W, N, -1)

    enc_p, enc_s = convert_base_pointnet(
        {k: v.numpy() for k, v in base.state_dict().items()}
    )
    rest_p, rest_s = convert_attention_head(
        {k: v.numpy() for k, v in head.state_dict().items()}
    )
    variables = {
        "params": {"encoder": enc_p, **rest_p},
        "batch_stats": {"encoder": enc_s, **rest_s},
    }

    model = AMPNetSegmenter(ModelConfig(dropout=0.0))
    logits, _, _ = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(cent), None, train=False
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)


def test_restore_honors_checkpoint_n_points(tmp_path, rng):
    """The .pth restore path must tile at the checkpoint's number_of_points —
    evaluating a 256-point-trained model with 2048-point tiling is the round-2
    parity-protocol bug this guards against (test_pointnet_att_segmen.py:87-94
    reads hyperparameters out of the checkpoint)."""
    import argparse

    from ampnet_tpu.cli.main import _restore_model

    base, head = RefBase(), RefAttHead()
    randomize(base, rng)
    randomize(head, rng)
    ckpt = {
        "base_pointnet": base.state_dict(),
        "segmen_net": head.state_dict(),
        "number_of_points": 256,
        "batch_size": 8,
        "lr": 1e-3,
        "epoch": 1,
    }
    p = str(tmp_path / "model_test.pth")
    torch.save(ckpt, p)
    args = argparse.Namespace(model_checkpoint=p, arch="attention")
    cfg, model, state, name = _restore_model(args, "segmentation")
    assert cfg.data.n_points == 256


class RefGRUHead(tnn.Module):
    """Reference SegmentationWithGRU key layout (pointnetAtt.py:212-258)."""

    def __init__(self, e=256, h=64, k=5, local=64):
        super().__init__()
        self.h = h
        self.gru_global = tnn.GRU(e, h, batch_first=True, bidirectional=False)
        self.conv_2 = tnn.Conv1d(local + h, 128, 1)
        self.conv_3 = tnn.Conv1d(128, 64, 1)
        self.conv_4 = tnn.Conv1d(64, k, 1)
        self.bn_2 = tnn.BatchNorm1d(128)
        self.bn_3 = tnn.BatchNorm1d(64)

    def forward(self, global_seq, local_feats, np_cluster):
        hidden = torch.zeros(1, global_seq.shape[0], self.h)
        out_h, _ = self.gru_global(global_seq, hidden)  # [B, W, h]
        reps = [out_h[:, i, :].unsqueeze(1).repeat(1, np_cluster[i], 1)
                for i in range(out_h.shape[1])]
        glob = torch.cat(reps, dim=1)
        x = torch.cat([local_feats, glob], dim=2).transpose(2, 1)
        x = tF.relu(self.bn_2(self.conv_2(x)))
        x = tF.relu(self.bn_3(self.conv_3(x)))
        return self.conv_4(x)


def test_gru_import_reproduces_reference_forward(rng):
    """SegmentationWithGRU checkpoints must import with numerical forward parity —
    torch nn.GRU (r,z,n row-packed gates) -> flax nn.GRUCell (ir/iz/in + hr/hz/hn)."""
    from ampnet_tpu.core.torch_import import convert_gru_head

    B, W, N = 2, 3, 64
    base, head = RefBase(), RefGRUHead()
    randomize(base, rng)
    randomize(head, rng)
    base.eval()
    head.eval()

    pts = rng.normal(size=(B, W, N, 9)).astype(np.float32)
    cent = rng.normal(size=(B, W, 2)).astype(np.float32)

    with torch.no_grad():
        locals_, tokens = [], []
        for w in range(W):
            lo, gl, _ = base(torch.from_numpy(pts[:, w]))
            locals_.append(lo)
            tokens.append(gl.unsqueeze(1))
        lo = torch.cat(locals_, dim=1)
        tok = torch.cat(tokens, dim=1)  # [B, W, 256] batch-first
        ref_logits = head(tok, lo, [N] * W)
    ref = ref_logits.numpy().transpose(0, 2, 1).reshape(B, W, N, -1)

    enc_p, enc_s = convert_base_pointnet(
        {k: v.numpy() for k, v in base.state_dict().items()}
    )
    rest_p, rest_s = convert_gru_head(
        {k: v.numpy() for k, v in head.state_dict().items()}
    )
    variables = {
        "params": {"encoder": enc_p, **rest_p},
        "batch_stats": {"encoder": enc_s, **rest_s},
    }
    model = AMPNetSegmenter(ModelConfig(dropout=0.0, context="gru"))
    logits, _, _ = model.apply(
        variables, jnp.asarray(pts), jnp.asarray(cent), None, train=False
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)
