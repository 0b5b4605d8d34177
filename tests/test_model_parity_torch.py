"""Numerical parity of the Flax AMP-Net against an independent torch construction.

These tests build the reference architecture from its spec (SURVEY.md §2.3) with plain
torch modules, copy the *Flax* model's weights into it, and assert the two forward
passes agree. That pins the vectorized [B, W, N, C] JAX implementation to the reference
math (pointNet/model/pointnetAtt.py) without importing or copying reference code.

All comparisons run with W=1 windows and dropout=0 so BatchNorm batch-statistics
compositions are identical in both frameworks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from ampnet_tpu.core.config import ModelConfig  # noqa: E402
from ampnet_tpu.models.amp import AMPNetSegmenter, WindowEncoder  # noqa: E402
from ampnet_tpu.models.attention import WindowMHA  # noqa: E402
from ampnet_tpu.models.layers import TNet  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def set_conv(conv, kernel):  # flax Dense kernel [Cin, Cout] → torch Conv1d [Cout, Cin, 1]
    conv.weight.data = t(kernel).T.unsqueeze(-1)


def set_linear(lin, kernel, bias=None):
    lin.weight.data = t(kernel).T
    if bias is not None:
        lin.bias.data = t(bias)


def set_bn(bn, p):
    bn.weight.data = t(p["scale"])
    bn.bias.data = t(p["bias"])


class TorchTNet(tnn.Module):
    """Spec-built torch T-Net: convs (64,128,bottleneck) + FCs (256,128) + out."""

    def __init__(self, d, bottleneck=256):
        super().__init__()
        self.d = d
        self.c1 = tnn.Conv1d(d, 64, 1, bias=False)
        self.c2 = tnn.Conv1d(64, 128, 1, bias=False)
        self.c3 = tnn.Conv1d(128, bottleneck, 1, bias=False)
        self.b1, self.b2, self.b3 = (
            tnn.BatchNorm1d(64),
            tnn.BatchNorm1d(128),
            tnn.BatchNorm1d(bottleneck),
        )
        self.f1 = tnn.Linear(bottleneck, 256, bias=False)
        self.f2 = tnn.Linear(256, 128, bias=False)
        self.b4, self.b5 = tnn.BatchNorm1d(256), tnn.BatchNorm1d(128)
        self.f3 = tnn.Linear(128, d * d)

    def forward(self, x):  # [B, N, d]
        n = x.shape[1]
        h = x.transpose(2, 1)
        h = tF.relu(self.b1(self.c1(h)))
        h = tF.relu(self.b2(self.c2(h)))
        h = tF.relu(self.b3(self.c3(h)))
        h = tnn.MaxPool1d(n)(h).squeeze(-1)
        h = tF.relu(self.b4(self.f1(h)))
        h = tF.relu(self.b5(self.f2(h)))
        h = self.f3(h)
        return h.view(-1, self.d, self.d) + torch.eye(self.d)

    def load_flax(self, p):
        trunk = p["trunk"]
        set_conv(self.c1, trunk["mlp_0"]["dense"]["kernel"])
        set_conv(self.c2, trunk["mlp_1"]["dense"]["kernel"])
        set_conv(self.c3, trunk["mlp_2"]["dense"]["kernel"])
        set_bn(self.b1, trunk["mlp_0"]["bn"])
        set_bn(self.b2, trunk["mlp_1"]["bn"])
        set_bn(self.b3, trunk["mlp_2"]["bn"])
        set_linear(self.f1, p["fc_0"]["kernel"])
        set_linear(self.f2, p["fc_1"]["kernel"])
        set_bn(self.b4, p["fc_bn_0"])
        set_bn(self.b5, p["fc_bn_1"])
        set_linear(self.f3, p["fc_out"]["kernel"], p["fc_out"]["bias"])


def randomized_params(key, params):
    """Replace zero-init output kernels with random values so parity is non-trivial."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * 0.1 if l.ndim >= 1 else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, new)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(dropout=0.0)


def test_tnet_parity(cfg):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 128, 3))
    model = TNet(output_dim=3, bottleneck=256, use_running_average=False)
    variables = model.init(key, x)
    params = randomized_params(jax.random.PRNGKey(7), variables["params"])
    out, _ = model.apply({"params": params}, x, mutable=["batch_stats"])

    tm = TorchTNet(3)
    tm.load_flax(jax.tree.map(np.asarray, params))
    tm.train()
    with torch.no_grad():
        tout = tm(t(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=2e-4)


class TorchAMPEncoder(tnn.Module):
    """Spec-built AMP window encoder (pointnetAtt.py:50-112 semantics)."""

    def __init__(self, point_dim=3, g=256):
        super().__init__()
        self.pd = point_dim
        self.tin = TorchTNet(point_dim)
        self.tfeat = TorchTNet(64)
        self.c1 = tnn.Conv1d(9 + point_dim, 64, 1, bias=False)
        self.c2 = tnn.Conv1d(64, 64, 1, bias=False)
        self.c3 = tnn.Conv1d(64, 64, 1, bias=False)
        self.c4 = tnn.Conv1d(64, 128, 1, bias=False)
        self.c5 = tnn.Conv1d(128, 128, 1, bias=False)
        self.c6 = tnn.Conv1d(128, g, 1, bias=False)
        self.b1, self.b2, self.b3 = tnn.BatchNorm1d(64), tnn.BatchNorm1d(64), tnn.BatchNorm1d(64)
        self.b4, self.b5, self.b6 = (
            tnn.BatchNorm1d(128),
            tnn.BatchNorm1d(128),
            tnn.BatchNorm1d(g),
        )

    def forward(self, x):  # [B, N, 9]
        n = x.shape[1]
        coords = x[:, :, : self.pd]
        tr = self.tin(coords)
        coords = torch.bmm(coords, tr)
        h = torch.cat([coords, x], dim=2).transpose(2, 1)
        h = tF.relu(self.b1(self.c1(h)))
        h = tF.relu(self.b2(self.c2(h))).transpose(2, 1)
        ft = self.tfeat(h)
        h = torch.bmm(h, ft)
        local = h
        h = h.transpose(2, 1)
        h = tF.relu(self.b3(self.c3(h)))
        h = tF.relu(self.b4(self.c4(h)))
        h = tF.relu(self.b5(self.c5(h)))
        h = tF.relu(self.b6(self.c6(h)))
        g = tnn.MaxPool1d(n)(h).squeeze(-1)
        return local, g, ft

    def load_flax(self, p):
        self.tin.load_flax(p["input_tnet"])
        self.tfeat.load_flax(p["feature_tnet"])
        a, b = p["mlp_a"], p["mlp_b"]
        set_conv(self.c1, a["mlp_0"]["dense"]["kernel"])
        set_conv(self.c2, a["mlp_1"]["dense"]["kernel"])
        set_bn(self.b1, a["mlp_0"]["bn"])
        set_bn(self.b2, a["mlp_1"]["bn"])
        set_conv(self.c3, b["mlp_0"]["dense"]["kernel"])
        set_conv(self.c4, b["mlp_1"]["dense"]["kernel"])
        set_conv(self.c5, b["mlp_2"]["dense"]["kernel"])
        set_conv(self.c6, b["mlp_3"]["dense"]["kernel"])
        set_bn(self.b3, b["mlp_0"]["bn"])
        set_bn(self.b4, b["mlp_1"]["bn"])
        set_bn(self.b5, b["mlp_2"]["bn"])
        set_bn(self.b6, b["mlp_3"]["bn"])


def test_window_encoder_parity(cfg):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 1, 256, 9))  # W=1 so BN batches match torch
    model = WindowEncoder(cfg)
    variables = model.init(key, x, train=True)
    params = randomized_params(jax.random.PRNGKey(8), variables["params"])
    (local, glob, ft), _ = model.apply(
        {"params": params}, x, train=True, mutable=["batch_stats"]
    )

    tm = TorchAMPEncoder(point_dim=cfg.point_dim, g=cfg.global_feat)
    tm.load_flax(jax.tree.map(np.asarray, params))
    tm.train()
    with torch.no_grad():
        tl, tg, tft = tm(t(np.asarray(x[:, 0])))
    np.testing.assert_allclose(np.asarray(local[:, 0]), tl.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(glob[:, 0]), tg.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ft[:, 0]), tft.numpy(), atol=5e-4)


def test_mha_parity():
    E, H, B, W = 256, 8, 3, 9
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, W, E))
    pad = np.zeros((B, W), bool)
    pad[0, 7:] = True
    pad[2, 4:] = True

    model = WindowMHA(E, H, dropout=0.0)
    variables = model.init(key, x, key_padding_mask=jnp.asarray(pad))
    params = variables["params"]
    out, weights = model.apply({"params": params}, x, key_padding_mask=jnp.asarray(pad))

    tm = tnn.MultiheadAttention(E, H, dropout=0.0, batch_first=False)
    p = jax.tree.map(np.asarray, params)
    tm.in_proj_weight.data = t(p["in_proj"]["kernel"]).T
    tm.in_proj_bias.data = t(p["in_proj"]["bias"])
    tm.out_proj.weight.data = t(p["out_proj"]["kernel"]).T
    tm.out_proj.bias.data = t(p["out_proj"]["bias"])
    tm.eval()
    xt = t(np.asarray(x)).transpose(0, 1)  # [W, B, E] seq-first
    with torch.no_grad():
        tout, tw = tm(xt, xt, xt, key_padding_mask=torch.from_numpy(pad), need_weights=True)
    np.testing.assert_allclose(np.asarray(out), tout.transpose(0, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(weights), tw.numpy(), atol=2e-5)


def test_segmenter_end_to_end_shapes(cfg):
    """Smoke test of the full segmenter on padded multi-window input."""
    key = jax.random.PRNGKey(4)
    B, W, N = 2, 9, 64
    pts = jax.random.normal(key, (B, W, N, 9))
    cent = jax.random.normal(key, (B, W, 2))
    pad = jnp.zeros((B, W), bool).at[:, 5:].set(True)
    model = AMPNetSegmenter(cfg)
    variables = model.init(key, pts, cent, pad, train=False)
    logits, ft, attw = model.apply(variables, pts, cent, pad, train=False)
    assert logits.shape == (B, W, N, cfg.num_classes)
    assert ft.shape == (B, W, 64, 64)
    assert attw.shape == (B, W, W)
    assert np.isfinite(np.asarray(logits)).all()


def test_padded_windows_do_not_change_attention(cfg):
    """Replicate-padded windows must not alter real-window outputs when masked."""
    key = jax.random.PRNGKey(5)
    B, W, N = 2, 4, 64
    real = 2
    pts = np.asarray(jax.random.normal(key, (B, real, N, 9)))
    # replicate-pad windows (collate_fns.py:42-45 'replicate' mode)
    pts_pad = np.concatenate([pts] + [pts[:, -1:]] * (W - real), axis=1)
    cent = np.asarray(jax.random.normal(key, (B, real, 2)))
    cent_pad = np.concatenate([cent] + [cent[:, -1:]] * (W - real), axis=1)
    pad = np.zeros((B, W), bool)
    pad[:, real:] = True

    model = AMPNetSegmenter(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts_pad), jnp.asarray(cent_pad),
                           jnp.asarray(pad), train=False)
    params = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}

    # garbage in the padded windows must not leak into real windows through attention
    pts_garbage = pts_pad.copy()
    pts_garbage[:, real:] = 1e3
    out_a, *_ = model.apply(params, jnp.asarray(pts_pad), jnp.asarray(cent_pad),
                            jnp.asarray(pad), train=False)
    out_b, *_ = model.apply(params, jnp.asarray(pts_garbage), jnp.asarray(cent_pad),
                            jnp.asarray(pad), train=False)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :real]), np.asarray(out_b[:, :real]), atol=1e-5
    )
