"""Export trained checkpoints to the reference's PyTorch ``.pth`` format.

The inverse of :mod:`core.torch_import`: converts :class:`AMPNetSegmenter`
variables into the two torch state dicts the reference saves —
``{'base_pointnet': …, 'segmen_net': …, task, batch_size, lr,
number_of_points, epoch, …}`` (``utils/utils.py:422-438``,
``save_checkpoint_segmen_model``) — so models trained on TPU here can be
evaluated by the reference's own torch scripts (both directions of migration).

Key layouts mirror torch_import exactly; BatchNorm entries additionally get the
``num_batches_tracked`` tensors a strict ``load_state_dict`` expects. The GRU
export splits flax's summed r/z input biases as (bias_ih = sum, bias_hh = 0) —
torch's GRU adds the two, so the module computes identically.
"""

from __future__ import annotations

from typing import Dict, Optional


def _require_torch():
    import torch

    return torch


def _t(torch, a):  # kernel [Cin, Cout] → weight [Cout, Cin]
    import numpy as np

    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32).T))


def _conv(torch, a):  # kernel [Cin, Cout] → Conv1d weight [Cout, Cin, 1]
    return _t(torch, a)[:, :, None].contiguous()


def _arr(torch, a):
    import numpy as np

    # copy: jax array views are non-writable and torch.from_numpy warns on them
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _bn(torch, sd: Dict, prefix: str, params: Dict, stats: Dict) -> None:
    sd[f"{prefix}.weight"] = _arr(torch, params["scale"])
    sd[f"{prefix}.bias"] = _arr(torch, params["bias"])
    sd[f"{prefix}.running_mean"] = _arr(torch, stats["mean"])
    sd[f"{prefix}.running_var"] = _arr(torch, stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)


def _tnet(torch, sd: Dict, prefix: str, p: Dict, s: Dict) -> None:
    """Our TNet tree → reference TransformationNet keys (pointnetAtt.py:7-47)."""
    for i in range(3):
        sd[f"{prefix}.conv_{i + 1}.weight"] = _conv(
            torch, p["trunk"][f"mlp_{i}"]["dense"]["kernel"]
        )
        _bn(torch, sd, f"{prefix}.bn_{i + 1}",
            p["trunk"][f"mlp_{i}"]["bn"], s["trunk"][f"mlp_{i}"]["bn"])
    for i in range(2):
        sd[f"{prefix}.fc_{i + 1}.weight"] = _t(torch, p[f"fc_{i}"]["kernel"])
        _bn(torch, sd, f"{prefix}.bn_{i + 4}", p[f"fc_bn_{i}"], s[f"fc_bn_{i}"])
    sd[f"{prefix}.fc_3.weight"] = _t(torch, p["fc_out"]["kernel"])
    sd[f"{prefix}.fc_3.bias"] = _arr(torch, p["fc_out"]["bias"])


def export_base_pointnet(enc_p: Dict, enc_s: Dict) -> Dict:
    """Our WindowEncoder tree → reference BasePointNet state dict
    (pointnetAtt.py:50-112)."""
    torch = _require_torch()
    sd: Dict = {}
    _tnet(torch, sd, "input_transform", enc_p["input_tnet"], enc_s["input_tnet"])
    _tnet(torch, sd, "feature_transform", enc_p["feature_tnet"], enc_s["feature_tnet"])
    for i, conv in enumerate((1, 2)):
        sd[f"conv_{conv}.weight"] = _conv(torch, enc_p["mlp_a"][f"mlp_{i}"]["dense"]["kernel"])
        _bn(torch, sd, f"bn_{conv}",
            enc_p["mlp_a"][f"mlp_{i}"]["bn"], enc_s["mlp_a"][f"mlp_{i}"]["bn"])
    for i, conv in enumerate((3, 4, 5, 6)):
        sd[f"conv_{conv}.weight"] = _conv(torch, enc_p["mlp_b"][f"mlp_{i}"]["dense"]["kernel"])
        _bn(torch, sd, f"bn_{conv}",
            enc_p["mlp_b"][f"mlp_{i}"]["bn"], enc_s["mlp_b"][f"mlp_{i}"]["bn"])
    return sd


def _seg_head(torch, sd: Dict, head_p: Dict, head_s: Dict) -> None:
    """Our SegmentationHead tree → reference conv_2/3/4 + bn_2/3 keys
    (pointnetAtt.py:167-174 / :221-228)."""
    for ours, conv, bn, tag in (
        ("dense_1", "conv_2", "bn_2", "bn_1"),
        ("dense_2", "conv_3", "bn_3", "bn_2"),
    ):
        sd[f"{conv}.weight"] = _conv(torch, head_p[ours]["kernel"])
        sd[f"{conv}.bias"] = _arr(torch, head_p[ours]["bias"])
        _bn(torch, sd, bn, head_p[tag], head_s[tag])
    sd["conv_4.weight"] = _conv(torch, head_p["dense_out"]["kernel"])
    sd["conv_4.bias"] = _arr(torch, head_p["dense_out"]["bias"])


def export_attention_head(params: Dict, stats: Dict) -> Dict:
    """Our context+head trees → reference SegmentationWithAttention state dict
    (pointnetAtt.py:154-209)."""
    torch = _require_torch()
    sd: Dict = {}
    pe = params["context"]["pos_enc"]
    sd["fc1.weight"] = _t(torch, pe["fc1"]["kernel"])
    sd["fc1.bias"] = _arr(torch, pe["fc1"]["bias"])
    sd["fc2.weight"] = _t(torch, pe["fc2"]["kernel"])
    sd["fc2.bias"] = _arr(torch, pe["fc2"]["bias"])
    mha = params["context"]["mha"]
    sd["attention.in_proj_weight"] = _t(torch, mha["in_proj"]["kernel"])
    sd["attention.in_proj_bias"] = _arr(torch, mha["in_proj"]["bias"])
    sd["attention.out_proj.weight"] = _t(torch, mha["out_proj"]["kernel"])
    sd["attention.out_proj.bias"] = _arr(torch, mha["out_proj"]["bias"])
    _seg_head(torch, sd, params["head"], stats["head"])
    return sd


def export_gru_head(params: Dict, stats: Dict) -> Dict:
    """Our GRUContext+head trees → reference SegmentationWithGRU state dict
    (pointnetAtt.py:212-258). flax's summed r/z input biases export as
    bias_ih (full) + bias_hh (zero) — torch adds them, so numerics match."""
    import numpy as np

    torch = _require_torch()
    sd: Dict = {}
    gru = params["context"]["gru"]
    wih = np.concatenate([np.asarray(gru[g]["kernel"], np.float32).T for g in ("ir", "iz", "in")])
    whh = np.concatenate([np.asarray(gru[g]["kernel"], np.float32).T for g in ("hr", "hz", "hn")])
    h = whh.shape[1]
    bih = np.concatenate([np.asarray(gru[g]["bias"], np.float32) for g in ("ir", "iz", "in")])
    bhh = np.concatenate([np.zeros(2 * h, np.float32), np.asarray(gru["hn"]["bias"], np.float32)])
    sd["gru_global.weight_ih_l0"] = _arr(torch, wih)
    sd["gru_global.weight_hh_l0"] = _arr(torch, whh)
    sd["gru_global.bias_ih_l0"] = _arr(torch, bih)
    sd["gru_global.bias_hh_l0"] = _arr(torch, bhh)
    _seg_head(torch, sd, params["head"], stats["head"])
    return sd


def export_reference_checkpoint(
    variables: Dict,
    path: str,
    arch: str = "attention",
    meta: Optional[Dict] = None,
) -> None:
    """Write AMPNetSegmenter ``variables`` as a reference ``model_*.pth``.

    ``meta`` fills the reference payload fields (task, batch_size, lr,
    number_of_points, epoch, epochs_since_improvement, accuracy —
    utils/utils.py:422-438); sensible defaults otherwise. Round-trip parity
    with :func:`core.torch_import.import_reference_checkpoint` is pinned in
    tests/test_torch_export.py."""
    torch = _require_torch()
    p, s = variables["params"], variables["batch_stats"]
    base_sd = export_base_pointnet(p["encoder"], s["encoder"])
    if arch == "attention":
        head_sd = export_attention_head(p, s)
    elif arch == "gru":
        head_sd = export_gru_head(p, s)
    else:
        raise ValueError(f"unsupported arch {arch!r} (attention | gru)")
    payload = {
        "task": "segmentation",
        "batch_size": 32,
        "lr": 1e-3,
        "number_of_points": 2048,
        "epoch": 0,
        "epochs_since_improvement": 0,
        "accuracy": float("nan"),
        **(meta or {}),
        "base_pointnet": base_sd,
        "segmen_net": head_sd,
    }
    torch.save(payload, path)
