"""Import reference PyTorch checkpoints into this framework.

The reference saves ``{'base_pointnet': state_dict, 'segmen_net': state_dict, ...}``
(``utils/utils.py:422-438``). This module converts those torch state dicts into the
Flax variables of :class:`AMPNetSegmenter`, so models trained with the reference run
directly on TPU — the key migration affordance for reference users.

Mapping (torch → flax), derived from the verified flax↔torch parity tests:

* ``Conv1d(k=1).weight [Cout, Cin, 1]`` → ``dense.kernel [Cin, Cout]`` (squeeze+T)
* ``Linear.weight [Cout, Cin]``         → ``kernel [Cin, Cout]`` (T)
* ``BatchNorm1d.{weight, bias}``        → ``bn.{scale, bias}`` (params)
* ``BatchNorm1d.running_{mean, var}``   → ``bn.{mean, var}`` (batch_stats)
* ``MultiheadAttention.in_proj_weight [3E, E]`` → ``in_proj.kernel [E, 3E]`` (T) —
  torch's row-chunk q/k/v order equals our column-split order.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _conv(w) -> np.ndarray:  # [Cout, Cin, 1] → [Cin, Cout]
    return _t(np.asarray(w, dtype=np.float32)[:, :, 0])


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return params, stats


def _tnet(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """Reference TransformationNet (pointnetAtt.py:7-47) → our TNet tree."""
    p, s = {}, {}
    trunk_p, trunk_s = {}, {}
    for i in range(3):
        bnp, bns = _bn(sd, f"{prefix}.bn_{i + 1}")
        trunk_p[f"mlp_{i}"] = {
            "dense": {"kernel": _conv(sd[f"{prefix}.conv_{i + 1}.weight"])},
            "bn": bnp,
        }
        trunk_s[f"mlp_{i}"] = {"bn": bns}
    p["trunk"], s["trunk"] = trunk_p, trunk_s
    for i in range(2):
        p[f"fc_{i}"] = {"kernel": _t(sd[f"{prefix}.fc_{i + 1}.weight"])}
        bnp, bns = _bn(sd, f"{prefix}.bn_{i + 4}")
        p[f"fc_bn_{i}"] = bnp
        s[f"fc_bn_{i}"] = bns
    p["fc_out"] = {
        "kernel": _t(sd[f"{prefix}.fc_3.weight"]),
        "bias": np.asarray(sd[f"{prefix}.fc_3.bias"], np.float32),
    }
    return p, s


def convert_base_pointnet(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference BasePointNet (pointnetAtt.py:50-112) → our WindowEncoder tree."""
    p, s = {}, {}
    p["input_tnet"], s["input_tnet"] = _tnet(sd, "input_transform")
    p["feature_tnet"], s["feature_tnet"] = _tnet(sd, "feature_transform")
    mlp_a_p, mlp_a_s = {}, {}
    for i, conv in enumerate((1, 2)):
        bnp, bns = _bn(sd, f"bn_{conv}")
        mlp_a_p[f"mlp_{i}"] = {
            "dense": {"kernel": _conv(sd[f"conv_{conv}.weight"])},
            "bn": bnp,
        }
        mlp_a_s[f"mlp_{i}"] = {"bn": bns}
    p["mlp_a"], s["mlp_a"] = mlp_a_p, mlp_a_s
    mlp_b_p, mlp_b_s = {}, {}
    for i, conv in enumerate((3, 4, 5, 6)):
        bnp, bns = _bn(sd, f"bn_{conv}")
        mlp_b_p[f"mlp_{i}"] = {
            "dense": {"kernel": _conv(sd[f"conv_{conv}.weight"])},
            "bn": bnp,
        }
        mlp_b_s[f"mlp_{i}"] = {"bn": bns}
    p["mlp_b"], s["mlp_b"] = mlp_b_p, mlp_b_s
    return p, s


def convert_attention_head(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference SegmentationWithAttention (pointnetAtt.py:154-209) →
    our context + head trees."""
    ctx_p = {
        "pos_enc": {
            "fc1": {
                "kernel": _t(sd["fc1.weight"]),
                "bias": np.asarray(sd["fc1.bias"], np.float32),
            },
            "fc2": {
                "kernel": _t(sd["fc2.weight"]),
                "bias": np.asarray(sd["fc2.bias"], np.float32),
            },
        },
        "mha": {
            "in_proj": {
                "kernel": _t(sd["attention.in_proj_weight"]),
                "bias": np.asarray(sd["attention.in_proj_bias"], np.float32),
            },
            "out_proj": {
                "kernel": _t(sd["attention.out_proj.weight"]),
                "bias": np.asarray(sd["attention.out_proj.bias"], np.float32),
            },
        },
    }
    head_p, head_s = {}, {}
    for ours, conv, bn in (("dense_1", "conv_2", "bn_2"), ("dense_2", "conv_3", "bn_3")):
        head_p[ours] = {
            "kernel": _conv(sd[f"{conv}.weight"]),
            "bias": np.asarray(sd[f"{conv}.bias"], np.float32),
        }
        bnp, bns = _bn(sd, bn)
        tag = "bn_1" if ours == "dense_1" else "bn_2"
        head_p[tag] = bnp
        head_s[tag] = bns
    head_p["dense_out"] = {
        "kernel": _conv(sd["conv_4.weight"]),
        "bias": np.asarray(sd["conv_4.bias"], np.float32),
    }
    return {"context": ctx_p, "head": head_p}, {"head": head_s}


def import_reference_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Load a reference ``model_*.pth`` → (variables for AMPNetSegmenter, meta)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
    enc_p, enc_s = convert_base_pointnet(to_np(ckpt["base_pointnet"]))
    rest_p, rest_s = convert_attention_head(to_np(ckpt["segmen_net"]))
    variables = {
        "params": {"encoder": enc_p, **rest_p},
        "batch_stats": {"encoder": enc_s, **rest_s},
    }
    meta = {k: v for k, v in ckpt.items() if not k.endswith(("pointnet", "net"))
            and not isinstance(v, dict)}
    return variables, meta
