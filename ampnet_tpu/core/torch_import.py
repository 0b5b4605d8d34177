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


def _seg_head(sd: Dict) -> Tuple[Dict, Dict]:
    """Shared per-point head convs (conv_2/3/4 + bn_2/3 — identical layout in
    SegmentationWithAttention pointnetAtt.py:167-174 and SegmentationWithGRU
    :221-228) → our SegmentationHead tree."""
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
    return head_p, head_s


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
    head_p, head_s = _seg_head(sd)
    return {"context": ctx_p, "head": head_p}, {"head": head_s}


def convert_gru_head(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference SegmentationWithGRU (pointnetAtt.py:212-258) → our GRUContext +
    SegmentationHead trees.

    torch ``nn.GRU`` packs gates row-wise in (r, z, n) order; flax ``GRUCell``
    names them ir/iz/in (input side, biased) and hr/hz/hn (hidden side, bias only
    on hn). Both compute ``n = tanh(W_in x + b_in + r*(W_hn h + b_hn))``, and for
    r/z torch's two biases sum into flax's single input-side bias.
    """
    wih = np.asarray(sd["gru_global.weight_ih_l0"], np.float32)  # [3H, E]
    whh = np.asarray(sd["gru_global.weight_hh_l0"], np.float32)  # [3H, H]
    bih = np.asarray(sd["gru_global.bias_ih_l0"], np.float32)
    bhh = np.asarray(sd["gru_global.bias_hh_l0"], np.float32)
    h = whh.shape[1]

    def chunk(a, i):
        return a[i * h : (i + 1) * h]

    gru = {
        "ir": {"kernel": _t(chunk(wih, 0)), "bias": chunk(bih, 0) + chunk(bhh, 0)},
        "iz": {"kernel": _t(chunk(wih, 1)), "bias": chunk(bih, 1) + chunk(bhh, 1)},
        "in": {"kernel": _t(chunk(wih, 2)), "bias": chunk(bih, 2)},
        "hr": {"kernel": _t(chunk(whh, 0))},
        "hz": {"kernel": _t(chunk(whh, 1))},
        "hn": {"kernel": _t(chunk(whh, 2)), "bias": chunk(bhh, 2)},
    }
    head_p, head_s = _seg_head(sd)
    return {"context": {"gru": gru}, "head": head_p}, {"head": head_s}


def import_reference_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Load a reference ``model_*.pth`` → (variables for AMPNetSegmenter, meta).

    Detects the context family from the head state dict: MultiheadAttention keys
    → attention (SegmentationWithAttention), gru_global keys → gru
    (SegmentationWithGRU). ``meta['arch']`` reports which."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
    base_sd = to_np(ckpt["base_pointnet"])
    enc_p, enc_s = convert_base_pointnet(base_sd)
    head_sd = to_np(ckpt["segmen_net"])
    if "gru_global.weight_ih_l0" in head_sd:
        rest_p, rest_s = convert_gru_head(head_sd)
        arch = "gru"
    else:
        rest_p, rest_s = convert_attention_head(head_sd)
        arch = "attention"
    variables = {
        "params": {"encoder": enc_p, **rest_p},
        "batch_stats": {"encoder": enc_s, **rest_s},
    }
    meta = {k: v for k, v in ckpt.items() if not k.endswith(("pointnet", "net"))
            and not isinstance(v, dict)}
    meta["arch"] = arch
    # model geometry lives only in the weights: the GRU trainer builds the
    # encoder with point_dimension=2 (LidarKmeansDataset.POINT_DIMENSION,
    # train_pointnetGRU.py:121) while the attention trainer uses 3
    d2 = base_sd["input_transform.fc_3.bias"].shape[0]
    meta["point_dim"] = int(round(d2 ** 0.5))
    meta["global_feat"] = int(base_sd["conv_6.weight"].shape[0])
    if arch == "gru":
        meta["gru_hidden"] = int(head_sd["gru_global.weight_hh_l0"].shape[1])
    return variables, meta
