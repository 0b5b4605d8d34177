"""Round-trip: flax variables → reference .pth → flax again, bit-for-bit.

Completes the bidirectional checkpoint interop: torch_import brings reference
models here (parity pinned in test_torch_import.py), torch_export lets models
trained here run under the reference's own torch scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPNetConfig, ModelConfig
from ampnet_tpu.core.torch_export import export_reference_checkpoint
from ampnet_tpu.core.torch_import import import_reference_checkpoint
from ampnet_tpu.models.amp import AMPNetSegmenter


def _randomized_variables(arch: str):
    cfg = AMPNetConfig(model=ModelConfig(context=arch, dropout=0.0))
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(2, 3, 32, 9)).astype(np.float32))
    cent = jnp.asarray(rng.normal(size=(2, 3, 2)).astype(np.float32))
    pad = jnp.zeros((2, 3), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, cent, pad, train=False)
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [l + jax.random.normal(k, l.shape, l.dtype) * 0.1 for k, l in zip(keys, leaves)]
    return cfg, model, jax.tree.unflatten(treedef, leaves), (pts, cent, pad)


@pytest.mark.parametrize("arch", ["attention", "gru"])
def test_export_import_roundtrip(arch, tmp_path):
    cfg, model, variables, (pts, cent, pad) = _randomized_variables(arch)
    path = str(tmp_path / f"model_{arch}.pth")
    export_reference_checkpoint(
        variables, path, arch=arch, meta={"number_of_points": 2048, "epoch": 7}
    )

    back, meta = import_reference_checkpoint(path)
    assert meta["arch"] == arch
    assert meta["epoch"] == 7 and meta["number_of_points"] == 2048

    # every leaf round-trips exactly (transposes/reshapes only, no arithmetic
    # except the GRU r/z bias split which import re-sums)
    ref_leaves = jax.tree.leaves_with_path(variables)
    back_flat = dict(jax.tree.leaves_with_path(back))
    for path_k, leaf in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(back_flat[path_k]), np.asarray(leaf), atol=1e-6,
            err_msg=str(path_k),
        )

    # and the forwards agree
    a, _, _ = model.apply(variables, pts, cent, pad, train=False)
    b, _, _ = model.apply(back, pts, cent, pad, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_export_rejects_unknown_arch(tmp_path):
    _, _, variables, _ = _randomized_variables("attention")
    with pytest.raises(ValueError):
        export_reference_checkpoint(variables, str(tmp_path / "x.pth"), arch="mamba")


def test_exported_state_dict_loads_into_reference_layout(tmp_path):
    """The exported state dicts carry exactly the keys a strict torch
    load_state_dict of the reference modules expects (same key set the
    importer consumes, plus num_batches_tracked for every BN)."""
    import torch

    _, _, variables, _ = _randomized_variables("attention")
    path = str(tmp_path / "model.pth")
    export_reference_checkpoint(variables, path, arch="attention")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    base = ckpt["base_pointnet"]
    # spot-check shapes of the reference layout (pointnetAtt.py:50-112)
    assert base["conv_1.weight"].shape[2] == 1  # Conv1d kernel size 1
    assert base["input_transform.fc_3.bias"].shape[0] == 9  # 3x3 transform
    assert base["bn_1.num_batches_tracked"].dtype == torch.long
    head = ckpt["segmen_net"]
    assert head["attention.in_proj_weight"].shape[0] == 3 * head["attention.out_proj.weight"].shape[0]
