"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded train step
must run AND produce numerics identical to the single-device step (SURVEY.md §4's
'1 vs N devices' seam)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ampnet_tpu.core.config import AMPNetConfig
from ampnet_tpu.data.synthetic import synthetic_batch
from ampnet_tpu.models.amp import AMPNetSegmenter
from ampnet_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_step_fns,
    replicate_state,
    shard_batch,
)
from ampnet_tpu.train.state import create_train_state
from ampnet_tpu.train.step import make_step_fns


@pytest.fixture(scope="module")
def cfg():
    return AMPNetConfig()


@pytest.fixture(scope="module")
def setup(cfg):
    rng = np.random.default_rng(3)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, 8, 3, 64, real_windows=2).items()}
    model = AMPNetSegmenter(cfg.model)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    return model, state, batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device(cfg, setup):
    model, state, batch = setup
    mesh = make_mesh(8)

    train_single, eval_single = make_step_fns(cfg, augment=False)
    train_shard, eval_shard = make_sharded_step_fns(cfg, mesh, augment=False)

    # train steps donate their input state: give each its own copy and keep
    # the fixture state alive for the gradient comparison below
    from ampnet_tpu.train.state import clone_state

    s1, m1 = train_single(clone_state(state), batch)
    s8, m8 = train_shard(replicate_state(clone_state(state), mesh), shard_batch(batch, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["confusion"]), np.asarray(m8["confusion"]), atol=1e-3
    )
    # gradients must agree across partitionings (post-Adam params can't be compared
    # bitwise: at step 1 Adam ≈ sign(g)·lr, which amplifies float-reassociation noise
    # on near-zero grads into ±lr flips). Compare the raw grads instead.
    from ampnet_tpu.train.losses import weighted_cross_entropy
    from ampnet_tpu.train.step import window_pad_mask_from_labels

    def loss_fn(params, batch):
        logits, _, _ = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["points"],
            batch["centroids"],
            window_pad_mask_from_labels(batch["labels"]),
            train=False,
        )
        return weighted_cross_entropy(logits, batch["labels"])

    from ampnet_tpu.parallel.mesh import batch_sharding, replicate_sharding

    g1 = jax.jit(jax.grad(loss_fn))(state.params, batch)
    g8 = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(replicate_sharding(mesh), batch_sharding(mesh)),
        out_shardings=replicate_sharding(mesh),
    )(replicate_state(state.params, mesh), shard_batch(batch, mesh))
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, jax.device_get(g8)
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4


def test_eval_sharded_matches(cfg, setup):
    model, state, batch = setup
    mesh = make_mesh(8)
    _, eval_single = make_step_fns(cfg)
    _, eval_shard = make_sharded_step_fns(cfg, mesh)
    m1, p1 = eval_single(state, batch)
    m8, p8 = eval_shard(replicate_state(state, mesh), shard_batch(batch, mesh))
    assert float(m1["ce_loss"]) == pytest.approx(float(m8["ce_loss"]), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p8))


def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
