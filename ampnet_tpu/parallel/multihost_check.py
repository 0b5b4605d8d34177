"""Real multi-process (multi-host) training check.

The reference is strictly single-process (SURVEY.md §2.6 — no NCCL/MPI/Gloo
anywhere); ampnet's multi-host input path (``HostShardedBatcher`` +
``global_device_batch``) was only ever exercised with SIMULATED host ids inside
one process until round 3. This module is the real thing: run one copy per
process under ``jax.distributed.initialize`` (CPU platform, gloo collectives,
N virtual devices per process) and the processes jointly execute the SAME
GSPMD-sharded train step the single-process path uses — each host loads only
its interleaved slice of every global batch, ``jax.make_array_from_process_local_data``
assembles the global array, and the gradient all-reduce spans processes.

The recorded loss trajectory must match the single-process run over the same
global device count bit-for-bit: every host draws the identical seeded global
permutation (``data/pipeline.py::HostShardedBatcher._epoch_order``), so the
global batches — and therefore the compiled step's inputs — are identical.

Usage (the test and ``__graft_entry__.dryrun_multichip`` drive this):

  # worker i of P (run P copies; process 0 hosts the coordinator):
  python -m ampnet_tpu.parallel.multihost_check --coordinator localhost:PORT \
      --num_processes P --process_id I --local_devices 4 --out out_I.json
  # single-process golden over the same global device count:
  python -m ampnet_tpu.parallel.multihost_check --local_devices 8 --out golden.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def _force_cpu(local_devices: int) -> None:
    """CPU platform with ``local_devices`` virtual devices, robust to the axon
    TPU plugin (sitecustomize imports jax early and overrides JAX_PLATFORMS;
    backends are still uninitialized at that point, so config updates work)."""
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}".strip()
    )
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(args) -> dict:
    _force_cpu(args.local_devices)
    import jax

    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_index() == args.process_id
    assert jax.device_count() == args.num_processes * args.local_devices

    import numpy as np

    from ampnet_tpu.core.config import AMPNetConfig, DataConfig, ModelConfig
    from ampnet_tpu.data.pipeline import HostShardedBatcher, global_device_batch
    from ampnet_tpu.models.amp import AMPNetSegmenter
    from ampnet_tpu.parallel.mesh import make_mesh, make_sharded_step_fns, replicate_state
    from ampnet_tpu.train.state import create_train_state

    W, N = 2, args.n_points

    class _DetDataset:
        """Deterministic per-index samples — identical on every host."""

        def __len__(self):
            return args.n_samples

        def __getitem__(self, i):
            rng = np.random.default_rng(1000 + i)
            return {
                "points": rng.normal(size=(W, N, 9)).astype(np.float32),
                "labels": rng.integers(-1, 5, size=(W, N)).astype(np.int32),
                "centroids": rng.normal(size=(W, 2)).astype(np.float32),
                "name": f"s{i}",
            }

    cfg = AMPNetConfig(
        data=DataConfig(n_points=N, max_windows=W),
        model=ModelConfig(dropout=0.0),
    )
    batcher = HostShardedBatcher(
        _DetDataset(), args.global_batch, n_points=N, max_windows=W,
        seed=0, prefetch=0, drop_last=True,
    )

    mesh = make_mesh(jax.device_count())
    model = AMPNetSegmenter(cfg.model)
    import jax.numpy as jnp

    tmpl = {
        "points": jnp.zeros((1, W, N, 9), jnp.float32),
        "labels": jnp.zeros((1, W, N), jnp.int32),
        "centroids": jnp.zeros((1, W, 2), jnp.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), tmpl,
                               steps_per_epoch=max(len(batcher), 1))
    state = replicate_state(state, mesh)
    train_step, _ = make_sharded_step_fns(cfg, mesh, augment=False)

    losses = []
    for _ in range(args.epochs):
        for local in batcher:
            g = global_device_batch(
                {k: v for k, v in local.items() if isinstance(v, np.ndarray)}, mesh
            )
            state, metrics = train_step(state, g)
            losses.append(float(metrics["loss"]))
    return {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "global_devices": jax.device_count(),
        "losses": losses,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--global_batch", type=int, default=8)
    ap.add_argument("--n_samples", type=int, default=16)
    ap.add_argument("--n_points", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    result = run(args)
    payload = json.dumps(result)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
