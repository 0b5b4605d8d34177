"""Training-step throughput on the real TPU chip (not part of bench.py's single
JSON line — run manually; results recorded in docs/design.md).

Measures the full jitted train step (augmentation + forward + backward + Adam) at
the reference geometry, with the carry-chained honest-timing pattern."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 32, windows: int = 9, n_points: int = 2048, iters: int = 20):
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from ampnet_tpu.core.config import AMPNetConfig
    from ampnet_tpu.models.amp import AMPNetSegmenter
    from ampnet_tpu.train.state import create_train_state
    from ampnet_tpu.train.step import make_step_fns

    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))
    print(f"warmup compile {time.perf_counter() - t0:.0f}s", flush=True)

    cfg = AMPNetConfig()
    rng = np.random.default_rng(0)
    batch_data = {
        "points": jnp.asarray(rng.normal(size=(batch, windows, n_points, 9)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 5, size=(batch, windows, n_points)).astype(np.int32)),
        "centroids": jnp.asarray(rng.normal(size=(batch, windows, 2)).astype(np.float32)),
    }
    model = AMPNetSegmenter(cfg.model)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch_data, steps_per_epoch=100)
    train_step, _ = make_step_fns(cfg, augment=True)

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch_data)
    float(metrics["loss"])
    print(f"train step compile {time.perf_counter() - t0:.0f}s", flush=True)

    for _ in range(3):
        state, metrics = train_step(state, batch_data)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch_data)
    float(metrics["loss"])  # state chains across iterations → serialized; one fetch
    dt = (time.perf_counter() - t0) / iters

    wps = batch * windows / dt
    print(
        f"train step: {dt * 1e3:.2f} ms  ({wps:,.0f} windows/s, "
        f"{batch * windows * n_points / dt / 1e6:.0f} Mpts/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
