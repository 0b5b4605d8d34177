#!/usr/bin/env python
"""Batch-scaling study for the train step (VERDICT r2 #3) — real TPU.

Measures full train-step time (augment + fwd + bwd + Adam) and windows/s at
batch 32/64/128/256, fp32 and bf16 activations, plus gradient-accumulation
arms (e.g. batch 256 as 4 x 64). The round-2 closure argued the backward is
HBM-resident-bound at batch 32; if that is the whole story, windows/s should
be ~flat in batch size (time scales linearly). If windows/s rises with batch,
the fixed per-step overhead (dispatch, BN barriers, optimizer) was a real
term and larger batches are the next train-throughput lever.

One process, one JSON line per arm to stdout; honest timing = the state
chains between iterations and one final loss fetch closes the region
(CLAUDE.md: block_until_ready does not cover remote execution here).

Usage: python benchmarks/batch_scaling.py [--iters 10] [--arms ...]
  arm syntax: BATCH[xACCUM][:dtype]   e.g. 32:bf16  256x4:bf16  64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOWS, POINTS, FEATS = 9, 2048, 9

DEFAULT_ARMS = [
    "32", "32:bf16", "64:bf16", "128:bf16", "256:bf16",
    "256x4:bf16",  # grad-accum: 4 micro-batches of 64, one update
    "128",
]


def parse_arm(spec: str):
    dtype = None
    if ":" in spec:
        spec, d = spec.split(":")
        dtype = "bfloat16" if d in ("bf16", "bfloat16") else None
    accum = 1
    if "x" in spec:
        b, a = spec.split("x")
        batch, accum = int(b), int(a)
    else:
        batch = int(spec)
    return batch, accum, dtype


def cost_analysis(compiled) -> dict:
    """XLA's own accounting for the roofline note (docs/design.md): total FLOPs
    and HBM bytes accessed of an already-compiled executable, plus peak temp
    memory. Takes the AOT ``Compiled`` object the timing loop itself ran, so
    no second relay compile is paid."""
    out = {}
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        out["flops"] = float(c.get("flops", -1))
        out["bytes_accessed"] = float(c.get("bytes accessed", -1))
        try:
            m = compiled.memory_analysis()
            out["temp_bytes"] = int(getattr(m, "temp_size_in_bytes", -1))
            out["output_bytes"] = int(getattr(m, "output_size_in_bytes", -1))
            out["argument_bytes"] = int(getattr(m, "argument_size_in_bytes", -1))
        except Exception:
            pass
    except Exception as e:  # cost analysis is best-effort; keep the timing row
        out["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return out


def measure(batch: int, accum: int, dtype, iters: int, with_cost: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.core.config import AMPNetConfig, ModelConfig
    from ampnet_tpu.models.amp import AMPNetSegmenter
    from ampnet_tpu.train.state import create_train_state
    from ampnet_tpu.train.step import make_step_fns

    cfg = AMPNetConfig(model=ModelConfig(dtype=dtype))
    rng = np.random.default_rng(0)
    data = {
        "points": jnp.asarray(rng.normal(size=(batch, WINDOWS, POINTS, FEATS)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(-1, 5, size=(batch, WINDOWS, POINTS)).astype(np.int32)),
        "centroids": jnp.asarray(rng.normal(size=(batch, WINDOWS, 2)).astype(np.float32)),
    }
    model = AMPNetSegmenter(cfg.model)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), data, steps_per_epoch=100)
    train_step, _ = make_step_fns(cfg, augment=True, grad_accum=accum)

    t0 = time.perf_counter()
    compiled = None
    if with_cost:
        # AOT-compile once and time the SAME executable — cost_analysis then
        # reads it back without a second relay compile
        compiled = train_step.lower(state, data).compile()
        train_step = compiled
    state, metrics = train_step(state, data)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    for _ in range(2):
        state, metrics = train_step(state, data)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, data)
    float(metrics["loss"])  # chained state serializes; one fetch closes it
    dt = (time.perf_counter() - t0) / iters
    row = {
        "batch": batch,
        "grad_accum": accum,
        "dtype": dtype or "float32",
        "step_ms": round(dt * 1e3, 2),
        "windows_per_sec": round(batch * WINDOWS / dt, 1),
        "compile_s": round(compile_s, 1),
    }
    if compiled is not None:
        row["cost"] = cost_analysis(compiled)
    del state, data, train_step, compiled
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--arms", nargs="*", default=DEFAULT_ARMS)
    ap.add_argument("--cost_arms", nargs="*", default=["32", "32:bf16"],
                    help="arms that also emit XLA cost/memory analysis")
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    for spec in args.arms:
        batch, accum, dtype = parse_arm(spec)
        try:
            row = measure(batch, accum, dtype, args.iters,
                          with_cost=spec in args.cost_arms)
        except Exception as e:  # OOM at a big batch is itself a result
            row = {"batch": batch, "grad_accum": accum,
                   "dtype": dtype or "float32",
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
