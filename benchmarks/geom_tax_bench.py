#!/usr/bin/env python
"""Decompose the --geom_features serving tax (VERDICT r3 weak #3).

Round-3 measured geom serving at ~1.4–2x below plain at the 256-pt geometry
and attributed it to the "memory-bound tile/gather path paying for all 15
columns". This bench separates the candidate costs on the real chip:

  wire     host->device upload bytes (f32 / f16 / int8 wire at 9 vs 15 cols)
  tiler    balanced k-means on x/y/NDVI + the reorder gather (wire dtype)
  forward  the model itself at 9 vs 15 input columns

Protocol per variant: TiledInferencer.predict_many over B clouds of N points
(one fetch per iteration closes the timed region — block_until_ready does not
cover remote execution on this transport, CLAUDE.md), plus two jitted
sub-programs with a data-dependent float carry for the tiler / forward splits.

Usage (real TPU — do NOT set AMPNET_PLATFORM):
  python benchmarks/geom_tax_bench.py [--clouds 8] [--points 50000] [--iters 5]

Output: one JSON object on stdout with points/s per variant; progress to
stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_inferencer(n_feats: int, wire: str, n_points: int = 256,
                    max_clusters: int = 32):
    import dataclasses

    import jax

    from ampnet_tpu.core.config import AMPNetConfig
    from ampnet_tpu.infer.tiled import TiledInferencer
    from ampnet_tpu.models.amp import AMPNetSegmenter

    cfg = AMPNetConfig()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, n_points=n_points,
                                      extra_features=n_feats - 9),
    )
    model = AMPNetSegmenter(cfg.model)
    pts = np.zeros((1, 2, n_points, n_feats), np.float32)
    cent = np.zeros((1, 2, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts, cent, None)
    return TiledInferencer(model, variables, cfg, n_points=n_points,
                           max_clusters=max_clusters, transfer_dtype=wire)


def time_predict_many(inf, clouds, iters: int) -> float:
    # warm (compile + first transfers)
    inf.predict_many(clouds)
    t0 = time.perf_counter()
    for i in range(iters):
        out = inf.predict_many(clouds, seeds=[i * 31 + j for j in range(len(clouds))])
    dt = (time.perf_counter() - t0) / iters
    del out
    return dt


def time_subprograms(n_feats: int, n: int, k: int, cap: int, iters: int):
    """Carry-chained timings of the tiler-only and forward-only programs."""
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.infer.tiled import KMEANS_FEATURE_IDX
    from ampnet_tpu.ops.kmeans import balanced_kmeans

    inf = make_inferencer(n_feats, "float32")
    fwd = inf._forward
    variables = inf.variables

    @jax.jit
    def tiler_only(points, key, carry):
        feats = points[:, KMEANS_FEATURE_IDX] + carry
        assign, _ = balanced_kmeans(feats, k, key, capacities=(cap,) * k,
                                    exact=True, lloyd_mode="sinkhorn")
        order = jnp.argsort(assign, stable=True)
        gathered = jnp.take_along_axis(points, order[:, None], axis=0)
        return jnp.max(gathered) * 1e-12 + jnp.max(assign).astype(jnp.float32) * 1e-12

    @jax.jit
    def forward_only(variables, windows, centroids, carry):
        logits = fwd(variables, windows + carry, centroids, None)
        return jnp.max(logits) * 1e-12

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(k * cap, n_feats)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((), jnp.float32)
    float(tiler_only(pts, key, zero))  # compile
    t0 = time.perf_counter()
    carry = zero
    for _ in range(iters):
        carry = tiler_only(pts, key, carry)
    float(carry)
    tiler_s = (time.perf_counter() - t0) / iters

    windows = jnp.asarray(rng.normal(size=(1, k, cap, n_feats)).astype(np.float32))
    cents = jnp.asarray(rng.normal(size=(1, k, 2)).astype(np.float32))
    float(forward_only(variables, windows, cents, zero))
    t0 = time.perf_counter()
    carry = zero
    for _ in range(iters):
        carry = forward_only(variables, windows, cents, carry)
    float(carry)
    fwd_s = (time.perf_counter() - t0) / iters
    return tiler_s, fwd_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clouds", type=int, default=8)
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n_points", type=int, default=256)
    ap.add_argument("--max_clusters", type=int, default=32)
    args = ap.parse_args()

    import jax

    if os.environ.get("AMPNET_PLATFORM"):  # CPU smoke: AMPNET_PLATFORM=cpu
        jax.config.update("jax_platforms", os.environ["AMPNET_PLATFORM"])

    from ampnet_tpu.ops.kmeans import num_tiles_test

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]), "clouds": args.clouds,
           "points": args.points, "variants": {}}
    total_pts = args.clouds * args.points

    for n_feats in (9, 15):
        clouds = [rng.normal(size=(args.points, n_feats)).astype(np.float32)
                  for _ in range(args.clouds)]
        for wire in ("float32", "float16", "int8"):
            name = f"f{n_feats}_{wire}"
            sys.stderr.write(f"== {name}\n")
            inf = make_inferencer(n_feats, wire, args.n_points,
                                  args.max_clusters)
            dt = time_predict_many(inf, clouds, args.iters)
            out["variants"][name] = {
                "sec_per_batch": round(dt, 4),
                "points_per_sec": round(total_pts / dt, 1),
            }
            sys.stderr.write(json.dumps(out["variants"][name]) + "\n")
            del inf

        k = num_tiles_test(args.points, args.n_points, args.max_clusters)
        # same cap ladder as TiledInferencer._cap_for
        need = -(-args.points // k)
        cap = args.n_points
        while cap < need:
            cap *= 2
        tiler_s, fwd_s = time_subprograms(n_feats, args.points, k, cap,
                                          args.iters)
        out["variants"][f"f{n_feats}_tiler_only"] = {
            "sec_per_cloud": round(tiler_s, 4),
            "points_per_sec": round(args.points / tiler_s, 1),
        }
        out["variants"][f"f{n_feats}_forward_only"] = {
            "sec_per_cloud": round(fwd_s, 4),
            "points_per_sec": round(args.points / fwd_s, 1),
        }
        sys.stderr.write(
            f"f{n_feats}: tiler {tiler_s*1e3:.1f} ms, forward {fwd_s*1e3:.1f} "
            f"ms per cloud (k={k}, cap={cap})\n"
        )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
