"""Serving throughput benchmark: many mid-size clouds through predict_many.

The scenario behind the serving numbers in docs/design.md: 32 clouds of 50k
points each (1.6M points total), tiled + encoded + stitched on device, with
same-bucket batching and pipelined bucket fetches. Reports warm steady state
(the second and third sweeps — the first pays the per-bucket compiles).

Usage:  python benchmarks/serving_bench.py [n_clouds] [points_per_cloud]
"""

from __future__ import annotations

import json
import sys
import time


def main(n_clouds: int = 32, cloud_pts: int = 50_000) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ampnet_tpu.core.config import AMPNetConfig, DataConfig
    from ampnet_tpu.infer.tiled import TiledInferencer
    from ampnet_tpu.models.amp import AMPNetSegmenter

    cfg = AMPNetConfig(data=DataConfig(n_points=256))
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(rng.normal(size=(2, 3, 256, 9)).astype(np.float32))
    cent0 = jnp.asarray(rng.normal(size=(2, 3, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts0, cent0, jnp.zeros((2, 3), bool))

    clouds = [
        rng.normal(size=(cloud_pts, 9)).astype(np.float32) * 0.3 + 0.5
        for _ in range(n_clouds)
    ]
    npts = sum(c.shape[0] for c in clouds)

    for tag, kw in (
        ("fast+f16", dict(tiler="fast", transfer_dtype="float16")),
        ("balanced+f16", dict(tiler="balanced", transfer_dtype="float16")),
    ):
        inf = TiledInferencer(model, variables, cfg, n_points=256, max_clusters=32, **kw)
        t0 = time.perf_counter()
        inf.predict_many(clouds)
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(2):
            t0 = time.perf_counter()
            inf.predict_many(clouds)
            warms.append(time.perf_counter() - t0)
        print(json.dumps({
            "config": tag,
            "n_clouds": n_clouds,
            "points_per_cloud": cloud_pts,
            "cold_s": round(cold, 3),
            "warm_s": [round(w, 3) for w in warms],
            "pts_per_sec_warm": round(npts / min(warms)),
        }), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
