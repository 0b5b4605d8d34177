"""Arbitrary-scale tiled inference with stitched per-point predictions.

The reference test path (``test_pointnet_att_segmen.py:31-284``) per cloud: host
KMeansConstrained tiling (or a precomputed pickle), a Python loop of batch-1 encoder
passes over variable-size clusters, one attention pass, per-class IoU, CSV row.

TPU-native redesign — per cloud, ONE jitted program does everything on device:

1. balanced k-means tiling on (x, y, NDVI) (``utils/utils.py:500-505`` features),
2. static-shape cluster grouping via a stable argsort (capacities are static),
3. the batched window encoder + attention forward,
4. scatter of per-cluster predictions back to original point order.

Static shapes come from *replicate padding*: the cloud is padded up to ``k × cap``
points by duplicating random real points (the same trick the reference's offline
tiler uses to reach k·2048, ``3_kmeans.py:64-69``); duplicate predictions are simply
dropped on the way out. One compiled program per cluster-count ``k`` (≤ max_clusters),
reused across every cloud that tiles to ``k`` clusters.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ampnet_tpu.core.config import AMPNetConfig
from ampnet_tpu.core.logging import append_results_csv
from ampnet_tpu.core.metrics import confusion_matrix, iou_from_confusion
from ampnet_tpu.data.schema import SEG_CLASS_NAMES
from ampnet_tpu.ops.kmeans import balanced_kmeans, num_tiles_test

KMEANS_FEATURE_IDX = (0, 1, 8)  # x, y, NDVI of the 9-feature layout


def dihedral_xy(points9: np.ndarray, t: int) -> np.ndarray:
    """Transform ``t`` (0–7) of the square's dihedral group applied to x, y.

    t % 4 counter-clockwise 90° rotations about the origin — the exact-angle
    subset of the training-time ``rotate_z`` augmentation (ops/augment.py;
    reference rotate_point_cloud_z, utils/utils.py:582-604) — then a mirror
    (x → −x) for t ≥ 4. Exact coordinate swaps/negations: no trig rounding.
    Every other feature (z/HAG, I, RGB, NIR, NDVI) is rotation-invariant."""
    out = np.array(points9, copy=True)
    x, y = out[:, 0].copy(), out[:, 1].copy()
    if t >= 4:
        x = -x
    for _ in range(t % 4):
        x, y = -y, x
    out[:, 0], out[:, 1] = x, y
    return out


def tta_ensemble(predict_probs, clouds, transforms: int, seeds=None,
                 votes: int = 1) -> list:
    """Shared view-ensemble driver behind every TTA surface (``predict_tta``,
    ``evaluate_dataset``, ``ampnet infer --tta``, serving JSON ``"tta"`` /
    binary ``X-TTA``): expand each cloud into its first T dihedral views, run
    ONE batched prediction over the expanded list (all views of a cloud share
    its (k, cap) bucket, so the ensemble batches into single device calls),
    regroup, average class probabilities in float32, argmax the mean.

    ``votes`` adds OVERLAP-VOTE tiled inference (VERDICT r3 #5): each view
    repeats V times with distinct prediction seeds, and the seed drives the
    balanced-k-means initialization + replicate padding, so every vote
    partitions the cloud into a DIFFERENT set of windows. Points near a
    window boundary in one tiling are interior in another; averaging their
    probabilities attacks the boundary-error mass the round-3 anatomy
    identified (~72 % of tower errors are boundary points — BASELINE.md).
    Spiritual precedent: the reference's overlapping sliding-window scanner
    (``utils/utils.py:668-754``), which this framework keeps as
    ``ops/sliding_window.py``; here the overlap comes from re-tiling, so the
    per-view device program is the standard bucket program, unchanged.

    ``predict_probs(clouds, seeds) -> [(preds, probs), ...]`` — a
    ``predict_many(..., return_probs=True)``-shaped callable; serving passes a
    closure over its micro-batching service, forwarding the per-request-
    deterministic expansion seeds (so vote copies tile differently while the
    response stays independent of co-batched traffic); plain non-ensemble
    serving jobs keep the fixed seed 0.

    T is capped at 8 because ``dihedral_xy`` has period 8: T > 8 would average
    duplicate views and silently bias the mean toward them.

    Returns ``[(preds int32, mean_probs float32), ...]`` in input order.
    """
    T, V = int(transforms), int(votes)
    if not 1 <= T <= 8:
        raise ValueError(
            f"tta transforms must be in 1..8 (dihedral_xy has period 8; more "
            f"would double-count views), got {T}"
        )
    if V < 1:
        raise ValueError(f"votes must be >= 1, got {V}")
    if seeds is None:
        seeds = list(range(len(clouds)))
    views = T * V
    expanded = [dihedral_xy(c, t) for c in clouds for t in range(T)
                for _ in range(V)]
    eseeds = [s * views + t * V + v
              for s in seeds for t in range(T) for v in range(V)]
    outs = predict_probs(expanded, eseeds)
    results = []
    for ci in range(len(clouds)):
        mean = np.mean(
            [np.asarray(outs[ci * views + j][1], np.float32)
             for j in range(views)],
            axis=0,
        )
        results.append((np.argmax(mean, axis=-1).astype(np.int32), mean))
    return results


def _replicate_variables(variables, mesh):
    from ampnet_tpu.parallel.mesh import replicate_sharding

    return jax.device_put(variables, replicate_sharding(mesh))


class TiledInferencer:
    def __init__(
        self,
        model,
        variables,
        cfg: AMPNetConfig,
        n_points: Optional[int] = None,
        max_clusters: Optional[int] = None,
        backend: str = "xla",
        tiler: str = "balanced",
        max_points_per_call: int = 2_000_000,
        transfer_dtype: Optional[str] = None,
        mesh=None,
    ):
        self.model = model
        # checkpoint ensemble: a LIST of variable trees stacks leaf-wise and
        # the bucket program vmaps the forward over the model axis, averaging
        # softmax probabilities ON DEVICE — M independently-trained seeds run
        # as one batched program (same idle-MXU trade as predict_tta; the two
        # compose). No reference counterpart (its tester loads one .pth).
        if isinstance(variables, (list, tuple)):
            self.ensemble = len(variables)
            if self.ensemble == 1:
                variables = variables[0]
            else:
                variables = jax.tree.map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *variables,
                )
        else:
            self.ensemble = 1
        self.variables = variables
        self.cfg = cfg
        self.n_points = n_points or cfg.data.n_points
        self.max_clusters = max_clusters or cfg.data.max_clusters_test
        # 'balanced' = Sinkhorn rebalancing inside every Lloyd iteration (closest
        # to the reference's KMeansConstrained); 'fast' = plain Lloyd + one final
        # balanced solve — ~4x cheaper tiling, measured −0.4 mIoU on the parity
        # test set (docs/design.md)
        if tiler not in ("balanced", "fast"):
            raise ValueError(f"unknown tiler {tiler!r}")
        self.tiler = tiler
        self.backend = backend
        # wire format for host->device cloud transfer: 'float16' halves the
        # bytes (features are normalized, quantization noise ~1e-3); 'int8'
        # quarters them via per-cloud per-column affine quantization (scale +
        # offset ride along as two tiny [B, F] arrays; max error = column
        # range / 254). Compute stays fp32 on device — the wire dtype also
        # sets the dtype of the on-device reorder gather, so a 15-column
        # --geom_features record moves FEWER bytes through the memory-bound
        # tile/gather path on the int8 wire than the 9-column f16 default
        # (VERDICT r3 weak #3). Matters when serving is transfer-bound (this
        # environment's relay moves ~26 MB/s — docs/design.md)
        self.transfer_dtype = np.dtype(transfer_dtype or np.float32)
        if self.transfer_dtype not in (np.dtype(np.float32), np.dtype(np.float16),
                                       np.dtype(np.int8)):
            raise ValueError(
                f"transfer_dtype must be float32, float16 or int8, "
                f"got {self.transfer_dtype}"
            )
        # clouds beyond this size are spatially halved and predicted per half
        # (windows are independent beyond the per-piece attention context —
        # the same independence the reference's upstream tile/window splitting
        # relies on); keeps any single device program within HBM (1M points
        # measured at 2.8 s on one v5e, docs/design.md)
        self.max_points_per_call = max_points_per_call
        # multi-chip serving: with a jax.sharding.Mesh, each bucket program is
        # compiled with the cloud axis sharded over the mesh's 'data' axis and
        # the variables replicated — every chip tiles + encodes its own clouds,
        # no collective anywhere (clouds are independent); predict_many pads the
        # cloud batch to a multiple of the mesh size
        self.mesh = mesh
        if mesh is not None:
            self.variables = _replicate_variables(variables, mesh)
        self._fns: Dict[tuple, callable] = {}
        # every (k, cap, probs, batch) shape that has executed at least once.
        # jax compiles per input SHAPE, so warmth is a property of this full
        # tuple, not just (k, cap): serving uses the monotone cold counter to
        # tag compile-bearing requests (infer/server.py), covering probs
        # variants, new batch sizes, and mega-cloud split halves alike.
        self._warm_shapes: set = set()
        self._cold_count: int = 0
        from ampnet_tpu.models.backends import make_forward

        self._forward = make_forward(model, cfg, backend)

    def _mark_program(self, k: int, cap: int, probs: bool, b: int) -> bool:
        """Record that the (k, cap, probs, batch) program shape is about to
        run; True (and counter bump) on its first execution — the call that
        pays the jit compile."""
        key = (k, cap, bool(probs), int(b))
        if key in self._warm_shapes:
            return False
        self._warm_shapes.add(key)
        self._cold_count += 1
        return True

    @property
    def cold_programs_seen(self) -> int:
        """Monotone count of program shapes compiled so far (serving stats)."""
        return self._cold_count

    def _cap_for(self, n: int, k: int) -> int:
        """Static per-cluster capacity: smallest ``n_points * 2**j >= ceil(n/k)``.

        The reference tiles test clouds with ``size_min`` ONLY (utils/utils.py:
        500-505): once k saturates at max_clusters, clusters simply grow, so every
        point of an arbitrarily large cloud is covered. Scaling the capacity with N
        keeps that guarantee under static shapes (``k*cap >= n`` always — no
        subsample, no fill), while the geometric ladder bounds the number of
        compiled programs to O(max_clusters * log N)."""
        need = -(-n // k)  # ceil
        cap = self.n_points
        while cap < need:
            cap *= 2
        return cap

    def _bucket_fn(self, k: int, cap: int, probs: bool = False):
        """Jitted whole-pipeline program for clouds tiling into k clusters of cap
        points. Batched over clouds: input [B, k*cap, 9] — per-cloud k-means runs
        under vmap, then one [B, k, cap, ·] model forward serves the whole batch
        (dispatch latency amortizes across clouds in serving). With ``probs``
        the program additionally returns per-point class probabilities
        (softmax, float16 wire — confidence maps for downstream thresholding)."""
        if (k, cap, probs) in self._fns:
            return self._fns[(k, cap, probs)]
        fwd = self._forward
        int8_wire = self.transfer_dtype == np.dtype(np.int8)

        def to_f32(x, scales, offsets):
            # wire decode: f16/f32 is a plain upcast; int8 is the affine
            # dequant of _encode_batch (scales/offsets are [B, F'] f32,
            # broadcast over the points axis)
            x = x.astype(jnp.float32)
            if int8_wire:
                x = (x + 127.0) * scales[:, None, :] + offsets[:, None, :]
            return x

        def tile_one(feats: jnp.ndarray, key: jax.Array):
            n = feats.shape[0]
            if k > 1:
                assign, _ = balanced_kmeans(
                    feats, k, key, capacities=(cap,) * k, exact=True,
                    lloyd_mode="argmin" if self.tiler == "fast" else "sinkhorn",
                )
                return jnp.argsort(assign, stable=True)
            return jnp.arange(n)

        def run_impl(variables, points: jnp.ndarray, scales, offsets,
                     keys: jax.Array):
            # points: [B, k*cap, F] in the WIRE dtype (already replicate-padded
            # on host). The tiler reads only the x/y/NDVI columns and the
            # reorder gather runs in the wire dtype, so neither pays for the
            # full record width (15 columns with --geom_features); decode to
            # fp32 happens after the gather, fused into the windows reshape.
            b, n, f = points.shape
            kidx = jnp.array(KMEANS_FEATURE_IDX)
            kfeats = to_f32(jnp.take(points, kidx, axis=2),
                            jnp.take(scales, kidx, axis=1),
                            jnp.take(offsets, kidx, axis=1))
            order = jax.vmap(tile_one)(kfeats, keys)  # [B, k*cap]
            gathered = jnp.take_along_axis(points, order[..., None], axis=1)
            windows = to_f32(gathered, scales, offsets).reshape(b, k, cap, f)
            centroids = windows[..., :2].mean(axis=2)  # [B, k, 2]
            if self.ensemble > 1:
                # checkpoint ensemble: vmap the forward over the stacked model
                # axis and average softmax probabilities on device (the wire
                # stays one cloud's worth regardless of M)
                elog = jax.vmap(
                    lambda v: fwd(v, windows, centroids, None)
                )(variables)
                ep = jax.nn.softmax(elog, axis=-1).mean(axis=0)
                preds = jnp.argmax(ep, axis=-1).reshape(b, n).astype(jnp.int8)
            else:
                logits = fwd(variables, windows, centroids, None)
                preds = jnp.argmax(logits, axis=-1).reshape(b, n).astype(jnp.int8)
            # int8 predictions: num_classes ≤ 127 always; quarters the
            # device→host result traffic (the transfer-bound serving path)
            flat = jnp.zeros((b, n), preds.dtype)
            flat = jax.vmap(lambda fl, o, p: fl.at[o].set(p))(flat, order, preds)
            if not probs:
                return flat
            p = (ep if self.ensemble > 1
                 else jax.nn.softmax(logits, axis=-1))
            p = p.reshape(b, n, -1).astype(jnp.float16)
            pflat = jnp.zeros((b, n, p.shape[-1]), p.dtype)
            pflat = jax.vmap(lambda fl, o, q: fl.at[o].set(q))(pflat, order, p)
            return flat, pflat

        if self.mesh is None:
            run = jax.jit(run_impl)
        else:
            from ampnet_tpu.parallel.mesh import batch_sharding, replicate_sharding

            repl = replicate_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            out_shard = (data, data) if probs else data
            run = jax.jit(
                run_impl,
                in_shardings=(repl, data, data, data, data),
                out_shardings=out_shard,
            )

        self._fns[(k, cap, probs)] = run
        return run

    def _encode_batch(self, rows: np.ndarray):
        """Wire-encode a [B, N, F] cloud batch: returns (encoded, scales,
        offsets) ready for the bucket program. f32/f16 wires pass scale/offset
        placeholders (unused in the graph — XLA prunes them); the int8 wire
        affine-quantizes per cloud per column: q = round((v−lo)/scale) − 127
        with scale = (hi−lo)/254, decoded on device as (q+127)·scale + lo.
        Constant columns get scale 0 and decode to lo exactly."""
        b, _, f = rows.shape
        if self.transfer_dtype != np.dtype(np.int8):
            return (rows.astype(self.transfer_dtype),
                    np.ones((b, f), np.float32), np.zeros((b, f), np.float32))
        lo = rows.min(axis=1).astype(np.float32)  # [B, F]
        hi = rows.max(axis=1).astype(np.float32)
        scale = (hi - lo) / 254.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.rint(
            (rows.astype(np.float32) - lo[:, None, :]) / safe[:, None, :]
        ).astype(np.int16)
        q = (q - 127).astype(np.int8)
        return q, scale, lo

    def predict(self, points9: np.ndarray, seed: int = 0, return_probs: bool = False):
        """Per-point class predictions for one [N, 9] cloud of any size.

        With ``return_probs`` returns ``(preds [N], probs [N, num_classes])``
        (softmax confidences, float16)."""
        n = points9.shape[0]
        if n > self.max_points_per_call:
            # balanced spatial halving along the wider of x/y (argsort split —
            # never degenerate), recursing until each piece fits one program
            axis = int(np.ptp(points9[:, 1]) > np.ptp(points9[:, 0]))
            order = np.argsort(points9[:, axis], kind="stable")
            half = n // 2
            a = self.predict(points9[order[:half]], seed, return_probs)
            b = self.predict(points9[order[half:]], seed + 1, return_probs)
            out = np.empty((n,), np.int32)
            if return_probs:
                probs = np.empty((n, a[1].shape[-1]), a[1].dtype)
                out[order[:half]], probs[order[:half]] = a
                out[order[half:]], probs[order[half:]] = b
                return out, probs
            out[order[:half]], out[order[half:]] = a, b
            return out
        if self.mesh is not None:
            # sharded programs want the batched entry point
            return self.predict_many([points9], seeds=[seed], return_probs=return_probs)[0]
        k = num_tiles_test(n, self.n_points, self.max_clusters)
        cap = self._cap_for(n, k)
        rng = np.random.default_rng(seed)
        dup = rng.integers(0, n, k * cap - n)  # k*cap >= n by construction
        padded = np.concatenate([points9, points9[dup]], axis=0)
        run = self._bucket_fn(k, cap, probs=return_probs)
        self._mark_program(k, cap, return_probs, 1)
        enc, scales, offsets = self._encode_batch(padded[None])
        out = run(
            self.variables,
            jnp.asarray(enc),
            jnp.asarray(scales),
            jnp.asarray(offsets),
            jax.random.PRNGKey(seed)[None],
        )
        if return_probs:
            flat, pflat = out
            return np.asarray(flat[0])[:n].astype(np.int32), np.asarray(pflat[0])[:n]
        return np.asarray(out[0])[:n].astype(np.int32)

    def predict_tta(self, points9: np.ndarray, seed: int = 0, transforms: int = 4,
                    return_probs: bool = False, votes: int = 1):
        """Test-time augmentation: average per-point class probabilities over
        the first ``transforms`` dihedral transforms of the cloud (90° rotations
        first, then their mirrors — ``dihedral_xy``), argmax the mean.

        Per-point predictions are order-preserving, so the T transformed
        copies align index-for-index; and identical N means every copy lands
        in the SAME (k, cap) bucket — the whole ensemble runs as one batched
        device call. Each copy also gets a different k-means/padding seed, so
        the ensemble averages over tiling variation too. ``votes > 1`` adds
        overlap-vote re-tiling on top (``tta_ensemble`` votes semantics). No
        reference counterpart (its tester is single-pass)."""
        T, V = int(transforms), int(votes)
        if T <= 1 and V <= 1:
            return self.predict(points9, seed, return_probs)
        ((preds, mean),) = tta_ensemble(
            lambda cs, sd: self.predict_many(cs, seeds=sd, return_probs=True),
            [points9], max(T, 1), seeds=[seed], votes=V,
        )
        if return_probs:
            return preds, mean.astype(np.float16)
        return preds

    def predict_many(self, clouds, seeds=None, return_probs: bool = False) -> list:
        """Predictions for a list of [N_i, 9] clouds, batching same-bucket clouds
        into single device calls (serving path: dispatch overhead amortizes).
        With ``return_probs`` every entry is ``(preds, probs)``."""
        return self.fetch_many(self.dispatch_many(clouds, seeds, return_probs))

    def dispatch_many(self, clouds, seeds=None, return_probs: bool = False) -> dict:
        """Async half of ``predict_many``: upload + enqueue every bucket program
        and return a pending handle immediately (device execution is async).
        ``fetch_many`` completes it. Lets a serving loop overlap one batch's
        result fetch with the next batch's host prep + upload + compute
        (infer/server.py). Mega-clouds that take the synchronous spatial-halving
        path are resolved eagerly into the handle."""
        seeds = seeds or list(range(len(clouds)))
        results = [None] * len(clouds)
        buckets: Dict[tuple, list] = {}
        prepped = {}
        cold_before = self._cold_count
        for i, pc in enumerate(clouds):
            n = pc.shape[0]
            if n > self.max_points_per_call:  # mega-clouds go down the
                results[i] = self.predict(pc, seeds[i], return_probs)  # spatial halving
                continue
            k = num_tiles_test(n, self.n_points, self.max_clusters)
            cap = self._cap_for(n, k)
            rng = np.random.default_rng(seeds[i])
            dup = rng.integers(0, n, k * cap - n)  # k*cap >= n by construction
            prepped[i] = (np.concatenate([pc, pc[dup]], axis=0), n)
            buckets.setdefault((k, cap), []).append(i)

        # dispatch every bucket before fetching any result: execution is async,
        # so bucket i's device→host result transfer overlaps bucket i+1's
        # upload + compute instead of serializing the pipeline
        calls = []
        for (k, cap), idxs in buckets.items():
            run = self._bucket_fn(k, cap, probs=return_probs)
            rows = np.stack([prepped[i][0] for i in idxs])
            # pad the cloud batch to a power of two so each (k, cap) bucket compiles
            # for at most log2(B) batch shapes
            b = len(idxs)
            b_pad = 1 << (b - 1).bit_length()
            if self.mesh is not None:  # shardable over the mesh's data axis
                nd = self.mesh.devices.size
                b_pad = -(-b_pad // nd) * nd
            if b_pad > b:
                rows = np.concatenate([rows, np.repeat(rows[:1], b_pad - b, axis=0)])
            keys = [jax.random.PRNGKey(seeds[i]) for i in idxs] + [
                jax.random.PRNGKey(0)
            ] * (b_pad - b)
            self._mark_program(k, cap, return_probs, b_pad)
            calls.append((idxs, run, rows, keys))

        def launch(call):
            _, run, rows, keys = call
            enc, scales, offsets = self._encode_batch(rows)
            return run(self.variables, jnp.asarray(enc), jnp.asarray(scales),
                       jnp.asarray(offsets), jnp.stack(keys))

        if len(calls) > 1 and not os.environ.get("AMPNET_SERIAL_DISPATCH"):
            # overlap per-bucket host→device uploads AND first-call compiles
            # across threads — a cold multi-bucket sweep otherwise serializes
            # its (minutes-long on a remote-relay toolchain) compiles
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(len(calls), 8)) as ex:
                outs = list(ex.map(launch, calls))
        else:
            outs = [launch(c) for c in calls]
        pending = [(c[0], out) for c, out in zip(calls, outs)]
        return {
            "results": results,
            "pending": pending,
            "sizes": {i: prepped[i][1] for i in prepped},
            "return_probs": return_probs,
            # any program shape in this dispatch compiled for the first time
            # (incl. inside mega-cloud recursion) — serving tags the whole
            # micro-batch cold, since every co-batched request's latency
            # includes that compile wait
            "cold": self._cold_count > cold_before,
        }

    def fetch_many(self, handle: dict) -> list:
        """Blocking half of ``predict_many``: pull every pending bucket's
        results to the host and slice off the replicate padding."""
        results, sizes = handle["results"], handle["sizes"]
        for idxs, out in handle["pending"]:
            if handle["return_probs"]:
                flat, pflat = np.asarray(out[0]), np.asarray(out[1])
                for row, i in enumerate(idxs):
                    n_i = sizes[i]
                    results[i] = (flat[row, :n_i].astype(np.int32), pflat[row, :n_i])
            else:
                flat = np.asarray(out)
                for row, i in enumerate(idxs):
                    results[i] = flat[row, : sizes[i]].astype(np.int32)
        return results


class EnsembleInferencer:
    """Cross-family checkpoint ensemble: average per-point class probabilities
    over member ``TiledInferencer``s that need NOT share architecture,
    parameter structure, or window geometry (``n_points`` / tiling protocol
    differ freely). Each member's bucket program scatters its predictions back
    to ORIGINAL point order (``_bucket_fn``), so the host-side probability
    mean is index-exact — no resample alignment is needed even though an
    attention member and a GRU member tile the same cloud differently.

    Same-structure members should be stacked inside ONE ``TiledInferencer``
    (the on-device vmapped fast path); this wrapper composes those groups, so
    ``attn_a,attn_b,gru_c`` runs as a 2-member ensemble of a stacked pair and
    a single. Implements the ``TiledInferencer`` prediction surface
    (``predict`` / ``predict_tta`` / ``predict_many`` / ``dispatch_many`` /
    ``fetch_many`` + the serving attributes), so ``ampnet test/infer/serve``
    and the TTA driver compose unchanged. ``dispatch_many`` enqueues EVERY
    member's device programs before any fetch — members pipeline on device
    rather than serializing. No reference counterpart (its tester loads
    exactly one ``.pth``, test_pointnet_att_segmen.py:87-94)."""

    def __init__(self, members):
        members = list(members)
        if len(members) < 2:
            raise ValueError("EnsembleInferencer needs >= 2 members; a single "
                             "group belongs in TiledInferencer directly")
        ncs = {m.cfg.model.num_classes for m in members}
        if len(ncs) != 1:
            raise ValueError(
                f"ensemble members disagree on num_classes: {sorted(ncs)}"
            )
        self.members = members
        # representative attributes for consumers (evaluate_dataset reads
        # cfg.model.num_classes; serving /v1/stats reports geometry — the
        # first member stands in, per-member geometry may differ)
        self.cfg = members[0].cfg
        self.n_points = members[0].n_points
        self.max_clusters = max(m.max_clusters for m in members)
        self.ensemble = sum(getattr(m, "ensemble", 1) for m in members)

    @property
    def cold_programs_seen(self) -> int:
        return sum(m.cold_programs_seen for m in self.members)

    def dispatch_many(self, clouds, seeds=None, return_probs: bool = False) -> dict:
        handles = [
            m.dispatch_many(clouds, seeds, return_probs=True) for m in self.members
        ]
        return {
            "member_handles": handles,
            "return_probs": return_probs,
            "cold": any(h.get("cold") for h in handles),
        }

    def fetch_many(self, handle: dict) -> list:
        per_member = [
            m.fetch_many(h) for m, h in zip(self.members, handle["member_handles"])
        ]
        outs = []
        for i in range(len(per_member[0])):
            mean = np.mean(
                [np.asarray(r[i][1], np.float32) for r in per_member], axis=0
            )
            preds = np.argmax(mean, axis=-1).astype(np.int32)
            outs.append(
                (preds, mean.astype(np.float16)) if handle["return_probs"] else preds
            )
        return outs

    def predict_many(self, clouds, seeds=None, return_probs: bool = False) -> list:
        return self.fetch_many(self.dispatch_many(clouds, seeds, return_probs))

    def predict(self, points9: np.ndarray, seed: int = 0, return_probs: bool = False):
        return self.predict_many([points9], seeds=[seed], return_probs=return_probs)[0]

    def predict_tta(self, points9: np.ndarray, seed: int = 0, transforms: int = 4,
                    return_probs: bool = False, votes: int = 1):
        T, V = int(transforms), int(votes)
        if T <= 1 and V <= 1:
            return self.predict(points9, seed, return_probs)
        ((preds, mean),) = tta_ensemble(
            lambda cs, sd: self.predict_many(cs, seeds=sd, return_probs=True),
            [points9], max(T, 1), seeds=[seed], votes=V,
        )
        if return_probs:
            return preds, mean.astype(np.float16)
        return preds


def evaluate_cloud(preds: np.ndarray, labels: np.ndarray, num_classes: int) -> Dict:
    """Per-cloud metrics like the reference tester (test_pointnet_att_segmen.py:186-219):
    IoU per class present, mIoU over present classes, overall accuracy."""
    cm = np.asarray(confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), num_classes))
    iou, valid = iou_from_confusion(jnp.asarray(cm))
    iou, valid = np.asarray(iou), np.asarray(valid)
    out = {"oa": float(np.diag(cm).sum() / max(cm.sum(), 1))}
    for c, name in enumerate(SEG_CLASS_NAMES[:num_classes]):
        out[f"iou_{name}"] = float(iou[c]) if valid[c] else float("nan")
    out["miou"] = float(iou[valid].mean()) if valid.any() else float("nan")
    out["confusion"] = cm
    return out


def evaluate_dataset(
    inferencer: TiledInferencer,
    dataset,
    out_csv: Optional[str] = None,
    model_name: str = "ampnet_tpu",
    plot_dir: Optional[str] = None,
    plot_limit: int = 8,
    chunk_size: int = 16,
    tta: int = 1,
    tile_votes: int = 1,
    analysis_dir: Optional[str] = None,
) -> Dict:
    """Evaluate every cloud; append an IoU-results CSV row per cloud and a dataset
    summary (mirrors the reference CSV machinery, test_pointnet_att_segmen.py:272-284).
    With ``plot_dir``, saves pred-vs-GT 3D scatters for the first clouds (the
    reference's visual-inspection loop, utils_plot.py:100-171).

    Clouds are loaded and predicted ``chunk_size`` at a time, so peak host memory
    is bounded by the chunk (GB-scale test lists stream instead of materializing);
    within a chunk, same-bucket clouds still batch into single device calls.

    ``tta > 1`` averages class probabilities over that many dihedral transforms
    per cloud (``TiledInferencer.predict_tta`` semantics); ``tile_votes > 1``
    additionally repeats each view under that many different tilings
    (overlap-vote inference — ``tta_ensemble`` votes semantics). The chunk
    shrinks so chunk × tta × votes stays within the device-batch budget.

    ``analysis_dir`` enables the error-analysis accumulator (infer.analysis):
    boundary-vs-interior error attribution, per-class precision/recall and
    worst-cloud lists, written as ``analysis.json`` + ``confusion.png``."""
    num_classes = inferencer.cfg.model.num_classes
    tta, tile_votes = int(tta), int(tile_votes)
    if not 1 <= tta <= 8:
        raise ValueError(f"tta must be in 1..8 (dihedral period), got {tta}")
    if tile_votes < 1:
        raise ValueError(f"tile_votes must be >= 1, got {tile_votes}")
    views = tta * tile_votes
    if views > 1:
        chunk_size = max(1, chunk_size // views)
    analyzer = None
    if analysis_dir:
        from ampnet_tpu.infer.analysis import ErrorAnalysisAccumulator

        analyzer = ErrorAnalysisAccumulator(num_classes)
    rows: List[Dict] = []
    total_cm = np.zeros((num_classes, num_classes))
    gt_counts = np.zeros(num_classes, np.int64)
    pred_counts = np.zeros(num_classes, np.int64)
    t0 = time.time()
    n_points_total = 0
    for start in range(0, len(dataset), chunk_size):
        chunk = [dataset[j] for j in range(start, min(start + chunk_size, len(dataset)))]
        if views > 1:
            chunk_preds = [
                p for p, _ in tta_ensemble(
                    lambda cs, sd: inferencer.predict_many(
                        cs, seeds=sd, return_probs=True
                    ),
                    [s["points"] for s in chunk], tta,
                    seeds=list(range(start, start + len(chunk))),
                    votes=tile_votes,
                )
            ]
        else:
            chunk_preds = inferencer.predict_many(
                [s["points"] for s in chunk], seeds=list(range(start, start + len(chunk)))
            )
        for i, (sample, preds) in enumerate(zip(chunk, chunk_preds), start=start):
            m = evaluate_cloud(preds, sample["labels"], num_classes)
            total_cm += m.pop("confusion")
            if analyzer is not None:
                analyzer.update(sample["name"], sample["points"],
                                sample["labels"], preds)
            n_points_total += len(preds)
            rows.append({"name": sample["name"], **m})
            if plot_dir:
                labels_np = np.asarray(sample["labels"]).astype(np.int64).ravel()
                valid_lbl = (labels_np >= 0) & (labels_np < num_classes)
                gt_counts += np.bincount(labels_np[valid_lbl], minlength=num_classes)
                # same valid mask both sides: predictions on ignore-labeled
                # points would otherwise inflate the predicted bars only
                pred_counts += np.bincount(
                    np.asarray(preds).ravel()[valid_lbl], minlength=num_classes
                )[:num_classes]
            if plot_dir and i < plot_limit:
                import os

                from ampnet_tpu.core.plotting import (
                    plot_class_histograms,
                    plot_predictions_vs_truth,
                )

                os.makedirs(plot_dir, exist_ok=True)
                plot_predictions_vs_truth(
                    sample["points"][:, :3], preds, sample["labels"],
                    save_to=os.path.join(plot_dir, f"{sample['name']}.png"),
                    title=sample["name"],
                )
                plot_class_histograms(
                    preds,
                    save_to=os.path.join(plot_dir, f"{sample['name']}_hist.png"),
                    title=f"{sample['name']} predicted class counts",
                )
        del chunk, chunk_preds
    elapsed = time.time() - t0
    minutes = elapsed / 60

    iou, valid = iou_from_confusion(jnp.asarray(total_cm))
    iou, valid = np.asarray(iou), np.asarray(valid)
    summary = {
        "model": model_name,
        "n_points": inferencer.n_points,
        **{
            f"iou_{n}": (float(iou[c]) if valid[c] else float("nan"))
            for c, n in enumerate(SEG_CLASS_NAMES[:num_classes])
        },
        "miou": float(iou[valid].mean()) if valid.any() else float("nan"),
        "oa": float(np.diag(total_cm).sum() / max(total_cm.sum(), 1)),
        "inference_minutes": round(minutes, 4),
        "points_per_sec": round(n_points_total / max(elapsed, 1e-9), 1),
        "n_clouds": len(rows),
    }
    if plot_dir and rows:
        import os

        from ampnet_tpu.core.plotting import plot_class_counts

        os.makedirs(plot_dir, exist_ok=True)
        plot_class_counts(
            {"ground truth": gt_counts, "predicted": pred_counts},
            save_to=os.path.join(plot_dir, "class_counts.png"),
            title=f"{model_name}: dataset class balance (GT vs predicted)",
        )
    result = {"summary": summary, "per_cloud": rows}
    if analyzer is not None:
        from ampnet_tpu.infer.analysis import write_analysis

        report = analyzer.finalize()
        write_analysis(report, analysis_dir)
        result["analysis"] = report
    if out_csv:
        append_results_csv(out_csv, summary)
    return result
