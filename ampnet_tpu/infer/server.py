"""Production serving daemon: a long-lived HTTP server over ``TiledInferencer``.

The reference has no serving story at all — its closest analog is re-running the
evaluation CLI per file (``test_pointnet_att_segmen.py``), paying model load +
k-means + compile every time. Here the model stays resident with every bucket
program warm, and concurrent requests are micro-batched: clouds arriving within
the batching window are predicted together through ``predict_many`` (same-bucket
clouds share one device program call and bucket fetches pipeline).

Endpoints (stdlib http.server; no third-party deps):

* ``GET  /healthz``     → liveness + model info
* ``GET  /v1/stats``    → request/point counters, latency quantiles
* ``POST /v1/predict``  → per-point class labels for one or more clouds
  * ``application/octet-stream``: one cloud, float32 (or float16, see
    ``X-Dtype``) little-endian ``[N, 9]`` rows in the model feature layout
    ``[x, y, z, I, R, G, B, NIR, NDVI]``; response is ``[N]`` int8 labels.
    ``X-TTA: T`` (1..8) averages a T-view dihedral ensemble (same semantics
    as the JSON ``"tta"`` field / ``infer --tta``); ``X-Tile-Votes: V``
    additionally re-tiles each view V times and averages (overlap-vote,
    JSON ``"votes"`` / ``test --tile_votes``).
  * ``application/json``: ``{"clouds": [[[f0..f8], ...], ...],
    "probs": false, "normalize": false, "tta": 1, "votes": 1}``; response
    ``{"labels": [[...], ...], "probs": [[[...], ...]]?}``.
    ``normalize=true`` applies the x/y → [-1, 1] rescale (schema
    ``normalize_xy_neg_one``) server-side for raw 13-column-derived features.

Run: ``ampnet serve --model_checkpoint ... [--port 8421] [--backend folded]``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np


class ServingStats:
    """Thread-safe counters + latency reservoir."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.clouds = 0
        self.points = 0
        self.errors = 0
        self.started = time.time()
        self._lat: List[float] = []  # bounded reservoir of recent WARM latencies
        self.cold_requests = 0  # first-per-bucket requests (paid a jit compile)
        self._cold_lat_max = 0.0
        self._decode_s = self._encode_s = self._device_s = 0.0
        self._decode_n = 0
        self._batches = 0
        self._batch_clouds = 0
        self._batch_points = 0
        self._cold_batches = 0
        self._cold_device_s = 0.0

    def record(self, n_clouds: int, n_points: int, latency_s: float,
               cold: bool = False) -> None:
        with self._lock:
            self.requests += 1
            self.clouds += n_clouds
            self.points += n_points
            if cold:
                # keep one multi-minute relay compile from dominating p99 for
                # the next 1024 requests: cold latencies are counted but stay
                # out of the quantile reservoir
                self.cold_requests += 1
                self._cold_lat_max = max(self._cold_lat_max, latency_s)
                return
            self._lat.append(latency_s)
            if len(self._lat) > 1024:
                self._lat = self._lat[-512:]

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    # decomposition counters (where does a point's wall time go?): HTTP decode,
    # device batch (dispatch -> fetch complete, includes device queueing), and
    # response encode. Exposed in /v1/stats so the serving-gap analysis
    # (docs/design.md) is measurable in production, not just in benchmarks.
    def record_decode(self, seconds: float) -> None:
        with self._lock:
            self._decode_s += seconds
            self._decode_n += 1

    def record_encode(self, seconds: float) -> None:
        with self._lock:
            self._encode_s += seconds

    def record_batch(self, n_clouds: int, n_points: int, device_s: float,
                     cold: bool = False) -> None:
        with self._lock:
            if cold:
                # a cold batch's minutes-long relay compile would swamp
                # device_s_total and make device_points_per_sec read orders of
                # magnitude low for the server's lifetime — keep the warm
                # breakdown clean and count cold batches separately
                self._cold_batches += 1
                self._cold_device_s += device_s
                return
            self._batches += 1
            self._batch_clouds += n_clouds
            self._batch_points += n_points
            self._device_s += device_s

    def snapshot(self) -> Dict:
        with self._lock:
            lat = sorted(self._lat)
            q = lambda p: (lat[int(p * (len(lat) - 1))] if lat else None)
            dt = time.time() - self.started
            return {
                "uptime_s": round(dt, 1),
                "requests": self.requests,
                "clouds": self.clouds,
                "points": self.points,
                "errors": self.errors,
                "points_per_sec_lifetime": round(self.points / dt, 1) if dt else 0.0,
                # quantiles cover warm requests only; cold (first-per-bucket,
                # compile-bearing) requests are counted separately
                "latency_s": {
                    "p50": q(0.50),
                    "p90": q(0.90),
                    "p99": q(0.99),
                },
                "cold_requests": self.cold_requests,
                "cold_latency_max_s": round(self._cold_lat_max, 3) or None,
                "breakdown": {
                    "decode_s_total": round(self._decode_s, 4),
                    "encode_s_total": round(self._encode_s, 4),
                    "device_s_total": round(self._device_s, 4),
                    "device_batches": self._batches,
                    "batch_clouds_mean": (
                        round(self._batch_clouds / self._batches, 2)
                        if self._batches else None
                    ),
                    "batch_points_mean": (
                        round(self._batch_points / self._batches, 1)
                        if self._batches else None
                    ),
                    "device_points_per_sec": (
                        round(self._batch_points / self._device_s, 1)
                        if self._device_s > 0 else None
                    ),
                    # compile-bearing batches, kept out of the warm totals
                    "cold_batches": self._cold_batches,
                    "cold_device_s_total": round(self._cold_device_s, 4),
                },
            }


class _Job:
    __slots__ = ("clouds", "probs", "seeds", "event", "result", "error", "cold")

    def __init__(self, clouds: List[np.ndarray], probs: bool,
                 seeds: Optional[List[int]] = None):
        self.clouds = clouds
        self.probs = probs
        # per-cloud prediction seeds (k-means init + replicate padding). The
        # default 0s keep responses independent of micro-batch composition;
        # overlap-vote requests pass their per-request-deterministic
        # tta_ensemble expansion seeds so vote copies tile DIFFERENTLY.
        self.seeds = seeds
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None
        # set by the worker at dispatch time: this job's micro-batch ran a
        # program shape for the first time, so its latency includes the jit
        # compile (minutes through this environment's relay)
        self.cold = False


class PredictionService:
    """Micro-batching front of a ``TiledInferencer``.

    Handler threads enqueue jobs; one worker drains everything that arrived
    within ``batch_window_ms`` (up to ``max_batch_clouds``) and serves it with
    a single ``predict_many`` call — concurrent clients share device programs
    instead of serializing round-trips."""

    def __init__(
        self,
        inferencer,
        batch_window_ms: float = 5.0,
        max_batch_clouds: int = 64,
        adaptive_wait_cap_s: float = 5.0,
    ):
        self.inferencer = inferencer
        self.batch_window_s = batch_window_ms / 1e3
        self.max_batch_clouds = max_batch_clouds
        # adaptive batching (round 3): while the device still executes the
        # previous batch, new arrivals would only queue — the drain window
        # stretches to the batch's expected completion so they join the next
        # batch instead. The round-3 decomposition measured decode+encode at
        # ~0.5 % of serving wall; the HTTP-vs-library gap was micro-batch size
        # (mean 5.5 clouds vs 32) — this is the lever that closes it.
        self.adaptive_wait_cap_s = adaptive_wait_cap_s
        self._exec_ema = 0.0  # EMA of recent warm device-batch execution time
        self.stats = ServingStats()
        self._q: "queue.Queue[_Job]" = queue.Queue()
        self._stop = threading.Event()
        # dispatched-but-unfetched batches, completed by a dedicated fetcher
        # thread. Fetching in its own thread keeps the measured execution time
        # free of the worker's drain window: when fetch only happened after the
        # NEXT batch's drain, the drain time leaked into the execution EMA that
        # the adaptive drain deadline is derived from — a positive feedback
        # loop that ratcheted the window to its cap and left the device idle
        # between batches (measured: serving throughput decayed 213k->96k
        # pts/s within one bench run). maxsize=2 keeps the old one-ahead
        # pipelining bound: dispatch blocks when two batches are in flight.
        self._fetch_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._pending = 0
        self._last_dispatch_t = 0.0
        self._plock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._fetcher = threading.Thread(target=self._run_fetch, daemon=True)
        self._worker.start()
        self._fetcher.start()

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=5)
        self._fetcher.join(timeout=5)

    def predict(self, clouds: List[np.ndarray], probs: bool = False,
                logical: Optional[tuple] = None,
                seeds: Optional[List[int]] = None):
        """Blocking predict for one request's clouds; thread-safe. Error
        accounting lives in the HTTP handler (the single recorder) so a failed
        prediction is counted exactly once.

        ``logical=(n_clouds, n_points)`` overrides the request-level stats
        counts: a TTA handler predicts T× expanded clouds but the client sent
        (and receives) only the originals, so /v1/stats throughput must not be
        inflated by the ensemble factor (batch-level stats still count the
        expanded device work — that is real)."""
        if self._stop.is_set():
            raise RuntimeError("PredictionService is closed")
        t0 = time.time()
        job = _Job(clouds, probs, seeds=seeds)
        self._q.put(job)
        if self._stop.is_set() and not job.event.is_set():
            # raced close(): the worker may already have drained its final
            # queue pass — fail fast instead of waiting on an event nobody sets
            job.error = job.error or RuntimeError("PredictionService is closed")
            job.event.set()
        job.event.wait()
        if job.error is not None:
            raise job.error
        # cold is decided by the worker at dispatch time from the
        # inferencer's own compiled-shape ledger — it covers probs variants,
        # new micro-batch sizes, and mega-cloud split halves, not just (k, cap)
        n_clouds, n_points = logical or (
            len(clouds), sum(c.shape[0] for c in clouds)
        )
        self.stats.record(n_clouds, n_points, time.time() - t0, cold=job.cold)
        return job.result

    # -- worker --------------------------------------------------------------
    def _drain(self) -> List[_Job]:
        """Everything that arrives within the batching window (the fetcher
        thread completes in-flight batches independently, so the worker always
        blocks for the first job).

        Adaptive window: with a batch in flight, the deadline stretches toward
        that batch's expected completion (dispatch time + execution EMA, capped
        by ``adaptive_wait_cap_s``) — arrivals during the previous batch's
        execution join ONE large next batch instead of fragmenting into many
        small dispatches, at no added latency (they would only have queued)."""
        job = self._q.get()
        if job is None:
            return []
        jobs, n = [job], len(job.clouds)
        deadline = time.time() + self.batch_window_s
        with self._plock:
            pending, t_disp = self._pending, self._last_dispatch_t
        if pending and self._exec_ema > 0:
            est_done = t_disp + min(self._exec_ema, self.adaptive_wait_cap_s)
            deadline = max(deadline, est_done - self.batch_window_s / 2)
        while n < self.max_batch_clouds:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            jobs.append(nxt)
            n += len(nxt.clouds)
        return jobs

    def _dispatch(self, jobs: List[_Job]):
        """Enqueue this batch's device work; return (group, handle) pairs."""
        dispatched = []
        # probs-vs-labels programs differ; serve each group in one call
        for want_probs in (False, True):
            group = [j for j in jobs if j.probs == want_probs]
            if not group:
                continue
            clouds = [c for j in group for c in j.clouds]
            # fixed per-cloud default seed: a response must not depend on
            # which other requests happened to share its micro-batch; jobs
            # that carry explicit seeds (overlap-vote) stay deterministic
            # per request by construction
            seeds = [s for j in group
                     for s in (j.seeds if j.seeds is not None
                               else [0] * len(j.clouds))]
            try:
                handle = self.inferencer.dispatch_many(
                    clouds, seeds=seeds, return_probs=want_probs
                )
                if handle.get("cold"):
                    # every request co-batched with a first-time program shape
                    # waits out that compile — tag them all
                    for j in group:
                        j.cold = True
                meta = (len(clouds), sum(c.shape[0] for c in clouds), time.time())
                dispatched.append((group, handle, meta))
            except Exception as e:
                for j in group:
                    j.error = e
                    j.event.set()
        return dispatched

    def _complete_one(self, group, handle, meta) -> None:
        try:
            outs = self.inferencer.fetch_many(handle)
            exec_s = time.time() - meta[2]
            self.stats.record_batch(meta[0], meta[1], exec_s,
                                    cold=bool(handle.get("cold")))
            if not handle.get("cold"):
                # warm-execution EMA drives the adaptive drain window; a
                # cold batch's minutes-long compile must not stretch it
                # (the cap guards the first samples regardless)
                self._exec_ema = (exec_s if self._exec_ema == 0
                                  else 0.7 * self._exec_ema + 0.3 * exec_s)
            i = 0
            for j in group:
                j.result = outs[i : i + len(j.clouds)]
                i += len(j.clouds)
        except BaseException as e:  # incl. non-Exception errors: a job must
            # never complete with neither result nor error
            err = e if isinstance(e, Exception) else RuntimeError(
                f"serving fetch error: {e!r}")
            for j in group:
                j.error = err
        finally:
            with self._plock:
                self._pending -= 1
            for j in group:
                j.event.set()

    def _run_fetch(self) -> None:
        """Completes dispatched batches as the device finishes them — decoupled
        from the worker so fetch latency never waits on (or pollutes) the next
        batch's drain window. Guarded like the worker: a dead fetcher would
        block dispatch forever on the bounded _fetch_q."""
        while True:
            item = self._fetch_q.get()
            if item is None:
                break
            try:
                self._complete_one(*item)
            except BaseException:
                continue  # _complete_one's finally already failed the jobs

    def _run(self) -> None:
        while not self._stop.is_set():
            jobs = []
            try:
                jobs = self._drain()
                for item in (self._dispatch(jobs) if jobs else []):
                    with self._plock:
                        self._pending += 1
                        self._last_dispatch_t = item[2][2]
                    # blocks at two batches in flight: upload/compute of batch
                    # k+1 overlaps batch k's execution + result transfer, but
                    # dispatch never runs further ahead of the device
                    self._fetch_q.put(item)
            except BaseException as e:  # keep the worker alive: a dead worker
                # would hang every future request on an unset event
                for j in jobs:
                    if not j.event.is_set():
                        j.error = j.error or RuntimeError(f"serving worker error: {e!r}")
                        j.event.set()
        self._fetch_q.put(None)  # fetcher drains queued batches, then exits
        # fail anything that raced into the queue during shutdown
        while True:
            try:
                j = self._q.get_nowait()
            except queue.Empty:
                break
            if j is not None and not j.event.is_set():
                j.error = RuntimeError("PredictionService is closed")
                j.event.set()


def _feature_count(service: PredictionService) -> int:
    # geom-feature checkpoints (cfg.data.extra_features > 0) expect the offline
    # eigenfeature columns appended after the 9 model features on the wire too
    cfg = service.inferencer.cfg.data
    return cfg.num_features + getattr(cfg, "extra_features", 0)


def make_handler(service: PredictionService, model_name: str):
    n_feat = _feature_count(service)

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: persistent connections (every response carries an exact
        # Content-Length, so keep-alive is safe); stdlib defaults to 1.0
        protocol_version = "HTTP/1.1"

        # quiet by default; errors still reach stderr via log_error
        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(
                    200,
                    {
                        "status": "ok",
                        "model": model_name,
                        "n_points": service.inferencer.n_points,
                        "max_clusters": service.inferencer.max_clusters,
                        "backend": getattr(service.inferencer, "backend", "xla"),
                    },
                )
            elif self.path == "/v1/stats":
                self._send_json(200, service.stats.snapshot())
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/v1/predict":
                self._send_json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype == "application/json":
                    self._handle_json(raw)
                else:
                    self._handle_binary(raw)
            except BrokenPipeError:  # client went away; nothing to answer
                service.stats.record_error()
            except Exception as e:
                service.stats.record_error()
                try:
                    self._send_json(400, {"error": str(e)})
                except BrokenPipeError:
                    pass

        def _handle_binary(self, raw: bytes) -> None:
            dtype = np.dtype(self.headers.get("X-Dtype", "float32"))
            itemsize = dtype.itemsize * n_feat
            if len(raw) == 0 or len(raw) % itemsize:
                self._send_json(
                    400,
                    {"error": f"body must be [N, {n_feat}] {dtype.name} rows "
                              f"(got {len(raw)} bytes)"},
                )
                return
            # non-numeric client input is a 400, not a ValueError → 500
            try:
                tta = int(self.headers.get("X-TTA", 1))
                votes = int(self.headers.get("X-Tile-Votes", 1))
            except (TypeError, ValueError):
                self._send_json(
                    400, {"error": "X-TTA and X-Tile-Votes must be integers"})
                return
            if not 1 <= tta <= 8:
                self._send_json(400, {"error": "X-TTA must be 1..8"})
                return
            if votes < 1:
                self._send_json(400, {"error": "X-Tile-Votes must be >= 1"})
                return
            t0 = time.time()
            pts = np.frombuffer(raw, dtype=dtype).reshape(-1, n_feat).astype(np.float32)
            service.stats.record_decode(time.time() - t0)
            if tta * votes > 1:
                # same view ensemble as the JSON path; all T*V copies ride
                # one micro-batch through the batching service. The expansion
                # seeds pass through so vote copies tile differently while
                # staying deterministic per request.
                from ampnet_tpu.infer.tiled import tta_ensemble

                ((labels, _),) = tta_ensemble(
                    lambda cs, sd: service.predict(
                        cs, probs=True, logical=(1, pts.shape[0]), seeds=sd
                    ),
                    [pts], tta, votes=votes,
                )
            else:
                (labels,) = service.predict([pts], probs=False)
            t0 = time.time()
            body = np.asarray(labels, np.int8).tobytes()
            service.stats.record_encode(time.time() - t0)
            self._send(200, body, "application/octet-stream")

        def _handle_json(self, raw: bytes) -> None:
            t0 = time.time()
            req = json.loads(raw.decode())
            clouds = [np.asarray(c, np.float32) for c in req.get("clouds", [])]
            service.stats.record_decode(time.time() - t0)
            if not clouds:
                self._send_json(400, {"error": "no clouds in request"})
                return
            for c in clouds:
                if c.ndim != 2 or c.shape[1] != n_feat:
                    self._send_json(
                        400, {"error": f"each cloud must be [N, {n_feat}]"}
                    )
                    return
            if req.get("normalize"):
                from ampnet_tpu.data.schema import normalize_xy_neg_one

                clouds = [normalize_xy_neg_one(c) for c in clouds]
            probs = bool(req.get("probs", False))
            try:
                tta = int(req.get("tta", 1))
                votes = int(req.get("votes", 1))
            except (TypeError, ValueError):
                self._send_json(400, {"error": "tta and votes must be integers"})
                return
            if not 1 <= tta <= 8:
                self._send_json(400, {"error": "tta must be 1..8"})
                return
            if votes < 1:
                self._send_json(400, {"error": "votes must be >= 1"})
                return
            if tta * votes > 1:
                # view ensemble (infer/tiled.py::tta_ensemble): dihedral TTA
                # x overlap-vote re-tiling; expansion happens here so the
                # batching service stays untouched — all T*V copies ride one
                # micro-batch. The expansion seeds (deterministic per request:
                # base seed = cloud index) pass through to the service so vote
                # copies tile differently; tta-only copies also tile
                # differently because rotation moves the k-means features.
                from ampnet_tpu.infer.tiled import tta_ensemble

                ens = tta_ensemble(
                    lambda cs, sd: service.predict(
                        cs, probs=True,
                        logical=(len(clouds),
                                 sum(c.shape[0] for c in clouds)),
                        seeds=sd,
                    ),
                    clouds, tta, votes=votes,
                )
                outs = [(p, m) if probs else p for p, m in ens]
            else:
                outs = service.predict(clouds, probs=probs)
            t0 = time.time()
            if probs:
                body = {
                    "labels": [np.asarray(p, int).tolist() for p, _ in outs],
                    "probs": [np.asarray(pr, float).round(6).tolist() for _, pr in outs],
                }
            else:
                body = {"labels": [np.asarray(p, int).tolist() for p in outs]}
            service.stats.record_encode(time.time() - t0)
            self._send_json(200, body)

    return Handler


class InferenceServer:
    """Own the HTTP server + service; usable as a context manager (tests) or
    via ``serve_forever`` (CLI)."""

    def __init__(
        self,
        inferencer,
        host: str = "127.0.0.1",
        port: int = 8421,
        model_name: str = "ampnet",
        batch_window_ms: float = 5.0,
        max_batch_clouds: int = 64,
    ):
        self.service = PredictionService(
            inferencer, batch_window_ms=batch_window_ms, max_batch_clouds=max_batch_clouds
        )
        class _Server(ThreadingHTTPServer):
            # socketserver's default accept backlog of 5 RSTs fresh
            # connections when many clients (re)connect at once — the
            # serving bench's 16 simultaneous keep-alive clients hit this
            # every round boundary
            request_queue_size = 128

        self.httpd = _Server((host, port), make_handler(self.service, model_name))
        self.httpd.daemon_threads = True

    @property
    def address(self):
        return self.httpd.server_address

    def warmup(self, sizes: List[int], batch_sizes: List[int] = (1,)) -> None:
        """Pre-compile bucket programs for the given cloud sizes (first-compile
        through a remote relay is minutes; do it before taking traffic).
        Goes straight to the inferencer so compile time never pollutes the
        /v1/stats request counters and latency quantiles.

        ``batch_sizes`` additionally pre-compiles the MICRO-BATCH shapes: jit
        programs are per (bucket, cloud-count), and under concurrent traffic
        the adaptive batcher forms multi-cloud batches whose first occurrence
        each pays a compile (the round-3 serving bench measured 29 cold
        requests dominated by exactly these). Pass e.g. [1, 2, 4, 8, 16] so a
        16-client steady state starts warm."""
        rng = np.random.default_rng(0)
        n_feat = _feature_count(self.service)
        for n in sizes:
            pts = rng.normal(size=(int(n), n_feat)).astype(np.float32)
            for b in batch_sizes:
                # the inferencer's compiled-shape ledger marks the programs
                # warm as a side effect, so later traffic is not tagged cold
                self.service.inferencer.predict_many(
                    [pts] * int(b), seeds=list(range(int(b))))

    def serve_forever(self) -> None:
        try:
            self.httpd.serve_forever()
        finally:
            self.close()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.service.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
