"""HTTP inference server tests: routes, wire formats, micro-batching, errors."""

import json
import threading
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPNetConfig, DataConfig, ModelConfig
from ampnet_tpu.infer.server import InferenceServer
from ampnet_tpu.infer.tiled import TiledInferencer
from ampnet_tpu.models.amp import AMPNetSegmenter


@pytest.fixture(scope="module")
def server():
    cfg = AMPNetConfig(
        data=DataConfig(n_points=64, max_clusters_test=3),
        model=ModelConfig(dropout=0.0),
    )
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 2, 64, 9)).astype(np.float32)
    pad = np.zeros((1, 2), bool)
    variables = model.init(
        jax.random.PRNGKey(0), pts, pts[:, :, :, :2].mean(axis=2), pad
    )
    inferencer = TiledInferencer(model, variables, cfg, n_points=64, max_clusters=3)
    srv = InferenceServer(
        inferencer, host="127.0.0.1", port=0, model_name="test-model",
        batch_window_ms=20.0,
    )
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.close()


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def _post(server, path, data, headers):
    req = urllib.request.Request(_url(server, path), data=data, headers=headers)
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["model"] == "test-model"
    assert body["n_points"] == 64


def test_binary_predict(server):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(150, 9)).astype(np.float32)
    status, ctype, body = _post(
        server, "/v1/predict", pts.tobytes(),
        {"Content-Type": "application/octet-stream"},
    )
    assert status == 200 and ctype == "application/octet-stream"
    labels = np.frombuffer(body, np.int8)
    assert labels.shape == (150,)
    assert set(np.unique(labels)) <= set(range(5))


def test_binary_predict_float16_wire(server):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(90, 9)).astype(np.float16)
    status, _, body = _post(
        server, "/v1/predict", pts.tobytes(),
        {"Content-Type": "application/octet-stream", "X-Dtype": "float16"},
    )
    assert status == 200
    assert np.frombuffer(body, np.int8).shape == (90,)


def test_server_int8_device_wire():
    """A server whose inferencer uses the int8 host->device wire
    (--transfer_dtype int8) serves identical-shaped predictions through the
    full HTTP path — the wire quantization is invisible to clients."""
    cfg = AMPNetConfig(
        data=DataConfig(n_points=64, max_clusters_test=3),
        model=ModelConfig(dropout=0.0),
    )
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(1, 2, 64, 9)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), pts, pts[:, :, :, :2].mean(axis=2),
        np.zeros((1, 2), bool),
    )
    inferencer = TiledInferencer(model, variables, cfg, n_points=64,
                                 max_clusters=3, transfer_dtype="int8")
    srv = InferenceServer(inferencer, host="127.0.0.1", port=0,
                          model_name="int8-wire", batch_window_ms=5.0)
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    try:
        cloud = rng.normal(size=(150, 9)).astype(np.float32)
        status, _, body = _post(
            srv, "/v1/predict", cloud.tobytes(),
            {"Content-Type": "application/octet-stream"},
        )
        assert status == 200
        labels = np.frombuffer(body, np.int8)
        assert labels.shape == (150,)
        # agrees with the direct inferencer call (same wire, same seed path)
        direct = inferencer.predict_many([cloud], seeds=[0])[0]
        assert labels.shape == direct.shape
    finally:
        srv.close()


def test_json_predict_multi_cloud_and_probs(server):
    rng = np.random.default_rng(3)
    clouds = [rng.normal(size=(n, 9)).astype(np.float32) for n in (80, 120)]
    payload = json.dumps(
        {"clouds": [c.tolist() for c in clouds], "probs": True}
    ).encode()
    status, ctype, body = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert status == 200 and ctype == "application/json"
    out = json.loads(body)
    assert [len(l) for l in out["labels"]] == [80, 120]
    probs = np.asarray(out["probs"][0])
    assert probs.shape == (80, 5)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-3)
    # labels consistent with probs argmax
    np.testing.assert_array_equal(np.argmax(probs, axis=1), out["labels"][0])


def test_json_normalize_flag(server):
    rng = np.random.default_rng(4)
    c = rng.normal(size=(70, 9)).astype(np.float32)
    c[:, 0] = rng.uniform(0, 1, 70)  # raw [0,1] x/y
    c[:, 1] = rng.uniform(0, 1, 70)
    payload = json.dumps({"clouds": [c.tolist()], "normalize": True}).encode()
    status, _, body = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert status == 200
    assert len(json.loads(body)["labels"][0]) == 70


def test_concurrent_requests_microbatch(server):
    """Two clients in the same batching window both get correct answers, and
    single-flight answers match (micro-batching is transparent)."""
    rng = np.random.default_rng(5)
    clouds = [rng.normal(size=(100, 9)).astype(np.float32) for _ in range(2)]
    solo = []
    for c in clouds:
        _, _, body = _post(server, "/v1/predict", c.tobytes(),
                           {"Content-Type": "application/octet-stream"})
        solo.append(np.frombuffer(body, np.int8))

    results = [None, None]

    def hit(i):
        _, _, body = _post(server, "/v1/predict", clouds[i].tobytes(),
                           {"Content-Type": "application/octet-stream"})
        results[i] = np.frombuffer(body, np.int8)

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    for i in range(2):
        np.testing.assert_array_equal(results[i], solo[i])


def test_keep_alive_connection_reuse(server):
    """HTTP/1.1 keep-alive: multiple predicts over ONE TCP connection."""
    import http.client

    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    try:
        rng = np.random.default_rng(7)
        for n in (60, 80):
            pts = rng.normal(size=(n, 9)).astype(np.float32)
            conn.request("POST", "/v1/predict", body=pts.tobytes(),
                         headers={"Content-Type": "application/octet-stream"})
            resp = conn.getresponse()
            body = resp.read()  # must fully drain to reuse the connection
            assert resp.status == 200
            assert np.frombuffer(body, np.int8).shape == (n,)
    finally:
        conn.close()


def test_stats(server):
    with urllib.request.urlopen(_url(server, "/v1/stats"), timeout=30) as r:
        s = json.loads(r.read())
    assert s["requests"] > 0 and s["points"] > 0 and s["errors"] >= 0
    assert s["latency_s"]["p50"] is not None
    # first-per-bucket requests pay the jit compile; they are counted but kept
    # out of the latency quantile reservoir
    assert s["cold_requests"] >= 1
    assert s["cold_requests"] + len([1]) <= s["requests"] + 1
    bd = s["breakdown"]
    assert bd["device_batches"] >= 1 and bd["device_s_total"] > 0
    assert bd["batch_clouds_mean"] >= 1 and bd["device_points_per_sec"] > 0


def test_adaptive_drain_window_grows_under_inflight():
    """With a batch in flight and a warm execution EMA, the drain deadline
    stretches toward that batch's expected completion, so arrivals during the
    previous batch's execution join one large batch instead of fragmenting
    (round-3 serving decomposition: mean micro-batch 5.5 clouds was the
    HTTP-vs-library throughput gap)."""
    import queue
    import time as _t

    from ampnet_tpu.infer.server import PredictionService, _Job

    svc = PredictionService.__new__(PredictionService)  # no worker thread
    svc.batch_window_s = 0.01
    svc.max_batch_clouds = 64
    svc.adaptive_wait_cap_s = 5.0
    svc._exec_ema = 0.5
    svc._q = queue.Queue()
    svc._plock = threading.Lock()
    clouds = [np.zeros((4, 9), np.float32)]

    # second job lands 100 ms in: far outside the 10 ms window, inside the
    # adaptive one (EMA 0.5 s, one batch pending on device)
    svc._pending, svc._last_dispatch_t = 1, _t.time()
    svc._q.put(_Job(clouds, False))
    threading.Timer(0.1, lambda: svc._q.put(_Job(clouds, False))).start()
    jobs = svc._drain()
    assert len(jobs) == 2

    # control: no batch in flight -> plain window, the late job misses it
    svc._q.queue.clear()
    svc._pending, svc._last_dispatch_t = 0, 0.0
    svc._q.put(_Job(clouds, False))
    threading.Timer(0.1, lambda: svc._q.put(_Job(clouds, False))).start()
    jobs = svc._drain()
    assert len(jobs) == 1
    _t.sleep(0.15)  # let the timer fire before the queue object goes away


def test_cold_requests_excluded_from_reservoir():
    from ampnet_tpu.infer.server import ServingStats

    st = ServingStats()
    st.record(1, 100, 300.0, cold=True)  # a relay compile
    for _ in range(4):
        st.record(1, 100, 0.01)
    s = st.snapshot()
    assert s["cold_requests"] == 1 and s["requests"] == 5
    assert s["latency_s"]["p99"] < 1.0  # the 300 s outlier stayed out
    assert s["cold_latency_max_s"] == 300.0


def test_mesh_sharded_service():
    """serve --num_devices N path: the service runs over a mesh-sharded
    inferencer (cloud batch sharded, params replicated)."""
    from ampnet_tpu.infer.server import PredictionService
    from ampnet_tpu.parallel.mesh import make_mesh

    cfg = AMPNetConfig(
        data=DataConfig(n_points=64, max_clusters_test=2),
        model=ModelConfig(dropout=0.0),
    )
    model = AMPNetSegmenter(cfg.model)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 2, 64, 9)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), pts, pts[:, :, :, :2].mean(axis=2), np.zeros((1, 2), bool)
    )
    inferencer = TiledInferencer(
        model, variables, cfg, n_points=64, max_clusters=2, mesh=make_mesh(8)
    )
    svc = PredictionService(inferencer, batch_window_ms=1.0)
    try:
        clouds = [rng.normal(size=(n, 9)).astype(np.float32) for n in (90, 110, 70)]
        outs = svc.predict(clouds)
        assert [o.shape[0] for o in outs] == [90, 110, 70]
    finally:
        svc.close()


def test_classification_service():
    """serve --task classification: CloudClassifier behind the same service —
    one label + class probabilities per cloud."""
    from ampnet_tpu.infer.classify import CloudClassifier
    from ampnet_tpu.infer.server import PredictionService
    from ampnet_tpu.models.factory import build_model

    cfg = AMPNetConfig(
        data=DataConfig(n_points=64), model=ModelConfig(context="baseline", dropout=0.0)
    )
    model = build_model(cfg, "baseline", "classification")
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 1, 64, 9)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pts, None, None)
    clf = CloudClassifier(model, variables, cfg, n_points=64)
    svc = PredictionService(clf, batch_window_ms=1.0)
    try:
        clouds = [rng.normal(size=(n, 9)).astype(np.float32) for n in (50, 120, 64)]
        outs = svc.predict(clouds)
        assert [o.shape for o in outs] == [(1,), (1,), (1,)]
        assert all(int(o[0]) in (0, 1) for o in outs)
        outs_p = svc.predict(clouds, probs=True)
        for label, probs in outs_p:
            assert probs.shape == (2,)
            np.testing.assert_allclose(float(probs.sum()), 1.0, atol=1e-2)
            assert int(np.argmax(probs)) == int(label[0])
        # deterministic across calls
        again = svc.predict(clouds)
        for a, b in zip(outs, again):
            np.testing.assert_array_equal(a, b)
    finally:
        svc.close()


def test_classification_service_attention_arch():
    """Windowed classifiers (attention) serve too: the head's window-mixing
    kernel is sized to the training max_windows, so the engine must present
    that window count (one real window, replicas attention-masked)."""
    from ampnet_tpu.infer.classify import CloudClassifier
    from ampnet_tpu.models.factory import build_model

    cfg = AMPNetConfig(
        data=DataConfig(n_points=64, max_windows=3),
        model=ModelConfig(context="attention", dropout=0.0),
    )
    model = build_model(cfg, "attention", "classification")
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1, 3, 64, 9)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), pts, pts[..., :2].mean(axis=2), np.zeros((1, 3), bool)
    )
    clf = CloudClassifier(model, variables, cfg, n_points=64)
    outs = clf.predict_many([rng.normal(size=(100, 9)).astype(np.float32)],
                            return_probs=True)
    label, probs = outs[0]
    assert label.shape == (1,) and probs.shape == (2,)
    assert int(np.argmax(probs)) == int(label[0])


def test_bad_requests(server):
    # misaligned binary body
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", b"abc",
              {"Content-Type": "application/octet-stream"})
    assert e.value.code == 400
    # wrong feature count
    payload = json.dumps({"clouds": [[[1.0, 2.0]]]}).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", payload, {"Content-Type": "application/json"})
    assert e.value.code == 400
    # empty clouds
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", json.dumps({"clouds": []}).encode(),
              {"Content-Type": "application/json"})
    assert e.value.code == 400
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", b"", {"Content-Type": "application/json"})
    assert e.value.code == 404
    # non-numeric view-ensemble fields are a 400, not a ValueError->500
    # (ADVICE r4: int() on client input used to raise out of the handler)
    pts = np.zeros((4, 9), np.float32)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", pts.tobytes(),
              {"Content-Type": "application/octet-stream", "X-TTA": "lots"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", pts.tobytes(),
              {"Content-Type": "application/octet-stream",
               "X-Tile-Votes": "1.5"})
    assert e.value.code == 400
    payload = json.dumps({"clouds": [pts.tolist()], "tta": "many"}).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", payload,
              {"Content-Type": "application/json"})
    assert e.value.code == 400


def test_exec_ema_tracks_device_time_not_drain_window():
    """Regression: the warm-execution EMA must measure device time only.
    When batch completion waited on the NEXT batch's drain (old single-thread
    worker), the adaptive drain window leaked into the EMA that the window is
    derived from — a feedback loop that ratcheted the window to its cap and
    decayed serving throughput within a bench run (213k -> 96k pts/s). With
    the dedicated fetcher thread the EMA settles at the stubbed device time."""
    import time as _t

    from ampnet_tpu.infer.server import PredictionService

    class _StubInferencer:
        def dispatch_many(self, clouds, seeds=None, return_probs=False):
            return {"cold": False, "n": len(clouds)}

        def fetch_many(self, handle):
            _t.sleep(0.05)  # "device" execution + transfer
            return [np.zeros((4,), np.int32)] * handle["n"]

    svc = PredictionService(_StubInferencer(), batch_window_ms=5.0,
                            adaptive_wait_cap_s=5.0)
    clouds = [np.zeros((4, 9), np.float32)]

    def client():
        for _ in range(10):
            svc.predict(clouds)

    ts = [threading.Thread(target=client) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in ts), "serving worker wedged"
    ema = svc._exec_ema
    svc.close()
    # true exec is 0.05 s; the old feedback loop pushed the EMA toward the
    # 5 s cap (adds ~0.3 x window per batch under sustained load)
    assert 0.0 < ema < 0.2, ema


def test_json_tta_ensemble(server):
    rng = np.random.default_rng(9)
    clouds = [rng.normal(size=(n, 9)).astype(np.float32) for n in (60, 95)]
    payload = json.dumps(
        {"clouds": [c.tolist() for c in clouds], "tta": 4, "probs": True}
    ).encode()
    status, _, body = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert status == 200
    out = json.loads(body)
    assert [len(l) for l in out["labels"]] == [60, 95]
    probs = np.asarray(out["probs"][1])
    assert probs.shape == (95, 5)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=2e-2)
    np.testing.assert_array_equal(np.argmax(probs, axis=1), out["labels"][1])
    # out-of-range ensemble size is a client error
    bad = json.dumps({"clouds": [clouds[0].tolist()], "tta": 99}).encode()
    import pytest as _pytest
    with _pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", bad, {"Content-Type": "application/json"})
    assert e.value.code == 400


def test_binary_tta_ensemble(server):
    """X-TTA on the binary wire: same dihedral-ensemble semantics as JSON
    'tta'; result must equal the JSON-path ensemble on the same cloud."""
    rng = np.random.default_rng(10)
    pts = rng.normal(size=(70, 9)).astype(np.float32)
    status, ctype, body = _post(
        server, "/v1/predict", pts.tobytes(),
        {"Content-Type": "application/octet-stream", "X-TTA": "4"},
    )
    assert status == 200 and ctype == "application/octet-stream"
    labels = np.frombuffer(body, np.int8)
    assert labels.shape == (70,)

    payload = json.dumps({"clouds": [pts.tolist()], "tta": 4}).encode()
    status, _, jbody = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert status == 200
    np.testing.assert_array_equal(labels, np.asarray(json.loads(jbody)["labels"][0], np.int8))

    import pytest as _pytest
    with _pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", pts.tobytes(),
              {"Content-Type": "application/octet-stream", "X-TTA": "99"})
    assert e.value.code == 400


def test_overlap_vote_serving(server):
    """JSON "votes" / binary X-Tile-Votes: overlap-vote re-tiling through the
    micro-batching service. The expansion seeds pass through to dispatch_many
    (per-request-deterministic), so two identical requests agree; votes
    composes with tta; bad values are client errors."""
    rng = np.random.default_rng(33)
    pts = rng.normal(size=(80, 9)).astype(np.float32)
    payload = json.dumps(
        {"clouds": [pts.tolist()], "votes": 3, "probs": True}
    ).encode()
    status, _, body = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert status == 200
    out1 = json.loads(body)
    assert len(out1["labels"][0]) == 80
    probs = np.asarray(out1["probs"][0])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=2e-2)
    # determinism across identical requests
    status, _, body = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert json.loads(body)["labels"] == out1["labels"]
    # binary wire, composed with tta
    status, ctype, body = _post(
        server, "/v1/predict", pts.tobytes(),
        {"Content-Type": "application/octet-stream", "X-TTA": "2",
         "X-Tile-Votes": "2"},
    )
    assert status == 200 and ctype == "application/octet-stream"
    assert np.frombuffer(body, np.int8).shape == (80,)
    import pytest as _pytest
    with _pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", pts.tobytes(),
              {"Content-Type": "application/octet-stream", "X-Tile-Votes": "0"})
    assert e.value.code == 400
    bad = json.dumps({"clouds": [pts.tolist()], "votes": 0}).encode()
    with _pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/predict", bad, {"Content-Type": "application/json"})
    assert e.value.code == 400


def test_tta_stats_count_logical_clouds(server):
    """A TTA request predicts T× expanded clouds on the device, but /v1/stats
    request accounting must count what the CLIENT sent — 2 clouds, not 8
    (review finding: ensemble-inflated throughput)."""
    with urllib.request.urlopen(_url(server, "/v1/stats"), timeout=30) as r:
        before = json.loads(r.read())
    rng = np.random.default_rng(21)
    clouds = [rng.normal(size=(n, 9)).astype(np.float32) for n in (40, 55)]
    payload = json.dumps(
        {"clouds": [c.tolist() for c in clouds], "tta": 4}
    ).encode()
    status, _, _ = _post(
        server, "/v1/predict", payload, {"Content-Type": "application/json"}
    )
    assert status == 200
    with urllib.request.urlopen(_url(server, "/v1/stats"), timeout=30) as r:
        after = json.loads(r.read())
    assert after["clouds"] - before["clouds"] == 2
    assert after["points"] - before["points"] == 95
    # the device-side breakdown DOES see the expanded ensemble work (the
    # 8-cloud micro-batch may be a first-contact shape -> counted cold)
    total_b = lambda s: (s["breakdown"]["device_batches"]
                         + s["breakdown"]["cold_batches"])
    assert after["breakdown"]["batch_points_mean"] > 0
    assert total_b(after) > total_b(before)


def test_serving_cross_family_ensemble():
    """An EnsembleInferencer (cross-family probability-averaging wrapper,
    infer/tiled.py) drives the serving engine unchanged: its dispatch_many/
    fetch_many/cold surface matches TiledInferencer's, and responses equal the
    library-path ensemble prediction on the same cloud."""
    from ampnet_tpu.infer.tiled import EnsembleInferencer
    from ampnet_tpu.models.amp import AMPNetSegmenter as _Seg

    rng = np.random.default_rng(40)
    members = []
    for n_pts, seed in ((64, 0), (48, 7)):
        cfg = AMPNetConfig(
            data=DataConfig(n_points=n_pts, max_clusters_test=3),
            model=ModelConfig(dropout=0.0),
        )
        model = _Seg(cfg.model)
        pts = rng.normal(size=(1, 2, n_pts, 9)).astype(np.float32)
        v = model.init(
            jax.random.PRNGKey(seed), pts, pts[:, :, :, :2].mean(axis=2),
            np.zeros((1, 2), bool),
        )
        members.append(TiledInferencer(model, v, cfg, max_clusters=3))
    ens = EnsembleInferencer(members)
    srv = InferenceServer(ens, host="127.0.0.1", port=0,
                          model_name="xfam", batch_window_ms=20.0)
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    try:
        cloud = rng.normal(size=(120, 9)).astype(np.float32)
        status, ctype, body = _post(
            srv, "/v1/predict", cloud.tobytes(),
            {"Content-Type": "application/octet-stream"},
        )
        assert status == 200 and ctype == "application/octet-stream"
        labels = np.frombuffer(body, np.int8)
        # serving uses fixed seed 0 per cloud -> must match the library path
        np.testing.assert_array_equal(labels, ens.predict(cloud, seed=0))
        with urllib.request.urlopen(_url(srv, "/healthz"), timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        srv.close()
