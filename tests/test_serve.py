"""Online inference server: micro-batching, both output kinds, codec
bodies, validation errors -- all against a live ThreadingHTTPServer on
an ephemeral port (CPU mesh from conftest)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from dl_image_segmentation_tpu.raster.image import encode_png
from dl_image_segmentation_tpu.serve import (PredictServer,
                                             make_http_server,
                                             scale_image)
from dl_image_segmentation_tpu.train.trainer import TrainConfig, Trainer


@pytest.fixture(scope="module")
def live_server():
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                      levels=1, image_size=16, batch_size=8)
    trainer = Trainer(cfg)
    ps = PredictServer(trainer, max_wait_ms=30.0)
    httpd = make_http_server("127.0.0.1", 0, ps, scale="auto")
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield trainer, ps, f"http://127.0.0.1:{port}"
    httpd.shutdown()
    ps.close()


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


class TestServe:
    def test_healthz(self, live_server):
        trainer, ps, base = live_server
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["num_classes"] == 2
        assert h["batch_size"] == 8 and h["image_size"] == 16

    def test_metrics_prometheus_exposition(self, live_server):
        """GET /metrics: counters track served traffic and the latency
        histograms are internally consistent (monotone cumulative
        buckets, +Inf == count, count advances with requests)."""
        trainer, ps, base = live_server
        img = np.random.RandomState(0).rand(16, 16, 3).astype(
            np.float32)
        for _ in range(3):
            status, _ct, _body = _post(base + "/predict", _npy(img))
            assert status == 200

        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            assert r.headers.get("Content-Type", "").startswith(
                "text/plain")
            text = r.read().decode()
        vals = {}
        for line in text.splitlines():
            if line.startswith("#") or not line.strip():
                continue
            key, _, v = line.rpartition(" ")
            vals[key] = float(v)
        assert vals["dlseg_requests_served_total"] >= 3
        assert vals["dlseg_batches_total"] >= 1
        assert vals["dlseg_batch_size"] == 8
        assert vals["dlseg_batch_errors_total"] == 0
        # histogram consistency
        for name in ("dlseg_request_latency_seconds",
                     "dlseg_dispatch_latency_seconds"):
            buckets = [(k, v) for k, v in vals.items()
                       if k.startswith(name + "_bucket")]
            counts = [v for _k, v in buckets]
            assert counts == sorted(counts)  # cumulative, monotone
            inf = vals[f'{name}_bucket{{le="+Inf"}}']
            assert inf == vals[name + "_count"] > 0
            assert vals[name + "_sum"] >= 0.0
        assert vals["dlseg_request_latency_seconds_count"] >= 3

    def test_npy_body_matches_offline_predict(self, live_server):
        trainer, ps, base = live_server
        rng = np.random.RandomState(0)
        img = rng.rand(16, 16, 3).astype(np.float32)
        code, ctype, body = _post(base + "/predict", _npy(img))
        assert code == 200 and ctype == "application/x-npy"
        out = np.load(io.BytesIO(body))
        assert out.dtype == np.int32 and out.shape == (16, 16)
        offline = trainer.predict(np.repeat(img[None], 8, axis=0))[0]
        np.testing.assert_array_equal(out, offline)

    def test_probs_argmax_consistent(self, live_server):
        trainer, ps, base = live_server
        rng = np.random.RandomState(1)
        img = rng.rand(16, 16, 3).astype(np.float32)
        c1, _, cls_body = _post(base + "/predict", _npy(img))
        c2, _, prob_body = _post(base + "/predict?probs=1", _npy(img))
        assert c1 == 200 and c2 == 200
        cls = np.load(io.BytesIO(cls_body))
        probs = np.load(io.BytesIO(prob_body))
        assert probs.dtype == np.float32 and probs.shape == (16, 16, 2)
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
        np.testing.assert_array_equal(probs.argmax(axis=-1), cls)

    def test_png_body_uses_auto_scaling(self, live_server):
        trainer, ps, base = live_server
        rng = np.random.RandomState(2)
        img8 = rng.randint(0, 255, (16, 16, 3), np.uint8)
        code, _, body = _post(base + "/predict", encode_png(img8))
        assert code == 200
        out = np.load(io.BytesIO(body))
        offline = trainer.predict(
            np.repeat(scale_image(img8, "auto")[None], 8, axis=0))[0]
        np.testing.assert_array_equal(out, offline)

    def test_micro_batching_packs_concurrent_requests(self, live_server):
        trainer, ps, base = live_server
        rng = np.random.RandomState(3)
        imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
        before = ps.batches
        results = [None] * 8

        def call(i):
            code, _, body = _post(base + "/predict", _npy(imgs[i]))
            assert code == 200
            results[i] = np.load(io.BytesIO(body))

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # 8 concurrent requests within one 30 ms window must NOT take
        # 8 dispatches (batching packs them; allow some window slack)
        assert ps.batches - before <= 4
        offline = trainer.predict(imgs)
        for i in range(8):
            np.testing.assert_array_equal(results[i], offline[i])

    def test_wrong_bands_is_400(self, live_server):
        # band-count mismatches can't be windowed away -> client error
        _, _, base = live_server
        code, ctype, body = _post(
            base + "/predict", _npy(np.zeros((16, 16, 2), np.float32)))
        assert code == 400 and "expected" in json.loads(body)["error"]
        code, _, body = _post(
            base + "/predict", _npy(np.zeros((2, 16, 16, 3), np.float32)))
        assert code == 400

    def test_whole_raster_windowed_matches_offline(self, live_server):
        """A larger raster (same bands) runs the sliding-window path
        through the micro-batcher -- numerically identical to the
        offline pipeline.window.predict_windowed blend."""
        trainer, _, base = live_server
        big = np.random.default_rng(11).random((40, 24, 3)).astype(
            np.float32)
        code, ctype, body = _post(base + "/predict?stride=8", _npy(big))
        assert code == 200 and ctype == "application/x-npy"
        cls = np.load(io.BytesIO(body))
        assert cls.shape == (40, 24) and cls.dtype == np.int32
        code, _, pbody = _post(base + "/predict?probs=1&stride=8",
                               _npy(big))
        assert code == 200
        probs = np.load(io.BytesIO(pbody))
        assert probs.shape == (40, 24, 2) and probs.dtype == np.float32
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
        np.testing.assert_array_equal(probs.argmax(axis=-1), cls)
        from dl_image_segmentation_tpu.pipeline.window import \
            predict_windowed
        offline = predict_windowed(trainer, big, stride=8, scale="none",
                                   probs=True)
        np.testing.assert_allclose(probs, offline, atol=1e-6)

    def test_windowed_and_chip_traffic_interleave(self, live_server):
        """The design claim: a scene's windows pack into dispatches
        WITH concurrent single-chip traffic, and both come back
        correct (per-sample results are batch-composition-invariant:
        convs and GroupNorm are per-sample)."""
        trainer, _, base = live_server
        rng = np.random.default_rng(23)
        big = rng.random((24, 24, 3)).astype(np.float32)
        chips = [rng.random((16, 16, 3)).astype(np.float32)
                 for _ in range(4)]
        results = {}

        def post_big():
            results["big"] = _post(base + "/predict?probs=1&stride=8",
                                   _npy(big))

        def post_chip(i):
            results[i] = _post(base + "/predict", _npy(chips[i]))

        threads = [threading.Thread(target=post_big)] + [
            threading.Thread(target=post_chip, args=(i,))
            for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        code, _, body = results["big"]
        assert code == 200
        from dl_image_segmentation_tpu.pipeline.window import \
            predict_windowed
        offline = predict_windowed(trainer, big, stride=8,
                                   scale="none", probs=True)
        np.testing.assert_allclose(np.load(io.BytesIO(body)), offline,
                                   atol=1e-6)
        for i in range(4):
            code, _, body = results[i]
            assert code == 200
            np.testing.assert_array_equal(
                np.load(io.BytesIO(body)),
                trainer.predict(chips[i][None])[0])

    def test_undersized_chip_padded_and_cropped(self, live_server):
        # smaller than the compiled window: edge-pad, predict, crop back
        _, _, base = live_server
        code, _, body = _post(
            base + "/predict", _npy(np.zeros((4, 7, 3), np.float32)))
        assert code == 200
        assert np.load(io.BytesIO(body)).shape == (4, 7)

    def test_bad_stride_is_400(self, live_server):
        _, _, base = live_server
        big = _npy(np.zeros((20, 20, 3), np.float32))
        for q in ("stride=0", "stride=99", "stride=x"):
            code, _, body = _post(f"{base}/predict?{q}", big)
            assert code == 400 and "stride" in json.loads(body)["error"]

    def test_oversized_raster_is_413(self):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=16, batch_size=2)
        ps = PredictServer(Trainer(cfg), max_wait_ms=5.0)
        httpd = make_http_server("127.0.0.1", 0, ps, max_pixels=500)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{httpd.server_address[1]}"
            code, _, body = _post(
                base + "/predict",
                _npy(np.zeros((30, 20, 3), np.float32)))
            assert code == 413
            assert "max_pixels" in json.loads(body)["error"]
        finally:
            httpd.shutdown()
            ps.close()

    def test_garbage_body_is_400(self, live_server):
        _, _, base = live_server
        code, _, body = _post(base + "/predict", b"not an image")
        assert code == 400

    def test_unknown_path_is_404(self, live_server):
        _, _, base = live_server
        code, _, _ = _post(base + "/nope", b"")
        assert code == 404

    def test_overload_rejected_503_and_close_fails_pending(self):
        """Admission control: beyond max_queue waiting requests submit
        fails fast with a 503-status error; close() fails anything
        still queued instead of letting it sit out its timeout."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=16, batch_size=2)
        trainer = Trainer(cfg)
        ps = PredictServer(trainer, max_wait_ms=5.0, max_queue=3)
        # jam the worker so the queue can actually fill
        gate = threading.Event()
        real = trainer.predict_probs
        trainer.predict_probs = lambda imgs: (gate.wait(30), real(imgs))[1]
        try:
            img = np.zeros((16, 16, 3), np.float32)
            pendings, threads = [], []

            def call():
                pendings.append(ps.submit(img, probs=False, timeout=30))

            # worker grabs up to batch_size from the queue for its
            # (blocked) first batch; keep submitting until one bounces
            for _ in range(ps.max_queue + cfg.batch_size + 1):
                t = threading.Thread(target=call)
                t.start()
                threads.append(t)
                if ps.rejected:
                    break
                import time as _t
                _t.sleep(0.05)
            assert ps.rejected >= 1
            rejected_now = [p for p in pendings
                            if p.error and p.status == 503]
            assert rejected_now and "overloaded" in rejected_now[0].error
            ps._stop = True  # stop the loop, then release the jam
            gate.set()
            ps.close()
            for t in threads:
                t.join(timeout=30)
            # every submission resolved: served, rejected (503), or
            # failed by close() -- none hung to the full timeout
            assert len(pendings) == len(threads)
            for p in pendings:
                assert p.result is not None or p.error is not None
        finally:
            gate.set()
            trainer.predict_probs = real
            ps.close()

    def test_worker_failure_surfaces_as_500(self):
        """A device-side failure inside the batch worker must reach
        every waiting request as a 500 (not a hang), and the server
        must keep serving afterwards."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=16, batch_size=8)
        trainer = Trainer(cfg)
        ps = PredictServer(trainer, max_wait_ms=5.0)
        httpd = make_http_server("127.0.0.1", 0, ps)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        real = trainer.predict_probs
        try:
            trainer.predict_probs = lambda imgs: (_ for _ in ()).throw(
                RuntimeError("device exploded"))
            img = np.zeros((16, 16, 3), np.float32)
            code, _, body = _post(base + "/predict", _npy(img))
            assert code == 500
            assert "device exploded" in json.loads(body)["error"]
            trainer.predict_probs = real  # server recovers
            code, _, _ = _post(base + "/predict", _npy(img))
            assert code == 200
        finally:
            trainer.predict_probs = real
            httpd.shutdown()
            ps.close()
