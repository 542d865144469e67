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

    def test_npy_body_matches_offline_predict(self, live_server):
        trainer, ps, base = live_server
        rng = np.random.RandomState(0)
        img = rng.rand(16, 16, 3).astype(np.float32)
        code, ctype, body = _post(base + "/predict", _npy(img))
        assert code == 200 and ctype == "application/x-npy"
        out = np.load(io.BytesIO(body))
        assert out.dtype == np.uint8 and out.shape == (16, 16)
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

    def test_wrong_shape_is_400(self, live_server):
        _, _, base = live_server
        code, ctype, body = _post(
            base + "/predict", _npy(np.zeros((4, 4, 3), np.float32)))
        assert code == 400 and "expected" in json.loads(body)["error"]

    def test_garbage_body_is_400(self, live_server):
        _, _, base = live_server
        code, _, body = _post(base + "/predict", b"not an image")
        assert code == 400

    def test_unknown_path_is_404(self, live_server):
        _, _, base = live_server
        code, _, _ = _post(base + "/nope", b"")
        assert code == 404

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
