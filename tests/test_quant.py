"""Int8 post-training quantization (models/quant.py): param-tree
compatibility with the float model, numeric closeness, and the
Trainer/CLI inference integration. No reference counterpart (the
reference ships no model/serving code); extends the BASELINE
north-star serving story with the v5e's 2x-rate int8 MXU path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_image_segmentation_tpu.models.quant import (Int8Conv,
                                                    quantize_tensor)
from dl_image_segmentation_tpu.models.unet import UNet
from dl_image_segmentation_tpu.train.trainer import TrainConfig, Trainer


class TestQuantizeTensor:
    def test_roundtrip_error_bounded(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(64, 64).astype(np.float32) * 3.0)
        q, s = quantize_tensor(x)
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - x)
        # symmetric max-abs int8: error is at most half a step
        assert err.max() <= float(s) * 0.5 + 1e-6
        assert q.dtype == jnp.int8

    def test_per_axis_scales(self):
        rng = np.random.RandomState(1)
        w = rng.randn(3, 3, 8, 16).astype(np.float32)
        w[..., 0] *= 100.0  # one loud output channel
        q, s = quantize_tensor(jnp.asarray(w), axes=(0, 1, 2))
        assert s.shape == (16,)
        # the loud channel's scale must not wash out the others
        deq = np.asarray(q, np.float32) * np.asarray(s)
        assert np.abs(deq - w).max() <= np.asarray(s).max() * 0.5 + 1e-6
        assert np.abs(deq[..., 1:] - w[..., 1:]).max() \
            <= np.asarray(s)[1:].max() * 0.5 + 1e-6

    def test_zero_tensor_safe(self):
        q, s = quantize_tensor(jnp.zeros((4, 4)))
        assert np.all(np.asarray(q) == 0) and float(s) > 0


class TestInt8Conv:
    def test_matches_float_conv_closely(self):
        from flax import linen as nn
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(2, 16, 16, 8).astype(np.float32))
        fc = nn.Conv(16, (3, 3), padding="SAME", dtype=jnp.float32,
                     param_dtype=jnp.float32)
        params = fc.init(jax.random.PRNGKey(0), x)["params"]
        qc = Int8Conv(16, (3, 3), padding="SAME", dtype=jnp.float32)
        y_f = fc.apply({"params": params}, x)
        y_q = qc.apply({"params": params}, x)
        # int8 dynamic-scale error: small relative to activation range
        scale = float(jnp.max(jnp.abs(y_f)))
        assert float(jnp.max(jnp.abs(y_q - y_f))) < 0.05 * scale

    def test_batch_composition_independent(self):
        """Per-example activation scales: a request's int8 output must
        not depend on co-batched traffic (the serving micro-batcher
        packs unrelated requests and zero padding into one batch). A
        co-batched 100x-magnitude input once shifted another request's
        first-conv output by ~0.5 under a shared per-batch scale."""
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.rand(1, 16, 16, 8).astype(np.float32))
        loud = x * 100.0
        qc = Int8Conv(16, (3, 3), padding="SAME", dtype=jnp.float32)
        params = qc.init(jax.random.PRNGKey(1), x)["params"]
        alone = qc.apply({"params": params}, x)
        mixed = qc.apply({"params": params},
                         jnp.concatenate([x, loud, jnp.zeros_like(x)]))
        np.testing.assert_array_equal(np.asarray(alone[0]),
                                      np.asarray(mixed[0]))

    def test_param_tree_matches_nn_conv(self):
        from flax import linen as nn
        x = jnp.zeros((1, 8, 8, 4))
        pf = nn.Conv(8, (2, 2), strides=(2, 2)).init(
            jax.random.PRNGKey(0), x)["params"]
        pq = Int8Conv(8, (2, 2), strides=(2, 2)).init(
            jax.random.PRNGKey(0), x)["params"]
        assert {k: v.shape for k, v in pf.items()} \
            == {k: v.shape for k, v in pq.items()}


class TestQuantUNet:
    def test_param_tree_identical_to_float(self):
        """The whole point: a float checkpoint loads into the quant
        model unchanged -- identical key paths, shapes, dtypes."""
        x = jnp.zeros((1, 32, 32, 3))
        m_f = UNet(num_classes=3, base_features=8, levels=2)
        m_q = UNet(num_classes=3, base_features=8, levels=2, quant=True)
        p_f = jax.eval_shape(m_f.init, jax.random.PRNGKey(0), x)["params"]
        p_q = jax.eval_shape(m_q.init, jax.random.PRNGKey(0), x)["params"]
        flat_f = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in
                  jax.tree_util.tree_flatten_with_path(p_f)[0]}
        flat_q = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in
                  jax.tree_util.tree_flatten_with_path(p_q)[0]}
        assert flat_f == flat_q

    def test_quant_forward_close_on_trained_params(self, tmp_path):
        """Train the red-channel task briefly in float, then compare
        int8 vs float predictions pixel-for-pixel."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8,
                          learning_rate=3e-3, precision="fp32")
        tr = Trainer(cfg)
        rng = np.random.RandomState(3)
        for _ in range(45):
            imgs = rng.randint(0, 255, (8, 32, 32, 3), np.uint8)
            lbls = (imgs[:, :, :, 0] > 128).astype(np.int32)
            m = tr.train_step(imgs.astype(np.float32) / 255.0, lbls)
        # gate only that the task is learning (agreement below is the
        # real assertion; exact convergence varies with init)
        assert m["accuracy"] > 0.8, m
        imgs = rng.randint(0, 255, (8, 32, 32, 3), np.uint8)
        x = imgs.astype(np.float32) / 255.0
        pred_f = tr.predict(x)
        cfg_q = dataclasses.replace(cfg, quantize="int8")
        tr_q = Trainer(cfg_q)
        tr_q.state = tr.state  # same float params, int8 compute
        pred_q = tr_q.predict(x)
        agree = float(np.mean(pred_f == pred_q))
        assert agree > 0.97, agree

    def test_trainer_rejects_quant_non_unet(self):
        with pytest.raises(ValueError, match="unet"):
            Trainer(TrainConfig(model="deeplab", quantize="int8",
                                base_features=8, levels=2, image_size=32,
                                batch_size=8))

    def test_trainer_rejects_unknown_quantize(self):
        with pytest.raises(ValueError, match="quantize"):
            Trainer(TrainConfig(quantize="int4", base_features=8,
                                levels=2, image_size=32, batch_size=8))

    def test_serve_quantized(self):
        """A quantized PredictServer serves the int8 predict path:
        HTTP result matches offline quantized predict exactly."""
        import io
        import threading
        import urllib.request

        from dl_image_segmentation_tpu.serve import (PredictServer,
                                                     make_http_server)

        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=16, batch_size=8,
                          quantize="int8")
        trainer = Trainer(cfg)
        ps = PredictServer(trainer, max_wait_ms=30.0)
        httpd = make_http_server("127.0.0.1", 0, ps, scale="auto")
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            rng = np.random.RandomState(7)
            img = rng.rand(16, 16, 3).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, img)
            req = urllib.request.Request(
                f"http://127.0.0.1:{httpd.server_address[1]}/predict",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
                out = np.load(io.BytesIO(r.read()))
            offline = trainer.predict(np.repeat(img[None], 8, axis=0))[0]
            np.testing.assert_array_equal(out, offline)
        finally:
            httpd.shutdown()
            ps.close()

    def test_training_unaffected_by_quantize(self):
        """quantize touches inference only: the train step is the
        float path bit-for-bit."""
        rng = np.random.RandomState(4)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8,
                          precision="fp32")
        la = Trainer(cfg).train_step(imgs, lbls)["loss"]
        lq = Trainer(dataclasses.replace(cfg, quantize="int8")) \
            .train_step(imgs, lbls)["loss"]
        np.testing.assert_allclose(float(la), float(lq), rtol=0)
