"""int8-static PTQ: calibrated constant activation scales
(models/quant.py Int8Conv static mode + Trainer.calibrate).

Static mode exists to win back the narrow-width serving case where
dynamic quantization's per-layer reduction passes cost more HBM than
the s8 convs save (TPU_EVIDENCE int8_speedup_*); these tests pin the
numerics and plumbing on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                     Trainer)


def _mk(quantize, seed=0, **kw):
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                      levels=2, image_size=32, batch_size=8,
                      quantize=quantize, seed=seed, **kw)
    return Trainer(cfg)


def _data(n=8, seed=1):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n, 32, 32, 3).astype(np.float32)
    lbls = (imgs[:, :, :, 0] > 0.5).astype(np.int32)
    return imgs, lbls


class TestStaticQuant:
    def test_uncalibrated_inference_raises_without_batch(self):
        tr = _mk("int8-static")
        with pytest.raises(RuntimeError, match="calibrat"):
            tr._quant_arg()

    def test_calibrate_then_predict_matches_float_mostly(self):
        imgs, lbls = _data()
        tr_f = _mk("none")
        tr_s = _mk("int8-static")
        # same float params in both
        tr_s.state = tr_f.state
        n = tr_s.calibrate([(imgs, lbls)], max_batches=4)
        assert n == 1
        assert tr_s.quant_vars  # scales recorded
        amaxes = [float(v) for v in
                  np.concatenate([np.atleast_1d(x) for x in
                                  __import__("jax").tree_util
                                  .tree_leaves(tr_s.quant_vars)])]
        assert all(a > 0 for a in amaxes)
        p_f = tr_f.predict(imgs)
        p_s = tr_s.predict(imgs)
        agree = (p_f == p_s).mean()
        assert agree > 0.95, f"static int8 argmax agreement {agree}"

    def test_static_close_to_dynamic(self):
        imgs, lbls = _data()
        tr_d = _mk("int8")
        tr_s = _mk("int8-static")
        tr_s.state = tr_d.state
        tr_s.calibrate([(imgs, lbls)])
        p_d = tr_d.predict(imgs)
        p_s = tr_s.predict(imgs)
        assert (p_d == p_s).mean() > 0.95

    def test_auto_calibration_on_first_predict(self):
        imgs, _ = _data()
        tr = _mk("int8-static")
        out = tr.predict(imgs)  # no explicit calibrate
        assert out.shape == (8, 32, 32)
        assert tr.quant_vars  # first batch calibrated the scales
        # scales are now frozen: a second predict reuses them
        before = __import__("jax").tree_util.tree_leaves(tr.quant_vars)
        tr.predict(imgs * 0.5)
        after = __import__("jax").tree_util.tree_leaves(tr.quant_vars)
        for b, a in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def test_evaluate_auto_calibrates(self):
        imgs, lbls = _data()
        tr = _mk("int8-static")
        out = tr.evaluate([(imgs, lbls)])
        assert np.isfinite(out["miou"]) and tr.quant_vars

    def test_request_independence_under_cobatching(self):
        """Constant scales: a request's int8 output cannot depend on
        co-batched traffic (the serving micro-batcher packs unrelated
        requests)."""
        imgs, lbls = _data()
        tr = _mk("int8-static")
        tr.calibrate([(imgs, lbls)])
        solo = tr.predict(imgs[:1])
        rng = np.random.RandomState(9)
        loud = (rng.rand(7, 32, 32, 3) * 1.0).astype(np.float32)
        batch = np.concatenate([imgs[:1], loud])
        co = tr.predict(batch)[:1]
        np.testing.assert_array_equal(solo, co)

    def test_float_checkpoint_roundtrip(self, tmp_path):
        imgs, lbls = _data()
        tr = _mk("none")
        ck = str(tmp_path / "ck")
        tr.save_checkpoint(ck)
        tr2 = _mk("int8-static")
        tr2.restore_checkpoint(ck)
        tr2.calibrate([(imgs, lbls)])
        assert tr2.predict(imgs).shape == (8, 32, 32)


class TestStaticQuantCLI:
    def test_eval_with_calibrate_records(self, tmp_path, capsys):
        from dl_image_segmentation_tpu.cli import main as cli_main
        from dl_image_segmentation_tpu.records.example import (
            convert_to_example)
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter, shard_filename)
        rng = np.random.RandomState(0)
        recs = tmp_path / "recs"
        recs.mkdir()
        with TFRecordWriter(str(recs / shard_filename("t", 0, 1))) as w:
            for _ in range(16):
                img = rng.rand(16, 16, 3).astype(np.float32)
                lbl = rng.randint(0, 2, (16, 16), np.uint8)
                w.write(convert_to_example(
                    img, lbl, 16, 16, 3, 16, 16, "x").SerializeToString())
        pattern = str(recs / "t-*")
        ck = str(tmp_path / "ck")
        rc = cli_main(["train", "--records", pattern, "--mode", "tifarr",
                       "--classes", "2", "--channels", "3",
                       "--features", "4", "--levels", "1",
                       "--image-size", "16", "--batch-size", "8",
                       "--steps", "2", "--workers", "1",
                       "--checkpoint", ck])
        assert rc == 0
        rc = cli_main(["eval", "--records", pattern,
                       "--checkpoint", ck, "--mode", "tifarr",
                       "--classes", "2", "--channels", "3",
                       "--features", "4", "--levels", "1",
                       "--image-size", "16", "--batch-size", "8",
                       "--quantize", "int8-static",
                       "--calibrate-records", pattern,
                       "--calibrate-batches", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "calibrated activation scales" in out
        assert "miou" in out.lower()
