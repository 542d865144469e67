"""Sliding-window whole-raster inference (pipeline/window.py).

Covers the 1-D origin math, the probability-blending accumulation
(against an independently coded reference), undersized-raster padding,
and the CLI's ``predict --geotiff`` surface end-to-end on CPU.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from dl_image_segmentation_tpu.pipeline.window import (predict_windowed,
                                                       window_origins)


class TestWindowOrigins:
    def test_exact_fit_single_window(self):
        assert window_origins(32, 32, 32) == [0]

    def test_exact_multiple(self):
        assert window_origins(64, 32, 32) == [0, 32]

    def test_clamped_last_window(self):
        # 10 px, size 4, stride 4 -> 0, 4, then clamp to 6 (not 8)
        assert window_origins(10, 4, 4) == [0, 4, 6]

    def test_overlapping_stride(self):
        assert window_origins(8, 4, 2) == [0, 2, 4]

    def test_stride_beyond_window_rejected(self):
        with pytest.raises(ValueError, match="stride"):
            window_origins(64, 32, 33)

    def test_nonpositive_stride_rejected(self):
        with pytest.raises(ValueError, match="stride"):
            window_origins(64, 32, 0)

    def test_extent_below_window_rejected(self):
        with pytest.raises(ValueError, match="smaller"):
            window_origins(16, 32, 32)

    def test_full_coverage_property(self):
        for n in (7, 16, 33, 100):
            for stride in (1, 3, 7):
                covered = np.zeros(n, bool)
                for o in window_origins(n, 7, stride):
                    assert 0 <= o <= n - 7
                    covered[o:o + 7] = True
                assert covered.all()


class _FakeTrainer:
    """Duck-typed trainer whose per-window probability is a constant
    determined by the window's mean pixel value: p(class 0) = mean,
    p(class 1) = 1 - mean. Deterministic, position-sensitive, and easy
    to reproduce independently in the tests below."""

    def __init__(self, size=4, batch_size=3, channels=1):
        self.config = SimpleNamespace(image_size=size,
                                      batch_size=batch_size,
                                      num_classes=2,
                                      in_channels=channels)
        self.calls = []

    def predict_probs(self, batch):
        self.calls.append(batch.shape)
        m = batch.mean(axis=(1, 2, 3))
        n, h, w = batch.shape[:3]
        out = np.zeros((n, h, w, 2), np.float32)
        out[..., 0] = m[:, None, None]
        out[..., 1] = 1.0 - m[:, None, None]
        return out


class TestBlending:
    def test_overlap_average_matches_reference(self):
        rng = np.random.default_rng(7)
        img = rng.random((6, 6, 1), np.float32)
        tr = _FakeTrainer(size=4, batch_size=3)
        got = predict_windowed(tr, img, stride=2, scale="none",
                               probs=True)
        # independent reference: plain accumulation loops
        acc = np.zeros((6, 6, 2))
        cnt = np.zeros((6, 6, 1))
        for r in (0, 2):
            for c in (0, 2):
                m = img[r:r + 4, c:c + 4].mean()
                acc[r:r + 4, c:c + 4] += [m, 1 - m]
                cnt[r:r + 4, c:c + 4] += 1
        np.testing.assert_allclose(got, acc / cnt, rtol=1e-6)
        # blended distributions still sum to 1
        np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-6)
        # class map is the argmax of the BLEND
        cm = predict_windowed(tr, img, stride=2, scale="none")
        np.testing.assert_array_equal(cm, (acc / cnt).argmax(-1))

    def test_batches_keep_one_compiled_shape(self):
        img = np.random.default_rng(0).random((8, 8, 1), np.float32)
        tr = _FakeTrainer(size=4, batch_size=3)
        predict_windowed(tr, img, stride=2, scale="none", probs=True)
        # 3x3 = 9 windows in batches of 3: every dispatch is (3, ...)
        assert tr.calls and all(s[0] == 3 for s in tr.calls)

    def test_undersized_raster_padded_and_cropped(self):
        img = np.random.default_rng(1).random((3, 9, 1), np.float32)
        tr = _FakeTrainer(size=4, batch_size=2)
        out = predict_windowed(tr, img, scale="none", probs=True)
        assert out.shape == (3, 9, 2)
        np.testing.assert_allclose(out.sum(axis=-1), 1.0, atol=1e-6)

    def test_band_mismatch_rejected(self):
        tr = _FakeTrainer(size=4, channels=3)
        with pytest.raises(ValueError, match="bands"):
            predict_windowed(tr, np.zeros((8, 8, 1), np.float32))

    def test_2d_raster_accepted(self):
        tr = _FakeTrainer(size=4, batch_size=2)
        out = predict_windowed(tr, np.zeros((8, 8), np.float32),
                               scale="none")
        assert out.shape == (8, 8)


class TestWindowedRealModel:
    def _trainer(self):
        from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                             Trainer)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=32, batch_size=4,
                          precision="fp32")
        return Trainer(cfg)

    def test_exact_window_matches_direct_predict(self):
        tr = self._trainer()
        img = np.random.default_rng(3).random((32, 32, 3)).astype(
            np.float32)
        windowed = predict_windowed(tr, img, scale="none")
        direct = tr.predict(img[None])[0]
        np.testing.assert_array_equal(windowed, direct)

    def test_cli_geotiff_class_and_prob_maps(self, tmp_path, capsys):
        from dl_image_segmentation_tpu.cli import main as cli_main
        from dl_image_segmentation_tpu.raster.geotiff import (read_geotiff,
                                                              write_geotiff)
        tr = self._trainer()
        ck = str(tmp_path / "ck")
        tr.save_checkpoint(ck)
        gt = (500000.0, 10.0, 0.0, 2105000.0, 0.0, -10.0)
        src = (np.random.default_rng(5).random((48, 80, 3)) * 255
               ).astype(np.uint8)
        big = str(tmp_path / "big.tif")
        write_geotiff(big, src, geotransform=gt, epsg=32643)
        common = ["predict", "--geotiff", big, "--checkpoint", ck,
                  "--classes", "2", "--channels", "3", "--features", "4",
                  "--levels", "1", "--image-size", "32",
                  "--batch-size", "4", "--precision", "fp32",
                  "--stride", "16"]
        out_cls = str(tmp_path / "pred.tif")
        assert cli_main(common + ["--out", out_cls]) == 0
        g = read_geotiff(out_cls)
        assert g.array.squeeze().shape == (48, 80)
        assert g.array.dtype == np.uint8
        assert g.info.epsg == 32643
        assert g.info.geotransform == gt
        assert set(np.unique(g.array)) <= {0, 1}
        assert "windows" in capsys.readouterr().out

        out_probs = str(tmp_path / "probs.tif")
        assert cli_main(common + ["--out", out_probs, "--probs"]) == 0
        pg = read_geotiff(out_probs)
        assert pg.array.dtype == np.float32
        assert pg.array.shape == (48, 80, 2)
        np.testing.assert_allclose(pg.array.sum(axis=2), 1.0, atol=1e-5)
        # the class map is the blend's argmax
        np.testing.assert_array_equal(pg.array.argmax(axis=2),
                                      g.array.squeeze())
