"""Trainer + input-feed tests on the virtual 8-device CPU mesh:
end-to-end TFRecords -> feed -> sharded train step, loss decrease on a
learnable toy task, checkpoint round-trip, mesh shardings."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_image_segmentation_tpu.models.unet import UNet
from dl_image_segmentation_tpu.parallel.sharding import (
    make_mesh, param_shardings)
from dl_image_segmentation_tpu.pipeline.input import (DevicePrefetcher,
                                                      TFRecordFeed)
from dl_image_segmentation_tpu.train.trainer import (TrainConfig, Trainer,
                                                     masked_xent_loss)
from dl_image_segmentation_tpu.records.writers import images_to_tfrecords_mt
from dl_image_segmentation_tpu.raster.image import encode_png


def make_learnable_dataset(root, n=16, size=32):
    """Chips where the label is derived from the red channel -- a task
    the U-Net can actually learn in a few steps."""
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for i in range(n):
        key = f"{size}:0:10.0:43:{i}:100"
        fn = key.replace(":", "#") + ".png"
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        lbl = (img[:, :, 0] > 128).astype(np.uint8)
        with open(os.path.join(root, "images", fn), "wb") as f:
            f.write(encode_png(img))
        with open(os.path.join(root, "labels", fn), "wb") as f:
            f.write(encode_png(lbl[:, :, None]))


class TestUNet:
    def test_forward_shapes(self):
        m = UNet(num_classes=3, base_features=8, levels=2)
        x = jnp.zeros((2, 32, 32, 4))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        y = m.apply({"params": params}, x)
        assert y.shape == (2, 32, 32, 3)
        assert y.dtype == jnp.float32


class TestLoss:
    def test_nodata_masking(self):
        logits = jnp.zeros((1, 4, 4, 2))
        labels = jnp.full((1, 4, 4), 255, jnp.int32)
        labels = labels.at[0, 0, 0].set(1)
        loss, acc = masked_xent_loss(logits, labels, 255)
        # only one valid pixel; uniform logits -> loss = log(2)
        np.testing.assert_allclose(float(loss), np.log(2), rtol=1e-5)

    def test_all_nodata_finite(self):
        logits = jnp.zeros((1, 4, 4, 2))
        labels = jnp.full((1, 4, 4), 255, jnp.int32)
        loss, _ = masked_xent_loss(logits, labels, 255)
        assert np.isfinite(float(loss))

    def test_class_weights(self):
        # class 0 well-predicted, class 1 badly-predicted: upweighting
        # class 1 must raise the loss; weight 0 on class 1 must reduce
        # it to the class-0-only loss; uniform weights == unweighted
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
        logits = logits.at[..., 0].add(3.0)  # favor class 0 everywhere
        labels = jnp.asarray(
            (np.arange(16).reshape(1, 4, 4) % 2).astype(np.int32))
        base, acc = masked_xent_loss(logits, labels, 255)
        uniform, _ = masked_xent_loss(logits, labels, 255,
                                      class_weights=jnp.ones(2))
        np.testing.assert_allclose(float(uniform), float(base), rtol=1e-6)
        up1, _ = masked_xent_loss(logits, labels, 255,
                                  class_weights=jnp.asarray([1.0, 9.0]))
        assert float(up1) > float(base)
        only0, _ = masked_xent_loss(logits, labels, 255,
                                    class_weights=jnp.asarray([1.0, 0.0]))
        mask0 = labels == 0
        logp = jax.nn.log_softmax(logits, axis=-1)[..., 0]
        expected = -float(jnp.sum(jnp.where(mask0, logp, 0.0))
                          / jnp.sum(mask0))
        np.testing.assert_allclose(float(only0), expected, rtol=1e-5)

    def test_trainer_rejects_wrong_weight_count(self):
        from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                             Trainer)
        with pytest.raises(ValueError, match="class_weights"):
            Trainer(TrainConfig(num_classes=3, class_weights=(1.0, 2.0),
                                base_features=4, levels=1, image_size=8,
                                batch_size=8))


class TestMesh:
    def test_mesh_and_shardings(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 devices"
        mesh = make_mesh(n_data=4, n_model=2)
        assert mesh.shape == {"data": 4, "model": 2}
        m = UNet(num_classes=2, base_features=16, levels=2)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
        shardings = param_shardings(mesh, params, tp_min_features=64)
        leaves = jax.tree_util.tree_leaves(shardings)
        assert len(leaves) > 0
        # at least one wide conv kernel should be model-sharded
        specs = [s.spec for s in leaves]
        assert any(spec != jax.sharding.PartitionSpec() for spec in specs)


class TestTrainerEndToEnd:
    def test_loss_decreases_on_learnable_task(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_learnable_dataset(root, n=16, size=32)
        images_to_tfrecords_mt("train", root, out, num_shards=2,
                               num_threads=1, store_as_array=False)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8,
                          learning_rate=3e-3)
        trainer = Trainer(cfg)
        feed = TFRecordFeed(os.path.join(out, "train-*"), "rgbraw",
                            batch_size=8, image_size=32,
                            shuffle_buffer=8, num_workers=2)
        losses = []
        it = iter(DevicePrefetcher(feed.batches(), trainer.place_batch))
        for step in range(30):
            images, labels = next(it)
            metrics = trainer.train_step(images, labels)
            losses.append(metrics["loss"])
        assert losses[-1] < losses[0] * 0.7, losses[::10]
        stats = trainer.throughput_stats()
        assert stats["examples_per_sec"] > 0
        assert 0 < stats["duty_cycle"] <= 1.0

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=4)
        trainer = Trainer(cfg)
        rng = np.random.RandomState(0)
        # batch must be divisible by the data-axis size (8 devices)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        trainer.train_step(imgs, lbls)
        ck = str(tmp_path / "ckpt")
        trainer.save_checkpoint(ck)
        step_before = int(trainer.state.step)
        p_before = jax.tree_util.tree_leaves(trainer.state.params)[0]
        trainer2 = Trainer(cfg)
        trainer2.restore_checkpoint(ck)
        assert int(trainer2.state.step) == step_before
        p_after = jax.tree_util.tree_leaves(trainer2.state.params)[0]
        np.testing.assert_array_equal(np.asarray(p_before),
                                      np.asarray(p_after))

    def test_model_sharded_training_runs(self, tmp_path):
        """dp=4 x tp=2 mesh: one step executes with sharded params."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=32,
                          levels=2, image_size=32, batch_size=8, n_model=2)
        trainer = Trainer(cfg)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        m = trainer.train_step(imgs, lbls)
        assert np.isfinite(m["loss"])


class TestFeed:
    def test_feed_modes_and_shapes(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_learnable_dataset(root, n=8, size=32)
        images_to_tfrecords_mt("t", root, out, num_shards=1,
                               num_threads=1, store_as_array=True)
        feed = TFRecordFeed(os.path.join(out, "t-*"), "rgbarr",
                            batch_size=4, image_size=32, shuffle_buffer=4,
                            num_workers=1, repeat=False)
        batches = list(feed.batches())
        assert len(batches) == 2
        imgs, lbls = batches[0]
        assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.float32
        assert imgs.max() <= 1.0
        assert lbls.shape == (4, 32, 32) and lbls.dtype == np.int32
        assert feed.records_read == 8

    def test_feed_truncated_shard_fails_loudly(self, tmp_path):
        """An IO error mid-shard (truncated file) must raise in the
        consumer, not strand it waiting for a worker sentinel."""
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_learnable_dataset(root, n=8, size=32)
        images_to_tfrecords_mt("t", root, out, num_shards=1, num_threads=1)
        shard = os.path.join(out, sorted(os.listdir(out))[0])
        sz = os.path.getsize(shard)
        with open(shard, "r+b") as f:
            f.truncate(sz - 7)  # cut into the last record's payload
        feed = TFRecordFeed(os.path.join(out, "t-*"), "rgbraw",
                            batch_size=2, repeat=False, num_workers=2,
                            shuffle_buffer=1)
        with pytest.raises(IOError, match="truncated"):
            list(feed.batches())

    def test_feed_skips_and_counts_corrupt_record(self, tmp_path):
        """A CRC-damaged PNG inside one record must be skipped and
        counted (raw-bytes translation only header-sniffs, so the
        corruption reaches the feed); the remaining records flow."""
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_learnable_dataset(root, n=4, size=32)
        victim = os.path.join(root, "images",
                              sorted(os.listdir(
                                  os.path.join(root, "images")))[0])
        data = bytearray(open(victim, "rb").read())
        data[29] ^= 0x01  # IHDR CRC byte; header fields intact, so
        open(victim, "wb").write(bytes(data))  # raw-mode sniff passes
        images_to_tfrecords_mt("t", root, out, num_shards=1,
                               num_threads=1)
        feed = TFRecordFeed(os.path.join(out, "t-*"), "rgbraw",
                            batch_size=1, repeat=False, num_workers=2,
                            shuffle_buffer=1)
        batches = list(feed.batches())
        assert len(batches) == 3  # 4 records, 1 corrupt
        assert feed._parse_failures == 1

    def test_feed_no_repeat_stops(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_learnable_dataset(root, n=4, size=32)
        images_to_tfrecords_mt("t", root, out, num_shards=1, num_threads=1)
        feed = TFRecordFeed(os.path.join(out, "t-*"), "rgbraw",
                            batch_size=2, repeat=False, num_workers=2,
                            shuffle_buffer=1)
        assert len(list(feed.batches())) == 2


class TestScannedTraining:
    def test_pool_scan_learns(self):
        """Device-resident pool + K-step scan: loss decreases on a
        learnable mapping (label = red channel threshold)."""
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (64, 32, 32, 3), np.uint8)
        lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8)
        trainer = Trainer(cfg)
        first = trainer.train_scanned(pool, total_steps=5,
                                      steps_per_dispatch=5)
        out = trainer.train_scanned(pool, total_steps=40,
                                    steps_per_dispatch=20)
        assert out["loss"] < first["loss"] * 0.8
        assert int(trainer.state.step) == 45

    def test_scan_photometric_augment(self):
        """Scan-mode training with photometric-only augmentation (the
        --augment-contrast/--augment-brightness CLI combination) runs
        and still learns; cfg.augment_geometric=False keeps dihedral
        ops out of the trace."""
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(7)
        imgs = rng.randint(0, 255, (64, 32, 32, 3), np.uint8)
        lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8,
                          augment_geometric=False,
                          augment_brightness=0.1, augment_contrast=0.2,
                          augment_invert=0.1)
        trainer = Trainer(cfg)
        first = trainer.train_scanned(pool, total_steps=5,
                                      steps_per_dispatch=5, augment=True)
        out = trainer.train_scanned(pool, total_steps=40,
                                    steps_per_dispatch=20, augment=True)
        assert np.isfinite(out["loss"])
        assert out["loss"] < first["loss"]

    def test_pool_refresh(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 255, (16, 8, 8, 3), np.uint8)
        lbls = rng.randint(0, 2, (16, 8, 8)).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        new_imgs = np.full((4, 8, 8, 3), 7, np.uint8)
        new_lbls = np.ones((4, 8, 8), np.uint8)
        pool.refresh(new_imgs, new_lbls, offset=2)
        got = np.asarray(pool.images)
        np.testing.assert_array_equal(got[2:6], new_imgs)
        np.testing.assert_array_equal(got[:2], imgs[:2])

    def test_pool_from_feed(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(2)

        def gen():
            for _ in range(10):
                yield (rng.randint(0, 255, (4, 8, 8, 3), np.uint8),
                       rng.randint(0, 2, (4, 8, 8)).astype(np.uint8))

        pool = DeviceDataPool.from_feed(gen(), 12)
        assert pool.size == 12
        # pool keeps the source dtype; the scan step normalizes via
        # the single dtype-dispatch rule (trainer.normalize_images)
        assert pool.images.dtype == jnp.uint8

    def test_pool_refresh_larger_than_pool_rejected(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(3)
        imgs = rng.randint(0, 255, (8, 8, 8, 3), np.uint8)
        lbls = rng.randint(0, 2, (8, 8, 8)).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        with pytest.raises(ValueError, match="larger than the pool"):
            pool.refresh(np.zeros((16, 8, 8, 3), np.uint8),
                         np.zeros((16, 8, 8), np.uint8))

    def test_uint16_pool_keeps_source_dtype(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        imgs = np.zeros((4, 8, 8, 2), np.uint16)
        lbls = np.zeros((4, 8, 8), np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        assert pool.images.dtype == jnp.uint16

    def test_pool_scan_uint8_matches_prescaled_float(self):
        """Scanned training from a uint8 pool is bitwise-identical to
        the same run from a pre-scaled float32 pool: the normalization
        contract lives only in normalize_images."""
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(6)
        imgs = rng.randint(0, 255, (16, 32, 32, 3), np.uint8)
        lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=4)

        def run(pool_imgs):
            pool = DeviceDataPool(pool_imgs, lbls)
            tr = Trainer(cfg)
            tr.train_scanned(pool, total_steps=4, steps_per_dispatch=2,
                             seed=7)
            return tr.state.params

        p_u8 = run(imgs)
        p_f32 = run(imgs.astype(np.float32) / 255.0)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), p_u8, p_f32)

    def test_train_scanned_zero_steps_no_crash(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(4)
        imgs = rng.randint(0, 255, (8, 32, 32, 3), np.uint8)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=4)
        out = Trainer(cfg).train_scanned(pool, total_steps=0)
        assert np.isnan(out["loss"])  # explicit "no steps ran" value

    def test_duty_cycle_lower_discounts_feed_time(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        import time as _time
        rng = np.random.RandomState(5)
        imgs = rng.randint(0, 255, (16, 32, 32, 3), np.uint8)
        lbls = rng.randint(0, 2, (16, 32, 32)).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=4)
        trainer = Trainer(cfg)

        def slow_feed():
            while True:
                _time.sleep(0.05)
                yield (rng.randint(0, 255, (4, 32, 32, 3), np.uint8),
                       rng.randint(0, 2, (4, 32, 32)).astype(np.uint8))

        out = trainer.train_scanned(pool, total_steps=6,
                                    steps_per_dispatch=2,
                                    refresh_feed=slow_feed())
        assert out["feed_seconds"] > 0.1
        assert out["duty_cycle_lower"] < out["duty_cycle"]


class TestEvalAndPredict:
    def test_miou_known_values(self):
        from dl_image_segmentation_tpu.train.trainer import masked_miou
        pred = jnp.array([[0, 0, 1, 1]])
        lbls = jnp.array([[0, 1, 1, 255]])
        # class0: inter 1 union 2 -> 0.5; class1: inter 1 union 2 -> 0.5
        miou = masked_miou(pred, lbls, 2, 255)
        np.testing.assert_allclose(float(miou), 0.5, rtol=1e-6)

    def test_miou_absent_class_ignored(self):
        from dl_image_segmentation_tpu.train.trainer import masked_miou
        pred = jnp.array([[0, 0]])
        lbls = jnp.array([[0, 0]])
        miou = masked_miou(pred, lbls, 3, 255)
        np.testing.assert_allclose(float(miou), 1.0)

    def test_evaluate_and_predict(self):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=1, image_size=16, batch_size=8)
        tr = Trainer(cfg)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)
        out = tr.evaluate([(imgs, lbls)])
        assert set(out) == {"loss", "accuracy", "miou", "batches",
                            "per_class_iou", "per_class_f1"}
        assert out["batches"] == 1
        p = tr.predict(imgs)
        assert p.shape == (8, 16, 16) and p.dtype == np.int32
        assert set(np.unique(p)) <= {0, 1}

    def test_evaluate_batch_size_invariant(self):
        """Dataset mIoU/accuracy/loss must not depend on how the
        dataset is split into batches (confusion-matrix accumulation,
        not per-batch-mean averaging)."""
        cfg = TrainConfig(num_classes=3, in_channels=3, base_features=8,
                          levels=1, image_size=16, batch_size=8)
        tr = Trainer(cfg)
        rng = np.random.RandomState(1)
        imgs = rng.rand(16, 16, 16, 3).astype(np.float32)
        lbls = rng.randint(0, 3, (16, 16, 16)).astype(np.int32)
        # skew class balance across batches: the old per-batch mean
        # weighted the rare class's batches wrongly
        lbls[:4] = np.where(lbls[:4] == 2, 2, 0)
        lbls[4:] = np.where(lbls[4:] == 2, 1, lbls[4:])
        one = tr.evaluate([(imgs, lbls)])
        four = tr.evaluate([(imgs[i:i + 4], lbls[i:i + 4])
                            for i in range(0, 16, 4)])
        ragged = tr.evaluate([(imgs[:5], lbls[:5]),
                              (imgs[5:11], lbls[5:11]),
                              (imgs[11:], lbls[11:])])
        for k in ("loss", "accuracy", "miou"):
            np.testing.assert_allclose(one[k], four[k], rtol=1e-5)
            np.testing.assert_allclose(one[k], ragged[k], rtol=1e-5)
        np.testing.assert_allclose(one["per_class_iou"],
                                   four["per_class_iou"], rtol=1e-5)

    def test_evaluate_per_class_metrics(self):
        """per_class_iou/f1 come from the dataset confusion matrix:
        miou is the mean over present classes, absent classes report
        None, and a class the model never predicts but that exists in
        the labels still gets a (zero-ish) score, not None."""
        cfg = TrainConfig(num_classes=4, in_channels=3, base_features=8,
                          levels=1, image_size=16, batch_size=8)
        tr = Trainer(cfg)
        rng = np.random.RandomState(3)
        imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
        # class 3 never appears in the labels; an untrained model on
        # random inputs essentially never predicts a fixed class either,
        # but PRESENCE in labels alone must keep classes 0-2 scored
        lbls = rng.randint(0, 3, (8, 16, 16)).astype(np.int32)
        out = tr.evaluate([(imgs, lbls)])
        iou, f1 = out["per_class_iou"], out["per_class_f1"]
        assert len(iou) == 4 and len(f1) == 4
        preds = tr.predict(imgs)
        for k in range(3):
            assert iou[k] is not None and 0.0 <= iou[k] <= 1.0
            assert f1[k] is not None and 0.0 <= f1[k] <= 1.0
        if 3 not in preds:  # class 3 absent from labels AND predictions
            assert iou[3] is None and f1[3] is None
        present = [v for v in iou if v is not None]
        np.testing.assert_allclose(out["miou"], np.mean(present),
                                   rtol=1e-6)
        # hand-check one class against a numpy confusion matrix
        valid = lbls != cfg.label_nodata
        tp = np.sum((preds == 0) & (lbls == 0) & valid)
        fp = np.sum((preds == 0) & (lbls != 0) & valid)
        fn = np.sum((preds != 0) & (lbls == 0) & valid)
        np.testing.assert_allclose(iou[0], tp / (tp + fp + fn),
                                   rtol=1e-6)
        np.testing.assert_allclose(f1[0], 2 * tp / (2 * tp + fp + fn),
                                   rtol=1e-6)

    def test_predict_sharded_matches_any_batch_size(self):
        """predict shards host batches over the data axis (padding the
        remainder) -- results must be identical for any batch split,
        including sizes not divisible by the 8-device mesh."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=1, image_size=16, batch_size=8)
        tr = Trainer(cfg)
        rng = np.random.RandomState(2)
        imgs = rng.rand(11, 16, 16, 3).astype(np.float32)
        whole = tr.predict(imgs)
        assert whole.shape == (11, 16, 16)
        parts = np.concatenate([tr.predict(imgs[:3]),
                                tr.predict(imgs[3:])])
        np.testing.assert_array_equal(whole, parts)
        # eval inputs actually land sharded over "data", not replicated
        padded, lbl_p, n = tr._pad_to_data_axis(
            imgs, rng.randint(0, 2, (11, 16, 16)).astype(np.int32))
        assert n == 11 and padded.shape[0] == 16
        from dl_image_segmentation_tpu.parallel.sharding import (
            shard_batch_local)
        placed = shard_batch_local(tr.mesh, padded)
        assert not placed.sharding.is_fully_replicated


class TestPrecisionPolicy:
    def test_bf16_matches_fp32_trajectory(self):
        """bf16 compute / fp32 params must track the fp32 loss
        trajectory on the learnable task within bf16 tolerance, and
        params stay float32 in both modes (checkpoint compatibility)."""
        rng = np.random.RandomState(0)
        imgs = rng.rand(16, 16, 16, 3).astype(np.float32)
        lbls = (imgs[:, :, :, 0] > 0.5).astype(np.int32)

        def run(precision):
            cfg = TrainConfig(num_classes=2, in_channels=3,
                              base_features=8, levels=1, image_size=16,
                              batch_size=8, learning_rate=3e-3,
                              precision=precision, seed=0)
            tr = Trainer(cfg)
            p = jax.tree_util.tree_leaves(tr.state.params)[0]
            assert p.dtype == jnp.float32
            losses = []
            for step in range(12):
                i = (step * 8) % 16
                m = tr.train_step(imgs[i:i + 8], lbls[i:i + 8])
                losses.append(m["loss"])
            return np.array(losses)

        l32 = run("fp32")
        l16 = run("bf16")
        assert l32[-1] < l32[0] * 0.8  # the task is actually learned
        assert l16[-1] < l16[0] * 0.8
        np.testing.assert_allclose(l16, l32, rtol=0.08, atol=0.02)

    def test_unknown_precision_rejected(self):
        with pytest.raises(ValueError, match="precision"):
            Trainer(TrainConfig(num_classes=2, in_channels=3,
                                base_features=8, levels=1, image_size=16,
                                batch_size=8, precision="fp16"))


class TestRotateAugment:
    def test_rotation_preserves_alignment_and_fill(self):
        from dl_image_segmentation_tpu.ops.augment import (
            random_rotate_pairs)
        imgs = np.zeros((4, 17, 17, 1), np.float32)
        imgs[:, 4:13, 4:13, 0] = 1.0
        lbls = np.zeros((4, 17, 17), np.int32)
        lbls[:, 4:13, 4:13] = 1
        ri, rl = random_rotate_pairs(jax.random.PRNGKey(3),
                                     jnp.asarray(imgs), jnp.asarray(lbls),
                                     max_degrees=45.0, fill_label=255)
        ri = np.asarray(ri)
        rl = np.asarray(rl)
        assert ri.shape == imgs.shape and rl.shape == lbls.shape
        # centre pixel of the square stays in class 1
        assert (rl[:, 8, 8] == 1).all()
        # image/label agreement away from interpolation boundaries
        interior = ri[:, :, :, 0] > 0.99
        assert (rl[interior] == 1).all()


class TestManagedCheckpoints:
    def test_rotation_and_resume(self, tmp_path):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=1, image_size=16, batch_size=8)
        tr = Trainer(cfg)
        mgr = tr.checkpoint_manager(str(tmp_path / "ckpts"), keep=2)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)
        saved = []
        for _ in range(3):
            tr.train_step(imgs, lbls)
            saved.append(tr.save_managed(mgr))
        assert saved == [1, 2, 3]
        assert sorted(mgr.all_steps()) == [2, 3]  # keep=2 rotated
        tr2 = Trainer(cfg)
        mgr2 = tr2.checkpoint_manager(str(tmp_path / "ckpts"), keep=2)
        step = tr2.restore_latest(mgr2)
        assert step == 3 and int(tr2.state.step) == 3
        p1 = jax.tree_util.tree_leaves(tr.state.params)[0]
        p2 = jax.tree_util.tree_leaves(tr2.state.params)[0]
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_restore_latest_empty(self, tmp_path):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=1, image_size=16, batch_size=8)
        tr = Trainer(cfg)
        mgr = tr.checkpoint_manager(str(tmp_path / "none"))
        assert tr.restore_latest(mgr) is None


class TestDeepLab:
    def test_forward_shapes(self):
        from dl_image_segmentation_tpu.models.deeplab import DeepLabLite
        m = DeepLabLite(num_classes=3, base_features=8, aspp_features=16)
        x = jnp.zeros((2, 32, 32, 4))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        y = m.apply({"params": params}, x)
        assert y.shape == (2, 32, 32, 3)
        assert y.dtype == jnp.float32

    def test_trains_via_trainer(self):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          image_size=32, batch_size=8, model="deeplab")
        tr = Trainer(cfg)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = (imgs[:, :, :, 0] > 0.5).astype(np.int32)
        losses = [tr.train_step(imgs, lbls)["loss"] for _ in range(15)]
        assert losses[-1] < losses[0]

    def test_unknown_model_rejected(self):
        with pytest.raises(ValueError, match="unknown model"):
            Trainer(TrainConfig(model="transformer9000"))


class TestDevicePrefetcher:
    def test_exception_propagates(self):
        def bad_gen():
            yield (np.zeros((1, 4, 4, 1), np.float32),
                   np.zeros((1, 4, 4), np.int32))
            raise RuntimeError("boom from source")

        pf = DevicePrefetcher(bad_gen(), lambda a, b: (a, b))
        it = iter(pf)
        next(it)
        with pytest.raises(RuntimeError, match="boom from source"):
            next(it)

    def test_stops_cleanly(self):
        def gen():
            for _ in range(3):
                yield (np.zeros((1, 2, 2, 1), np.float32),
                       np.zeros((1, 2, 2), np.int32))

        pf = DevicePrefetcher(gen(), lambda a, b: (a, b))
        assert len(list(pf)) == 3

    def test_close_unblocks_fill_on_early_stop(self):
        # An endless source with the consumer stopping after one batch:
        # close() must terminate the fill thread (it would otherwise
        # block forever on the bounded queue).
        def endless():
            while True:
                yield (np.zeros((1, 2, 2, 1), np.float32),
                       np.zeros((1, 2, 2), np.int32))

        pf = DevicePrefetcher(endless(), lambda a, b: (a, b), depth=2)
        next(iter(pf))
        pf.close()
        assert not pf.thread.is_alive()

    def test_context_manager_closes(self):
        def endless():
            while True:
                yield (np.zeros((1, 2, 2, 1), np.float32),
                       np.zeros((1, 2, 2), np.int32))

        with DevicePrefetcher(endless(), lambda a, b: (a, b)) as pf:
            next(iter(pf))
        assert not pf.thread.is_alive()


    def test_next_after_exhaustion_raises_again(self):
        """Regression: next() after the StopIteration sentinel used to
        block forever on the dead queue."""
        def gen():
            yield (np.zeros((1, 2, 2, 1), np.float32),
                   np.zeros((1, 2, 2), np.int32))

        pf = DevicePrefetcher(gen(), lambda a, b: (a, b))
        it = iter(pf)
        next(it)
        with pytest.raises(StopIteration):
            next(it)
        with pytest.raises(StopIteration):  # and again, without hanging
            next(it)


class TestAsyncStep:
    def test_train_step_async_defers_sync(self):
        """train_step_async returns device metrics without host sync;
        values are fetched only when read (duty-friendly stepping for
        directly-attached chips)."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8)
        tr = Trainer(cfg)
        rng = np.random.RandomState(0)
        imgs, lbls = tr.place_batch(
            rng.rand(8, 32, 32, 3).astype(np.float32),
            rng.randint(0, 2, (8, 32, 32)).astype(np.int32))
        m1 = tr.train_step_async(imgs, lbls)
        m2 = tr.train_step_async(imgs, lbls)
        assert float(m2["loss"]) <= float(m1["loss"]) * 5  # finite, sane
        assert int(tr.state.step) == 2
        assert tr.examples_seen == 16


class TestSpatialPartitioning:
    def test_spatial_sharded_training_runs(self):
        """dp=2 x sp=4 mesh: the image height is sharded over the
        model axis and GSPMD spatially partitions the convs (halo
        exchange); one step executes and the loss is finite."""
        from dl_image_segmentation_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(n_data=2, n_model=4)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=64, batch_size=4,
                          n_model=4, spatial=True)
        tr = Trainer(cfg, mesh=mesh)
        rng = np.random.RandomState(0)
        imgs = rng.rand(4, 64, 64, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (4, 64, 64)).astype(np.int32)
        m = tr.train_step(imgs, lbls)
        assert np.isfinite(m["loss"])
        # params are replicated; the placed batch is height-sharded
        pi, _ = tr.place_batch(imgs, lbls)
        spec = pi.sharding.spec
        assert spec[0] == "data" and spec[1] == "model"

    def test_spatial_matches_unsharded_loss(self):
        """The spatially partitioned step computes the SAME numbers as
        plain DP (GSPMD partitioning is an implementation detail)."""
        rng = np.random.RandomState(1)
        imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (4, 32, 32)).astype(np.int32)
        from dl_image_segmentation_tpu.parallel.sharding import make_mesh
        cfg_a = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                            levels=2, image_size=32, batch_size=4,
                            n_model=2, spatial=True)
        tr_a = Trainer(cfg_a, mesh=make_mesh(n_data=2, n_model=2))
        cfg_b = dataclasses.replace(cfg_a, n_model=1, spatial=False)
        tr_b = Trainer(cfg_b, mesh=make_mesh(n_data=4, n_model=1))
        la = tr_a.train_step(imgs, lbls)["loss"]
        lb = tr_b.train_step(imgs, lbls)["loss"]
        np.testing.assert_allclose(la, lb, rtol=2e-5)


class TestFSDP:
    def test_params_and_moments_stored_sharded(self):
        """fsdp=True: large conv kernels live sharded over "data"
        (ZeRO-3 storage); after one donated step the optimizer moments
        follow. Small leaves (biases, norm scales) stay replicated."""
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=16,
                          levels=2, image_size=32, batch_size=8,
                          fsdp=True)
        tr = Trainer(cfg)
        flat, _ = jax.tree_util.tree_flatten_with_path(tr.state.params)
        sharded = {jax.tree_util.keystr(path): leaf
                   for path, leaf in flat
                   if not leaf.sharding.is_fully_replicated}
        assert sharded, "no kernel was fsdp-sharded"
        for name, leaf in sharded.items():
            assert leaf.sharding.spec[-1] == "data", (name,
                                                      leaf.sharding.spec)
            assert leaf.size >= 16384  # only big kernels pay a gather
        # biases stay replicated
        biases = [leaf for path, leaf in flat if leaf.ndim == 1]
        assert biases and all(b.sharding.is_fully_replicated
                              for b in biases)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        m = tr.train_step(imgs, lbls)
        assert np.isfinite(m["loss"])
        # params kept their storage sharding through the donated step
        flat2, _ = jax.tree_util.tree_flatten_with_path(tr.state.params)
        for path, leaf in flat2:
            key = jax.tree_util.keystr(path)
            if key in sharded:
                assert leaf.sharding.spec[-1] == "data", key
        # the adam moments of sharded params are sharded too (the
        # memory claim is the point of fsdp)
        mu_leaves = [leaf for path, leaf in
                     jax.tree_util.tree_flatten_with_path(
                         tr.state.opt_state)[0]
                     if hasattr(leaf, "ndim") and leaf.ndim == 4
                     and leaf.size >= 16384]
        assert mu_leaves
        assert any(not leaf.sharding.is_fully_replicated
                   for leaf in mu_leaves)

    def test_fsdp_matches_plain_dp_loss(self):
        """FSDP is a storage layout, not a numerics change: the step
        computes the same loss as plain DP."""
        rng = np.random.RandomState(1)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        cfg_a = TrainConfig(num_classes=2, in_channels=3,
                            base_features=16, levels=2, image_size=32,
                            batch_size=8, precision="fp32", fsdp=True)
        cfg_b = dataclasses.replace(cfg_a, fsdp=False)
        la = [Trainer(cfg_a).train_step(imgs, lbls)["loss"]
              for _ in range(1)][0]
        lb = Trainer(cfg_b).train_step(imgs, lbls)["loss"]
        np.testing.assert_allclose(la, lb, rtol=2e-6)

    def test_fsdp_composes_with_channel_tp(self):
        """A kernel wide enough for both shards cout over
        ("model", "data"); a dp=4 x tp=2 fsdp step executes."""
        from dl_image_segmentation_tpu.models.unet import UNet
        from dl_image_segmentation_tpu.parallel.sharding import (
            make_mesh, param_shardings)
        mesh = make_mesh(n_data=4, n_model=2)
        m = UNet(num_classes=2, base_features=32, levels=2)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
        sh = param_shardings(mesh, params, tp_min_features=64,
                             fsdp=True, fsdp_min_size=16384)
        specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
        assert any(s and s[-1] == ("model", "data") for s in specs), specs
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=16,
                          levels=2, image_size=32, batch_size=8,
                          n_model=2, fsdp=True)
        tr = Trainer(cfg, mesh=mesh)
        rng = np.random.RandomState(2)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        assert np.isfinite(tr.train_step(imgs, lbls)["loss"])


class TestSegFormer:
    def test_forward_shapes(self):
        from dl_image_segmentation_tpu.models.segformer import SegFormerLite
        m = SegFormerLite(num_classes=3, base_features=8,
                          decoder_dim=32)
        x = jnp.zeros((2, 64, 64, 4))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        y = m.apply({"params": params}, x)
        assert y.shape == (2, 64, 64, 3)
        assert y.dtype == jnp.float32

    def test_learns_toy_task(self):
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          image_size=64, batch_size=8, model="segformer",
                          learning_rate=3e-3)
        tr = Trainer(cfg)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
        lbls = (imgs[:, :, :, 0] > 0.5).astype(np.int32)
        losses = [tr.train_step(imgs, lbls)["loss"] for _ in range(20)]
        assert losses[-1] < losses[0]

    def test_sharded_step_runs(self):
        from dl_image_segmentation_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = TrainConfig(num_classes=2, in_channels=3,
                          base_features=16, image_size=64, batch_size=8,
                          model="segformer", n_model=2)
        tr = Trainer(cfg, mesh=mesh)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 64, 64)).astype(np.int32)
        assert np.isfinite(tr.train_step(imgs, lbls)["loss"])


class TestShardedCheckpoint:
    def test_sharded_save_restore_preserves_values_and_shardings(
            self, tmp_path):
        """Checkpoint round-trip with model-sharded params: values
        identical and the restored arrays carry the mesh shardings."""
        from dl_image_segmentation_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(n_data=4, n_model=2)
        # base_features=128, levels=2 -> widest stage 256 channels,
        # which crosses the tp_min_features=256 sharding threshold
        cfg = TrainConfig(num_classes=2, in_channels=3,
                          base_features=128, levels=2, image_size=32,
                          batch_size=8, n_model=2)
        tr = Trainer(cfg, mesh=mesh)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        tr.train_step(imgs, lbls)
        ck = str(tmp_path / "ck")
        tr.save_checkpoint(ck)
        tr2 = Trainer(cfg, mesh=make_mesh(n_data=4, n_model=2))
        tr2.restore_checkpoint(ck)
        a = jax.tree_util.tree_leaves(tr.state.params)
        b = jax.tree_util.tree_leaves(tr2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # restored params keep their MESH shardings (restoring into
        # concrete arrays used to silently replicate everything): the
        # wide conv kernels must come back model-sharded
        assert any("model" in str(x.sharding.spec) for x in b)
        # restored trainer keeps training
        m = tr2.train_step(imgs, lbls)
        assert np.isfinite(m["loss"])


class TestRemat:
    def test_remat_matches_plain_loss(self):
        """jax.checkpoint changes memory, not math: identical loss."""
        rng = np.random.RandomState(5)
        imgs = rng.rand(8, 32, 32, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 32, 32)).astype(np.int32)
        base = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                           levels=2, image_size=32, batch_size=8)
        la = Trainer(base).train_step(imgs, lbls)["loss"]
        lb = Trainer(dataclasses.replace(base, remat=True)).train_step(
            imgs, lbls)["loss"]
        np.testing.assert_allclose(la, lb, rtol=1e-6)

    def test_remat_scanned_runs(self):
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (16, 32, 32, 3), np.uint8)
        lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=4,
                          remat=True)
        out = Trainer(cfg).train_scanned(pool, total_steps=4,
                                         steps_per_dispatch=4)
        assert np.isfinite(out["loss"])


class TestSpatialScanned:
    def test_spatial_pool_scan_runs(self):
        """Spatial sharding + the K-steps-per-dispatch pool loop."""
        from dl_image_segmentation_tpu.parallel.sharding import make_mesh
        from dl_image_segmentation_tpu.train.pool import DeviceDataPool
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (16, 32, 32, 3), np.uint8)
        lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
        pool = DeviceDataPool(imgs, lbls)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                          levels=2, image_size=32, batch_size=8,
                          n_model=2, spatial=True)
        tr = Trainer(cfg, mesh=make_mesh(n_data=4, n_model=2))
        out = tr.train_scanned(pool, total_steps=4, steps_per_dispatch=4)
        assert np.isfinite(out["loss"])


class TestOddImageSizes:
    def test_unet_odd_size_forward(self):
        import jax
        import jax.numpy as jnp
        from dl_image_segmentation_tpu.models.unet import UNet
        m = UNet(num_classes=2, base_features=4, levels=3)
        x = jnp.zeros((1, 33, 45, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": params}, x)
        assert out.shape == (1, 33, 45, 2)

    def test_deeplab_odd_size_forward(self):
        import jax
        import jax.numpy as jnp
        from dl_image_segmentation_tpu.models.deeplab import DeepLabLite
        m = DeepLabLite(num_classes=3, base_features=4)
        x = jnp.zeros((1, 37, 51, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": params}, x)
        assert out.shape == (1, 37, 51, 3)


class TestDeviceSideNormalization:
    """normalize_images: integer batches ship raw and scale on device
    (trace-time dtype dispatch) with numerics identical to the feed's
    host-side path."""

    def _cfg(self, **kw):
        return TrainConfig(num_classes=2, in_channels=3, base_features=4,
                           levels=1, image_size=16, batch_size=8, seed=0,
                           **kw)

    def test_uint8_step_identical_to_host_scaled(self):
        rng = np.random.RandomState(0)
        imgs8 = rng.randint(0, 255, (8, 16, 16, 3), np.uint8)
        lbls = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)
        t1, t2 = Trainer(self._cfg()), Trainer(self._cfg())
        m1 = t1.train_step(imgs8, lbls)
        m2 = t2.train_step(imgs8.astype(np.float32) / 255.0, lbls)
        # same IEEE ops either side -> bitwise-identical loss and params
        assert m1["loss"] == m2["loss"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            t1.state.params, t2.state.params)

    def test_uint16_step_identical_to_host_scaled(self):
        rng = np.random.RandomState(1)
        imgs16 = rng.randint(0, 65535, (8, 16, 16, 3)).astype(np.uint16)
        lbls = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)
        t1, t2 = Trainer(self._cfg()), Trainer(self._cfg())
        m1 = t1.train_step(imgs16, lbls)
        m2 = t2.train_step(imgs16.astype(np.float32) / 65535.0, lbls)
        assert m1["loss"] == m2["loss"]

    def test_evaluate_and_predict_accept_uint8(self):
        rng = np.random.RandomState(2)
        imgs8 = rng.randint(0, 255, (8, 16, 16, 3), np.uint8)
        lbls = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)
        t = Trainer(self._cfg())
        e8 = t.evaluate([(imgs8, lbls)])
        ef = t.evaluate([(imgs8.astype(np.float32) / 255.0, lbls)])
        assert e8["loss"] == ef["loss"] and e8["miou"] == ef["miou"]
        np.testing.assert_array_equal(
            t.predict(imgs8),
            t.predict(imgs8.astype(np.float32) / 255.0))

    def test_raw_feed_batches_train(self, tmp_path):
        """scale='raw' feed -> uint8 batches -> prefetcher -> step:
        the production CLI path end-to-end."""
        root = str(tmp_path / "chips")
        make_learnable_dataset(root, n=16, size=32)
        out = str(tmp_path / "recs")
        images_to_tfrecords_mt("d", root, out, num_shards=2,
                               num_threads=2, store_as_array=False)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=32, batch_size=8, seed=0)
        trainer = Trainer(cfg)
        feed = TFRecordFeed(os.path.join(out, "d-*"), "rgbraw",
                            batch_size=8, image_size=32,
                            shuffle_buffer=8, num_workers=2,
                            scale="raw")
        with DevicePrefetcher(feed.batches(),
                              trainer.place_batch) as pf:
            it = iter(pf)
            losses = []
            for _ in range(6):
                images, labels = next(it)
                losses.append(trainer.train_step(images, labels)["loss"])
        assert losses[-1] < losses[0]


class TestFeedRobustness:
    def test_prefetcher_exception_then_stopiteration(self):
        """After the fill thread dies delivering an exception, a
        caller that catches it and calls next() again must get
        StopIteration, not block forever on the dead queue."""
        def bad_batches():
            yield (np.zeros((2, 4, 4, 3), np.float32),
                   np.zeros((2, 4, 4), np.int32))
            raise IOError("truncated shard")

        pf = DevicePrefetcher(bad_batches(), lambda *b: b)
        next(pf)
        with pytest.raises(IOError, match="truncated"):
            while True:
                next(pf)
        with pytest.raises(StopIteration):
            next(pf)
        pf.close()

    def test_feed_verify_crc_catches_payload_corruption(self, tmp_path):
        """Array-mode payload corruption reshapes cleanly and trains
        silently by default; verify_crc=True must fail loudly."""
        from dl_image_segmentation_tpu.records.writers import (
            images_to_tfrecords_mt)
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_learnable_dataset(root, n=4, size=32)
        images_to_tfrecords_mt("t", root, out, num_shards=1,
                               num_threads=1, store_as_array=True)
        shard = os.path.join(out, sorted(os.listdir(out))[0])
        data = bytearray(open(shard, "rb").read())
        data[len(data) // 2] ^= 0x01  # flip a payload byte mid-shard
        open(shard, "wb").write(bytes(data))
        feed = TFRecordFeed(os.path.join(out, "t-*"), "rgbarr",
                            batch_size=1, repeat=False, num_workers=2,
                            shuffle_buffer=1, verify_crc=True)
        with pytest.raises(IOError, match="corrupt record"):
            list(feed.batches())

    def test_distributed_env_vars_forwarded(self, monkeypatch):
        """COORDINATOR_ADDRESS / DLSEG_* env vars must reach
        jax.distributed.initialize (JAX itself only reads the
        JAX_-prefixed spellings)."""
        from dl_image_segmentation_tpu.parallel import distributed
        captured = {}
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: captured.update(kw))
        monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:9876")
        monkeypatch.setenv("DLSEG_NUM_PROCESSES", "2")
        monkeypatch.setenv("DLSEG_PROCESS_ID", "1")
        distributed.initialize()
        assert captured == {"coordinator_address": "127.0.0.1:9876",
                            "num_processes": 2, "process_id": 1}

    def test_distributed_single_host_noop(self, monkeypatch):
        from dl_image_segmentation_tpu.parallel import distributed
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("DLSEG_NUM_PROCESSES", raising=False)
        called = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.append(kw))
        distributed.initialize()
        assert called == []
