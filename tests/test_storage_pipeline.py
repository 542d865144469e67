"""gs:// threaded through the data plane: shard writing and reading,
chip folders, whole-raster IO, and checkpoints — all against the
in-process fake GCS (STORAGE_EMULATOR_HOST), mirroring the
reference's tf.io.gfile cloud transparency end to end
(_img_to_tf_threaded.py:87-88, _img_to_tf_mp.py:43-44,
parse_tfrecords.ipynb cell 4)."""

import os

import numpy as np
import pytest

from dl_image_segmentation_tpu import storage
from dl_image_segmentation_tpu.pipeline.input import TFRecordFeed
from dl_image_segmentation_tpu.raster.geotiff import (read_geotiff,
                                                      write_geotiff)
from dl_image_segmentation_tpu.records import parsers
from dl_image_segmentation_tpu.records.tfrecord import (TFRecordWriter,
                                                        list_shards,
                                                        read_records)
from dl_image_segmentation_tpu.records.writers import (
    images_to_tfrecords_mp, images_to_tfrecords_mt)
from dl_image_segmentation_tpu.storage.fake_gcs import FakeGCS

from test_writers_parsers import make_png_dataset, make_tif_dataset


@pytest.fixture()
def fake(monkeypatch):
    with FakeGCS() as f:
        monkeypatch.setenv("STORAGE_EMULATOR_HOST", f.host)
        yield f


class TestRemoteShards:
    def test_writer_roundtrip_gs(self, fake):
        p = "gs://bucket/recs/x-00000-of-00001"
        with TFRecordWriter(p) as w:
            w.write(b"alpha")
            w.write(b"beta" * 1000)
        assert [r for r in read_records(p)] == [b"alpha", b"beta" * 1000]
        assert list_shards("gs://bucket/recs", "x") == [p]

    def test_writer_abort_leaves_nothing(self, fake):
        w = TFRecordWriter("gs://bucket/recs/y-00000-of-00001")
        w.write(b"partial")
        w.abort()
        assert storage.glob("gs://bucket/recs/*") == []

    def test_to_tfrecords_writes_gs_and_feed_reads_gs(self, fake,
                                                      tmp_path):
        """The verdict's acceptance path: to-tfrecords writes gs://
        shards from local chips, train's feed reads a gs:// glob."""
        root = str(tmp_path / "chips")
        truth = make_png_dataset(root, n=10, size=16)
        n = images_to_tfrecords_mt("mumbai", root, "gs://bucket/recs",
                                   num_shards=2, num_threads=2,
                                   store_as_array=False)
        assert n == 10
        shards = storage.glob("gs://bucket/recs/mumbai-*")
        assert len(shards) == 2
        # parse back every record byte-for-byte
        seen = set()
        for s in shards:
            for rec in read_records(s):
                img, lbl, ident = parsers.parse_encoded_rgb_img_proto(rec)
                exp_img, exp_lbl = truth[ident.decode()]
                np.testing.assert_array_equal(img, exp_img)
                seen.add(ident.decode())
        assert seen == set(truth)
        feed = TFRecordFeed("gs://bucket/recs/mumbai-*",
                            parse_mode="rgbraw", batch_size=4,
                            image_size=16, repeat=False,
                            shuffle_buffer=1, per_host=False)
        batches = list(feed)
        assert len(batches) == 2  # 10 imgs, batch 4, drop remainder
        assert batches[0][0].shape == (4, 16, 16, 3)

    def test_remote_chip_folder_to_remote_shards(self, fake, tmp_path):
        """Chips on gs:// too: the writer lists and reads the remote
        folder (native fast path gates off, Python loaders read via
        the storage layer)."""
        root = str(tmp_path / "chips")
        truth = make_tif_dataset(root, n=6, size=12)
        for sub in ("images", "labels"):
            for fn in os.listdir(os.path.join(root, sub)):
                with open(os.path.join(root, sub, fn), "rb") as f:
                    storage.write_bytes(f"gs://bucket/chips/{sub}/{fn}",
                                        f.read())
        n = images_to_tfrecords_mp("s2", "gs://bucket/chips",
                                   "gs://bucket/recs2", num_shards=2,
                                   num_proc=1, store_as_array=True)
        assert n == 6
        feed = TFRecordFeed("gs://bucket/recs2/s2-*", parse_mode="tifarr",
                            batch_size=2, image_size=12, repeat=False,
                            shuffle_buffer=1, per_host=False)
        imgs, lbls = next(iter(feed))
        assert imgs.shape == (2, 12, 12, 4) and lbls.shape == (2, 12, 12)
        del truth

    def test_resume_skips_complete_remote_shards(self, fake, tmp_path,
                                                 capsys):
        root = str(tmp_path / "chips")
        make_png_dataset(root, n=8, size=16)
        images_to_tfrecords_mt("r", root, "gs://bucket/res",
                               num_shards=2, num_threads=1)
        reqs_before = fake.requests
        images_to_tfrecords_mt("r", root, "gs://bucket/res",
                               num_shards=2, num_threads=1, resume=True)
        out = capsys.readouterr().out
        assert out.count("skipping (resume)") == 2
        # resume re-uploads nothing: only listing/stat traffic
        uploads = [k for k in fake.objects]
        assert len(uploads) == 2
        assert fake.requests - reqs_before < 10


class TestRemoteRasters:
    def test_geotiff_roundtrip_gs(self, fake):
        arr = np.arange(48, dtype=np.uint16).reshape(4, 4, 3)
        gt = (100.0, 10.0, 0.0, 200.0, 0.0, -10.0)
        write_geotiff("gs://bucket/img.tif", arr, geotransform=gt,
                      epsg=32643)
        g = read_geotiff("gs://bucket/img.tif")
        np.testing.assert_array_equal(g.array, arr)
        assert g.info.epsg == 32643

    def test_is_done_on_gs(self, fake):
        from dl_image_segmentation_tpu.geo.tilegrid import Tile
        from dl_image_segmentation_tpu.pipeline.chips import (
            DLTileJobConfig, is_done)
        tile = Tile.from_key("16:2:10.0:43:-900:8394")
        job = DLTileJobConfig(
            dltile=tile, out_folder_base="gs://bucket/out",
            dl_product="p", ref_date="2020-06-01", labels_data="x")
        assert not is_done(job)
        fn = tile.key.replace(":", "#") + ".tif"
        storage.write_bytes(f"gs://bucket/out/images/{fn}", b"t")
        assert not is_done(job)  # label still missing
        storage.write_bytes(f"gs://bucket/out/labels/{fn}", b"t")
        assert is_done(job)


class TestRemoteTools:
    """Round-4 follow-through: the tool commands that previously
    bypassed the storage layer (convert, stitch, push) run their whole
    IO against gs://."""

    def _chips_on_gs(self, n=3, size=16):
        from dl_image_segmentation_tpu.geo.tilegrid import Tile
        rng = np.random.RandomState(5)
        names = []
        base = Tile.from_key("16:0:10.0:43:-900:8394")
        for i in range(n):
            t = Tile(16, 0, 10.0, 43, base.ti + i, base.tj)
            fn = t.key.replace(":", "#") + ".tif"
            img = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
            lbl = rng.randint(0, 3, (size, size, 1)).astype(np.uint8)
            write_geotiff(f"gs://bucket/chips/images/{fn}", img,
                          geotransform=t.geotrans, epsg=32643)
            write_geotiff(f"gs://bucket/chips/labels/{fn}", lbl,
                          geotransform=t.geotrans, epsg=32643)
            names.append(fn)
        return names

    def test_convert_chip_folder_gs(self, fake):
        from dl_image_segmentation_tpu.pipeline.convert import (
            convert_chip_folder)
        names = self._chips_on_gs()
        n = convert_chip_folder("gs://bucket/chips", "gs://bucket/png",
                                num_workers=2)
        assert n == 2 * len(names)
        out = storage.listdir("gs://bucket/png/images")
        assert len(out) == len(names) and out[0].endswith(".png")
        # resumable: second run rewrites nothing
        assert convert_chip_folder("gs://bucket/chips",
                                   "gs://bucket/png",
                                   num_workers=2) == 0

    def test_stitch_folder_gs(self, fake):
        from dl_image_segmentation_tpu.pipeline.stitch import (
            stitch_folder)
        names = self._chips_on_gs()
        n, (h, w) = stitch_folder("gs://bucket/chips/images",
                                  "gs://bucket/mosaic.tif")
        assert n == len(names)
        g = read_geotiff("gs://bucket/mosaic.tif")
        assert (g.array.shape[0], g.array.shape[1]) == (h, w)

    def test_push_shards_gs_pattern(self, fake, tmp_path):
        from dl_image_segmentation_tpu.records.sink import (
            LocalDirSink, push_shards)
        for i in range(2):
            storage.write_bytes(f"gs://bucket/recs/set-0000{i}-of-00002",
                                b"shardbytes%d" % i)
        storage.write_bytes("gs://bucket/recs/set-x/nested", b"junk")
        sink = LocalDirSink(str(tmp_path / "out"))
        pushed = push_shards("gs://bucket/recs/set-*", sink)
        assert len(pushed) == 2


class TestRemoteCheckpoints:
    def _trainer(self):
        from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                             Trainer)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=4,
                          levels=1, image_size=8, batch_size=8,
                          precision="fp32")
        return Trainer(cfg)

    def test_save_restore_gs(self, fake):
        tr = self._trainer()
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 8, 8, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 8, 8)).astype(np.int32)
        tr.train_step(imgs, lbls)
        tr.save_checkpoint("gs://bucket/ckpt")
        assert len([k for k in fake.objects
                    if k[1].startswith("ckpt/")]) > 0
        pred_before = tr.predict(imgs)
        tr2 = self._trainer()
        tr2.restore_checkpoint("gs://bucket/ckpt")
        assert int(tr2.state.step) == 1
        np.testing.assert_array_equal(tr2.predict(imgs), pred_before)

    def test_restore_missing_gs_raises(self, fake):
        with pytest.raises(FileNotFoundError):
            self._trainer().restore_checkpoint("gs://bucket/nope")

    def test_managed_rotation_syncs_and_prunes(self, fake, tmp_path):
        import shutil

        tr = self._trainer()
        rng = np.random.RandomState(1)
        mgr = tr.checkpoint_manager("gs://bucket/managed", keep=2)
        try:
            for _ in range(3):
                tr.train_step(rng.rand(8, 8, 8, 3).astype(np.float32),
                              rng.randint(0, 2, (8, 8, 8)).astype(
                                  np.int32))
                tr.save_managed(mgr)
            steps = {k[1].split("/")[1] for k in fake.objects
                     if k[1].startswith("managed/")}
            # keep=2: steps 2 and 3 remain remotely, step 1 pruned
            assert "1" not in steps and {"2", "3"} <= steps
        finally:
            mgr.close()
        # cold resume on a fresh mirror dir: wipe the local staging
        import hashlib
        import tempfile
        local = os.path.join(
            tempfile.gettempdir(), "dlseg-ckpt-mirror",
            hashlib.sha1(b"gs://bucket/managed").hexdigest()[:16])
        shutil.rmtree(local, ignore_errors=True)
        tr2 = self._trainer()
        mgr2 = tr2.checkpoint_manager("gs://bucket/managed", keep=2)
        try:
            assert tr2.restore_latest(mgr2) == 3
            assert int(tr2.state.step) == 3
        finally:
            mgr2.close()

    def test_stale_staging_dir_does_not_fabricate_resume(self, fake):
        """A fresh (empty) bucket at a previously-used URI must open
        with no checkpoints, even though the URI-keyed local staging
        dir still holds the earlier run's files (remote is the source
        of truth)."""
        tr = self._trainer()
        rng = np.random.RandomState(2)
        mgr = tr.checkpoint_manager("gs://bucket/stale", keep=2)
        try:
            tr.train_step(rng.rand(8, 8, 8, 3).astype(np.float32),
                          rng.randint(0, 2, (8, 8, 8)).astype(np.int32))
            tr.save_managed(mgr)
            assert mgr.latest_step() == 1
        finally:
            mgr.close()
        # simulate a brand-new empty bucket at the same URI
        fake.objects.clear()
        tr2 = self._trainer()
        mgr2 = tr2.checkpoint_manager("gs://bucket/stale", keep=2)
        try:
            assert mgr2.latest_step() is None
            assert tr2.restore_latest(mgr2) is None
            # and a save from the fresh run must not resurrect stale
            # steps remotely
            tr2.train_step(rng.rand(8, 8, 8, 3).astype(np.float32),
                           rng.randint(0, 2, (8, 8, 8)).astype(np.int32))
            tr2.save_managed(mgr2)
            steps = {k[1].split("/")[1] for k in fake.objects
                     if k[1].startswith("stale/")}
            assert steps == {"1"}
        finally:
            mgr2.close()


class TestMultiHostRemote:
    def test_two_host_partitioned_write_to_gs_equals_one_host(
            self, fake, tmp_path):
        """The multi-host data plane over cloud storage: two 'hosts'
        writing their shard ranges to the same gs:// prefix produce
        byte-identical objects to a single-host run (per-host shard
        ownership, global shard numbering -- SURVEY.md section 2.3
        P2 over the reference's gfile cloud transparency)."""
        root = str(tmp_path / "chips")
        make_png_dataset(root, n=12, size=16)
        images_to_tfrecords_mt("mh", root, "gs://bucket/one",
                               num_shards=4, num_threads=1)
        for host in range(2):
            images_to_tfrecords_mt("mh", root, "gs://bucket/two",
                                   num_shards=4, num_threads=1,
                                   host_index=host, host_count=2)
        one = {k[1].split("/")[-1]: v for k, v in fake.objects.items()
               if k[1].startswith("one/")}
        two = {k[1].split("/")[-1]: v for k, v in fake.objects.items()
               if k[1].startswith("two/")}
        assert sorted(one) == sorted(two) and len(one) == 4
        for name in one:
            assert one[name] == two[name], name


class TestCatalogOnGCS:
    def test_catalog_root_on_gs(self, fake):
        """A bucket of scenes IS a catalog: LocalCatalog works with a
        gs:// root through the storage layer, and big scenes are read
        by byte range (windowed), never downloaded whole."""
        import datetime as dt

        from dl_image_segmentation_tpu.catalog import LocalCatalog
        from dl_image_segmentation_tpu.geo import Tile

        tile = Tile(60, 2, 10.0, 43, -380, 3491)
        root = "gs://bucket/catalog"
        cat = LocalCatalog.create(root)
        rng = np.random.RandomState(3)
        x0, y0, x1, y1 = tile.bounds
        scene = rng.randint(0, 3000, (512, 512, 3)).astype(np.uint16)
        gt = (x0 - 1920.0, 10.0, 0.0, y1 + 1920.0, 0.0, -10.0)
        cat.add_scene("s2", ["r", "g", "b"], "big",
                      dt.date(2020, 6, 1), scene, gt, epsg=32643)
        # reload from the bucket
        whole = LocalCatalog(root)          # small enough: whole-read
        windowed = LocalCatalog(root, window_bytes=1)
        ms = whole.search(tile, "s2")
        assert [m.scene_id for m in ms] == ["big"]
        w_stack, w_valid = whole.load(ms, tile, ["r", "b"])
        r_stack, r_valid = windowed.load(windowed.search(tile, "s2"),
                                         tile, ["r", "b"])
        np.testing.assert_array_equal(r_stack, w_stack)
        np.testing.assert_array_equal(r_valid, w_valid)
        assert w_valid.all()
        # provenance: values come from the right scene window
        col0 = int((x0 - gt[0]) / 10.0)
        row0 = int((gt[3] - y1) / 10.0)
        np.testing.assert_array_equal(
            w_stack[0, :, :, 0],
            scene[row0:row0 + 64, col0:col0 + 64, 0])
