"""Read-only https:// (and http://) through the storage layer.

The reference's gfile registry reads plain HTTP(S) URIs
(/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:43-44 via
tf.io.gfile); these tests pin the rebuild's equivalent: ranged reads,
autoindex listing/globbing, the read-only write refusal, and the two
end-to-end flows the verdict named — to-tfrecords ingesting a chip
folder served over HTTP, and the training feed reading shards from an
https URL.
"""

import os

import numpy as np
import pytest

from dl_image_segmentation_tpu import storage
from dl_image_segmentation_tpu.catalog.httpserver import SceneServer


@pytest.fixture()
def served(tmp_path):
    root = tmp_path / "www"
    (root / "sub").mkdir(parents=True)
    (root / "a.bin").write_bytes(b"alpha-bytes")
    (root / "b.txt").write_bytes(b"beta")
    (root / "sub" / "c.bin").write_bytes(b"gamma!")
    with SceneServer(str(root)) as srv:
        yield srv


class TestReads:
    def test_read_bytes_and_range(self, served):
        url = f"{served.url}/a.bin"
        assert storage.read_bytes(url) == b"alpha-bytes"
        assert storage.read_range(url, 0, 4) == b"alpha"
        assert storage.read_range(url, 6) == b"bytes"

    def test_exists_and_missing(self, served):
        assert storage.exists(f"{served.url}/a.bin")
        assert not storage.exists(f"{served.url}/nope.bin")
        with pytest.raises(FileNotFoundError):
            storage.read_bytes(f"{served.url}/nope.bin")

    def test_listdir_autoindex(self, served):
        names = storage.listdir(served.url)
        assert names == ["a.bin", "b.txt", "sub"]
        assert storage.listdir(f"{served.url}/sub") == ["c.bin"]

    def test_glob_wildcard_and_exact(self, served):
        assert storage.glob(f"{served.url}/*.bin") == \
            [f"{served.url}/a.bin"]
        # recursive list keeps out of '/' (local-glob semantics)
        assert f"{served.url}/sub/c.bin" not in \
            storage.glob(f"{served.url}/*.bin")
        # no-wildcard glob works even without an index page
        assert storage.glob(f"{served.url}/sub/c.bin") == \
            [f"{served.url}/sub/c.bin"]
        assert storage.glob(f"{served.url}/missing.bin") == []

    def test_download_file_streams(self, served, tmp_path):
        dst = tmp_path / "out.bin"
        storage.download_file(f"{served.url}/a.bin", str(dst))
        assert dst.read_bytes() == b"alpha-bytes"

    def test_retry_on_injected_503(self, served):
        served.fail_next(2)
        assert storage.read_bytes(f"{served.url}/b.txt") == b"beta"


class TestReadOnly:
    def test_write_refused(self, served):
        with pytest.raises(PermissionError, match="read-only"):
            storage.write_bytes(f"{served.url}/new.bin", b"x")

    def test_unlink_refused(self, served):
        with pytest.raises(PermissionError, match="read-only"):
            storage.unlink(f"{served.url}/a.bin")

    def test_upload_file_refused(self, served, tmp_path):
        src = tmp_path / "s.bin"
        src.write_bytes(b"x")
        with pytest.raises(PermissionError, match="read-only"):
            storage.upload_file(str(src), f"{served.url}/new.bin")


class TestEndToEnd:
    def _chip_folder(self, tmp_path, n=6):
        from dl_image_segmentation_tpu.raster.image import encode_png
        root = tmp_path / "chips"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.RandomState(0)
        for i in range(n):
            key = f"60:2:10.0:43:{-380 + i}:3491"
            fn = key.replace(":", "#") + ".png"
            img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
            lbl = (img[:, :, :1] > 127).astype(np.uint8)
            (root / "images" / fn).write_bytes(encode_png(img))
            (root / "labels" / fn).write_bytes(encode_png(lbl))
        return root

    def test_to_tfrecords_from_https_folder(self, tmp_path):
        """to-tfrecords ingests a chip folder served over HTTP: the
        finder pairs files through the autoindex listing, loaders
        read through ranged-GET storage, shards land locally."""
        from dl_image_segmentation_tpu.records.writers import (
            images_to_tfrecords_mt)
        root = self._chip_folder(tmp_path)
        out = tmp_path / "recs"
        with SceneServer(str(root)) as srv:
            n = images_to_tfrecords_mt(
                "web", srv.url, str(out), num_shards=2, num_threads=1,
                store_as_array=False)
        assert n == 6
        shards = sorted(os.listdir(out))
        assert shards == ["web-00000-of-00002", "web-00001-of-00002"]

    def test_feed_reads_shards_over_https(self, tmp_path):
        """TFRecordFeed accepts an https:// shard pattern (training
        data behind any web server)."""
        from dl_image_segmentation_tpu.pipeline.input import TFRecordFeed
        from dl_image_segmentation_tpu.records.writers import (
            images_to_tfrecords_mt)
        root = self._chip_folder(tmp_path)
        recs = tmp_path / "recs"
        images_to_tfrecords_mt("web", str(root), str(recs),
                               num_shards=2, num_threads=1,
                               store_as_array=False)
        with SceneServer(str(recs)) as srv:
            feed = TFRecordFeed(f"{srv.url}/web-*", "rgbraw",
                                batch_size=4, image_size=32,
                                shuffle_buffer=1, num_workers=1,
                                repeat=False)
            batches = list(feed.batches())
        assert batches and batches[0][0].shape == (4, 32, 32, 3)
