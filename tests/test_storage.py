"""Cloud-storage layer (storage/): gs:// path dispatch, the thin GCS
JSON-API client against the in-process fake server, retry behavior,
and atomic-write semantics. Mirrors the reference's tf.io.gfile
transparency (_img_to_tf_threaded.py:87-88, _img_to_tf_mp.py:43-44)."""

import os

import pytest

from dl_image_segmentation_tpu import storage
from dl_image_segmentation_tpu.storage.fake_gcs import FakeGCS
from dl_image_segmentation_tpu.storage.gcs import GCSError


@pytest.fixture()
def fake(monkeypatch):
    with FakeGCS() as f:
        monkeypatch.setenv("STORAGE_EMULATOR_HOST", f.host)
        yield f


class TestPathHelpers:
    def test_is_remote(self):
        assert storage.is_remote("gs://b/x")
        assert not storage.is_remote("/tmp/x")
        assert not storage.is_remote("relative/x")

    def test_join(self):
        assert storage.join("gs://b/a", "c", "d.tif") == "gs://b/a/c/d.tif"
        assert storage.join("gs://b/a/", "c") == "gs://b/a/c"
        assert storage.join("/tmp/a", "c") == os.path.join("/tmp/a", "c")

    def test_basename_dirname(self):
        assert storage.basename("gs://b/a/c.tif") == "c.tif"
        assert storage.dirname("gs://b/a/c.tif") == "gs://b/a"
        assert storage.dirname("s3://b/a/c.tif") == "s3://b/a"
        # bucket roots have no parent — never degrade to 'gs:/'
        assert storage.dirname("gs://b") == "gs://b"
        assert storage.dirname("s3://b/") == "s3://b"

    def test_split(self):
        from dl_image_segmentation_tpu.storage.gcs import split_gcs_path
        assert split_gcs_path("gs://buck/a/b") == ("buck", "a/b")
        with pytest.raises(ValueError):
            split_gcs_path("/local/path")


class TestGCSRoundtrip:
    def test_write_read_exists_unlink(self, fake):
        p = "gs://bucket/dir/file.bin"
        assert not storage.exists(p)
        storage.write_bytes(p, b"hello gcs")
        assert storage.exists(p)
        assert storage.read_bytes(p) == b"hello gcs"
        storage.unlink(p)
        assert not storage.exists(p)
        with pytest.raises(FileNotFoundError):
            storage.read_bytes(p)

    def test_ranged_read(self, fake):
        p = "gs://bucket/r.bin"
        storage.write_bytes(p, bytes(range(100)))
        assert storage.read_range(p, 10, 19) == bytes(range(10, 20))
        assert storage.read_range(p, 90) == bytes(range(90, 100))
        assert storage.read_range(p, 1000, 2000) == b""

    def test_listdir_and_glob(self, fake):
        for n in ["recs/name-00000-of-00002", "recs/name-00001-of-00002",
                  "recs/other.txt", "recs/sub/deep.bin", "top.bin"]:
            storage.write_bytes(f"gs://bucket/{n}", b"x")
        assert storage.listdir("gs://bucket/recs") == [
            "name-00000-of-00002", "name-00001-of-00002", "other.txt",
            "sub"]
        assert storage.glob("gs://bucket/recs/name-*") == [
            "gs://bucket/recs/name-00000-of-00002",
            "gs://bucket/recs/name-00001-of-00002"]
        # ? and [] glob forms
        assert len(storage.glob(
            "gs://bucket/recs/name-0000?-of-00002")) == 2

    def test_glob_does_not_cross_slashes(self, fake):
        """Local glob semantics: '*' and '?' never match '/', so a
        shard pattern cannot accidentally pull nested objects."""
        for n in ["recs/name-1", "recs/name-x/nested",
                  "recs/name-y/deep/er"]:
            storage.write_bytes(f"gs://bucket/{n}", b"x")
        assert storage.glob("gs://bucket/recs/name-*") == [
            "gs://bucket/recs/name-1"]
        assert storage.glob("gs://bucket/recs/name-*/nested") == [
            "gs://bucket/recs/name-x/nested"]

    def test_replace_remote(self, fake):
        storage.write_bytes("gs://bucket/a", b"payload")
        storage.replace("gs://bucket/a", "gs://bucket/b")
        assert not storage.exists("gs://bucket/a")
        assert storage.read_bytes("gs://bucket/b") == b"payload"

    def test_upload_download_dir(self, fake, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "f1").write_bytes(b"1")
        (tmp_path / "sub" / "f2").write_bytes(b"2")
        n = storage.upload_dir(str(tmp_path), "gs://bucket/ckpt")
        assert n == 2
        dn = tmp_path / "down"
        assert storage.download_dir("gs://bucket/ckpt", str(dn)) == 2
        assert (dn / "f1").read_bytes() == b"1"
        assert (dn / "sub" / "f2").read_bytes() == b"2"

    def test_download_dir_skips_pseudo_folder_placeholders(
            self, fake, tmp_path):
        """Console-created 'folders' are zero-byte objects whose names
        end in '/'; download_dir must skip them (and an object equal to
        the prefix itself), not crash trying to open a directory."""
        storage.write_bytes("gs://bucket/ckpt/", b"")       # the prefix
        storage.write_bytes("gs://bucket/ckpt/sub/", b"")   # a subfolder
        storage.write_bytes("gs://bucket/ckpt/sub/f", b"data")
        dn = tmp_path / "down"
        assert storage.download_dir("gs://bucket/ckpt", str(dn),
                                    delete_extras=True) == 1
        assert (dn / "sub" / "f").read_bytes() == b"data"

    def test_names_with_hash_chars(self, fake):
        # chip filenames contain '#' (tile-key contract); must survive
        # URL quoting both ways
        p = "gs://bucket/images/60#2#10.0#43#-374#3512.tif"
        storage.write_bytes(p, b"tif")
        assert storage.read_bytes(p) == b"tif"
        assert storage.listdir("gs://bucket/images") == [
            "60#2#10.0#43#-374#3512.tif"]


class TestRetries:
    def test_transient_503s_are_retried(self, fake):
        storage.write_bytes("gs://bucket/x", b"v")
        fake.fail_next(2, status=503)
        assert storage.read_bytes("gs://bucket/x") == b"v"

    def test_persistent_failure_raises(self, fake):
        fake.fail_next(100, status=503)
        with pytest.raises(GCSError) as ei:
            storage.read_bytes("gs://bucket/x")
        assert ei.value.status == 503

    def test_4xx_not_retried(self, fake):
        storage.write_bytes("gs://bucket/x", b"v")
        before = fake.requests
        fake.fail_next(1, status=403)
        with pytest.raises(GCSError):
            storage.read_bytes("gs://bucket/x")
        assert fake.requests == before + 1  # no retry burn on 403


class TestSpooledWriter:
    def test_remote_spool_atomic(self, fake):
        w = storage.SpooledWriter("gs://bucket/out.rec")
        w.write(b"abc")
        w.flush()
        # nothing visible until close (GCS upload happens at close)
        assert not storage.exists("gs://bucket/out.rec")
        w.write(b"def")
        w.close()
        assert storage.read_bytes("gs://bucket/out.rec") == b"abcdef"

    def test_remote_abort_publishes_nothing(self, fake):
        w = storage.SpooledWriter("gs://bucket/never.rec")
        w.write(b"zzz")
        w.abort()
        assert not storage.exists("gs://bucket/never.rec")
        assert not os.path.exists(w._spool)

    def test_local_matches_tmp_rename(self, tmp_path):
        p = str(tmp_path / "f.bin")
        w = storage.SpooledWriter(p)
        w.write(b"xy")
        assert not os.path.exists(p) and os.path.exists(p + ".tmp")
        w.close()
        assert open(p, "rb").read() == b"xy"

    def test_fileno_usable_for_native_writes(self, fake):
        w = storage.SpooledWriter("gs://bucket/fd.rec", buffering=0)
        os.write(w.fileobj.fileno(), b"direct")
        w.close()
        assert storage.read_bytes("gs://bucket/fd.rec") == b"direct"


class TestLocalPassthrough:
    def test_local_ops(self, tmp_path):
        p = str(tmp_path / "a" / "f.bin")
        storage.write_bytes(p, b"local")
        assert storage.read_bytes(p) == b"local"
        assert storage.exists(p)
        assert storage.listdir(str(tmp_path)) == ["a"]
        assert storage.glob(str(tmp_path / "a" / "*.bin")) == [p]
        storage.makedirs(str(tmp_path / "b"))
        assert (tmp_path / "b").is_dir()
        storage.replace(p, str(tmp_path / "g.bin"))
        assert storage.read_bytes(str(tmp_path / "g.bin")) == b"local"
