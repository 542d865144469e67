"""s3:// storage backend: SigV4 signing pinned to the AWS doc test
vector, the REST client against the in-process fake server, retry
behavior, scheme dispatch through the storage layer, and a TFRecord
shard round-trip. Mirrors the reference's tf.io.gfile s3 transparency
(_img_to_tf_threaded.py:87-88, _img_to_tf_mp.py:43-44 — gfile's
filesystem registry dispatches on the scheme)."""

import datetime as dt
import hashlib
import os

import pytest

from dl_image_segmentation_tpu import storage
from dl_image_segmentation_tpu.storage.fake_s3 import FakeS3
from dl_image_segmentation_tpu.storage.gcs import GCSError
from dl_image_segmentation_tpu.storage.s3 import (S3Client, sigv4_headers,
                                                  split_s3_path)


@pytest.fixture()
def fake(monkeypatch):
    with FakeS3() as f:
        monkeypatch.setenv("AWS_ENDPOINT_URL_S3", f.endpoint)
        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIDEXAMPLE")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "secret")
        monkeypatch.delenv("AWS_SESSION_TOKEN", raising=False)
        yield f


class TestSigV4:
    def test_aws_documentation_vector(self):
        """The official worked example from the AWS SigV4 docs (GET
        iam.amazonaws.com ListUsers, 2015-08-30T12:36:00Z,
        AKIDEXAMPLE): published expected signature, computed
        independently of this repo."""
        hdrs = sigv4_headers(
            "GET",
            "https://iam.amazonaws.com/?Action=ListUsers"
            "&Version=2010-05-08",
            "us-east-1", "iam", "AKIDEXAMPLE",
            "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            hashlib.sha256(b"").hexdigest(),
            now=dt.datetime(2015, 8, 30, 12, 36, 0,
                            tzinfo=dt.timezone.utc),
            extra_signed={"content-type": "application/"
                          "x-www-form-urlencoded; charset=utf-8"},
            content_sha_header=False)
        assert hdrs["Authorization"] == (
            "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/"
            "us-east-1/iam/aws4_request, "
            "SignedHeaders=content-type;host;x-amz-date, "
            "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c4"
            "00e06b5924a6f2b5d7")

    def test_s3_headers_include_content_sha(self):
        h = sigv4_headers("PUT", "https://s3.example/b/k", "us-east-1",
                          "s3", "AK", "SK",
                          hashlib.sha256(b"body").hexdigest())
        assert h["x-amz-content-sha256"] == \
            hashlib.sha256(b"body").hexdigest()
        assert "x-amz-content-sha256" in h["Authorization"]

    def test_caller_x_amz_headers_are_signed(self, monkeypatch):
        """S3 mandates every x-amz-* request header be signed —
        rewrite's x-amz-copy-source must land in SignedHeaders, or
        real AWS rejects the copy with SignatureDoesNotMatch."""
        import dl_image_segmentation_tpu.storage.s3 as s3mod
        captured = {}

        def fake_http(method, url, data=None, headers=None,
                      ok_statuses=(200,), max_attempts=5,
                      timeout=60.0):
            captured["headers"] = dict(headers or {})
            return 200, b"<CopyObjectResult/>", {}

        monkeypatch.setattr(s3mod, "http_request", fake_http)
        cli = S3Client(endpoint="http://s3.example", region="us-east-1",
                       access_key="AK", secret_key="SK")
        cli.rewrite("b", "src.tif", "b", "dst.tif")
        hdrs = captured["headers"]
        auth = hdrs["Authorization"]
        signed = auth.split("SignedHeaders=")[1].split(",")[0]
        assert "x-amz-copy-source" in signed.split(";")
        # and the header itself still rides the request, exactly once
        amz_src = [k for k in hdrs if k.lower() == "x-amz-copy-source"]
        assert len(amz_src) == 1

    def test_session_token_signed(self):
        h = sigv4_headers("GET", "https://s3.example/b/k", "us-east-1",
                          "s3", "AK", "SK",
                          hashlib.sha256(b"").hexdigest(),
                          session_token="TOK")
        assert h["x-amz-security-token"] == "TOK"
        assert "x-amz-security-token" in h["Authorization"]


class TestPathHelpers:
    def test_is_remote_covers_s3(self):
        assert storage.is_remote("s3://b/x")
        assert storage.is_remote("gs://b/x")
        assert not storage.is_remote("/tmp/x")

    def test_split(self):
        assert split_s3_path("s3://buck/a/b") == ("buck", "a/b")
        with pytest.raises(ValueError):
            split_s3_path("gs://buck/a")
        assert storage.split_url("s3://b/k/x") == ("s3://", "b", "k/x")
        assert storage.split_url("gs://b/k") == ("gs://", "b", "k")

    def test_join_basename_dirname(self):
        assert storage.join("s3://b/a", "c", "d.tif") == "s3://b/a/c/d.tif"
        assert storage.basename("s3://b/a/c.tif") == "c.tif"
        assert storage.dirname("s3://b/a/c.tif") == "s3://b/a"

    def test_client_for_dispatches_scheme(self, fake):
        cli, b, n = storage.client_for("s3://bucket/k")
        assert isinstance(cli, S3Client) and (b, n) == ("bucket", "k")


class TestS3Roundtrip:
    def test_write_read_exists_unlink(self, fake):
        p = "s3://bucket/dir/file.bin"
        assert not storage.exists(p)
        storage.write_bytes(p, b"hello s3")
        assert storage.exists(p)
        assert storage.read_bytes(p) == b"hello s3"
        storage.unlink(p)
        assert not storage.exists(p)
        with pytest.raises(FileNotFoundError):
            storage.read_bytes(p)

    def test_unsigned_when_no_credentials(self, fake, monkeypatch):
        monkeypatch.delenv("AWS_ACCESS_KEY_ID")
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY")
        p = "s3://bucket/anon.bin"
        storage.write_bytes(p, b"public")
        assert storage.read_bytes(p) == b"public"

    def test_ranged_read(self, fake):
        p = "s3://bucket/r.bin"
        storage.write_bytes(p, bytes(range(100)))
        assert storage.read_range(p, 10, 19) == bytes(range(10, 20))
        assert storage.read_range(p, 90) == bytes(range(90, 100))
        assert storage.read_range(p, 1000, 2000) == b""

    def test_listdir_and_glob(self, fake):
        for n in ["recs/name-00000-of-00002", "recs/name-00001-of-00002",
                  "recs/other.txt", "recs/sub/deep.bin", "top.bin"]:
            storage.write_bytes(f"s3://bucket/{n}", b"x")
        assert storage.listdir("s3://bucket/recs") == [
            "name-00000-of-00002", "name-00001-of-00002", "other.txt",
            "sub"]
        assert storage.glob("s3://bucket/recs/name-*") == [
            "s3://bucket/recs/name-00000-of-00002",
            "s3://bucket/recs/name-00001-of-00002"]
        # '*' never crosses '/': nested objects stay out of shard globs
        storage.write_bytes("s3://bucket/recs/name-x/nested", b"x")
        assert "s3://bucket/recs/name-x/nested" not in \
            storage.glob("s3://bucket/recs/name-*")

    def test_list_pagination(self, fake):
        for i in range(2500):  # spans 3 ListObjectsV2 pages
            fake.objects[("bucket", f"many/{i:05d}")] = b"x"
        cli = storage.client_for("s3://bucket/x")[0]
        items, _ = cli.list("bucket", "many/")
        assert len(items) == 2500

    def test_replace_remote_same_scheme(self, fake):
        storage.write_bytes("s3://bucket/a", b"payload")
        storage.replace("s3://bucket/a", "s3://bucket/b")
        assert not storage.exists("s3://bucket/a")
        assert storage.read_bytes("s3://bucket/b") == b"payload"

    def test_upload_download_dir(self, fake, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "f1").write_bytes(b"1")
        (tmp_path / "sub" / "f2").write_bytes(b"2")
        assert storage.upload_dir(str(tmp_path), "s3://bucket/ckpt") == 2
        dn = tmp_path / "down"
        assert storage.download_dir("s3://bucket/ckpt", str(dn)) == 2
        assert (dn / "f1").read_bytes() == b"1"
        assert (dn / "sub" / "f2").read_bytes() == b"2"

    def test_names_with_hash_chars(self, fake):
        # chip filenames contain '#' (tile-key contract); must survive
        # URL quoting both ways
        p = "s3://bucket/images/60#2#10.0#43#-374#3512.tif"
        storage.write_bytes(p, b"tif")
        assert storage.read_bytes(p) == b"tif"
        assert storage.listdir("s3://bucket/images") == [
            "60#2#10.0#43#-374#3512.tif"]

    def test_spooled_writer_atomic(self, fake):
        w = storage.SpooledWriter("s3://bucket/out.rec")
        w.write(b"abc")
        w.flush()
        assert not storage.exists("s3://bucket/out.rec")
        w.write(b"def")
        w.close()
        assert storage.read_bytes("s3://bucket/out.rec") == b"abcdef"


class TestRetries:
    def test_transient_503s_are_retried(self, fake):
        storage.write_bytes("s3://bucket/x", b"v")
        fake.fail_next(2, status=503)
        assert storage.read_bytes("s3://bucket/x") == b"v"

    def test_persistent_failure_raises(self, fake):
        fake.fail_next(100, status=503)
        with pytest.raises(GCSError) as ei:
            storage.read_bytes("s3://bucket/x")
        assert ei.value.status == 503

    def test_4xx_not_retried(self, fake):
        storage.write_bytes("s3://bucket/x", b"v")
        before = fake.requests
        fake.fail_next(1, status=403)
        with pytest.raises(GCSError):
            storage.read_bytes("s3://bucket/x")
        assert fake.requests == before + 1


class TestRecordsOverS3:
    def test_tfrecord_shard_roundtrip(self, fake):
        """A shard written to s3:// reads back record-for-record (the
        writers/readers go through the storage layer; existing-object
        atomicity is the resume invariant)."""
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter, read_records)
        p = "s3://bucket/recs/pairs-00000-of-00001"
        w = TFRecordWriter(p)
        payloads = [b"alpha", b"beta" * 100, b""]
        for b in payloads:
            w.write(b)
        w.close()
        assert [bytes(r) for r in read_records(p)] == payloads
        assert storage.glob("s3://bucket/recs/pairs-*") == [p]
