"""Streaming object IO: GCS resumable uploads, S3 multipart uploads,
ranged-GET download streams, and the bounded-memory guarantee.

The reference reaches cloud storage through tf.io.gfile
(/root/reference/dl_segmentation_utils/_img_to_tf_threaded.py:87-88),
whose GCS/S3 filesystems stream large objects (resumable / multipart)
rather than buffering them whole. These tests pin the rebuild's
equivalents: wire protocols against the in-process fakes (small chunk
sizes exercise multi-chunk paths cheaply), failure-injection retries,
and a >5 GiB round trip through BOTH fakes executed in a subprocess
under a hard RLIMIT_AS cap — the only honest proof that no code path
materializes the object in memory.
"""

import io
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from dl_image_segmentation_tpu import storage
from dl_image_segmentation_tpu.storage.fake_gcs import FakeGCS
from dl_image_segmentation_tpu.storage.fake_s3 import FakeS3
from dl_image_segmentation_tpu.storage.gcs import GCSClient
from dl_image_segmentation_tpu.storage.s3 import S3Client


@pytest.fixture()
def gcs(monkeypatch):
    with FakeGCS() as fake:
        monkeypatch.setenv("STORAGE_EMULATOR_HOST", fake.host)
        monkeypatch.delenv("GCS_OAUTH_TOKEN", raising=False)
        yield fake


@pytest.fixture()
def s3(monkeypatch):
    with FakeS3() as fake:
        monkeypatch.setenv("AWS_ENDPOINT_URL_S3", fake.endpoint)
        for var in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
                    "AWS_SESSION_TOKEN"):
            monkeypatch.delenv(var, raising=False)
        yield fake


def _payload(n: int) -> bytes:
    return bytes(np.random.RandomState(42).randint(
        0, 256, n, dtype=np.uint8))


class TestGCSResumable:
    CHUNK = 256 * 1024

    def test_multi_chunk_upload(self, gcs):
        data = _payload(3 * self.CHUNK + 12345)  # 3 full + partial
        cli = GCSClient()
        meta = cli.upload_stream("b", "big.bin", io.BytesIO(data),
                                 size=len(data), chunk_size=self.CHUNK)
        assert gcs.objects[("b", "big.bin")] == data
        assert meta.get("size") == str(len(data))
        assert not gcs.sessions  # session consumed

    def test_unknown_size_exact_chunk_multiple(self, gcs):
        data = _payload(2 * self.CHUNK)
        cli = GCSClient()
        cli.upload_stream("b", "exact.bin", io.BytesIO(data),
                          chunk_size=self.CHUNK)
        assert gcs.objects[("b", "exact.bin")] == data

    def test_empty_and_tiny(self, gcs):
        cli = GCSClient()
        cli.upload_stream("b", "empty", io.BytesIO(b""),
                          chunk_size=self.CHUNK)
        assert gcs.objects[("b", "empty")] == b""
        cli.upload_stream("b", "tiny", io.BytesIO(b"xy"),
                          chunk_size=self.CHUNK)
        assert gcs.objects[("b", "tiny")] == b"xy"

    def test_retry_mid_stream(self, gcs):
        data = _payload(4 * self.CHUNK)
        cli = GCSClient()
        gcs.fail_next(2)  # 503s land mid-protocol; chunks re-PUT
        cli.upload_stream("b", "retry.bin", io.BytesIO(data),
                          size=len(data), chunk_size=self.CHUNK)
        assert gcs.objects[("b", "retry.bin")] == data

    def test_chunk_size_must_be_256k_multiple(self, gcs):
        with pytest.raises(ValueError, match="256 KiB"):
            GCSClient().upload_stream("b", "x", io.BytesIO(b"d"),
                                      chunk_size=1000)

    def test_download_stream_chunked(self, gcs):
        data = _payload(700_000)
        gcs.objects[("b", "dl.bin")] = data
        sink = io.BytesIO()
        n = GCSClient().download_stream("b", "dl.bin", sink,
                                       chunk_size=100_000)
        assert n == len(data) and sink.getvalue() == data

    def test_download_stream_missing(self, gcs):
        with pytest.raises(FileNotFoundError):
            GCSClient().download_stream("b", "nope", io.BytesIO())

    def test_short_source_with_declared_size_fails_loudly(self, gcs):
        # a source that under-delivers vs its declared size must NOT
        # finalize a silently truncated object
        data = _payload(self.CHUNK)
        with pytest.raises(Exception, match="declared"):
            GCSClient().upload_stream("b", "short.bin",
                                      io.BytesIO(data),
                                      size=len(data) + 999,
                                      chunk_size=self.CHUNK)
        assert ("b", "short.bin") not in gcs.objects


class TestS3Multipart:
    PART = 5 * 1024 * 1024  # S3 minimum

    def test_small_object_single_put(self, s3):
        data = _payload(1024)
        S3Client().upload_stream("b", "small.bin", io.BytesIO(data),
                                 part_size=self.PART)
        assert s3.objects[("b", "small.bin")] == data
        assert not s3.uploads

    def test_multipart_three_parts(self, s3):
        data = _payload(2 * self.PART + 999)
        meta = S3Client().upload_stream("b", "big.bin",
                                        io.BytesIO(data),
                                        part_size=self.PART)
        assert s3.objects[("b", "big.bin")] == data
        assert meta["parts"] == 3
        assert not s3.uploads  # completed (not left dangling)

    def test_exact_part_multiple(self, s3):
        data = _payload(2 * self.PART)
        S3Client().upload_stream("b", "exact.bin", io.BytesIO(data),
                                 part_size=self.PART)
        assert s3.objects[("b", "exact.bin")] == data

    def test_retry_mid_part(self, s3):
        data = _payload(2 * self.PART + 17)
        s3.fail_next(2)
        S3Client().upload_stream("b", "retry.bin", io.BytesIO(data),
                                 part_size=self.PART)
        assert s3.objects[("b", "retry.bin")] == data

    def test_failure_aborts_upload(self, s3):
        data = _payload(2 * self.PART)
        # non-retryable failures exhaust every part attempt -> the
        # client must abort the multipart upload server-side
        s3.fail_next(50, status=403)
        with pytest.raises(Exception):
            S3Client(max_attempts=2).upload_stream(
                "b", "doomed.bin", io.BytesIO(data),
                part_size=self.PART)
        assert ("b", "doomed.bin") not in s3.objects

    def test_part_size_floor(self, s3):
        with pytest.raises(ValueError, match="5 MiB"):
            S3Client().upload_stream("b", "x", io.BytesIO(b"d"),
                                     part_size=1024)

    def test_download_stream_chunked(self, s3):
        data = _payload(700_000)
        s3.objects[("b", "dl.bin")] = data
        sink = io.BytesIO()
        n = S3Client().download_stream("b", "dl.bin", sink,
                                      chunk_size=100_000)
        assert n == len(data) and sink.getvalue() == data


class TestStorageFacade:
    def test_upload_download_file_gcs(self, gcs, tmp_path):
        data = _payload(600_000)
        src = tmp_path / "src.bin"
        src.write_bytes(data)
        storage.upload_file(str(src), "gs://b/f.bin")
        assert gcs.objects[("b", "f.bin")] == data
        dst = tmp_path / "dst.bin"
        storage.download_file("gs://b/f.bin", str(dst))
        assert dst.read_bytes() == data

    def test_upload_download_file_s3(self, s3, tmp_path):
        data = _payload(600_000)
        src = tmp_path / "src.bin"
        src.write_bytes(data)
        storage.upload_file(str(src), "s3://b/f.bin")
        assert s3.objects[("b", "f.bin")] == data
        dst = tmp_path / "dst.bin"
        storage.download_file("s3://b/f.bin", str(dst))
        assert dst.read_bytes() == data

    def test_local_atomic_copy(self, tmp_path):
        src = tmp_path / "a.bin"
        src.write_bytes(b"hello")
        dst = tmp_path / "sub" / "b.bin"
        storage.upload_file(str(src), str(dst))
        assert dst.read_bytes() == b"hello"
        storage.download_file(str(dst), str(tmp_path / "c.bin"))
        assert (tmp_path / "c.bin").read_bytes() == b"hello"

    def test_download_file_failure_leaves_no_tmp(self, gcs, tmp_path):
        dst = tmp_path / "never.bin"
        with pytest.raises(FileNotFoundError):
            storage.download_file("gs://b/missing", str(dst))
        assert not dst.exists() and not (tmp_path / "never.bin.tmp").exists()

    def test_stitch_pushes_to_s3(self, s3, tmp_path):
        """stitch --out s3://... goes through the streaming writer
        (multipart past one part), so BigTIFF mosaics beyond the
        single-PUT cap push fine; verified end-to-end at small size."""
        from dl_image_segmentation_tpu.pipeline.stitch import (
            stitch_folder)
        from dl_image_segmentation_tpu.raster.geotiff import (
            decode_geotiff, write_geotiff)
        chips = tmp_path / "chips"
        chips.mkdir()
        rng = np.random.RandomState(0)
        for ti in range(2):
            arr = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
            gt = (1000.0 + ti * 160, 10.0, 0.0, 2000.0, 0.0, -10.0)
            write_geotiff(str(chips / f"12#2#10.0#43#{ti}#0.tif"),
                          arr, geotransform=gt, epsg=32643)
        n, shape = stitch_folder(str(chips), "s3://b/mosaic.tif")
        assert n == 2
        g = decode_geotiff(s3.objects[("b", "mosaic.tif")])
        assert g.array.shape[0] == shape[0]

    def test_spooled_writer_streams_to_s3(self, s3, tmp_path):
        w = storage.SpooledWriter("s3://b/spooled.bin")
        data = _payload(300_000)
        w.write(data)
        w.close()
        assert s3.objects[("b", "spooled.bin")] == data


# the >5 GiB child runs with plain numpy-free imports and a hard
# address-space cap; it builds the payload from a repeating 1 MiB
# pattern so neither side of the pipe ever owns more than a chunk
_BIG_CHILD = textwrap.dedent("""
    import os, resource, sys, json
    resource.setrlimit(resource.RLIMIT_AS,
                       (2 << 30, 2 << 30))  # 2 GiB hard cap
    sys.path.insert(0, os.environ["DLSEG_REPO"])
    from dl_image_segmentation_tpu import storage

    SIZE = (5 << 30) + (256 << 20)  # 5.25 GiB: past S3's single-PUT cap
    PATTERN = bytes(range(256)) * 4096  # 1 MiB

    class PatternSrc:
        def __init__(self, n):
            self.left = n
        def read(self, k):
            k = min(k, self.left)
            self.left -= k
            q, r = divmod(k, len(PATTERN))
            return PATTERN * q + PATTERN[:r]

    class VerifySink:
        def __init__(self):
            self.n = 0
            self.ok = True
        def write(self, b):
            off = self.n % len(PATTERN)
            expect = (PATTERN[off:] + PATTERN * (
                (off + len(b)) // len(PATTERN) + 1))[:len(b)]
            if b != expect:
                self.ok = False
            self.n += len(b)

    url = sys.argv[1]
    cli, bucket, name = storage.client_for(url)
    kw = ({"part_size": 256 << 20} if url.startswith("s3://")
          else {"chunk_size": 256 << 20})
    cli.upload_stream(bucket, name, PatternSrc(SIZE), size=SIZE, **kw)
    sink = VerifySink()
    cli.download_stream(bucket, name, sink, chunk_size=256 << 20)
    print(json.dumps({"uploaded": SIZE, "downloaded": sink.n,
                      "ok": sink.ok and sink.n == SIZE}))
""")


class TestFiveGiBBoundedMemory:
    """A >5 GiB object round-trips through each fake server while the
    CLIENT process runs under a 2 GiB RLIMIT_AS — streaming is proven,
    not asserted. (S3's single PUT caps at 5 GiB; multipart is the
    only way this object exists at all.)"""

    def _run(self, url, env):
        env = {**os.environ, **env,
               "DLSEG_REPO": os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__)))}
        proc = subprocess.run(
            [sys.executable, "-c", _BIG_CHILD, url],
            env=env, capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stderr[-2000:]
        import json
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        assert out["ok"] and out["downloaded"] == out["uploaded"]

    def test_s3_5gib(self, s3):
        self._run("s3://bigbucket/huge.bin",
                  {"AWS_ENDPOINT_URL_S3": s3.endpoint})
        assert len(s3.objects[("bigbucket", "huge.bin")]) == \
            (5 << 30) + (256 << 20)
        del s3.objects[("bigbucket", "huge.bin")]

    def test_gcs_5gib(self, gcs):
        self._run("gs://bigbucket/huge.bin",
                  {"STORAGE_EMULATOR_HOST": gcs.host})
        assert len(gcs.objects[("bigbucket", "huge.bin")]) == \
            (5 << 30) + (256 << 20)
        del gcs.objects[("bigbucket", "huge.bin")]
