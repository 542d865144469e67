"""Native extension tests: builds fastcodec.cc and validates every
entry point against the pure-Python reference implementations."""

import os

import numpy as np
import pytest

from dl_image_segmentation_tpu import _native
from dl_image_segmentation_tpu.records.crc32c import (
    crc32c as py_crc32c, masked_crc32c as py_masked)
from dl_image_segmentation_tpu.raster.lzw import (
    lzw_decode as py_lzw_decode, lzw_encode as py_lzw_encode)

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native toolchain unavailable")


class TestNativeCRC:
    def test_vectors(self):
        assert _native.crc32c(b"123456789") == 0xE3069283
        assert _native.crc32c(b"") == 0
        assert _native.crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_matches_python(self):
        rng = np.random.RandomState(0)
        for n in (1, 7, 8, 9, 100, 4096, 100001):
            data = rng.randint(0, 256, n, np.uint8).tobytes()
            assert _native.crc32c(data) == py_crc32c(data)
            assert _native.masked_crc32c(data) == py_masked(data)

    def test_frame(self):
        payload = b"some-payload" * 10
        frame = _native.tfrecord_frame(payload)
        assert len(frame) == len(payload) + 16
        import struct
        (ln,) = struct.unpack("<Q", frame[:8])
        assert ln == len(payload)
        (hcrc,) = struct.unpack("<I", frame[8:12])
        assert hcrc == py_masked(frame[:8])
        assert frame[12:-4] == payload
        (dcrc,) = struct.unpack("<I", frame[-4:])
        assert dcrc == py_masked(payload)


class TestNativeLZW:
    def _cases(self):
        rng = np.random.RandomState(0)
        return [
            b"", b"x", b"aaaaaaaaaaaaaa", bytes(range(256)) * 30,
            rng.randint(0, 256, 200000, np.uint8).tobytes(),
            rng.randint(0, 3, 300000, np.uint8).tobytes(),
            b"TOBEORNOTTOBEOR" * 5000,
        ]

    def test_native_encode_bitidentical_to_python(self):
        for i, c in enumerate(self._cases()):
            assert _native.lzw_encode(c) == py_lzw_encode(c), f"case {i}"

    def test_cross_roundtrips(self):
        for i, c in enumerate(self._cases()):
            ne = _native.lzw_encode(c)
            assert _native.lzw_decode(ne) == c, f"n->n case {i}"
            assert py_lzw_decode(ne) == c, f"n->py case {i}"
            assert _native.lzw_decode(py_lzw_encode(c)) == c, f"py->n case {i}"

    def test_corrupt_raises(self):
        good = _native.lzw_encode(b"hello world" * 100)
        bad = bytes([good[0] ^ 0x55]) + good[1:]
        with pytest.raises(ValueError):
            _native.lzw_decode(bad)


def _best_rate(fn, nbytes: int, attempts: int = 5) -> float:
    """Best-of-N throughput: floor tests assert CODE speed, not machine
    idleness -- a single timing on this shared 1-core box fails
    spuriously whenever another process holds the core for one slice."""
    import time
    best = 0.0
    for _ in range(attempts):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = max(best, nbytes / dt)
    return best


class TestNativeSpeed:
    def test_crc_throughput_floor(self):
        data = os.urandom(8 << 20)
        rate = _best_rate(lambda: _native.crc32c(data), 8 << 20)
        # hardware CRC32C should exceed 2 GB/s comfortably
        assert rate > 1e9, f"crc32c too slow: {rate/1e9:.2f} GB/s"

    def test_lzw_encode_throughput_floor(self):
        rng = np.random.RandomState(1)
        # realistic chip content: smooth-ish uint8 imagery
        data = (rng.rand(1 << 20).cumsum() % 256).astype(np.uint8).tobytes()
        rate = _best_rate(lambda: _native.lzw_encode(data), 1 << 20)
        assert rate > 30e6, f"lzw too slow: {rate/1e6:.1f} MB/s"


class TestFusedExampleEncoder:
    def test_bitidentical_to_python_encoder(self):
        import io
        import struct
        from dl_image_segmentation_tpu.records.example import (
            convert_to_example, write_example_framed)
        from dl_image_segmentation_tpu.records.crc32c import masked_crc32c
        rng = np.random.RandomState(0)
        cases = [
            (rng.randint(0, 255, (16, 16, 3), np.uint8),
             rng.randint(0, 2, (16, 16), np.uint8)),           # bytes mode
            (b"\x89PNG fake bytes", b"\x89PNG other bytes"),    # raw bytes
            (rng.rand(8, 8, 13).astype(np.float32),
             rng.randint(0, 3, (8, 8), np.uint8)),              # float mode
            (rng.randint(0, 4000, (8, 8, 4), np.uint16),
             rng.randint(0, 2, (8, 8), np.uint8)),              # promoted
        ]
        for i, (img, tgt) in enumerate(cases):
            buf = io.BytesIO()
            write_example_framed(buf, img, tgt, 16, 16, 3, 16, 16,
                                 "k:1:2")
            framed = buf.getvalue()
            rec = convert_to_example(img, tgt, 16, 16, 3, 16, 16,
                                     "k:1:2").SerializeToString()
            header = struct.pack("<Q", len(rec))
            expect = (header + struct.pack("<I", masked_crc32c(header))
                      + rec + struct.pack("<I", masked_crc32c(rec)))
            assert framed == expect, f"case {i}"


class TestNativePairPath:
    def test_bitidentical_to_python_path(self, tmp_path):
        """The fully-native pair encoder must produce byte-identical
        frames to the Python loader + encoder path."""
        import io as _io
        from dl_image_segmentation_tpu.raster.image import encode_png
        from dl_image_segmentation_tpu.records.writers import _load_mt
        from dl_image_segmentation_tpu.records.example import (
            write_example_framed)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (32, 32, 3), np.uint8)
        lbl = rng.randint(0, 2, (32, 32), np.uint8)
        ipath = str(tmp_path / "60#2#10.0#43#-380#3491.png")
        lpath = str(tmp_path / "lbl_60#2#10.0#43#-380#3491.png")
        open(ipath, "wb").write(encode_png(img))
        open(lpath, "wb").write(encode_png(lbl[:, :, None]))
        key = "60:2:10.0:43:-380:3491"
        mv = _native.encode_pair_from_files(ipath, lpath, key.encode())
        assert mv is not None
        native_frame = bytes(mv)
        # python path
        ib, ih, iw, ic, _ = _load_mt(ipath, True, False, False)
        lb, lh, lw, lc, _ = _load_mt(lpath, True, False, False)
        buf = _io.BytesIO()
        write_example_framed(buf, ib, lb, ih, iw, ic, lh, lw, key)
        assert native_frame == buf.getvalue()

    def test_fallback_on_garbage(self, tmp_path):
        p1 = str(tmp_path / "a.png")
        p2 = str(tmp_path / "b.png")
        open(p1, "wb").write(b"not a png at all")
        open(p2, "wb").write(b"also not")
        assert _native.encode_pair_from_files(p1, p2, b"k") is None


class TestShardWriteSafety:
    def _mk_pair(self, tmp_path):
        from dl_image_segmentation_tpu.raster.image import encode_png
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (16, 16, 3), np.uint8)
        lbl = rng.randint(0, 2, (16, 16, 1), np.uint8)
        ipath = str(tmp_path / "60#2#10.0#43#-1#1.png")
        lpath = str(tmp_path / "l_60#2#10.0#43#-1#1.png")
        open(ipath, "wb").write(encode_png(img))
        open(lpath, "wb").write(encode_png(lbl))
        return ipath, lpath

    def test_unrollbackable_fd_raises(self, tmp_path):
        """A frame write that cannot be rolled back (unseekable fd)
        must raise IOError so the caller aborts the shard, instead of
        leaving a torn frame (ADVICE round 1, fastcodec.cc:559)."""
        ipath, lpath = self._mk_pair(tmp_path)
        r, w = os.pipe()
        try:
            with pytest.raises(IOError, match="rolled back"):
                _native.write_shard([ipath], [lpath], [b"k"], w)
        finally:
            os.close(r)
            os.close(w)

    def test_writer_abort_leaves_tmp_only(self, tmp_path):
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter)
        final = str(tmp_path / "shard-00000-of-00001")
        wtr = TFRecordWriter(final)
        wtr.write(b"payload")
        wtr.abort()
        assert not os.path.exists(final)
        assert os.path.exists(final + ".tmp")

    def test_writer_context_aborts_on_exception(self, tmp_path):
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter)
        final = str(tmp_path / "shard-00000-of-00001")
        with pytest.raises(RuntimeError):
            with TFRecordWriter(final) as wtr:
                wtr.write(b"payload")
                raise RuntimeError("boom")
        assert not os.path.exists(final)

    def test_worker_aborts_shard_on_write_error(self, tmp_path, capsys):
        """An unrecoverable write error inside a shard leaves only the
        .tmp (resume treats the shard as incomplete) and propagates."""
        from dl_image_segmentation_tpu.records import writers

        root = tmp_path / "chips"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        from dl_image_segmentation_tpu.raster.image import encode_png
        rng = np.random.RandomState(2)
        for i in range(4):
            name = f"64#0#10.0#43#-{i}#7.png"
            img = rng.randint(0, 255, (16, 16, 3), np.uint8)
            lbl = rng.randint(0, 2, (16, 16, 1), np.uint8)
            open(root / "images" / name, "wb").write(encode_png(img))
            open(root / "labels" / name, "wb").write(encode_png(lbl))
        out = tmp_path / "recs"

        def boom(*a, **k):
            raise IOError("simulated device-full")

        orig = writers.write_example_framed
        writers.write_example_framed = boom
        try:
            # disable the native whole-shard path so the Python encode
            # path (and its failure) is exercised
            from dl_image_segmentation_tpu import _native as nat
            avail = nat.available
            nat.available = lambda: False
            try:
                with pytest.raises(IOError, match="device-full"):
                    writers.process_dataset_multithreaded(
                        "t", str(root), str(out), num_shards=1,
                        num_threads=1)
            finally:
                nat.available = avail
        finally:
            writers.write_example_framed = orig
        assert not os.path.exists(out / "t-00000-of-00001")
        assert os.path.exists(str(out / "t-00000-of-00001") + ".tmp")


class TestFusedTiffPair:
    """fc_write_shard_tifarr: fused TIFF decode -> framed Example must
    be byte-identical to the Python codec path, with per-pair fallback
    for containers outside the chip-contract subset."""

    def _pair(self, tmp_path, img_dtype=np.uint16, lbl_bands=1,
              size=48, bands=4):
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        rng = np.random.RandomState(7)
        img = (rng.rand(size, size, bands) * 4000).astype(img_dtype)
        lshape = (size, size, lbl_bands) if lbl_bands > 1 else (size, size)
        lbl = rng.randint(0, 3, lshape).astype(np.uint8)
        ip = str(tmp_path / "60#2#10.0#43#-1#2.tif")
        lp = str(tmp_path / "lbl.tif")
        gt = (0, 10, 0, 0, 0, -10)
        write_geotiff(ip, img, geotransform=gt, epsg=32643)
        write_geotiff(lp, lbl, geotransform=gt, epsg=32643, nodata=255)
        return ip, lp, img, lbl

    def _native_record(self, tmp_path, ip, lp, ident=b"60:2:10.0:43:-1:2"):
        shard = str(tmp_path / "shard")
        fd = os.open(shard, os.O_WRONLY | os.O_CREAT, 0o644)
        try:
            written, failed = _native.write_shard_tifarr(
                [ip], [lp], [ident], fd)
        finally:
            os.close(fd)
        return written, failed, open(shard, "rb").read()

    def _python_record(self, ip, lp, ident="60:2:10.0:43:-1:2"):
        import io as _io
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        from dl_image_segmentation_tpu.records.example import (
            write_example_framed)
        gi = read_geotiff(ip)
        gl = read_geotiff(lp)
        arr, lbl = gi.array, gl.array
        if lbl.ndim == 3 and lbl.shape[2] == 1:
            lbl = lbl[:, :, 0]
        buf = _io.BytesIO()
        write_example_framed(buf, arr, lbl, gi.info.height, gi.info.width,
                             gi.info.count, gl.info.height, gl.info.width,
                             ident)
        return buf.getvalue()

    def test_uint16_float_mode_identical(self, tmp_path):
        ip, lp, _, _ = self._pair(tmp_path)
        written, failed, nat = self._native_record(tmp_path, ip, lp)
        assert written == 1 and failed == []
        assert nat == self._python_record(ip, lp)

    def test_uint8_bytes_mode_identical(self, tmp_path):
        ip, lp, _, _ = self._pair(tmp_path, img_dtype=np.uint8, bands=3)
        written, failed, nat = self._native_record(tmp_path, ip, lp)
        assert written == 1 and failed == []
        assert nat == self._python_record(ip, lp)

    def test_multiband_label_falls_back(self, tmp_path):
        ip, lp, _, _ = self._pair(tmp_path, lbl_bands=3)
        written, failed, _ = self._native_record(tmp_path, ip, lp)
        assert written == 0 and failed == [0]

    def test_float32_source_falls_back(self, tmp_path):
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        rng = np.random.RandomState(1)
        ip = str(tmp_path / "f32.tif")
        lp = str(tmp_path / "lbl8.tif")
        write_geotiff(ip, rng.rand(16, 16, 2).astype(np.float32),
                      geotransform=(0, 10, 0, 0, 0, -10), epsg=32643)
        write_geotiff(lp, rng.randint(0, 2, (16, 16)).astype(np.uint8),
                      geotransform=(0, 10, 0, 0, 0, -10), epsg=32643)
        written, failed, _ = self._native_record(tmp_path, ip, lp)
        assert written == 0 and failed == [0]

    def test_writer_pipeline_identity(self, tmp_path):
        """Whole-shard output through process_dataset_mp equals the
        pure-Python encode path byte-for-byte."""
        import contextlib
        import io as _io
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        from dl_image_segmentation_tpu.records import writers
        root = tmp_path / "chips"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.RandomState(3)
        for i in range(6):
            fn = f"28#2#10.0#43#-{i}#9.tif"
            img = (rng.rand(32, 32, 4) * 4000).astype(np.uint16)
            lbl = rng.randint(0, 3, (32, 32)).astype(np.uint8)
            gt = (0, 10, 0, 0, 0, -10)
            write_geotiff(str(root / "images" / fn), img,
                          geotransform=gt, epsg=32643)
            write_geotiff(str(root / "labels" / fn), lbl,
                          geotransform=gt, epsg=32643, nodata=255)
        sink = _io.StringIO()
        with contextlib.redirect_stdout(sink):
            writers.process_dataset_mp("a", str(root),
                                       str(tmp_path / "rn"),
                                       num_shards=1, num_proc=1,
                                       store_as_array=True)
            # python encode path: a loader wrapper defeats the
            # `loader is _load_any` native dispatch
            writers._process_dataset(
                "a", str(root), str(tmp_path / "rp"), 1, 1,
                lambda *a: writers._load_any(*a), (True,), True,
                ["tif"], 100)
        a = (tmp_path / "rn" / "a-00000-of-00001").read_bytes()
        b = (tmp_path / "rp" / "a-00000-of-00001").read_bytes()
        assert a == b

    def test_multitile_raster_identical(self, tmp_path):
        """A 300x300 chip spans a 2x2 tile grid: the fused decoder's
        multi-chunk scatter path must stay byte-identical."""
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        rng = np.random.RandomState(11)
        img = (rng.rand(300, 300, 4) * 4000).astype(np.uint16)
        lbl = rng.randint(0, 3, (300, 300)).astype(np.uint8)
        ip = str(tmp_path / "296#2#10.0#43#-5#6.tif")
        lp = str(tmp_path / "lbl.tif")
        write_geotiff(ip, img, geotransform=(0, 10, 0, 0, 0, -10),
                      epsg=32643)
        write_geotiff(lp, lbl, geotransform=(0, 10, 0, 0, 0, -10),
                      epsg=32643, nodata=255)
        written, failed, nat = self._native_record(
            tmp_path, ip, lp, ident=b"296:2:10.0:43:-5:6")
        assert written == 1 and failed == []
        assert nat == self._python_record(ip, lp,
                                          ident="296:2:10.0:43:-5:6")

    def test_striped_raster_identical(self, tmp_path):
        """Striped (non-tiled) layout through the fused decoder."""
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        rng = np.random.RandomState(12)
        img = (rng.rand(64, 48, 2) * 4000).astype(np.uint16)
        lbl = rng.randint(0, 2, (64, 48)).astype(np.uint8)
        ip = str(tmp_path / "60#2#10.0#43#-6#7.tif")
        lp = str(tmp_path / "lbl.tif")
        write_geotiff(ip, img, geotransform=(0, 10, 0, 0, 0, -10),
                      epsg=32643, tiled=False)
        write_geotiff(lp, lbl, geotransform=(0, 10, 0, 0, 0, -10),
                      epsg=32643, nodata=255, tiled=False)
        written, failed, nat = self._native_record(
            tmp_path, ip, lp, ident=b"60:2:10.0:43:-6:7")
        assert written == 1 and failed == []
        assert nat == self._python_record(ip, lp,
                                          ident="60:2:10.0:43:-6:7")

    def test_bigtiff_falls_back(self, tmp_path):
        """BigTIFF pairs fall back to the Python codec (which decodes
        them) instead of being mis-parsed by the fused path."""
        from dl_image_segmentation_tpu.raster.geotiff import (
            encode_geotiff)
        rng = np.random.RandomState(13)
        img = (rng.rand(16, 16, 2) * 4000).astype(np.uint16)
        lbl = rng.randint(0, 2, (16, 16)).astype(np.uint8)
        ip = str(tmp_path / "a.tif")
        lp = str(tmp_path / "b.tif")
        open(ip, "wb").write(encode_geotiff(img, bigtiff=True))
        open(lp, "wb").write(encode_geotiff(lbl, bigtiff=True))
        written, failed, _ = self._native_record(tmp_path, ip, lp)
        assert written == 0 and failed == [0]


class TestLZWFuzz:
    def test_roundtrip_fuzz(self):
        """Random buffers across entropy regimes: native encode ->
        native decode == identity, and native decode == the pure-Python
        oracle on the same stream."""
        from dl_image_segmentation_tpu.raster.lzw import (
            lzw_decode as py_decode)
        rng = np.random.RandomState(99)
        for trial in range(30):
            n = int(rng.randint(0, 60000))
            kind = trial % 4
            if kind == 0:      # incompressible
                raw = rng.randint(0, 256, n).astype(np.uint8).tobytes()
            elif kind == 1:    # highly repetitive
                raw = (bytes(rng.randint(0, 256, max(1, n // 97))
                             .astype(np.uint8)) * 97)[:n]
            elif kind == 2:    # low-alphabet
                raw = rng.choice([0, 1, 255], n).astype(np.uint8).tobytes()
            else:              # smooth ramps (predictor-like)
                raw = (np.arange(n) % 251).astype(np.uint8).tobytes()
            comp = _native.lzw_encode(raw)
            out = _native.lzw_decode(comp, max_size=len(raw))
            assert out == raw, f"native roundtrip failed (trial {trial})"
            assert py_decode(comp)[:len(raw)] == raw, \
                f"python oracle disagrees (trial {trial})"


class TestTiffDecodeF32:
    def test_matches_python_codec(self, tmp_path):
        from dl_image_segmentation_tpu.raster.geotiff import (
            decode_geotiff, write_geotiff)
        rng = np.random.RandomState(21)
        for dtype, bands in [(np.uint16, 4), (np.uint8, 3),
                             (np.uint8, 1)]:
            arr = (rng.rand(40, 56, bands) * 4000).astype(dtype)
            p = str(tmp_path / f"x_{bands}_{dtype.__name__}.tif")
            write_geotiff(p, arr, geotransform=(0, 10, 0, 0, 0, -10),
                          epsg=32643)
            data = open(p, "rb").read()
            nat = _native.tiff_decode_f32(data)
            assert nat is not None and nat.dtype == np.float32
            py = decode_geotiff(data).array.astype(np.float32)
            np.testing.assert_array_equal(nat, py)

    def test_unsupported_returns_none(self):
        assert _native.tiff_decode_f32(b"not a tiff at all") is None


class TestLzwTinyStreams:
    """n < 8 byte streams must take the byte-wise path (the 8-byte
    fast-window load would read past the buffer end)."""

    def test_empty_payload_roundtrip(self):
        enc = _native.lzw_encode(b"")
        assert enc is not None and 0 < len(enc) < 8
        assert _native.lzw_decode(enc) == b""

    def test_tiny_payloads_roundtrip(self):
        for payload in (b"A", b"ab", b"xyz", b"\x00\xff"):
            enc = _native.lzw_encode(payload)
            assert enc is not None
            assert _native.lzw_decode(enc) == payload, payload

    def test_truncated_stream_no_garbage_growth(self):
        """Truncating a stream must never DECODE MORE than the full
        stream did (garbage tail bits emitted as codes)."""
        payload = bytes(range(256)) * 4
        enc = _native.lzw_encode(payload)
        full = _native.lzw_decode(enc)
        assert full == payload
        for cut in (1, 2, 3, 5, 7, len(enc) // 2):
            out = _native.lzw_decode(enc[:cut])
            assert out is None or len(out) <= len(payload)


class TestTiffStrictTags:
    """A PRESENT but unparseable IFD tag must fail the native TIFF
    parse (clean fallback to the Python codec), never keep its default
    -- a >64-band uint16 file parsed with default bps=8 would write a
    structurally valid but silently wrong record."""

    def test_many_band_uint16_falls_back_correctly(self, tmp_path):
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        rng = np.random.RandomState(3)
        img = (rng.rand(8, 8, 70) * 4000).astype(np.uint16)  # 70 > 64
        lbl = rng.randint(0, 3, (8, 8)).astype(np.uint8)
        ip = str(tmp_path / "img.tif")
        lp = str(tmp_path / "lbl.tif")
        gt = (0, 10, 0, 0, 0, -10)
        write_geotiff(ip, img, geotransform=gt, epsg=32643)
        write_geotiff(lp, lbl, geotransform=gt, epsg=32643, nodata=255)
        shard = str(tmp_path / "shard")
        fd = os.open(shard, os.O_WRONLY | os.O_CREAT, 0o644)
        try:
            written, failed = _native.write_shard_tifarr(
                [ip], [lp], [b"k"], fd)
        finally:
            os.close(fd)
        # the native path must REJECT the pair (fall back), not write
        # a record with bps defaulted to 8
        assert written == 0 and failed == [0]
        assert os.path.getsize(shard) == 0


class TestCraftedTiffHeaders:
    def test_overflowing_tile_dims_rejected_cleanly(self, tmp_path):
        """A crafted header with TileWidth=TileLength=2^31 wraps the
        chunk-size product in uint64; the parser must REJECT it (clean
        fallback / failed pair), never scribble out of bounds."""
        import struct
        def tag(tid, ttype, cnt, val):
            ch = "H" if ttype == 3 else "I"
            raw = struct.pack("<" + ch, val).ljust(4, b"\x00")
            return struct.pack("<HHI", tid, ttype, cnt) + raw
        big = 1 << 31
        tags = [tag(256, 4, 1, 64), tag(257, 4, 1, 64),
                tag(258, 3, 1, 16), tag(259, 3, 1, 5),
                tag(277, 3, 1, 4), tag(322, 4, 1, big),
                tag(323, 4, 1, big), tag(324, 4, 1, 200),
                tag(325, 4, 1, 4), tag(339, 3, 1, 1)]
        ifd = struct.pack("<H", len(tags)) + b"".join(sorted(tags)) \
            + struct.pack("<I", 0)
        data = b"II*\x00" + struct.pack("<I", 8) + ifd
        data = data.ljust(200, b"\x00") + b"\x00\x01\x02\x03"
        ip = str(tmp_path / "evil.tif")
        open(ip, "wb").write(data)
        lbl = str(tmp_path / "lbl.tif")
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        write_geotiff(lbl, np.zeros((8, 8), np.uint8))
        shard = str(tmp_path / "shard")
        fd = os.open(shard, os.O_WRONLY | os.O_CREAT, 0o644)
        try:
            written, failed = _native.write_shard_tifarr(
                [ip], [lbl], [b"k"], fd)
        finally:
            os.close(fd)
        assert written == 0 and failed == [0]

    def test_max_size_stops_high_expansion_stream(self):
        """With max_size, decode must stop at the cap instead of
        materializing the full (possibly multi-GB) expansion."""
        payload = b"\x00" * (1 << 20)  # ~1 MB of zeros: huge expansion
        enc = _native.lzw_encode(payload)
        assert len(enc) < (1 << 16)
        out = _native.lzw_decode(enc, max_size=1000)
        assert out == payload[:1000]
        # python oracle identical
        from dl_image_segmentation_tpu.raster import lzw as pylzw
        assert pylzw.lzw_decode(enc, max_size=1000) == out


class TestNativePngDecode:
    """fc_png_decode: libdeflate fast path for the training-feed PNG
    lane -- byte-identical to PIL on the chip contract (8-bit
    non-interlaced grey/RGB), None (-> PIL fallback) everywhere else."""

    def _pil(self, data):
        from dl_image_segmentation_tpu.raster.image import _pil_decode
        return _pil_decode(data)

    def _png(self, arr):
        from dl_image_segmentation_tpu.raster.image import encode_png
        return encode_png(arr)

    @pytest.mark.skipif(not _native.available(), reason="no toolchain")
    def test_identical_to_pil_across_shapes_and_filters(self):
        if _native.png_decode(self._png(
                np.zeros((4, 4, 3), np.uint8))) is None:
            pytest.skip("libdeflate unavailable")
        rng = np.random.RandomState(0)
        base = rng.randint(0, 255, (32, 32, 3), np.uint8)
        chip = np.kron(base, np.ones((8, 8, 1), np.uint8))
        chip = np.clip(chip.astype(np.int16)
                       + rng.randint(-20, 20, chip.shape),
                       0, 255).astype(np.uint8)  # filters 1/2/4 mix
        cases = [
            chip,
            rng.randint(0, 255, (256, 256, 3), np.uint8),  # noise
            rng.randint(0, 255, (100, 101, 1), np.uint8),  # gray odd W
            np.zeros((64, 64, 3), np.uint8),               # filter 0
            np.tile(np.arange(256, dtype=np.uint8),
                    (256, 1))[:, :, None],                 # ramp
            rng.randint(0, 255, (1, 1, 3), np.uint8),      # 1 px
            rng.randint(0, 255, (3, 513, 3), np.uint8),    # wide odd
        ]
        for arr in cases:
            data = self._png(arr)
            out = _native.png_decode(data)
            assert out is not None, arr.shape
            np.testing.assert_array_equal(out, self._pil(data))

    @pytest.mark.skipif(not _native.available(), reason="no toolchain")
    def test_unsupported_subsets_fall_back(self):
        """Palette / alpha / 16-bit / corrupt containers must return
        None (PIL keeps handling them), never a wrong array."""
        import io

        from PIL import Image
        rng = np.random.RandomState(1)
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (16, 16, 4), np.uint8),
                        "RGBA").save(buf, "PNG")
        assert _native.png_decode(buf.getvalue()) is None
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (16, 16), np.uint8)) \
            .convert("P").save(buf, "PNG")
        assert _native.png_decode(buf.getvalue()) is None
        data = bytearray(self._png(rng.randint(0, 255, (16, 16, 3),
                                               np.uint8)))
        import struct
        pos = 8
        while pos < len(data):
            ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
            if typ == b"IDAT":
                data[pos + 8:pos + 16] = b"\x00" * 8
                break
            pos += 12 + ln
        assert _native.png_decode(bytes(data)) is None

    @pytest.mark.skipif(not _native.available(), reason="no toolchain")
    def test_multiple_idat_chunks(self):
        """The IDAT stream may be split across chunks at ANY byte
        boundary (spec); the decoder must concatenate before
        inflating."""
        import io
        import struct
        import zlib as _zlib

        from PIL import Image
        rng = np.random.RandomState(2)
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)) \
            .save(buf, "PNG")
        d = buf.getvalue()
        pos, chunks = 8, []
        while pos < len(d):
            ln, typ = struct.unpack(">I4s", d[pos:pos + 8])
            chunks.append((typ, d[pos + 8:pos + 8 + ln]))
            pos += 12 + ln
        out = bytearray(d[:8])

        def put(typ, payload):
            out.extend(struct.pack(">I", len(payload)))
            out.extend(typ)
            out.extend(payload)
            out.extend(struct.pack(
                ">I", _zlib.crc32(typ + payload) & 0xFFFFFFFF))

        for typ, payload in chunks:
            if typ == b"IDAT" and len(payload) > 10:
                put(b"IDAT", payload[:7])
                put(b"IDAT", payload[7:])
            else:
                put(typ, payload)
        got = _native.png_decode(bytes(out))
        if got is None:
            pytest.skip("libdeflate unavailable")
        np.testing.assert_array_equal(got, self._pil(bytes(out)))

    @pytest.mark.skipif(not _native.available(), reason="no toolchain")
    def test_bomb_header_rejected_before_allocation(self):
        """A ~100-byte container claiming huge dimensions must not size
        the thread-retained buffers (memory-exhaustion guard): the
        native path declines >32 MiB of pixels and PIL's decompression
        -bomb guard owns the fallback."""
        import struct
        import threading
        import zlib as _zlib
        ihdr = struct.pack(">IIBBBBB", 0xFFFF, 5461, 8, 2, 0, 0, 0)
        data = bytearray(b"\x89PNG\r\n\x1a\n")
        for typ, payload in ((b"IHDR", ihdr), (b"IDAT", b"\x00" * 16),
                             (b"IEND", b"")):
            data.extend(struct.pack(">I", len(payload)))
            data.extend(typ + payload)
            data.extend(struct.pack(
                ">I", _zlib.crc32(typ + payload) & 0xFFFFFFFF))
        sentinel = threading.local()
        orig = _native._png_buf
        _native._png_buf = sentinel  # fresh per-test buffer store
        try:
            assert _native.png_decode(bytes(data)) is None
            buf = getattr(sentinel, "buf", None)
            assert buf is None or len(buf) <= (1 << 25)
        finally:
            _native._png_buf = orig

    @pytest.mark.skipif(not _native.available(), reason="no toolchain")
    def test_critical_chunk_crc_damage_rejected(self):
        """A bit-flipped CRC on a critical chunk must be rejected by
        the native path (PIL rejects such containers; the fast path
        must not silently train on them). The pixel data itself is
        untouched, so only the CRC check can catch this."""
        import struct
        rng = np.random.RandomState(7)
        good = self._png(rng.randint(0, 255, (16, 16, 3), np.uint8))
        if _native.png_decode(good) is None:
            pytest.skip("libdeflate unavailable")
        for target in (b"IHDR", b"IDAT"):
            data = bytearray(good)
            pos = 8
            while pos < len(data):
                ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
                if typ == target:
                    data[pos + 8 + ln] ^= 0x01  # first CRC byte
                    break
                pos += 12 + ln
            assert _native.png_decode(bytes(data)) is None, target

    @pytest.mark.skipif(not _native.available(), reason="no toolchain")
    def test_decode_png_wrapper_uses_fast_path_transparently(self):
        """The public decode_png must give identical results whether
        or not the native path engages."""
        from dl_image_segmentation_tpu.raster.image import decode_png
        rng = np.random.RandomState(3)
        arr = rng.randint(0, 255, (32, 48, 3), np.uint8)
        data = self._png(arr)
        np.testing.assert_array_equal(decode_png(data), arr)
