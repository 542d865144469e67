"""Raster codec tests: LZW vs libtiff both directions, GeoTIFF
round-trips across dtypes/band-counts, geo tags, nodata, third-party
interop (PIL + cv2 read our files; we read theirs)."""

import io
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.raster.lzw import lzw_decode, lzw_encode
from dl_image_segmentation_tpu.raster.geotiff import (
    decode_geotiff, encode_geotiff, read_geotiff, write_geotiff)
from dl_image_segmentation_tpu.raster.image import (
    decode_image_bytes, decode_png, encode_png, encode_jpeg, png_to_jpeg)


class TestLZW:
    def test_roundtrip_cases(self):
        rng = np.random.RandomState(0)
        cases = [
            b"", b"a", b"ab" * 5, b"aaaaaaaaaaaa",
            bytes(range(256)) * 20,
            rng.randint(0, 256, 100000, np.uint8).tobytes(),  # table resets
            rng.randint(0, 4, 150000, np.uint8).tobytes(),
            b"TOBEORNOTTOBEORTOBEORNOT" * 3000,
        ]
        for i, c in enumerate(cases):
            assert lzw_decode(lzw_encode(c)) == c, f"case {i}"

    def test_libtiff_decodes_ours(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 256, (300, 200), np.uint8)
        data = encode_geotiff(arr, compress="lzw", tiled=False)
        got = cv2.imdecode(np.frombuffer(data, np.uint8),
                           cv2.IMREAD_UNCHANGED)
        assert got is not None
        np.testing.assert_array_equal(got, arr)

    def test_we_decode_libtiff(self):
        from PIL import Image
        rng = np.random.RandomState(2)
        arr = rng.randint(0, 256, (128, 128), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="TIFF",
                                  compression="tiff_lzw")
        got = decode_geotiff(buf.getvalue())
        np.testing.assert_array_equal(got.array[:, :, 0], arr)


class TestGeoTIFF:
    @pytest.mark.parametrize("dtype,bands", [
        ("uint8", 3), ("uint8", 1), ("uint16", 4), ("uint16", 13),
        ("int16", 2), ("float32", 5), ("uint32", 1), ("float64", 1),
    ])
    def test_roundtrip_dtypes(self, dtype, bands):
        rng = np.random.RandomState(3)
        if np.dtype(dtype).kind == "f":
            arr = rng.rand(37, 51, bands).astype(dtype)
        else:
            hi = min(np.iinfo(dtype).max, 10000)
            arr = rng.randint(0, hi, (37, 51, bands)).astype(dtype)
        data = encode_geotiff(arr)
        out = decode_geotiff(data)
        np.testing.assert_array_equal(out.array, arr)
        assert out.info.dtype == dtype
        assert out.info.count == bands

    @pytest.mark.parametrize("compress", ["none", "lzw", "deflate"])
    def test_compressions(self, compress):
        rng = np.random.RandomState(4)
        arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
        out = decode_geotiff(encode_geotiff(arr, compress=compress))
        np.testing.assert_array_equal(out.array, arr)

    def test_tiled_vs_striped(self):
        rng = np.random.RandomState(5)
        arr = rng.randint(0, 255, (300, 271, 4), np.uint16)
        a = decode_geotiff(encode_geotiff(arr, tiled=True))
        b = decode_geotiff(encode_geotiff(arr, tiled=False))
        np.testing.assert_array_equal(a.array, arr)
        np.testing.assert_array_equal(b.array, arr)

    def test_geo_tags_roundtrip(self):
        arr = np.zeros((16, 16), np.uint8)
        gt = (272696.0, 1.0, 0.0, 2115548.0, 0.0, -1.0)
        data = encode_geotiff(arr, geotransform=gt, epsg=32643, nodata=255)
        out = decode_geotiff(data)
        assert out.info.geotransform == gt
        assert out.info.epsg == 32643
        assert out.info.nodata == 255
        assert out.info.crs == "EPSG:32643"
        assert "32643" in out.info.wkt

    def test_file_roundtrip(self, tmp_path):
        arr = np.arange(16 * 16 * 2, dtype=np.uint16).reshape(16, 16, 2)
        p = str(tmp_path / "x.tif")
        write_geotiff(p, arr, epsg=32601)
        out = read_geotiff(p)
        np.testing.assert_array_equal(out.array, arr)

    def test_pil_reads_our_geotiff(self, tmp_path):
        from PIL import Image
        rng = np.random.RandomState(6)
        arr = rng.randint(0, 255, (100, 80, 3), np.uint8)
        p = str(tmp_path / "rgb.tif")
        write_geotiff(p, arr, geotransform=(0, 1, 0, 100, 0, -1),
                      epsg=32643)
        got = np.asarray(Image.open(p))
        np.testing.assert_array_equal(got, arr)

    def test_we_read_pil_multiband(self):
        from PIL import Image
        rng = np.random.RandomState(7)
        arr = rng.randint(0, 255, (40, 60, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="TIFF",
                                  compression="tiff_adobe_deflate")
        out = decode_geotiff(buf.getvalue())
        np.testing.assert_array_equal(out.array, arr)

    def test_we_read_cv2_uint16(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(8)
        arr = rng.randint(0, 60000, (50, 70), np.uint16)
        ok, data = cv2.imencode(".tif", arr)
        assert ok
        out = decode_geotiff(data.tobytes())
        np.testing.assert_array_equal(out.array[:, :, 0], arr)


class TestImageCodec:
    def test_png_roundtrip(self):
        rng = np.random.RandomState(9)
        arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
        out = decode_png(encode_png(arr))
        np.testing.assert_array_equal(out, arr)

    def test_png_gray_roundtrip(self):
        arr = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32, 1) % 255
        out = decode_png(encode_png(arr))
        np.testing.assert_array_equal(out, arr)

    def test_jpeg_decodes(self):
        arr = np.full((32, 32, 3), 128, np.uint8)
        data = encode_jpeg(arr)
        out = decode_image_bytes(data)
        assert out.array.shape == (32, 32, 3)

    def test_png_to_jpeg(self):
        arr = np.full((16, 16, 3), 200, np.uint8)
        jpg = png_to_jpeg(encode_png(arr))
        assert jpg[:3] == b"\xff\xd8\xff"

    def test_sniffing(self):
        arr = np.zeros((8, 8, 3), np.uint8)
        assert decode_image_bytes(encode_png(arr)).array.shape == (8, 8, 3)
        assert decode_image_bytes(encode_geotiff(arr)).array.shape == (8, 8, 3)
        with pytest.raises(ValueError):
            decode_image_bytes(b"garbage-bytes")


class TestLZWFuzz:
    def test_random_length_roundtrips(self):
        """Fuzz: random contents and lengths through both codecs."""
        from dl_image_segmentation_tpu import _native
        rng = np.random.RandomState(42)
        for trial in range(40):
            n = int(rng.randint(0, 5000))
            alphabet = int(rng.choice([2, 8, 256]))
            data = rng.randint(0, alphabet, n).astype(np.uint8).tobytes()
            enc_py = lzw_encode(data)
            assert lzw_decode(enc_py) == data, trial
            if _native.available():
                enc_c = _native.lzw_encode(data)
                assert enc_c == enc_py, trial
                assert _native.lzw_decode(enc_c) == data, trial

    def test_bigtiff_rejected_with_clear_message(self):
        from dl_image_segmentation_tpu.raster.geotiff import decode_geotiff
        with pytest.raises(ValueError, match="BigTIFF"):
            decode_geotiff(b"II+\x00" + b"\x00" * 32)


class TestBigTIFF:
    def test_roundtrip_all_layouts(self, tmp_path):
        from dl_image_segmentation_tpu.raster.geotiff import (
            decode_geotiff, encode_geotiff)
        rng = np.random.RandomState(0)
        for dtype, tiled, comp in [(np.uint16, True, "lzw"),
                                   (np.uint8, False, "none"),
                                   (np.float32, True, "deflate")]:
            arr = (rng.rand(70, 50, 3) * 1000).astype(dtype)
            data = encode_geotiff(arr, geotransform=(5, 10, 0, 900, 0, -10),
                                  epsg=32643, nodata=7, tiled=tiled,
                                  compress=comp, bigtiff=True)
            assert data[:4] == b"II+\x00"
            g = decode_geotiff(data)
            np.testing.assert_array_equal(g.array, arr)
            assert g.info.epsg == 32643
            assert g.info.geotransform[0] == 5
            assert g.info.nodata == 7

    def test_auto_picks_classic_for_small_data(self):
        """bigtiff="auto" decides from the ACTUAL compressed size: a
        small mosaic stays classic TIFF (max compatibility)."""
        from dl_image_segmentation_tpu.raster.geotiff import (
            decode_geotiff, encode_geotiff)
        rng = np.random.RandomState(4)
        arr = (rng.rand(64, 64, 3) * 250).astype(np.uint8)
        data = encode_geotiff(arr, bigtiff="auto")
        assert data[:4] == b"II*\x00"
        np.testing.assert_array_equal(decode_geotiff(data).array, arr)

    def test_classic_overflowing_offsets_raises_clearly(self, monkeypatch):
        """Laying out classic-TIFF offsets past 4 GiB must raise a
        clear ValueError, not a struct.error deep in packing (LZW can
        EXPAND noisy data past a caller's raw-size heuristic)."""
        from dl_image_segmentation_tpu.raster import geotiff as gt

        class _FakeChunk(bytes):
            def __len__(self):
                return 5 << 29  # each fake chunk claims 2.5 GiB

        def fake_lzw(raw):
            return _FakeChunk(b"x")

        monkeypatch.setattr(gt, "_lzw_encode_fast", fake_lzw)
        arr = np.zeros((512, 512), np.uint8)  # 2 tiles of 256 -> 2 chunks
        with pytest.raises(ValueError, match="4 GiB"):
            gt.encode_geotiff(arr, tiled=True, tile_size=256,
                              bigtiff=False)
        # and "auto" on the same data flips to BigTIFF instead
        data = gt.encode_geotiff(arr, tiled=True, tile_size=256,
                                 bigtiff="auto")
        assert data[:4] == b"II+\x00"

    def test_pil_reads_our_bigtiff(self, tmp_path):
        """External-convention check: Pillow decodes our BigTIFF."""
        from PIL import Image
        import io as _io
        from dl_image_segmentation_tpu.raster.geotiff import encode_geotiff
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (40, 30), np.uint8)
        data = encode_geotiff(arr, tiled=False, compress="none",
                              bigtiff=True)
        try:
            ext = np.asarray(Image.open(_io.BytesIO(data)))
        except Exception:
            pytest.skip("Pillow build lacks BigTIFF read support")
        np.testing.assert_array_equal(ext, arr)

    def test_dispatch_through_decode_image_bytes(self):
        from dl_image_segmentation_tpu.raster.geotiff import encode_geotiff
        from dl_image_segmentation_tpu.raster.image import (
            decode_image_bytes, sniff_image_info)
        rng = np.random.RandomState(2)
        arr = (rng.rand(20, 20, 4) * 4000).astype(np.uint16)
        data = encode_geotiff(arr, bigtiff=True)
        info = sniff_image_info(data)
        assert (info.height, info.width, info.count) == (20, 20, 4)
        np.testing.assert_array_equal(decode_image_bytes(data).array, arr)


class TestFloatPredictor:
    """TIFF floating-point predictor (3) decode, as GDAL writes for
    float rasters with PREDICTOR=3. The fixture applies the forward
    transform by hand (big-endian byte planes per row, then byte-wise
    horizontal differencing) so the decoder is tested independently."""

    @staticmethod
    def _forward_fpredictor(arr: np.ndarray) -> bytes:
        h, w, spp = arr.shape
        k = arr.dtype.itemsize
        out = bytearray()
        for r in range(h):
            be = arr[r].astype(arr.dtype.newbyteorder(">"))
            rowb = np.frombuffer(be.tobytes(), np.uint8)
            planes = rowb.reshape(w * spp, k).T.reshape(-1)  # MSBs first
            diff = np.diff(planes.astype(np.int16),
                           prepend=np.int16(0)).astype(np.uint8)
            out += diff.tobytes()
        return bytes(out)

    @staticmethod
    def _minimal_tiff(h, w, spp, payload: bytes, predictor: int,
                      bits: int, sfmt: int, photometric: int = 1) -> bytes:
        import struct
        tags = [  # (tag, type, count, value)
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
            (259, 3, 1, 1), (262, 3, 1, photometric), (277, 3, 1, spp),
            (278, 3, 1, h), (317, 3, 1, predictor), (339, 3, 1, sfmt),
        ]
        n = len(tags) + 2  # + StripOffsets/ByteCounts below
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * n + 4
        tags += [(273, 4, 1, data_off), (279, 4, 1, len(payload))]
        tags.sort()
        out = b"II*\x00" + struct.pack("<I", ifd_off)
        out += struct.pack("<H", n)
        for tid, ttype, cnt, val in tags:
            ch = "H" if ttype == 3 else "I"
            raw = struct.pack("<" + ch, val).ljust(4, b"\x00")
            out += struct.pack("<HHI", tid, ttype, cnt) + raw
        out += struct.pack("<I", 0)
        return out + payload

    def test_float32_predictor3_roundtrip(self):
        from dl_image_segmentation_tpu.raster.geotiff import decode_geotiff
        rng = np.random.RandomState(11)
        arr = (rng.rand(13, 9, 1) * 1000 - 500).astype(np.float32)
        payload = self._forward_fpredictor(arr)
        tif = self._minimal_tiff(13, 9, 1, payload, predictor=3,
                                 bits=32, sfmt=3)
        g = decode_geotiff(tif)
        np.testing.assert_array_equal(g.array, arr)

    def test_unknown_predictor_raises(self):
        from dl_image_segmentation_tpu.raster.geotiff import decode_geotiff
        arr = np.zeros((4, 4, 1), np.uint8)
        tif = self._minimal_tiff(4, 4, 1, arr.tobytes(), predictor=7,
                                 bits=8, sfmt=1)
        with pytest.raises(ValueError, match="predictor 7"):
            decode_geotiff(tif)

    def test_predictor3_on_int_samples_raises(self):
        from dl_image_segmentation_tpu.raster.geotiff import decode_geotiff
        arr = np.zeros((4, 4, 1), np.uint8)
        tif = self._minimal_tiff(4, 4, 1, arr.tobytes(), predictor=3,
                                 bits=8, sfmt=1)
        with pytest.raises(ValueError, match="non-float"):
            decode_geotiff(tif)

    def test_predictor2_on_float_samples_raises(self):
        """The int-domain cumsum would truncate fractional deltas --
        must refuse, not silently decode garbage."""
        from dl_image_segmentation_tpu.raster.geotiff import decode_geotiff
        arr = np.zeros((4, 4, 1), np.float32)
        tif = self._minimal_tiff(4, 4, 1, arr.tobytes(), predictor=2,
                                 bits=32, sfmt=3)
        with pytest.raises(ValueError, match="float samples"):
            decode_geotiff(tif)

    def test_palette_photometric_raises(self):
        """Palette-color TIFFs (photometric 3) carry indices, not
        pixels; decoding them as pixels would be silently wrong."""
        from dl_image_segmentation_tpu.raster.geotiff import decode_geotiff
        arr = np.zeros((4, 4, 1), np.uint8)
        tif = self._minimal_tiff(4, 4, 1, arr.tobytes(), predictor=1,
                                 bits=8, sfmt=1, photometric=3)
        with pytest.raises(ValueError, match="palette"):
            decode_geotiff(tif)


class TestEncodeEdges:
    def test_nan_nodata_roundtrip(self):
        from dl_image_segmentation_tpu.raster.geotiff import (
            decode_geotiff, encode_geotiff)
        arr = np.zeros((8, 8, 1), np.float32)
        data = encode_geotiff(arr, nodata=float("nan"))
        info = decode_geotiff(data).info
        assert np.isnan(info.nodata)

    def test_geographic_epsg_roundtrip(self):
        from dl_image_segmentation_tpu.raster.geotiff import (
            decode_geotiff, encode_geotiff)
        arr = np.zeros((8, 8, 1), np.uint8)
        data = encode_geotiff(arr, geotransform=(10, 0.1, 0, 50, 0, -0.1),
                              epsg=4326)
        info = decode_geotiff(data).info
        assert info.epsg == 4326
        # GTModelType must be geographic (2), key 1024
        from dl_image_segmentation_tpu.raster.geotiff import _parse_ifd
        _, tags = _parse_ifd(data)
        gk = tags[34735]
        keys = {int(gk[4 + k * 4]): int(gk[4 + k * 4 + 3])
                for k in range(int(gk[3]))}
        assert keys[1024] == 2 and keys[2048] == 4326

    def test_write_geotiff_atomic_no_tmp_left(self, tmp_path):
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        p = str(tmp_path / "a.tif")
        write_geotiff(p, np.zeros((8, 8), np.uint8))
        assert os.listdir(tmp_path) == ["a.tif"]

    def test_python_lzw_max_size_matches_native(self):
        from dl_image_segmentation_tpu import _native
        from dl_image_segmentation_tpu.raster import lzw as pylzw
        payload = bytes(range(256)) * 8
        enc = pylzw.lzw_encode(payload)
        for cap in (1, 100, 1000, len(payload)):
            got_py = pylzw.lzw_decode(enc, max_size=cap)
            assert len(got_py) == cap
            assert got_py == payload[:cap]
            if _native.available():
                got_c = _native.lzw_decode(enc, max_size=cap)
                assert got_c == got_py


class TestPaletteAndSniffConsistency:
    def test_paletted_png_expands_to_rgb(self):
        """tf.image.decode_png expands palettes to RGB (the reference's
        decoder); palette INDICES must never be stored as pixels, and
        the sniffed band count must match the decode."""
        import io
        from PIL import Image
        from dl_image_segmentation_tpu.raster.image import (
            decode_png, sniff_image_info)
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 255, (16, 16, 3), np.uint8)
        p = Image.fromarray(rgb).quantize(colors=16)
        buf = io.BytesIO()
        p.save(buf, "PNG")
        data = buf.getvalue()
        arr = decode_png(data)
        assert arr.shape == (16, 16, 3)
        np.testing.assert_array_equal(
            arr, np.asarray(p.convert("RGB")))
        info = sniff_image_info(data)
        assert info.count == 3 and info.dtype == "uint8"

    def test_gif_first_frame_expands_to_rgb(self):
        import io
        from PIL import Image
        from dl_image_segmentation_tpu.raster.image import decode_image
        rng = np.random.RandomState(1)
        rgb = rng.randint(0, 255, (8, 8, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, "GIF")
        arr = decode_image(buf.getvalue())
        assert arr.shape == (8, 8, 3)

    def test_gif_sniff_matches_decode_bands(self):
        """GIF header-only sniff mirrors PIL's first-frame mode: a
        grayscale identity-ramp palette decodes as 1 band, any colour
        or permuted-grey palette expands to RGB."""
        import io
        from PIL import Image
        from dl_image_segmentation_tpu.raster.image import (
            decode_image, sniff_image_info)
        rng = np.random.RandomState(4)
        cases = []
        grey = Image.fromarray(
            np.arange(64, dtype=np.uint8).reshape(8, 8), "L")
        cases.append(grey)
        cases.append(Image.fromarray(
            rng.randint(0, 255, (8, 8, 3), np.uint8)))
        permuted = grey.convert("P")
        permuted.putpalette(sum(([(i * 37) % 256] * 3
                                 for i in range(256)), []))
        cases.append(permuted)
        for img in cases:
            buf = io.BytesIO()
            img.save(buf, "GIF")
            data = buf.getvalue()
            arr = decode_image(data)
            si = sniff_image_info(data)
            assert (si.height, si.width, si.count) == arr.shape
            assert si.dtype == arr.dtype.name

    def test_bmp_sniff_matches_decode_bands(self):
        import io
        from PIL import Image
        from dl_image_segmentation_tpu.raster.image import (
            decode_image, sniff_image_info)
        rng = np.random.RandomState(2)
        cases = []
        grey = Image.fromarray(rng.randint(0, 255, (8, 8), np.uint8), "L")
        cases.append(grey)                       # 8-bpp grey palette
        rgbi = Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8))
        cases.append(rgbi)                       # 24-bpp
        cases.append(rgbi.quantize(colors=16))   # 8-bpp colour palette
        for img in cases:
            buf = io.BytesIO()
            img.save(buf, "BMP")
            data = buf.getvalue()
            assert (sniff_image_info(data).count
                    == decode_image(data).shape[2]), img.mode

    def test_jpeg_sniff_tolerates_fill_bytes(self):
        """0xFF fill bytes before a marker are spec-legal; the SOF
        walk must skip them instead of mis-parsing a length."""
        import io
        from PIL import Image
        from dl_image_segmentation_tpu.raster.image import sniff_image_info
        rng = np.random.RandomState(3)
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (16, 24, 3), np.uint8)) \
            .save(buf, "JPEG")
        data = bytearray(buf.getvalue())
        i = bytes(data).find(b"\xff\xc0")
        assert i > 0
        padded = bytes(data[:i]) + b"\xff\xff" + bytes(data[i:])
        info = sniff_image_info(padded)
        assert (info.height, info.width, info.count) == (16, 24, 3)
