"""NITF 2.1 codec (raster/nitf.py): round trips across IMODEs,
blocking, dtypes, georeferencing, C8 (JPEG 2000) delegation, universal
ingestion, and loud failures for the unsupported tail — one more entry
of the reference's any-GDAL-readable matrix
(/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:45-53)
decoded in-repo."""

import numpy as np
import pytest

from dl_image_segmentation_tpu.raster.nitf import (decode_nitf,
                                                   encode_nitf,
                                                   is_nitf,
                                                   sniff_nitf_info)


class TestRoundTrip:
    @pytest.mark.parametrize("imode", ["B", "P", "S"])
    def test_multiblock_uint16(self, imode):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 4096, (37, 53, 3)).astype(np.uint16)
        data = encode_nitf(a, imode=imode, block_size=16)
        assert is_nitf(data)
        g = decode_nitf(data)
        np.testing.assert_array_equal(g.array, a)

    def test_single_block_uint8_mono(self):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 255, (32, 30)).astype(np.uint8)
        g = decode_nitf(encode_nitf(a))
        np.testing.assert_array_equal(g.array[:, :, 0], a)

    def test_int16_and_float32(self):
        rng = np.random.RandomState(2)
        si = (rng.randint(-3000, 3000, (16, 16))).astype(np.int16)
        g = decode_nitf(encode_nitf(si))
        np.testing.assert_array_equal(g.array[:, :, 0], si)
        f = rng.rand(16, 16).astype(np.float32)
        g = decode_nitf(encode_nitf(f))
        np.testing.assert_array_equal(g.array[:, :, 0], f)

    def test_c8_jpeg2000_segment(self):
        rng = np.random.RandomState(3)
        a = rng.randint(0, 255, (24, 24, 3)).astype(np.uint8)
        data = encode_nitf(a, compression="C8")
        g = decode_nitf(data)
        np.testing.assert_array_equal(g.array, a)


class TestGeoref:
    def test_utm_corners_roundtrip(self):
        gt = (500000.0, 10.0, 0.0, 2000000.0, 0.0, -10.0)
        a = np.zeros((32, 32), np.uint8)
        data = encode_nitf(a, geotransform=gt, epsg=32643)
        info = sniff_nitf_info(data)
        assert info.epsg == 32643
        assert info.geotransform == gt

    def test_southern_hemisphere(self):
        gt = (400000.0, 20.0, 0.0, 8000000.0, 0.0, -20.0)
        a = np.zeros((16, 16), np.uint8)
        info = sniff_nitf_info(encode_nitf(a, geotransform=gt,
                                           epsg=32719))
        assert info.epsg == 32719
        assert info.geotransform == gt

    def test_no_geo_still_decodes(self):
        a = np.ones((8, 8), np.uint8)
        info = sniff_nitf_info(encode_nitf(a))
        assert info.geotransform is None and info.epsg is None


class TestUniversal:
    def test_decode_image_bytes_and_sniff(self):
        from dl_image_segmentation_tpu.raster.image import (
            decode_image_bytes, sniff_image_info)
        rng = np.random.RandomState(4)
        a = rng.randint(0, 4096, (20, 22, 4)).astype(np.uint16)
        data = encode_nitf(a, block_size=8)
        g = decode_image_bytes(data)
        np.testing.assert_array_equal(g.array, a)
        info = sniff_image_info(data)
        assert (info.height, info.width, info.count) == (20, 22, 4)
        assert info.dtype == "uint16"

    def test_writer_ingests_ntf_chips(self, tmp_path):
        """to-tfrecords --file-ext ntf: NITF chip pairs flow through
        the MP engine like any raster."""
        from dl_image_segmentation_tpu.records.writers import (
            process_dataset_mp)
        rng = np.random.RandomState(5)
        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        gt = (272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        for i in range(4):
            key = f"28:2:10.0:43:{-380 + i}:3491"
            fn = key.replace(":", "#") + ".ntf"
            img = rng.randint(0, 4096, (32, 32, 3)).astype(np.uint16)
            lbl = rng.randint(0, 2, (32, 32)).astype(np.uint8)
            (tmp_path / "images" / fn).write_bytes(
                encode_nitf(img, geotransform=gt, epsg=32643))
            (tmp_path / "labels" / fn).write_bytes(
                encode_nitf(lbl, geotransform=gt, epsg=32643))
        out = tmp_path / "recs"
        n = process_dataset_mp("ntf", str(tmp_path), str(out),
                               num_shards=1, num_proc=1,
                               file_ext="ntf", store_as_array=True)
        assert n == 4

    def test_truncated_raises_cleanly(self):
        a = np.zeros((16, 16), np.uint8)
        data = encode_nitf(a)
        with pytest.raises(Exception):
            decode_nitf(data[:400])

    def test_unsupported_compression_named(self):
        a = np.zeros((8, 8), np.uint8)
        # a spec-consistent subheader with an IC this decoder refuses
        data = encode_nitf(a, compression="C3")
        with pytest.raises(ValueError, match="C3"):
            decode_nitf(data)
