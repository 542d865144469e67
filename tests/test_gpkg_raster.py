"""GeoPackage raster tiles (raster/gpkg_raster.py): assembly, grid
georeferencing, sniffing, universal ingestion — another entry of the
reference's any-GDAL-readable matrix
(/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:45-53)
decoded in-repo (stdlib sqlite3 + the in-repo PNG codec)."""

import numpy as np
import pytest

from dl_image_segmentation_tpu.raster.gpkg_raster import (decode_gpkg,
                                                          encode_gpkg,
                                                          is_gpkg,
                                                          sniff_gpkg_info)

GT = (272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0)


class TestRoundTrip:
    def test_multi_tile_rgb(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 255, (300, 520, 3)).astype(np.uint8)
        data = encode_gpkg(a, geotransform=GT, epsg=32643,
                           tile_size=256)
        assert is_gpkg(data)
        g = decode_gpkg(data)
        # matrix extent rounds up to whole tiles; content matches,
        # pad rows/cols are zero (GDAL edge-tile behaviour)
        assert g.array.shape == (512, 768, 3)
        np.testing.assert_array_equal(g.array[:300, :520], a)
        assert (g.array[300:] == 0).all()

    def test_uint16_single_band(self):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 4096, (40, 40)).astype(np.uint16)
        g = decode_gpkg(encode_gpkg(a, tile_size=32))
        np.testing.assert_array_equal(g.array[:40, :40, 0], a)

    def test_named_table(self):
        a = np.ones((8, 8), np.uint8)
        data = encode_gpkg(a, table="dem", tile_size=8)
        assert decode_gpkg(data, table="dem").array.shape == (8, 8, 1)
        with pytest.raises(ValueError, match="named 'other'"):
            decode_gpkg(data, table="other")


class TestGeo:
    def test_sniff_grid_and_epsg(self):
        a = np.zeros((60, 90), np.uint8)
        info = sniff_gpkg_info(encode_gpkg(a, geotransform=GT,
                                           epsg=32643, tile_size=32))
        assert info.epsg == 32643
        assert info.geotransform == GT
        assert (info.width, info.height) == (96, 64)
        assert info.dtype == "uint8"

    def test_no_epsg(self):
        a = np.zeros((8, 8), np.uint8)
        info = sniff_gpkg_info(encode_gpkg(a, tile_size=8))
        assert info.epsg is None


class TestUniversal:
    def test_decode_image_bytes(self):
        from dl_image_segmentation_tpu.raster.image import (
            decode_image_bytes, sniff_image_info)
        rng = np.random.RandomState(2)
        a = rng.randint(0, 255, (16, 24, 3)).astype(np.uint8)
        data = encode_gpkg(a, tile_size=16)
        g = decode_image_bytes(data)
        np.testing.assert_array_equal(g.array[:16, :24], a)
        assert sniff_image_info(data).count == 3

    def test_writer_ingests_gpkg_chips(self, tmp_path):
        from dl_image_segmentation_tpu.records.writers import (
            process_dataset_mp)
        rng = np.random.RandomState(3)
        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        for i in range(3):
            key = f"28:2:10.0:43:{-380 + i}:3491"
            fn = key.replace(":", "#") + ".gpkg"
            img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
            lbl = rng.randint(0, 2, (32, 32)).astype(np.uint8)
            (tmp_path / "images" / fn).write_bytes(
                encode_gpkg(img, geotransform=GT, epsg=32643,
                            tile_size=32))
            (tmp_path / "labels" / fn).write_bytes(
                encode_gpkg(lbl, geotransform=GT, epsg=32643,
                            tile_size=32))
        out = tmp_path / "recs"
        n = process_dataset_mp("gp", str(tmp_path), str(out),
                               num_shards=1, num_proc=1,
                               file_ext="gpkg", store_as_array=True)
        assert n == 3

    def test_corrupt_database_raises_cleanly(self):
        from dl_image_segmentation_tpu.raster.image import (
            CorruptRasterError, decode_image_bytes)
        a = np.zeros((8, 8), np.uint8)
        data = bytearray(encode_gpkg(a, tile_size=8))
        data[2000 % len(data):2600 % len(data)] = b"\xff" * 600
        with pytest.raises((CorruptRasterError, ValueError)):
            decode_image_bytes(bytes(data))

    def test_vector_only_gpkg_named_error(self):
        """A features-only GeoPackage is a valid database with no
        tiles table: the error names that."""
        import sqlite3
        conn = sqlite3.connect(":memory:")
        conn.executescript("""
            PRAGMA application_id = 1196444487;
            CREATE TABLE gpkg_contents (
                table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
                srs_id INTEGER);
            INSERT INTO gpkg_contents VALUES ('roads', 'features', 0);
        """)
        conn.commit()
        data = bytes(conn.serialize())
        conn.close()
        assert is_gpkg(data)
        with pytest.raises(ValueError, match="tiles"):
            decode_gpkg(data)
