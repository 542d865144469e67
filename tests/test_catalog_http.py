"""Remote HTTP catalog: COG windowed reads (raster/cog.py), the
range-serving scene server, HTTPCatalog search/load parity with
LocalCatalog, real processing_level asset selection, and the
fetch-None/bounded-retry protocol end-to-end under injected 503s —
the role the Descartes Labs service played for the reference
(_descartes_img_chips.py:512-513, 589-593, 612-627, 718-722)."""

import datetime as dt
import json
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.catalog import HTTPCatalog, LocalCatalog
from dl_image_segmentation_tpu.catalog.httpserver import SceneServer
from dl_image_segmentation_tpu.geo import Tile
from dl_image_segmentation_tpu.raster.cog import CogReader
from dl_image_segmentation_tpu.raster.geotiff import (decode_geotiff,
                                                      encode_geotiff)
from dl_image_segmentation_tpu.storage.gcs import GCSError

from test_pipeline import TILE, ZONE, write_labels_geojson


def _counting_fetch(data: bytes):
    stats = {"calls": 0, "bytes": 0}

    def fetch(start, length):
        stats["calls"] += 1
        chunk = data[start:start + length]
        stats["bytes"] += len(chunk)
        return chunk

    return fetch, stats


class TestCogReader:
    @pytest.mark.parametrize("kwargs", [
        dict(tiled=True, compress="lzw"),
        dict(tiled=True, compress="deflate"),
        dict(tiled=False, compress="lzw"),
        dict(tiled=True, compress="none"),
    ])
    def test_window_matches_full_decode(self, kwargs):
        rng = np.random.RandomState(3)
        arr = rng.randint(0, 60000, (150, 130, 4)).astype(np.uint16)
        enc_kwargs = {k: v for k, v in kwargs.items()}
        data = encode_geotiff(arr, geotransform=(0, 10, 0, 0, 0, -10),
                              epsg=32643, **enc_kwargs)
        full = decode_geotiff(data).array
        fetch, _ = _counting_fetch(data)
        r = CogReader(fetch)
        win, (oy, ox) = r.read_window(17, 23, 101, 99)
        assert (oy, ox) == (17, 23)
        np.testing.assert_array_equal(win, full[17:101, 23:99])

    def test_clipping_and_empty(self):
        arr = np.arange(64 * 64, dtype=np.uint16).reshape(64, 64, 1)
        data = encode_geotiff(arr)
        r = CogReader(_counting_fetch(data)[0])
        win, (oy, ox) = r.read_window(-5, 60, 70, 200)
        assert (oy, ox) == (0, 60)
        np.testing.assert_array_equal(win, arr[0:64, 60:64])
        empty, _ = r.read_window(100, 100, 120, 120)
        assert empty.shape[0] == 0

    def test_header_growth_from_tiny_initial(self):
        arr = np.random.RandomState(0).randint(
            0, 255, (96, 96, 3)).astype(np.uint8)
        data = encode_geotiff(arr, geotransform=(5, 1, 0, 9, 0, -1),
                              epsg=32701, nodata=0)
        r = CogReader(_counting_fetch(data)[0], initial_header=64)
        assert r.info.epsg == 32701 and r.info.nodata == 0
        np.testing.assert_array_equal(r.read_full(), arr)

    def test_windowed_read_fetches_small_fraction(self):
        """The point of COG reads: a chip window from a big scene must
        NOT fetch the scene."""
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (2048, 2048, 3)).astype(np.uint8)
        data = encode_geotiff(arr, compress="lzw", tiled=True)
        fetch, stats = _counting_fetch(data)
        r = CogReader(fetch)
        win, _ = r.read_window(1000, 1000, 1064, 1064)
        np.testing.assert_array_equal(win, arr[1000:1064, 1000:1064])
        assert stats["bytes"] < len(data) * 0.1, (
            f"fetched {stats['bytes']} of {len(data)}")

    def test_not_a_tiff_raises_immediately(self):
        fetch, stats = _counting_fetch(b"PNG nonsense" * 100)
        with pytest.raises(ValueError, match="not a TIFF"):
            CogReader(fetch)
        assert stats["calls"] == 1  # no futile growth loop

    def test_sparse_tiles_read_as_zeros(self):
        """GDAL writes sparse COGs with offset=0/count=0 for empty
        tiles; those must fill with zeros, not crash the decoder."""
        import struct
        arr = np.arange(128 * 128, dtype=np.uint16).reshape(128, 128, 1)
        data = bytearray(encode_geotiff(arr, tiled=True, compress="lzw",
                                        tile_size=64))
        # walk the classic little-endian IFD to the TileOffsets (324)
        # and TileByteCounts (325) arrays and zero entry 3 (tile 1,1)
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (n_entries,) = struct.unpack_from("<H", data, ifd_off)
        patched = 0
        for k in range(n_entries):
            e = ifd_off + 2 + 12 * k
            tag, typ, cnt, val = struct.unpack_from("<HHII", data, e)
            if tag in (324, 325):
                assert cnt == 4  # 2x2 grid of 64x64 tiles
                size = 4 if typ == 4 else 8
                struct.pack_into("<I" if typ == 4 else "<Q",
                                 data, val + 3 * size, 0)
                patched += 1
        assert patched == 2
        r = CogReader(_counting_fetch(bytes(data))[0])
        full = r.read_full()
        np.testing.assert_array_equal(full[:64, :64], arr[:64, :64])
        assert (full[64:, 64:] == 0).all()
        win, _ = r.read_window(100, 100, 120, 120)  # inside the hole
        assert (win == 0).all()


@pytest.fixture(scope="module")
def catalog_root(tmp_path_factory):
    """A LocalCatalog root with one big scene + a small late scene,
    plus a multi-level scene entry (assets: surface vs toa)."""
    root = str(tmp_path_factory.mktemp("httpcat") / "cat")
    cat = LocalCatalog.create(root)
    x0, y0, x1, y1 = TILE.bounds
    rng = np.random.RandomState(7)
    # big scene: 2048^2 at 10 m (64 internal 256^2 TIFF tiles), the
    # chip window sits strictly inside
    big = rng.randint(0, 3000, (2048, 2048, 3)).astype(np.uint16)
    gt_big = (x0 - 9600.0, 10.0, 0.0, y1 + 9600.0, 0.0, -10.0)
    cat.add_scene("sentinel-2:L1C", ["red", "green", "blue"], "big",
                  dt.date(2020, 10, 20), big, gt_big,
                  epsg=32600 + ZONE, cloud_fraction=0.05)
    # exact-grid scene, later date
    small = rng.randint(0, 3000, (64, 64, 3)).astype(np.uint16)
    cat.add_scene("sentinel-2:L1C", ["red", "green", "blue"], "small",
                  dt.date(2020, 11, 5), small, TILE.geotrans,
                  epsg=32600 + ZONE, cloud_fraction=0.01)
    # multi-level product: surface and toa assets differ by content
    surf = np.full((64, 64, 1), 100, np.uint16)
    toa = np.full((64, 64, 1), 200, np.uint16)
    from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
    write_geotiff(os.path.join(root, "scenes", "lv_sr.tif"), surf,
                  geotransform=TILE.geotrans, epsg=32600 + ZONE)
    write_geotiff(os.path.join(root, "scenes", "lv_toa.tif"), toa,
                  geotransform=TILE.geotrans, epsg=32600 + ZONE)
    idx_path = os.path.join(root, "index.json")
    with open(idx_path) as f:
        idx = json.load(f)
    bounds = [x0, y0, x1, y1]
    idx["products"]["levels:demo"] = {
        "bands": ["b"],
        "scenes": [{"id": "lv", "date": "2020-06-01", "bounds": bounds,
                    "assets": {"surface": "scenes/lv_sr.tif",
                               "toa": "scenes/lv_toa.tif"}},
                   {"id": "lv-missing", "date": "2020-06-02",
                    "bounds": bounds,
                    "assets": {"toa": "scenes/lv_toa.tif"}}]}
    with open(idx_path, "w") as f:
        json.dump(idx, f)
    return root


class TestHTTPCatalog:
    def test_search_load_matches_local(self, catalog_root):
        local = LocalCatalog(catalog_root)
        with SceneServer(catalog_root) as srv:
            remote = HTTPCatalog(srv.url)
            for resampler in ("near", "bilinear"):
                ls = local.search(TILE, "sentinel-2:L1C",
                                  start=dt.date(2020, 1, 1),
                                  end=dt.date(2020, 12, 31),
                                  max_cloud_fraction=0.2)
                rs = remote.search(TILE, "sentinel-2:L1C",
                                   start=dt.date(2020, 1, 1),
                                   end=dt.date(2020, 12, 31),
                                   max_cloud_fraction=0.2)
                assert [m.scene_id for m in rs] == \
                    [m.scene_id for m in ls]
                lstack, lvalid = local.load(ls, TILE,
                                            ["red", "blue"],
                                            resampler=resampler)
                rstack, rvalid = remote.load(rs, TILE,
                                             ["red", "blue"],
                                             resampler=resampler)
                np.testing.assert_array_equal(rstack, lstack)
                np.testing.assert_array_equal(rvalid, lvalid)

    def test_windowed_reads_stay_small(self, catalog_root):
        scene_bytes = os.path.getsize(
            os.path.join(catalog_root, "scenes", "big.tif"))
        with SceneServer(catalog_root) as srv:
            remote = HTTPCatalog(srv.url)
            scenes = [m for m in remote.search(TILE, "sentinel-2:L1C")
                      if m.scene_id == "big"]
            remote.load(scenes, TILE, ["red"])
            assert srv.range_requests > 0
            # a ~68^2 window intersects at most 4 of the 64 internal
            # 256^2 tiles: ~6% of the scene + the header prefix
            assert srv.bytes_served < scene_bytes * 0.12, (
                f"served {srv.bytes_served} of {scene_bytes}")

    def test_processing_level_is_real(self, catalog_root):
        with SceneServer(catalog_root) as srv:
            surf = HTTPCatalog(srv.url, processing_level="surface")
            toa = HTTPCatalog(srv.url, processing_level="toa")
            s1 = surf.search(TILE, "levels:demo")
            s2 = toa.search(TILE, "levels:demo")
            # the scene without a surface asset is skipped loudly
            assert [m.scene_id for m in s1] == ["lv"]
            assert surf.skipped_levels == 1
            assert [m.scene_id for m in s2] == ["lv", "lv-missing"]
            a1, _ = surf.load(s1, TILE, ["b"])
            a2, _ = toa.load(s2[:1], TILE, ["b"])
            assert (a1 == 100).all() and (a2 == 200).all()
            # per-call override beats the constructor default
            s3 = surf.search(TILE, "levels:demo", processing_level="toa")
            assert [m.scene_id for m in s3] == ["lv", "lv-missing"]

    def test_transient_503s_retried(self, catalog_root):
        with SceneServer(catalog_root) as srv:
            remote = HTTPCatalog(srv.url)
            scenes = remote.search(TILE, "sentinel-2:L1C")
            srv.fail_next(2, status=503)
            stack, valid = remote.load(scenes[:1], TILE, ["red"])
            assert stack.shape[0] == 1

    def test_persistent_failure_raises(self, catalog_root):
        with SceneServer(catalog_root) as srv:
            srv.fail_next(1000, status=503)
            with pytest.raises(GCSError):
                HTTPCatalog(srv.url, max_attempts=2)

    def test_missing_index_raises(self, tmp_path):
        os.makedirs(tmp_path / "empty", exist_ok=True)
        with SceneServer(str(tmp_path / "empty")) as srv:
            with pytest.raises(FileNotFoundError):
                HTTPCatalog(srv.url)


class TestEndToEndExport:
    def test_create_chips_against_flaky_http_catalog(self, catalog_root,
                                                     tmp_path):
        """The reference's operating regime: a flaky remote catalog,
        fetch errors returning (job, None, None), the driver's retry
        loop finishing the export anyway (create nb cells 76, 82-83)."""
        from dl_image_segmentation_tpu.pipeline.chips import (
            DLSampleCreationConfig, OGRLabelDataDesc)
        from dl_image_segmentation_tpu.pipeline.export import run_export

        labels = write_labels_geojson(str(tmp_path / "labels.geojson"))
        with SceneServer(catalog_root) as srv:
            remote = HTTPCatalog(srv.url, max_attempts=2)
            cfg = DLSampleCreationConfig(
                tile_size=56, tile_padding=2, tile_res_m=10.0,
                dl_product="sentinel-2:L1C", bands="red green blue",
                sample_folder_root=str(tmp_path / "chips"),
                source_tag="s2http",
                label_data_config=OGRLabelDataDesc(labels, 0, "cls"),
                max_cloud_fraction=0.5, catalog=remote)
            jobs = cfg.create_tile_job_configs(
                "Mumbai", 2020, ref_date=dt.date(2020, 11, 1),
                min_date=dt.date(2020, 1, 1),
                max_date=dt.date(2020, 12, 31))
            assert jobs
            # every HTTP request fails once in a while: with
            # max_attempts=2 SOME loads fail through to the chip
            # layer's None protocol; run_export's retry loop recovers
            srv.fail_next(3, status=503)
            result = run_export(jobs, n_workers=2, max_attempts=5,
                                progress=None)
            assert result.ok and result.failed == []
            assert result.completed + result.skipped_existing \
                == len(jobs)
            out_root = jobs[0].OUTFOLDER
            imgs = sorted(os.listdir(os.path.join(out_root, "images")))
            lbls = sorted(os.listdir(os.path.join(out_root, "labels")))
            assert imgs == lbls and len(imgs) == len(jobs)


class TestLocalWindowedReads:
    def test_big_scene_windowed_path_identical(self, catalog_root):
        """LocalCatalog reads big scenes WINDOWED (pread + CogReader,
        memory-bounded); results must be byte-identical to the
        whole-decode path for every resampler."""
        full = LocalCatalog(catalog_root)           # default threshold
        windowed = LocalCatalog(catalog_root, window_bytes=1)
        for resampler in ("near", "bilinear", "cubic"):
            fs = full.search(TILE, "sentinel-2:L1C")
            ws = windowed.search(TILE, "sentinel-2:L1C")
            assert [m.scene_id for m in ws] == [m.scene_id for m in fs]
            f_stack, f_valid = full.load(fs, TILE, ["red", "blue"],
                                         resampler=resampler)
            w_stack, w_valid = windowed.load(ws, TILE, ["red", "blue"],
                                             resampler=resampler)
            np.testing.assert_array_equal(w_stack, f_stack)
            np.testing.assert_array_equal(w_valid, f_valid)

    def test_windowed_cross_zone(self, tmp_path):
        import datetime as dt
        from test_crosszone import SRC_ZONE, _zone42_scene_for_tile
        arr, gt = _zone42_scene_for_tile(TILE)
        root = str(tmp_path / "cat")
        cat = LocalCatalog.create(root)
        cat.add_scene("p", ["col", "row"], "z42", dt.date(2020, 6, 1),
                      arr, gt, epsg=32600 + SRC_ZONE)
        full = LocalCatalog(root)
        windowed = LocalCatalog(root, window_bytes=1)
        f_stack, f_valid = full.load(full.search(TILE, "p"), TILE,
                                     ["col", "row"])
        w_stack, w_valid = windowed.load(windowed.search(TILE, "p"),
                                         TILE, ["col", "row"])
        np.testing.assert_array_equal(w_stack, f_stack)
        np.testing.assert_array_equal(w_valid, f_valid)
