"""Chip-creation pipeline tests: tile planning, compositing dispatch,
label burning, GeoTIFF pair contract, resume + retry, catalogs."""

import datetime as dt
import json
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.catalog import (LocalCatalog,
                                               SyntheticCatalog)
from dl_image_segmentation_tpu.geo import Tile, crs
from dl_image_segmentation_tpu.pipeline.chips import (
    DLSampleCreationConfig, DLTileJobConfig, OGRLabelDataDesc,
    create_chips_for_tile, create_cloudmasked_s2_array,
    create_img_array_for_tile, create_label_array_for_tile, is_done,
    stack_products_for_tile)
from dl_image_segmentation_tpu.pipeline.export import run_export
from dl_image_segmentation_tpu.raster.geotiff import read_geotiff

ZONE = 43
TILE = Tile(60, 2, 10.0, ZONE, -380, 3491)  # real key from reference nb


def write_labels_geojson(path, tile=TILE, attr_values=(1, 2)):
    """Two polygons inside the tile, with a class attribute."""
    x0, y0, x1, y1 = tile.bounds_unpadded
    w = x1 - x0
    feats = []
    for i, v in enumerate(attr_values):
        # horizontal strips
        fy0 = y0 + (i + 0.5) * (y1 - y0) / (len(attr_values) + 1)
        fy1 = fy0 + (y1 - y0) / (len(attr_values) + 2)
        ring = [[x0 + 0.1 * w, fy0], [x1 - 0.1 * w, fy0],
                [x1 - 0.1 * w, fy1], [x0 + 0.1 * w, fy1],
                [x0 + 0.1 * w, fy0]]
        lonlat = [
            list(map(float, crs.utm_to_lonlat(px, py, ZONE)))
            for px, py in ring
        ]
        feats.append({"type": "Feature",
                      "geometry": {"type": "Polygon",
                                   "coordinates": [lonlat]},
                      "properties": {"cls": v}})
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


@pytest.fixture()
def labels_path(tmp_path):
    return write_labels_geojson(str(tmp_path / "labels.geojson"))


@pytest.fixture()
def catalog():
    return SyntheticCatalog(scenes_per_tile=6)


class TestMosaics:
    def test_nearest_date_mosaic(self, catalog):
        arr = create_img_array_for_tile(
            TILE, "sentinel-2:L1C", reference_date=dt.date(2020, 11, 1),
            bands="red green blue", catalog=catalog)
        assert arr is not None
        assert arr.shape == (64, 64, 3)

    def test_no_scenes_returns_none(self, catalog):
        arr = create_img_array_for_tile(
            TILE, "nonexistent:product", reference_date=dt.date(2020, 11, 1),
            catalog=catalog)
        assert arr is None

    def test_cloud_filter_none_vs_strict(self, catalog):
        loose = create_img_array_for_tile(
            TILE, "sentinel-2:L1C", dt.date(2020, 11, 1),
            max_cloud_fraction=None, catalog=catalog)
        strict = create_img_array_for_tile(
            TILE, "sentinel-2:L1C", dt.date(2020, 11, 1),
            max_cloud_fraction=1e-9, catalog=catalog)
        assert loose is not None
        assert strict is None  # cf < 1e-9 excludes everything

    def test_cloudmasked_median(self, catalog):
        arr = create_cloudmasked_s2_array(
            TILE, bands="red green blue", catalog=catalog)
        assert arr is not None
        assert isinstance(arr, np.ma.MaskedArray)
        assert arr.shape == (64, 64, 3)

    def test_stack_products(self, catalog):
        arr = stack_products_for_tile(
            TILE, ["sentinel-2:L1C", "airbus:oneatlas:phr:v2"],
            ["red green", "red green blue"], catalog=catalog)
        assert arr.shape == (64, 64, 5)

    def test_stack_products_rejects_unknown_resampler(self, catalog):
        # 'cubic' (and later 'cubicspline'/'lanczos') graduated to
        # real resamplers; 'mode' is the unknown example now
        with pytest.raises(ValueError, match="resampler"):
            stack_products_for_tile(TILE, ["sentinel-2:L1C"],
                                    ["red green"], resampler="mode",
                                    catalog=catalog)

    def test_stack_products_accepts_bilinear(self, catalog):
        arr = stack_products_for_tile(TILE, ["sentinel-2:L1C"],
                                      ["red green"],
                                      resampler="bilinear",
                                      catalog=catalog)
        assert arr.shape == (64, 64, 2)


class TestResample:
    def _src(self):
        """4x oversampled source raster covering the tile (2.5 m px vs
        the tile's 10 m), with a smooth gradient so bilinear and
        nearest genuinely differ."""
        x0, y0, x1, y1 = TILE.bounds  # equator-referenced, padded
        res = 2.5
        w = int(round((x1 - x0) / res))
        h = int(round((y1 - y0) / res))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        src = (xx * 2 + yy)[:, :, None]
        gt = (x0, res, 0.0, y1, 0.0, -res)
        return src, gt

    def test_bilinear_interpolates_gradient(self):
        from dl_image_segmentation_tpu.catalog.base import resample_to_tile
        src, gt = self._src()
        near, v_n = resample_to_tile(src, gt, TILE, method="near")
        bil, v_b = resample_to_tile(src, gt, TILE, method="bilinear")
        assert near.shape == bil.shape == (64, 64, 1)
        assert v_b[2:-2, 2:-2].all()
        # on a linear ramp, bilinear reconstructs the exact centre
        # value; nearest is off by up to half a source pixel step
        interior = v_b & v_n
        # the tile centre at (r, c) maps to source (4r+1.5, 4c+1.5):
        # expected = 2*(4c+1.5) + (4r+1.5)
        rr, cc = np.mgrid[0:64, 0:64].astype(np.float32)
        expected = 2 * (4 * cc + 1.5) + (4 * rr + 1.5)
        np.testing.assert_allclose(bil[interior, 0],
                                   expected[interior], rtol=1e-5)
        assert np.abs(near[interior, 0] - expected[interior]).max() > 0.4

    def test_bilinear_integer_rounding_and_nodata(self):
        from dl_image_segmentation_tpu.catalog.base import resample_to_tile
        src, gt = self._src()
        src_u16 = src.astype(np.uint16)
        out, valid = resample_to_tile(src_u16, gt, TILE,
                                      method="bilinear")
        assert out.dtype == np.uint16
        # nodata hole in the source invalidates pixels that touch it
        src_hole = src_u16.copy()
        src_hole[100:120, 100:120] = 0
        out2, valid2 = resample_to_tile(src_hole, gt, TILE, nodata=0,
                                        method="bilinear")
        assert valid2.sum() < valid.sum()

    def test_unknown_method_raises(self):
        from dl_image_segmentation_tpu.catalog.base import resample_to_tile
        src, gt = self._src()
        with pytest.raises(ValueError, match="resampler"):
            resample_to_tile(src, gt, TILE, method="mode")

    def test_bilinear_aligned_source_is_identity(self):
        """A source exactly co-registered with the tile grid (the
        model-output-chips use case) must keep its FULL extent: the
        boundary pixels have wx/wy == 0 toward the out-of-range
        neighbour, and zero-weight corners are don't-care (regression:
        the last row/column used to come back nodata)."""
        from dl_image_segmentation_tpu.catalog.base import resample_to_tile
        x0, y0, x1, y1 = TILE.bounds
        n = TILE.raster_size
        src = (np.arange(n * n, dtype=np.uint16).reshape(n, n) % 997
               + 1)[:, :, None]
        gt = (x0, 10.0, 0.0, y1, 0.0, -10.0)
        bil, v_b = resample_to_tile(src, gt, TILE, method="bilinear")
        assert v_b.all()
        np.testing.assert_array_equal(bil, src)
        # a nodata hole invalidates exactly itself on an aligned grid
        # (zero-weight neighbours must not spread it)
        hole = src.copy()
        hole[5, 7] = 0
        out, v = resample_to_tile(hole, gt, TILE, nodata=0,
                                  method="bilinear")
        assert not v[5, 7]
        assert v.sum() == n * n - 1

    def test_local_catalog_load_rejects_unknown_resampler_when_empty(
            self, tmp_path):
        from dl_image_segmentation_tpu.catalog.local import LocalCatalog
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        with pytest.raises(ValueError, match="resampler"):
            cat.load([], TILE, ["red"], resampler="mode")


class TestLabelBurn:
    def test_attribute_burn(self, labels_path):
        arr = create_label_array_for_tile(TILE, labels_path,
                                          attrib_to_burn="cls",
                                          background_value=255)
        assert arr.shape == (64, 64)
        assert arr.dtype == np.uint8
        vals = set(np.unique(arr))
        assert vals == {1, 2, 255}

    def test_binary_burn(self, labels_path):
        arr = create_label_array_for_tile(TILE, labels_path,
                                          attrib_to_burn=None,
                                          background_value=0)
        assert set(np.unique(arr)) == {0, 1}


class TestChipCreation:
    def _job(self, tmp_path, labels_path, catalog, **kw):
        defaults = dict(
            dltile=TILE, out_folder_base=str(tmp_path / "out"),
            dl_product="sentinel-2:L1C", ref_date=dt.date(2020, 11, 1),
            labels_data=labels_path, label_attr="cls",
            bands="red green blue", label_nodata_value=255,
            catalog=catalog)
        defaults.update(kw)
        return DLTileJobConfig(**defaults)

    def test_chip_pair_contract(self, tmp_path, labels_path, catalog):
        job = self._job(tmp_path, labels_path, catalog)
        _, img_path, lbl_path = create_chips_for_tile(job)
        assert img_path and lbl_path
        # filename contract
        assert os.path.basename(img_path) == TILE.filename + ".tif"
        assert os.path.basename(img_path) == os.path.basename(lbl_path)
        assert "/images/" in img_path and "/labels/" in lbl_path
        # image chip: padded size, band count, georeferencing
        g = read_geotiff(img_path)
        assert g.array.shape == (64, 64, 3)
        assert g.info.epsg == 32600 + ZONE
        np.testing.assert_allclose(g.info.geotransform, TILE.geotrans)
        # label chip: single-band uint8 with nodata metadata
        L = read_geotiff(lbl_path)
        assert L.array.shape == (64, 64, 1)
        assert L.info.dtype == "uint8"
        assert L.info.nodata == 255
        assert {1, 2} <= set(np.unique(L.array))
        assert is_done(job)

    def test_cloudmasked_dispatch(self, tmp_path, labels_path, catalog):
        job = self._job(tmp_path, labels_path, catalog,
                        max_cloud_fraction=0)
        _, img_path, _ = create_chips_for_tile(job)
        assert img_path is not None

    def test_multiproduct_dispatch(self, tmp_path, labels_path, catalog):
        job = self._job(tmp_path, labels_path, catalog,
                        dl_product=["sentinel-2:L1C",
                                    "airbus:oneatlas:phr:v2"],
                        bands=["red green", "red green blue"])
        _, img_path, _ = create_chips_for_tile(job)
        g = read_geotiff(img_path)
        assert g.array.shape[2] == 5

    def test_failure_returns_none_tuple(self, tmp_path, labels_path,
                                        catalog):
        job = self._job(tmp_path, labels_path, catalog,
                        dl_product="missing:product")
        out = create_chips_for_tile(job)
        assert out[1] is None and out[2] is None


class TestSampleCreationConfig:
    def test_folder_naming_contract(self, labels_path, tmp_path, catalog):
        cfg = DLSampleCreationConfig(
            tile_size=64, tile_padding=2, tile_res_m=10.0,
            dl_product="sentinel-2:L1C", bands="red green blue",
            sample_folder_root=str(tmp_path), source_tag="sentinel",
            label_data_config=OGRLabelDataDesc(labels_path),
            max_cloud_fraction=0.2, catalog=catalog)
        d = cfg.images_dir_name("Mumbai", 2020)
        assert d.endswith("sentinel-cf0p2_10.0m_2pad_64_Mumbai_2020")
        assert cfg.dataset_name("Mumbai", 2020) == \
            "sentinel-cf0p2_arr_Mumbai_2020"
        # size stored net of padding
        assert cfg.TILE_SIZE_PAD_RES() == (60, 2, 10.0)

    def test_tile_planning_and_jobs(self, labels_path, tmp_path, catalog):
        cfg = DLSampleCreationConfig(
            tile_size=64, tile_padding=2, tile_res_m=10.0,
            dl_product="sentinel-2:L1C", bands="red green blue",
            sample_folder_root=str(tmp_path), source_tag="s2",
            label_data_config=OGRLabelDataDesc(labels_path, 0, "cls"),
            catalog=catalog)
        tiles = cfg.get_tiles()
        assert len(tiles) >= 1
        assert TILE.key in cfg.get_tile_ids()
        jobs = cfg.create_tile_job_configs("Loc", 2020,
                                           ref_date=dt.date(2020, 11, 1))
        assert len(jobs) == len(tiles)
        assert jobs[0].LABEL_BURN_ATTR == "cls"
        # rebuild-from-keys fast path
        cfg2 = DLSampleCreationConfig(
            tile_size=64, tile_padding=2, tile_res_m=10.0,
            dl_product="x", bands="red",
            sample_folder_root=str(tmp_path), source_tag="s2",
            label_data_config=OGRLabelDataDesc(labels_path),
            catalog=catalog)
        tiles2 = cfg2.get_tiles(tile_ids=list(cfg.get_tile_ids()))
        assert {t.key for t in tiles2} == cfg.get_tile_ids()

    def test_cache_invalidation(self, labels_path, tmp_path, catalog):
        cfg = DLSampleCreationConfig(
            tile_size=64, tile_padding=2, tile_res_m=10.0,
            dl_product="p", bands="red", sample_folder_root=str(tmp_path),
            source_tag="t", label_data_config=OGRLabelDataDesc(labels_path),
            catalog=catalog)
        t1 = cfg.get_tiles()
        cfg.TILE_SIZE_PAD_RES((128, 4, 10.0))
        t2 = cfg.get_tiles()
        assert t2[0].tilesize == 120


class TestExport:
    def test_export_with_resume(self, tmp_path, labels_path, catalog):
        jobs = [DLTileJobConfig(
            dltile=TILE, out_folder_base=str(tmp_path / "out"),
            dl_product="sentinel-2:L1C", ref_date=dt.date(2020, 11, 1),
            labels_data=labels_path, bands="red green blue",
            catalog=catalog)]
        r1 = run_export(jobs, n_workers=1, progress=None)
        assert r1.completed == 1 and r1.ok
        r2 = run_export(jobs, n_workers=1, progress=None)
        assert r2.skipped_existing == 1 and r2.completed == 0

    def test_export_retries_then_fails(self, tmp_path, labels_path,
                                       catalog):
        jobs = [DLTileJobConfig(
            dltile=TILE, out_folder_base=str(tmp_path / "out"),
            dl_product="missing:product", ref_date=dt.date(2020, 11, 1),
            labels_data=labels_path, catalog=catalog)]
        r = run_export(jobs, n_workers=1, max_attempts=3, progress=None)
        assert not r.ok
        assert r.attempts == 3
        assert r.failed == [TILE.key]


class TestLocalCatalog:
    def test_local_catalog_roundtrip(self, tmp_path, labels_path):
        root = str(tmp_path / "cat")
        cat = LocalCatalog.create(root)
        # one scene covering the tile, same grid
        gt = TILE.geotrans
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 3000, (64, 64, 3)).astype(np.uint16)
        cat.add_scene("sentinel-2:L1C", ["red", "green", "blue"],
                      "scene-a", dt.date(2020, 10, 20), arr, gt,
                      epsg=32600 + ZONE, cloud_fraction=0.05)
        # reload from disk
        cat2 = LocalCatalog(root)
        scenes = cat2.search(TILE, "sentinel-2:L1C")
        assert len(scenes) == 1
        stack, valid = cat2.load(scenes, TILE, ["red", "blue"])
        assert stack.shape == (1, 64, 64, 2)
        assert valid.all()
        np.testing.assert_array_equal(stack[0, :, :, 0], arr[:, :, 0])
        # mosaic through the pipeline
        out = create_img_array_for_tile(TILE, "sentinel-2:L1C",
                                        dt.date(2020, 11, 1),
                                        bands="red green blue",
                                        catalog=cat2)
        np.testing.assert_array_equal(out, arr)

    def test_resample_coarser_scene(self, tmp_path):
        root = str(tmp_path / "cat")
        cat = LocalCatalog.create(root)
        # scene at 20 m covering the 10 m tile: constant-valued quads
        x0, y0, x1, y1 = TILE.bounds
        gt20 = (x0, 20.0, 0.0, y1, 0.0, -20.0)
        arr = np.arange(32 * 32, dtype=np.uint16).reshape(32, 32, 1)
        cat.add_scene("p", ["b"], "s", dt.date(2020, 1, 1), arr, gt20,
                      epsg=32600 + ZONE)
        scenes = cat.search(TILE, "p")
        stack, valid = cat.load(scenes, TILE, ["b"])
        assert stack.shape == (1, 64, 64, 1)
        # each 20 m pixel covers a 2x2 block of 10 m pixels
        np.testing.assert_array_equal(stack[0, 0:2, 0:2, 0], 0)
        np.testing.assert_array_equal(stack[0, 0:2, 2:4, 0], 1)


    def test_mixed_product_load_resolves_bands_per_scene(self, tmp_path):
        """Scenes from products with DIFFERENT band orders in one load:
        indices must resolve per scene, not from the first product."""
        root = str(tmp_path / "cat")
        cat = LocalCatalog.create(root)
        gt = TILE.geotrans
        a = np.stack([np.full((64, 64), v, np.uint16)
                      for v in (10, 20, 30)], axis=-1)  # r,g,b
        b = np.stack([np.full((64, 64), v, np.uint16)
                      for v in (300, 200, 100)], axis=-1)  # b,g,r
        cat.add_scene("prod-rgb", ["red", "green", "blue"], "sa",
                      dt.date(2020, 1, 1), a, gt, epsg=32600 + ZONE)
        cat.add_scene("prod-bgr", ["blue", "green", "red"], "sb",
                      dt.date(2020, 1, 2), b, gt, epsg=32600 + ZONE)
        scenes = (cat.search(TILE, "prod-rgb")
                  + cat.search(TILE, "prod-bgr"))
        stack, valid = cat.load(scenes, TILE, ["red", "blue"])
        assert stack.shape == (2, 64, 64, 2)
        np.testing.assert_array_equal(stack[0, :, :, 0], 10)   # rgb red
        np.testing.assert_array_equal(stack[0, :, :, 1], 30)   # rgb blue
        np.testing.assert_array_equal(stack[1, :, :, 0], 100)  # bgr red
        np.testing.assert_array_equal(stack[1, :, :, 1], 300)  # bgr blue

    def test_ingest_chips_writes_index_once(self, tmp_path, monkeypatch):
        from dl_image_segmentation_tpu.catalog.local import LocalCatalog
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        folder = str(tmp_path / "preds")
        os.makedirs(folder)
        gt = TILE.geotrans
        for i in range(3):
            write_geotiff(os.path.join(folder, f"c{i}.tif"),
                          np.full((8, 8, 1), i, np.uint8),
                          geotransform=gt, epsg=32600 + ZONE)
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        calls = {"n": 0}
        orig = LocalCatalog._save_index

        def counting(self):
            calls["n"] += 1
            return orig(self)

        monkeypatch.setattr(LocalCatalog, "_save_index", counting)
        n = cat.ingest_chips("p", ["b"], folder, dt.date(2020, 1, 1))
        assert n == 3
        assert calls["n"] == 1  # one dump, not one per chip
        assert len(LocalCatalog(str(tmp_path / "cat"))
                   ._index["products"]["p"]["scenes"]) == 3

    def test_search_without_indexed_bounds_is_header_only(self, tmp_path):
        """index.json without 'bounds' entries: search must resolve
        scene bounds from the GeoTIFF header alone -- the old fallback
        full-decoded every candidate scene INTO the scene LRU, evicting
        load()'s working set."""
        import json as _json
        root = str(tmp_path / "cat")
        cat = LocalCatalog.create(root)
        gt = TILE.geotrans
        arr = np.zeros((64, 64, 1), np.uint16)
        cat.add_scene("p", ["b"], "s1", dt.date(2020, 1, 1), arr, gt,
                      epsg=32600 + ZONE)
        idx_path = os.path.join(root, "index.json")
        idx = _json.load(open(idx_path))
        for prod in idx["products"].values():
            for s in prod["scenes"]:
                s.pop("bounds", None)
        _json.dump(idx, open(idx_path, "w"))
        cat2 = LocalCatalog(root)
        scenes = cat2.search(TILE, "p")
        assert len(scenes) == 1
        assert cat2._cache == {}  # no pixel decodes during search
        # and a scene far away is excluded via header bounds too
        x0, y0, x1, y1 = TILE.bounds
        far_gt = (x0 + 10_000_000, gt[1], 0.0, gt[3], 0.0, gt[5])
        cat2.add_scene("p", ["b"], "s2", dt.date(2020, 1, 2), arr,
                       far_gt, epsg=32600 + ZONE)
        idx = _json.load(open(idx_path))
        for prod in idx["products"].values():
            for s in prod["scenes"]:
                s.pop("bounds", None)
        _json.dump(idx, open(idx_path, "w"))
        cat3 = LocalCatalog(root)
        assert [m.scene_id for m in cat3.search(TILE, "p")] == ["s1"]
        assert cat3._cache == {}


class TestStitch:
    def test_stitch_roundtrip(self, tmp_path):
        """create chips on a 2x2 tile block -> stitch -> values land at
        the right geographic positions with padding stripped."""
        from dl_image_segmentation_tpu.pipeline.stitch import (
            stitch_folder, stitch_tiles)
        from dl_image_segmentation_tpu.raster.geotiff import (
            read_geotiff, write_geotiff)
        tiles = [Tile(60, 2, 10.0, ZONE, -380 + di, 3491 + dj)
                 for di in (0, 1) for dj in (0, 1)]
        chip_dir = str(tmp_path / "preds")
        os.makedirs(chip_dir)
        for k, t in enumerate(tiles):
            arr = np.full((64, 64), k + 1, np.uint8)
            write_geotiff(os.path.join(chip_dir, t.filename + ".tif"),
                          arr, geotransform=t.geotrans,
                          epsg=32600 + ZONE, nodata=255)
        out = str(tmp_path / "mosaic.tif")
        n, shape = stitch_folder(chip_dir, out)
        assert n == 4 and shape == (120, 120)
        g = read_geotiff(out)
        assert g.info.epsg == 32600 + ZONE
        assert g.info.nodata == 255
        # geotransform origin = NW corner of the tile block (unpadded)
        west = min(t.bounds_unpadded[0] for t in tiles)
        north = max(t.bounds_unpadded[3] for t in tiles)
        assert g.info.geotransform[0] == west
        assert g.info.geotransform[3] == north
        # tile (di=0, dj=1) is the NW quadrant -> value of its index
        arrs = {(t.ti, t.tj): k + 1 for k, t in enumerate(tiles)}
        m = g.array[:, :, 0]
        assert m[0, 0] == arrs[(-380, 3492)]
        assert m[119, 119] == arrs[(-379, 3491)]
        assert m[0, 119] == arrs[(-379, 3492)]
        assert m[119, 0] == arrs[(-380, 3491)]

    def test_mixed_grid_rejected(self):
        from dl_image_segmentation_tpu.pipeline.stitch import stitch_tiles
        a = Tile(60, 2, 10.0, 43, 0, 0)
        b = Tile(60, 2, 20.0, 43, 0, 1)
        with pytest.raises(ValueError):
            stitch_tiles({a: np.zeros((64, 64)), b: np.zeros((64, 64))})

    def test_stitch_skips_stray_tifs_and_is_rerunnable(self, tmp_path):
        """A previous run's mosaic (or any non-tile-key .tif) in the
        chip folder must be skipped, not crash the stitch."""
        from dl_image_segmentation_tpu.pipeline.stitch import stitch_folder
        from dl_image_segmentation_tpu.raster.geotiff import (
            read_geotiff, write_geotiff)
        chip_dir = str(tmp_path / "preds")
        os.makedirs(chip_dir)
        t = Tile(60, 2, 10.0, ZONE, -380, 3491)
        write_geotiff(os.path.join(chip_dir, t.filename + ".tif"),
                      np.full((64, 64), 7, np.uint8),
                      geotransform=t.geotrans, epsg=32600 + ZONE)
        out = os.path.join(chip_dir, "mosaic.tif")  # INSIDE the folder
        n1, shape1 = stitch_folder(chip_dir, out)
        assert n1 == 1 and shape1 == (60, 60)
        n2, shape2 = stitch_folder(chip_dir, out)  # rerun: mosaic there
        assert (n2, shape2) == (n1, shape1)
        assert (read_geotiff(out).array == 7).all()


class TestViz:
    def test_plot_tiles_and_chip_pair(self, tmp_path, labels_path):
        from dl_image_segmentation_tpu.geo.vector import open_vector
        from dl_image_segmentation_tpu.utils.viz import (plot_chip_pair,
                                                         plot_tiles,
                                                         save_fig)
        tiles = [TILE]
        layer = open_vector(labels_path).get_layer(0)
        fig = plot_tiles(tiles, layer)
        p1 = str(tmp_path / "tiles.png")
        save_fig(fig, p1)
        assert os.path.getsize(p1) > 1000
        rng = np.random.RandomState(0)
        img = rng.randint(0, 4000, (64, 64, 4), np.uint16)
        lbl = rng.randint(0, 3, (64, 64)).astype(np.uint8)
        fig2 = plot_chip_pair(img, lbl, prediction=lbl)
        p2 = str(tmp_path / "pair.png")
        save_fig(fig2, p2)
        assert os.path.getsize(p2) > 1000


class TestIngestAndCoverage:
    def test_ingest_chips_as_product(self, tmp_path, labels_path, catalog):
        """Prediction chips re-ingested as a catalog product feed the
        multi-product stacking flow (reference's prior-model-output
        use case)."""
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        # fake "prediction" chips on the tile grid
        pred_dir = str(tmp_path / "preds")
        os.makedirs(pred_dir)
        rng = np.random.RandomState(0)
        for t in (TILE,):
            arr = rng.randint(0, 2, (64, 64)).astype(np.uint8)
            write_geotiff(os.path.join(pred_dir, t.filename + ".tif"),
                          arr, geotransform=t.geotrans, epsg=32643)
        local = LocalCatalog.create(str(tmp_path / "cat"))
        n = local.ingest_chips("model:v1:predictions", ["class"],
                               pred_dir, dt.date(2021, 1, 1))
        assert n == 1
        scenes = local.search(TILE, "model:v1:predictions")
        assert len(scenes) == 1
        stack, valid = local.load(scenes, TILE, ["class"])
        assert stack.shape == (1, 64, 64, 1)

    def test_coverage_dataset_controls_tiling(self, tmp_path, catalog):
        """label_coverage_config determines WHERE tiles go; labels are
        still what gets rasterised (reference :354-364)."""
        labels = write_labels_geojson(str(tmp_path / "labels.geojson"))
        # coverage: a small polygon inside ONE tile only
        x0, y0, x1, y1 = TILE.bounds_unpadded
        ring = [[x0 + 50, y0 + 50], [x0 + 150, y0 + 50],
                [x0 + 150, y0 + 150], [x0 + 50, y0 + 150],
                [x0 + 50, y0 + 50]]
        import json as _json
        lonlat = [list(map(float, crs.utm_to_lonlat(px, py, ZONE)))
                  for px, py in ring]
        cov = str(tmp_path / "cov.geojson")
        with open(cov, "w") as f:
            _json.dump({"type": "FeatureCollection", "features": [
                {"type": "Feature",
                 "geometry": {"type": "Polygon", "coordinates": [lonlat]},
                 "properties": {}}]}, f)
        cfg = DLSampleCreationConfig(
            tile_size=64, tile_padding=2, tile_res_m=10.0,
            dl_product="sentinel-2:L1C", bands="red",
            sample_folder_root=str(tmp_path), source_tag="s",
            label_data_config=OGRLabelDataDesc(labels, 0, "cls"),
            label_coverage_config=OGRLabelDataDesc(cov),
            catalog=catalog)
        tiles = cfg.get_tiles()
        assert [t.key for t in tiles] == [TILE.key]


class TestS2ThirteenBand:
    def test_full_band_s2_chip(self, tmp_path, labels_path, catalog):
        """BASELINE 'S2 13-band 64px/10m' run config (create nb cell
        13): all 13 Sentinel-2 bands through the cloud-masked path."""
        bands = ("coastal-aerosol blue green red red-edge red-edge-2 "
                 "red-edge-3 nir red-edge-4 water-vapor cirrus swir1 swir2")
        job = DLTileJobConfig(
            dltile=TILE, out_folder_base=str(tmp_path / "out"),
            dl_product="sentinel-2:L1C", ref_date=dt.date(2020, 11, 1),
            labels_data=labels_path, bands=bands,
            max_cloud_fraction=0, catalog=catalog)
        _, img_path, _ = create_chips_for_tile(job)
        g = read_geotiff(img_path)
        assert g.array.shape == (64, 64, 13)


class TestProfilingTrace:
    def test_trace_and_stage_timer(self, tmp_path):
        import jax.numpy as jnp
        from dl_image_segmentation_tpu.utils.profiling import (StageTimer,
                                                               trace)
        st = StageTimer()
        with st.stage("demo", items=10, nbytes=1000):
            pass
        assert "demo" in st.report()
        logdir = str(tmp_path / "trace")
        with trace(logdir):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        assert os.path.exists(logdir)


class TestConcurrencySafety:
    def test_concurrent_exports_no_corruption(self, tmp_path, labels_path,
                                              catalog):
        """Two exports racing on the same output folder produce valid,
        complete chips (the makedirs/write races the reference handled
        manually in its notebook, create nb cell 76)."""
        from concurrent.futures import ThreadPoolExecutor
        jobs = [DLTileJobConfig(
            dltile=TILE, out_folder_base=str(tmp_path / "out"),
            dl_product="sentinel-2:L1C", ref_date=dt.date(2020, 11, 1),
            labels_data=labels_path, bands="red green blue",
            catalog=catalog)]
        with ThreadPoolExecutor(max_workers=2) as ex:
            r1 = ex.submit(run_export, jobs, 2, 3, None)
            r2 = ex.submit(run_export, jobs, 2, 3, None)
            a, b = r1.result(), r2.result()
        assert a.ok and b.ok
        img = os.path.join(str(tmp_path / "out"), "images",
                           TILE.filename + ".tif")
        g = read_geotiff(img)  # parses -> not corrupt
        assert g.array.shape == (64, 64, 3)


class TestSouthernHemisphere:
    """Zone-43S golden path (VERDICT r1 weak #4): southern tiles are
    written EPSG:327xx with the standard 10^7 m false northing, so
    external GIS tools place them correctly."""

    STILE = Tile(60, 2, 10.0, ZONE, -380, -3491)  # ~19 deg S

    def test_tile_crs_properties(self):
        t = self.STILE
        assert not t.north
        assert t.epsg == 32700 + ZONE
        assert t.crs == f"EPSG:{32700 + ZONE}"
        assert 'PARAMETER["false_northing",1e+07]' in t.wkt \
            or '"false_northing",10000000' in t.wkt
        # geotransform origin must be a positive false northing
        gt = t.geotrans
        assert 0 < gt[3] < 10_000_000
        assert gt[3] == t.geotrans_equator[3] + 10_000_000.0
        # northern tiles unchanged
        n = Tile(60, 2, 10.0, ZONE, -380, 3491)
        assert n.north and n.epsg == 32600 + ZONE
        assert n.geotrans == n.geotrans_equator

    def test_external_convention_placement(self):
        """Decode the written georeferencing the way an external GIS
        would (EPSG:327xx => subtract false northing before inverse
        UTM) and check it lands at the tile's true latitude."""
        t = self.STILE
        gt = t.geotrans
        lon, lat = crs.utm_to_lonlat(gt[0], gt[3] - 10_000_000.0, t.zone)
        _, lat_min, _, lat_max = t.lonlat_bounds
        assert lat_min - 1e-6 <= float(lat) <= lat_max + 1e-6
        assert float(lat) < 0

    def test_chip_pair_golden_path(self, tmp_path, catalog):
        labels = write_labels_geojson(str(tmp_path / "s.geojson"),
                                      tile=self.STILE)
        job = DLTileJobConfig(
            dltile=self.STILE, out_folder_base=str(tmp_path / "chips"),
            dl_product="sentinel-2:L1C", bands="red green blue",
            ref_date=dt.date(2020, 11, 1),
            labels_data=labels, label_attr="cls",
            label_nodata_value=255, catalog=catalog)
        job2, img_file, lbl_file = create_chips_for_tile(job)
        assert img_file is not None
        for f in (img_file, lbl_file):
            g = read_geotiff(f)
            assert g.info.epsg == 32700 + ZONE
            assert 0 < g.info.geotransform[3] < 10_000_000
        # label strips actually burned (placement math consistent)
        lbl = read_geotiff(lbl_file).array
        assert set(np.unique(lbl)) == {1, 2, 255}

    def test_southern_chips_roundtrip_local_catalog(self, tmp_path,
                                                    catalog):
        """Southern chips ingested into a LocalCatalog resolve onto the
        same southern tile (false northing normalized both ways)."""
        labels = write_labels_geojson(str(tmp_path / "s.geojson"),
                                      tile=self.STILE)
        job = DLTileJobConfig(
            dltile=self.STILE, out_folder_base=str(tmp_path / "chips"),
            dl_product="sentinel-2:L1C", bands="red green blue",
            ref_date=dt.date(2020, 11, 1),
            labels_data=labels, label_attr="cls",
            label_nodata_value=255, catalog=catalog)
        _, img_file, _ = create_chips_for_tile(job)
        lc = LocalCatalog.create(str(tmp_path / "cat"))
        n = lc.ingest_chips("pred:v1", ["red", "green", "blue"],
                            os.path.dirname(img_file),
                            dt.date(2021, 1, 1))
        assert n == 1
        scenes = lc.search(self.STILE, "pred:v1")
        assert len(scenes) == 1
        stack, valid = lc.load(scenes, self.STILE,
                               ["red", "green", "blue"])
        assert stack.shape == (1, 64, 64, 3)
        assert valid.all()
        src = read_geotiff(img_file).array
        np.testing.assert_array_equal(stack[0], src)

    def test_stitch_southern_tiles(self, tmp_path, catalog):
        from dl_image_segmentation_tpu.pipeline.stitch import stitch_tiles
        t1 = self.STILE
        t2 = Tile(60, 2, 10.0, ZONE, -379, -3491)
        rng = np.random.RandomState(0)
        chips = {t: rng.randint(0, 255, (64, 64), np.uint8)
                 for t in (t1, t2)}
        mosaic, gt, epsg = stitch_tiles(chips)
        assert epsg == 32700 + ZONE
        assert 0 < gt[3] < 10_000_000
        assert mosaic.shape == (60, 120)
        # northern stitch unchanged
        n1 = Tile(60, 2, 10.0, ZONE, -380, 3491)
        mosaic, gt, epsg = stitch_tiles(
            {n1: rng.randint(0, 255, (64, 64), np.uint8)})
        assert epsg == 32600 + ZONE


class TestCloudScenePairing:
    """Cloud masks are paired to S2 scenes by DATE (VERDICT r1 #7):
    a missing cloud acquisition must not shift masks onto wrong
    scenes."""

    class _DroppingCatalog(SyntheticCatalog):
        """SyntheticCatalog that drops one cloud-product scene."""

        def __init__(self, drop_index=2, **kw):
            super().__init__(**kw)
            self.drop_index = drop_index

        def search(self, tile, product, start=None, end=None,
                   max_cloud_fraction=None):
            out = super().search(tile, product, start=start, end=end,
                                 max_cloud_fraction=max_cloud_fraction)
            if product == self.cloud_product and len(out) > self.drop_index:
                del out[self.drop_index]
            return out

    def test_missing_cloud_scene_warns_and_pairs_by_date(self, capsys):
        full = SyntheticCatalog(scenes_per_tile=6)
        dropping = self._DroppingCatalog(drop_index=2, scenes_per_tile=6)
        a = create_cloudmasked_s2_array(TILE, bands="red", catalog=full)
        b = create_cloudmasked_s2_array(TILE, bands="red",
                                        catalog=dropping)
        assert a is not None and b is not None
        out = capsys.readouterr().out
        assert "no same-date" in out
        # scenes other than the dropped one keep their own masks: the
        # two composites agree except where the dropped scene's
        # (now unmasked) pixels shift the median
        s2 = full.search(TILE, "sentinel-2:L1C")
        cloud_full = full.search(TILE, full.cloud_product)
        dates_s2 = [m.date for m in s2]
        dates_cloud = [m.date for m in dropping.search(
            TILE, dropping.cloud_product)]
        assert len(dates_cloud) == len(cloud_full) - 1
        # positional pairing would have mismatched every scene after
        # the drop; date pairing only changes the dropped scene's mask
        assert set(dates_cloud).issubset(set(dates_s2))

    def test_full_catalog_unchanged(self):
        """With aligned scene sets the composite is identical to the
        previous positional pairing (no behavior change)."""
        cat = SyntheticCatalog(scenes_per_tile=6)
        arr = create_cloudmasked_s2_array(TILE, bands="red green",
                                          catalog=cat)
        assert arr is not None and arr.shape == (64, 64, 2)


class TestMultiHostExport:
    def test_partitioned_export_union_equals_single_host(self, tmp_path,
                                                         catalog):
        """Two hosts each export their round-robin slice; the union of
        outputs equals a single-host run (idempotent per file)."""
        labels = write_labels_geojson(str(tmp_path / "l.geojson"))
        t2 = Tile(60, 2, 10.0, ZONE, -379, 3491)
        jobs = [DLTileJobConfig(
            dltile=t, out_folder_base=str(tmp_path / "multi"),
            dl_product="sentinel-2:L1C", bands="red",
            ref_date=dt.date(2020, 11, 1), labels_data=labels,
            label_attr="cls", catalog=catalog) for t in (TILE, t2)]
        r0 = run_export(jobs, n_workers=1, host_index=0, host_count=2,
                        progress=None)
        r1 = run_export(jobs, n_workers=1, host_index=1, host_count=2,
                        progress=None)
        assert r0.completed == 1 and r1.completed == 1
        import glob as _glob
        multi = sorted(os.path.basename(f) for f in _glob.glob(
            str(tmp_path / "multi" / "images" / "*.tif")))
        jobs_s = [DLTileJobConfig(
            dltile=t, out_folder_base=str(tmp_path / "single"),
            dl_product="sentinel-2:L1C", bands="red",
            ref_date=dt.date(2020, 11, 1), labels_data=labels,
            label_attr="cls", catalog=catalog) for t in (TILE, t2)]
        run_export(jobs_s, n_workers=1, progress=None)
        single = sorted(os.path.basename(f) for f in _glob.glob(
            str(tmp_path / "single" / "images" / "*.tif")))
        assert multi == single and len(multi) == 2


class TestLabelPrefilter:
    def test_far_features_dropped_same_burn(self, tmp_path):
        """A label dataset with features far outside the tile burns
        identically (the bbox prefilter only drops never-burnable
        features) and the packed edge arrays stay small."""
        x0, y0, x1, y1 = TILE.bounds_unpadded
        w = x1 - x0
        feats = []
        # one in-tile polygon + 50 far-away many-vertex polygons
        ring = [[x0 + 0.2 * w, y0 + 0.2 * w], [x1 - 0.2 * w, y0 + 0.2 * w],
                [x1 - 0.2 * w, y1 - 0.2 * w], [x0 + 0.2 * w, y1 - 0.2 * w],
                [x0 + 0.2 * w, y0 + 0.2 * w]]
        def lonlat_ring(r):
            return [list(map(float, crs.utm_to_lonlat(px, py, ZONE)))
                    for px, py in r]
        feats.append({"type": "Feature",
                      "geometry": {"type": "Polygon",
                                   "coordinates": [lonlat_ring(ring)]},
                      "properties": {"cls": 2}})
        import numpy as _np
        th = _np.linspace(0, 2 * _np.pi, 200)
        for k in range(50):
            cx, cy = x0 + 100000 + k * 2000, y0 + 50000
            far = _np.stack([cx + 500 * _np.cos(th),
                             cy + 500 * _np.sin(th)], axis=1)
            feats.append({"type": "Feature",
                          "geometry": {"type": "Polygon",
                                       "coordinates": [
                                           lonlat_ring(far.tolist())]},
                          "properties": {"cls": 1}})
        import json as _json
        p = tmp_path / "far.geojson"
        p.write_text(_json.dumps({"type": "FeatureCollection",
                                  "features": feats}))
        arr = create_label_array_for_tile(TILE, str(p),
                                          attrib_to_burn="cls",
                                          background_value=255)
        assert set(np.unique(arr)) == {2, 255}
        # the giant containing polygon (vertices all outside) still burns
        big = [[x0 - 5000, y0 - 5000], [x1 + 5000, y0 - 5000],
               [x1 + 5000, y1 + 5000], [x0 - 5000, y1 + 5000],
               [x0 - 5000, y0 - 5000]]
        p2 = tmp_path / "big.geojson"
        p2.write_text(_json.dumps({
            "type": "FeatureCollection",
            "features": [{"type": "Feature",
                          "geometry": {"type": "Polygon",
                                       "coordinates": [lonlat_ring(big)]},
                          "properties": {"cls": 3}}]}))
        arr2 = create_label_array_for_tile(TILE, str(p2),
                                           attrib_to_burn="cls",
                                           background_value=255)
        assert set(np.unique(arr2)) == {3}


class TestConvertChipFolder:
    """GeoTIFF pairs -> PNG/JPG pairs (reference translate nb cells
    6-8: translate_tif_to_png + joblib fan-out)."""

    def _tif_folder(self, tmp_path, dtype=np.uint8, bands=3, n=4):
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        root = tmp_path / "chips"
        rng = np.random.RandomState(7)
        for sub in ("images", "labels"):
            (root / sub).mkdir(parents=True)
        gt = (272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        for i in range(n):
            name = f"252#2#1.0#43#{-900 + i}#8300.tif"
            img = rng.randint(0, np.iinfo(dtype).max, (16, 16, bands))
            write_geotiff(str(root / "images" / name),
                          img.astype(dtype), geotransform=gt, epsg=32643)
            lbl = rng.randint(0, 3, (16, 16)).astype(np.uint8)
            write_geotiff(str(root / "labels" / name), lbl,
                          geotransform=gt, epsg=32643, nodata=255)
        return root

    def test_png_roundtrip_and_stems(self, tmp_path):
        from dl_image_segmentation_tpu.pipeline.convert import (
            convert_chip_folder)
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        from dl_image_segmentation_tpu.raster.image import decode_png
        root = self._tif_folder(tmp_path)
        out = tmp_path / "png"
        n = convert_chip_folder(str(root), str(out), num_workers=2)
        assert n == 8  # 4 pairs
        for sub in ("images", "labels"):
            src_names = sorted(p.name for p in (root / sub).iterdir())
            dst_names = sorted(p.name for p in (out / sub).iterdir())
            assert dst_names == [s.replace(".tif", ".png")
                                 for s in src_names]
            for s, d in zip(src_names, dst_names):
                orig = read_geotiff(str(root / sub / s)).array
                back = decode_png((out / sub / d).read_bytes())
                np.testing.assert_array_equal(orig.squeeze(),
                                              back.squeeze())

    def test_resume_skips_existing(self, tmp_path):
        from dl_image_segmentation_tpu.pipeline.convert import (
            convert_chip_folder)
        root = self._tif_folder(tmp_path)
        out = tmp_path / "png"
        assert convert_chip_folder(str(root), str(out)) == 8
        assert convert_chip_folder(str(root), str(out)) == 0

    def test_converted_folder_feeds_mt_engine(self, tmp_path):
        from dl_image_segmentation_tpu.pipeline.convert import (
            convert_chip_folder)
        from dl_image_segmentation_tpu.records.writers import (
            images_to_tfrecords_mt)
        root = self._tif_folder(tmp_path)
        out = tmp_path / "png"
        convert_chip_folder(str(root), str(out))
        n = images_to_tfrecords_mt("conv", str(out),
                                   str(tmp_path / "recs"),
                                   num_shards=2, num_threads=1)
        assert n == 4

    def test_uint16_multiband_rejected_then_rescaled(self, tmp_path):
        from dl_image_segmentation_tpu.pipeline.convert import (
            convert_chip_folder)
        from dl_image_segmentation_tpu.raster.image import (
            UnsupportedFormatError, decode_png)
        root = self._tif_folder(tmp_path, dtype=np.uint16, bands=3)
        with pytest.raises(UnsupportedFormatError, match="uint16 3-band"):
            convert_chip_folder(str(root), str(tmp_path / "p1"))
        out = tmp_path / "p2"
        n = convert_chip_folder(str(root), str(out),
                                rescale=(0.0, 65535.0))
        assert n == 8
        img = decode_png(next((out / "images").iterdir()).read_bytes())
        assert img.dtype == np.uint8
        # labels (class ids 0-2) must NOT be rescaled to zero
        lbl = decode_png(next((out / "labels").iterdir()).read_bytes())
        assert set(np.unique(lbl)) == {0, 1, 2}

    def test_jpg_target_and_cli(self, tmp_path):
        from dl_image_segmentation_tpu.cli import main
        from dl_image_segmentation_tpu.raster.image import decode_jpeg
        root = self._tif_folder(tmp_path)
        out = tmp_path / "jpg"
        rc = main(["convert", "--directory", str(root), "--out",
                   str(out), "--to", "jpg", "--workers", "2"])
        assert rc == 0
        files = sorted((out / "images").iterdir())
        assert len(files) == 4 and files[0].suffix == ".jpg"
        assert decode_jpeg(files[0].read_bytes()).shape == (16, 16, 3)
