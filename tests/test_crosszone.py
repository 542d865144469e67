"""Cross-CRS scene->tile warping and the cubic resampler
(catalog/base.py): a scene in one UTM zone serves a tile in another
(per-pixel exact zone->WGS84->zone lookup), matching host-computed
goldens; Keys cubic convolution (GDAL 'cubic') reproduces linear
fields exactly and beats bilinear on smooth ones. The reference's
server reprojected scenes onto any requested geocontext
(_descartes_img_chips.py:617-627)."""

import datetime as dt

import numpy as np
import pytest

from dl_image_segmentation_tpu.catalog import LocalCatalog
from dl_image_segmentation_tpu.catalog.base import (reproject_bounds,
                                                    resample_to_tile)
from dl_image_segmentation_tpu.geo import Tile, crs

from test_pipeline import TILE, ZONE

SRC_ZONE = ZONE - 1  # zone 42 scene serving the zone-43 tile


def _zone42_scene_for_tile(tile, res=10.0, margin=300.0):
    """A zone-42 raster covering the zone-43 tile: band 0 encodes the
    source column index, band 1 the row index (uint16), so any sampled
    pixel's provenance is checkable."""
    x0, y0, x1, y1 = reproject_bounds(tile.bounds, tile.zone, SRC_ZONE,
                                      margin=margin)
    gx0 = np.floor(x0 / res) * res
    gy1 = np.ceil(y1 / res) * res
    w = int(np.ceil((x1 - gx0) / res)) + 1
    h = int(np.ceil((gy1 - y0) / res)) + 1
    cols, rows = np.meshgrid(np.arange(w, dtype=np.uint16),
                             np.arange(h, dtype=np.uint16))
    arr = np.stack([cols, rows], axis=-1)
    gt = (gx0, res, 0.0, gy1, 0.0, -res)
    return arr, gt


class TestCrossZoneWarp:
    def test_near_matches_host_golden(self):
        arr, gt = _zone42_scene_for_tile(TILE)
        out, valid = resample_to_tile(arr, gt, TILE,
                                      src_epsg=32600 + SRC_ZONE,
                                      method="near")
        assert valid.all()
        # host-computed golden: map every tile pixel centre through
        # the SAME published-golden-validated CRS (tests/test_geo.py)
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        ys = tgt[3] + (np.arange(n) + 0.5) * tgt[5]
        X, Y = np.meshgrid(xs, ys)
        lon, lat = crs.utm_to_lonlat(X.ravel(), Y.ravel(), TILE.zone)
        sx, sy = crs.lonlat_to_utm(lon, lat, SRC_ZONE)
        exp_col = np.floor((np.asarray(sx) - gt[0]) / gt[1])
        exp_row = np.floor((np.asarray(sy) - gt[3]) / gt[5])
        np.testing.assert_array_equal(
            out[:, :, 0].ravel(), exp_col.astype(np.uint16))
        np.testing.assert_array_equal(
            out[:, :, 1].ravel(), exp_row.astype(np.uint16))

    def test_bilinear_cross_zone_linear_field_exact(self):
        """A field linear in source coordinates is reproduced to
        float rounding by bilinear regardless of the zone change."""
        x0, y0, x1, y1 = reproject_bounds(TILE.bounds, TILE.zone,
                                          SRC_ZONE, margin=300.0)
        res = 10.0
        gx0 = np.floor(x0 / res) * res
        gy1 = np.ceil(y1 / res) * res
        w = int(np.ceil((x1 - gx0) / res)) + 1
        h = int(np.ceil((gy1 - y0) / res)) + 1
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        lin = (3.0 * cols + 2.0 * rows)[:, :, None].astype(np.float32)
        gt = (gx0, res, 0.0, gy1, 0.0, -res)
        out, valid = resample_to_tile(lin, gt, TILE,
                                      src_epsg=32600 + SRC_ZONE,
                                      method="bilinear")
        assert valid.all()
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        ys = tgt[3] + (np.arange(n) + 0.5) * tgt[5]
        X, Y = np.meshgrid(xs, ys)
        lon, lat = crs.utm_to_lonlat(X.ravel(), Y.ravel(), TILE.zone)
        sx, sy = crs.lonlat_to_utm(lon, lat, SRC_ZONE)
        fcol = (np.asarray(sx) - gt[0]) / gt[1] - 0.5
        frow = (np.asarray(sy) - gt[3]) / gt[5] - 0.5
        exp = (3.0 * fcol + 2.0 * frow).reshape(n, n)
        np.testing.assert_allclose(out[:, :, 0], exp, atol=1e-3)

    def test_local_catalog_cross_zone_end_to_end(self, tmp_path):
        """The verdict's acceptance: a zone-42 scene in a LocalCatalog
        serves a zone-43 tile (search prunes correctly across zones,
        load warps)."""
        arr, gt = _zone42_scene_for_tile(TILE)
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        cat.add_scene("p", ["col", "row"], "z42", dt.date(2020, 6, 1),
                      arr, gt, epsg=32600 + SRC_ZONE)
        scenes = cat.search(TILE, "p")
        assert [m.scene_id for m in scenes] == ["z42"]
        stack, valid = cat.load(scenes, TILE, ["col", "row"])
        assert stack.shape == (1, TILE.raster_size, TILE.raster_size, 2)
        assert valid.all()
        direct, _ = resample_to_tile(arr, gt, TILE,
                                     src_epsg=32600 + SRC_ZONE,
                                     method="near")
        np.testing.assert_array_equal(stack[0], direct)
        # a far-away zone-42 scene must NOT match (cross-zone pruning)
        far_gt = (gt[0] - 500_000.0, gt[1], 0.0, gt[3], 0.0, gt[5])
        cat.add_scene("p", ["col", "row"], "far", dt.date(2020, 6, 2),
                      arr[:40, :40], far_gt, epsg=32600 + SRC_ZONE)
        assert [m.scene_id for m in cat.search(TILE, "p")] == ["z42"]

    def test_http_catalog_cross_zone_matches_local(self, tmp_path):
        from dl_image_segmentation_tpu.catalog import HTTPCatalog
        from dl_image_segmentation_tpu.catalog.httpserver import \
            SceneServer

        arr, gt = _zone42_scene_for_tile(TILE)
        root = str(tmp_path / "cat")
        cat = LocalCatalog.create(root)
        cat.add_scene("p", ["col", "row"], "z42", dt.date(2020, 6, 1),
                      arr, gt, epsg=32600 + SRC_ZONE)
        lstack, lvalid = cat.load(cat.search(TILE, "p"), TILE,
                                  ["col", "row"])
        with SceneServer(root) as srv:
            remote = HTTPCatalog(srv.url)
            scenes = remote.search(TILE, "p")
            assert [m.scene_id for m in scenes] == ["z42"]
            rstack, rvalid = remote.load(scenes, TILE, ["col", "row"])
        np.testing.assert_array_equal(rstack, lstack)
        np.testing.assert_array_equal(rvalid, lvalid)


class TestCubic:
    def _tile_grid_source(self, scale=1.0, jitter=0.0):
        """Source on the tile's own grid (optionally offset/coarser)."""
        x0, y0, x1, y1 = TILE.bounds
        res = 10.0 * scale
        w = int(np.ceil((x1 - x0) / res)) + 4
        h = int(np.ceil((y1 - y0) / res)) + 4
        gt = (x0 - 2 * res + jitter, res, 0.0, y1 + 2 * res + jitter,
              0.0, -res)
        return h, w, gt

    def test_cubic_identity_on_aligned_grid(self):
        h, w, gt = self._tile_grid_source()
        rng = np.random.RandomState(0)
        src = rng.randint(0, 60000, (h, w, 3)).astype(np.uint16)
        out, valid = resample_to_tile(src, gt, TILE, method="cubic")
        assert valid.all()
        np.testing.assert_array_equal(out, src[2:2 + TILE.raster_size,
                                               2:2 + TILE.raster_size])

    def test_cubic_reproduces_linear_fields(self):
        h, w, gt = self._tile_grid_source(scale=1.7, jitter=3.3)
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        src = (5.0 * cols - 2.5 * rows)[:, :, None].astype(np.float32)
        out, valid = resample_to_tile(src, gt, TILE, method="cubic")
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        ys = tgt[3] + (np.arange(n) + 0.5) * tgt[5]
        fcol = (xs - gt[0]) / gt[1] - 0.5
        frow = (ys - gt[3]) / gt[5] - 0.5
        exp = 5.0 * fcol[None, :] - 2.5 * frow[:, None]
        np.testing.assert_allclose(out[:, :, 0][valid], exp[valid],
                                   atol=1e-3)

    def test_cubic_beats_bilinear_on_smooth_field(self):
        h, w, gt = self._tile_grid_source(scale=2.3, jitter=4.1)
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        src = np.sin(cols / 6.0)[:, :, None].astype(np.float32)
        cub, vc = resample_to_tile(src, gt, TILE, method="cubic")
        bil, vb = resample_to_tile(src, gt, TILE, method="bilinear")
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        fcol = (xs - gt[0]) / gt[1] - 0.5
        exp = np.tile(np.sin(fcol / 6.0), (n, 1))
        m = vc & vb
        err_c = np.abs(cub[:, :, 0] - exp)[m].mean()
        err_b = np.abs(bil[:, :, 0] - exp)[m].mean()
        assert err_c < err_b * 0.5, (err_c, err_b)

    def test_cubic_nodata_tap_invalidates(self):
        h, w, gt = self._tile_grid_source()
        src = np.full((h, w, 1), 7.0, np.float32)
        src[10, 10, 0] = -1.0  # nodata island
        out, valid = resample_to_tile(src, gt, TILE, nodata=-1.0,
                                      method="cubic")
        assert not valid[8, 8]  # within the 4x4 stencil of the island
        assert valid[20, 20] and out[20, 20, 0] == 7.0

    def test_unknown_resampler_message_lists_cubic(self):
        with pytest.raises(ValueError, match="cubic"):
            resample_to_tile(np.zeros((4, 4, 1)), (0, 1, 0, 0, 0, -1),
                             TILE, method="mode")

    def test_cubicspline_smooths_but_tracks_linear_fields(self):
        # the B-spline kernel is approximating: it does NOT
        # interpolate arbitrary data, but it DOES reproduce linear
        # fields exactly (B-splines have linear precision)
        h, w, gt = self._tile_grid_source(scale=1.7, jitter=3.3)
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        src = (5.0 * cols - 2.5 * rows)[:, :, None].astype(np.float32)
        out, valid = resample_to_tile(src, gt, TILE,
                                      method="cubicspline")
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        ys = tgt[3] + (np.arange(n) + 0.5) * tgt[5]
        fcol = (xs - gt[0]) / gt[1] - 0.5
        frow = (ys - gt[3]) / gt[5] - 0.5
        exp = 5.0 * fcol[None, :] - 2.5 * frow[:, None]
        np.testing.assert_allclose(out[:, :, 0][valid], exp[valid],
                                   atol=1e-3)

    def test_cubicspline_weights_are_a_partition_of_unity(self):
        # constant fields come back exactly: non-negative weights
        # summing to 1 at every fractional offset
        h, w, gt = self._tile_grid_source(scale=2.3, jitter=4.1)
        src = np.full((h, w, 2), 123.0, np.float32)
        out, valid = resample_to_tile(src, gt, TILE,
                                      method="cubicspline")
        np.testing.assert_allclose(out[valid], 123.0, atol=1e-4)

    def test_lanczos_identity_on_aligned_grid(self):
        h, w, gt = self._tile_grid_source()
        rng = np.random.RandomState(1)
        src = rng.randint(0, 60000, (h, w, 3)).astype(np.uint16)
        out, valid = resample_to_tile(src, gt, TILE, method="lanczos")
        assert valid.all()
        np.testing.assert_array_equal(out, src[2:2 + TILE.raster_size,
                                               2:2 + TILE.raster_size])

    def test_lanczos_beats_bilinear_on_high_frequency_field(self):
        # the windowed sinc's pass band is where it earns its keep:
        # on an 8-px-period field bilinear attenuates ~12x worse
        # (on LOW frequencies Keys cubic is the more accurate kernel
        # — lanczos' truncated window costs it polynomial precision)
        h, w, gt = self._tile_grid_source(scale=2.3, jitter=4.1)
        k = 2.0 * np.pi / 8.0
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        src = np.sin(k * cols)[:, :, None].astype(np.float32)
        lan, vl = resample_to_tile(src, gt, TILE, method="lanczos")
        bil, vb = resample_to_tile(src, gt, TILE, method="bilinear")
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        fcol = (xs - gt[0]) / gt[1] - 0.5
        exp = np.tile(np.sin(k * fcol), (n, 1))
        m = vl & vb
        err_l = np.abs(lan[:, :, 0] - exp)[m].mean()
        err_b = np.abs(bil[:, :, 0] - exp)[m].mean()
        assert err_l < err_b * 0.25, (err_l, err_b)

    def test_lanczos_nodata_tap_invalidates(self):
        h, w, gt = self._tile_grid_source()
        src = np.full((h, w, 1), 7.0, np.float32)
        src[12, 12, 0] = -1.0
        out, valid = resample_to_tile(src, gt, TILE, nodata=-1.0,
                                      method="lanczos")
        # within the 6x6 stencil of the island
        assert not valid[9, 9]
        assert valid[25, 25] and out[25, 25, 0] == 7.0

    def test_kernel_resamplers_cross_zone(self):
        # the new kernels ride the same per-pixel zone->WGS84->zone
        # path as cubic: a smooth field warped from zone 42 matches
        # the analytically-mapped expectation
        arr, gt = _zone42_scene_for_tile(TILE)
        cols = arr[:, :, 0].astype(np.float64)
        src = np.sin(cols / 9.0)[:, :, None].astype(np.float32)
        n = TILE.raster_size
        tgt = TILE.geotrans_equator
        xs = tgt[0] + (np.arange(n) + 0.5) * tgt[1]
        ys = tgt[3] + (np.arange(n) + 0.5) * tgt[5]
        X, Y = np.meshgrid(xs, ys)
        lon, lat = crs.utm_to_lonlat(X.ravel(), Y.ravel(), TILE.zone)
        sx, _ = crs.lonlat_to_utm(lon, lat, SRC_ZONE)
        fcol = ((np.asarray(sx) - gt[0]) / gt[1] - 0.5).reshape(n, n)
        exp = np.sin(fcol / 9.0)
        for method in ("cubicspline", "lanczos"):
            out, valid = resample_to_tile(src, gt, TILE,
                                          src_epsg=32600 + SRC_ZONE,
                                          method=method)
            assert valid.all()
            err = np.abs(out[:, :, 0] - exp).mean()
            assert err < 5e-3, (method, err)
