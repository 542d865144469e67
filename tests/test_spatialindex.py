"""Spatial index for label layers (geo/spatialindex.py) and its wiring
into per-tile label burning: identical rasters, O(candidates) per-tile
cost, once-per-export parse+index caching. Replaces the all-features
Python projection loop (GDAL's RasterizeLayer filtered internally for
the reference, _descartes_img_chips.py:682-685)."""

import json
import time

import numpy as np

from dl_image_segmentation_tpu.geo import crs
from dl_image_segmentation_tpu.geo.spatialindex import (BBoxGrid,
                                                        feature_bboxes)
from dl_image_segmentation_tpu.geo.vector import open_vector
from dl_image_segmentation_tpu.pipeline.chips import (
    _indexed_layer, _label_features_px, _tile_lonlat_bbox,
    create_label_array_for_tile)
from dl_image_segmentation_tpu.ops.rasterize import rasterize

from test_pipeline import TILE, ZONE, write_labels_geojson


class TestBBoxGrid:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        mins = rng.rand(500, 2) * 100
        sizes = rng.rand(500, 2) * 5
        bboxes = np.concatenate([mins, mins + sizes], axis=1)
        bboxes = bboxes[:, [0, 1, 2, 3]]
        grid = BBoxGrid(bboxes)
        for _ in range(50):
            q = rng.rand(2) * 100
            qbox = (q[0], q[1], q[0] + rng.rand() * 10,
                    q[1] + rng.rand() * 10)
            got = grid.query(*qbox)
            exp = np.nonzero(
                (bboxes[:, 0] <= qbox[2]) & (bboxes[:, 2] >= qbox[0])
                & (bboxes[:, 1] <= qbox[3])
                & (bboxes[:, 3] >= qbox[1]))[0]
            np.testing.assert_array_equal(got, exp)
            assert (np.diff(got) > 0).all() if len(got) > 1 else True

    def test_empty_and_degenerate(self):
        grid = BBoxGrid(np.empty((0, 4)))
        assert len(grid.query(0, 0, 1, 1)) == 0
        # all-identical points (zero extent)
        same = np.tile([5.0, 5.0, 5.0, 5.0], (10, 1))
        g2 = BBoxGrid(same)
        assert len(g2.query(4, 4, 6, 6)) == 10
        assert len(g2.query(6, 6, 7, 7)) == 0


def _layer_with_far_features(path, n_far=20000):
    """The near-tile labels plus n_far features ~100 km away."""
    write_labels_geojson(path)
    with open(path) as f:
        doc = json.load(f)
    x0, y0, x1, y1 = TILE.bounds
    rng = np.random.RandomState(1)
    for i in range(n_far):
        fx = x0 + 100_000 + rng.rand() * 50_000
        fy = y0 + 100_000 + rng.rand() * 50_000
        ring = [[fx, fy], [fx + 50, fy], [fx + 50, fy + 50],
                [fx, fy + 50], [fx, fy]]
        lonlat = [list(map(float, crs.utm_to_lonlat(px, py, ZONE)))
                  for px, py in ring]
        doc["features"].append(
            {"type": "Feature",
             "geometry": {"type": "Polygon", "coordinates": [lonlat]},
             "properties": {"cls": 1}})
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


class TestIndexedBurn:
    def test_identical_raster_and_few_candidates(self, tmp_path):
        path = _layer_with_far_features(str(tmp_path / "big.geojson"),
                                        n_far=2000)
        layer, grid = _indexed_layer(path, 0)
        cand = grid.query(*_tile_lonlat_bbox(TILE))
        assert len(cand) <= 10  # only the 2 near strips (+margin)
        out = create_label_array_for_tile(TILE, path,
                                          attrib_to_burn="cls")
        # oracle: the full projection loop over ALL features
        full = rasterize(
            _label_features_px(TILE, layer, "cls", candidates=None),
            (TILE.raster_size, TILE.raster_size), background=255,
            all_touched=True, dtype=np.uint8)
        np.testing.assert_array_equal(out, full)
        assert (out == 1).any() and (out == 2).any()

    def test_cache_hits_and_mtime_invalidation(self, tmp_path):
        path = write_labels_geojson(str(tmp_path / "l.geojson"))
        l1, g1 = _indexed_layer(path, 0)
        l2, g2 = _indexed_layer(path, 0)
        assert l1 is l2 and g1 is g2  # cached, not re-parsed
        time.sleep(0.01)
        with open(path) as f:
            doc = json.load(f)
        doc["features"] = doc["features"][:1]
        with open(path, "w") as f:
            json.dump(doc, f)
        l3, _ = _indexed_layer(path, 0)
        assert l3 is not l1 and len(l3.features) == 1

    def test_per_tile_cost_is_o_candidates(self, tmp_path):
        """The verdict's acceptance: with 10^5-scale far features the
        indexed per-tile projection must not scale with the layer."""
        path = _layer_with_far_features(str(tmp_path / "huge.geojson"),
                                        n_far=30000)
        layer, grid = _indexed_layer(path, 0)
        cand = grid.query(*_tile_lonlat_bbox(TILE))
        t0 = time.perf_counter()
        for _ in range(5):
            _label_features_px(TILE, layer, "cls", candidates=cand)
        t_indexed = time.perf_counter() - t0
        t0 = time.perf_counter()
        _label_features_px(TILE, layer, "cls", candidates=None)
        t_full = time.perf_counter() - t0
        # 5 indexed tiles vs ONE full pass, still >=3x margin
        assert t_indexed * 3 < t_full, (t_indexed, t_full)
