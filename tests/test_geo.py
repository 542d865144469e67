"""Geo core tests: CRS math, tile grid key compatibility, geometry
predicates, vector IO."""

import json
import math
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.geo import crs, Tile, tiles_from_shape
from dl_image_segmentation_tpu.geo.geometry import (
    Geometry, points_in_polygon, polygon_intersects_rect)
from dl_image_segmentation_tpu.geo.vector import (
    open_vector, write_geojson, VectorLayer, Feature)


class TestCRS:
    def test_known_point_two_formulations_agree(self):
        # Cross-validated against an independently-coded classic Snyder
        # series (agreement < 1mm). WGS84, zone 18, phi=40.5N lam=73.5W.
        e, n = crs.lonlat_to_utm(-73.5, 40.5, 18)
        assert abs(e - 627103.087) < 0.01
        assert abs(n - 4484335.402) < 0.01

    def test_roundtrip_grid(self):
        lons = np.linspace(-5.9, 5.9, 13)  # within ±6 deg of the CM
        lats = np.linspace(-80, 84, 23)
        LO, LA = np.meshgrid(lons, lats)
        zone = 31  # CM at 3E
        e, n = crs.lonlat_to_utm(LO.ravel() + 3.0, LA.ravel(), zone)
        lon2, lat2 = crs.utm_to_lonlat(e, n, zone)
        np.testing.assert_allclose(lon2, LO.ravel() + 3.0, atol=1e-9)
        np.testing.assert_allclose(lat2, LA.ravel(), atol=1e-9)

    def test_southern_hemisphere_negative_northing(self):
        e, n = crs.lonlat_to_utm(173.0, -41.0, 59)
        assert n < 0

    def test_zone_selection(self):
        assert crs.utm_zone_from_lonlat(72.87, 19.07) == 43  # Mumbai
        assert crs.utm_zone_from_lonlat(-73.5, 40.5) == 18
        assert crs.utm_zone_from_lonlat(5.3, 60.4) == 32  # Bergen (Norway exc.)
        assert crs.utm_zone_from_lonlat(15.6, 78.2) == 33  # Svalbard exc.

    def test_wkt_contains_epsg(self):
        w = crs.utm_wkt(43)
        assert '"32643"' in w and "Transverse_Mercator" in w


class TestTileGrid:
    def test_key_roundtrip(self):
        # real keys from the reference notebook (create nb cell 56)
        for key in ("252:2:1.0:43:-902:8394",
                    "252:2:1.0:43:-909:8373",
                    "60:2:10.0:43:-380:3491"):
            t = Tile.from_key(key)
            assert t.key == key

    def test_known_tile_location(self):
        # 252:2:1.0:43:-902:8394 should cover Mumbai (~72.85E, 19.1N)
        t = Tile.from_key("252:2:1.0:43:-902:8394")
        lon, lat = t.center_lonlat
        assert 72.5 < lon < 73.2
        assert 18.9 < lat < 19.3

    def test_geotransform_and_size(self):
        t = Tile.from_key("252:2:1.0:43:-902:8394")
        assert t.raster_size == 256
        gt = t.geotrans
        assert gt[1] == 1.0 and gt[5] == -1.0
        x0, y0, x1, y1 = t.bounds
        assert abs((x1 - x0) - 256.0) < 1e-9
        assert gt[0] == x0 and gt[3] == y1

    def test_filename_contract(self):
        t = Tile.from_key("252:2:1.0:43:-902:8394")
        assert t.filename == "252#2#1.0#43#-902#8394"
        assert Tile.from_filename("252#2#1.0#43#-902#8394.tif").key == t.key

    def test_tiles_from_shape_cover_and_dedup(self):
        # small polygon near Mumbai; 64px@10m tiles (640 m each)
        poly = {
            "type": "Polygon",
            "coordinates": [[
                [72.85, 19.05], [72.88, 19.05],
                [72.88, 19.08], [72.85, 19.08], [72.85, 19.05],
            ]],
        }
        tiles = tiles_from_shape(poly, resolution=10.0, tilesize=60, pad=2)
        assert len(tiles) > 0
        keys = [t.key for t in tiles]
        assert len(keys) == len(set(keys))
        for t in tiles:
            assert t.zone == 43
            assert t.key.startswith("60:2:10.0:43:")
        # polygon is ~3.1km x 3.3km; 600m tiles -> expect a 6x7-ish block
        assert 20 <= len(tiles) <= 56

    def test_tiles_contain_polygon_points(self):
        poly = {
            "type": "Polygon",
            "coordinates": [[
                [72.85, 19.05], [72.88, 19.05],
                [72.88, 19.08], [72.85, 19.08], [72.85, 19.05],
            ]],
        }
        tiles = tiles_from_shape(poly, resolution=10.0, tilesize=60, pad=2)
        # every polygon corner must fall inside some tile
        for lon, lat in poly["coordinates"][0]:
            e, n = crs.lonlat_to_utm(lon, lat, 43)
            hit = any(
                t.bounds_unpadded[0] <= e <= t.bounds_unpadded[2]
                and t.bounds_unpadded[1] <= n <= t.bounds_unpadded[3]
                for t in tiles)
            assert hit


class TestGeometry:
    def test_point_in_polygon(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
        inside = points_in_polygon([5, 15, -1], [5, 5, 5], sq)
        assert list(inside) == [True, False, False]

    def test_point_in_polygon_with_hole(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
        hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
        inside = points_in_polygon([5, 2], [5, 2], sq, [hole])
        assert list(inside) == [False, True]

    def test_polygon_rect_intersection(self):
        tri = np.array([[0, 0], [10, 0], [5, 10]], dtype=float)
        assert polygon_intersects_rect(tri, [], 4, 4, 6, 6)       # inside
        assert polygon_intersects_rect(tri, [], -5, -5, 1, 1)     # corner
        assert not polygon_intersects_rect(tri, [], 11, 11, 12, 12)
        assert not polygon_intersects_rect(tri, [], -2, 5, -0.5, 6)
        # rect fully containing the polygon
        assert polygon_intersects_rect(tri, [], -1, -1, 11, 11)
        # rect inside a hole -> no intersection
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
        hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], dtype=float)
        assert not polygon_intersects_rect(sq, [hole], 4, 4, 6, 6)
        assert polygon_intersects_rect(sq, [hole], 0.5, 0.5, 1.5, 1.5)

    def test_multipolygon_explode(self):
        mp = Geometry.coerce({
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 1]]],
                [[[5, 5], [6, 5], [6, 6], [5, 6]]],
            ],
        })
        parts = mp.explode()
        assert len(parts) == 2
        assert parts[1].bounds == (5.0, 5.0, 6.0, 6.0)


class TestVectorIO:
    def test_geojson_roundtrip(self, tmp_path):
        sq = [[72.85, 19.05], [72.88, 19.05], [72.88, 19.08],
              [72.85, 19.08], [72.85, 19.05]]
        obj = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature",
                 "geometry": {"type": "Polygon", "coordinates": [sq]},
                 "properties": {"class_id": 2, "name": "slum"}},
            ],
        }
        p = tmp_path / "labels.geojson"
        p.write_text(json.dumps(obj))
        ds = open_vector(str(p))
        assert ds.layer_names() == ["labels"]
        assert ds.get_layer_index("labels") == 0
        assert ds.get_layer_index("nope") == -1
        lyr = ds.get_layer(0)
        assert len(lyr.features) == 1
        assert lyr.features[0].properties["class_id"] == 2

    def test_write_then_read_geojson(self, tmp_path):
        g = Geometry.coerce({"type": "Polygon",
                             "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1]]]})
        lyr = VectorLayer("t", [Feature(g, {"v": 1})], 4326)
        p = tmp_path / "out.geojson"
        write_geojson(str(p), lyr)
        ds = open_vector(str(p))
        assert len(ds.get_layer(0).features) == 1

    def test_utm_geojson_reprojection(self, tmp_path):
        # a square in EPSG:32643 around Mumbai
        e, n = crs.lonlat_to_utm(72.86, 19.06, 43)
        ring = [[e, n], [e + 1000, n], [e + 1000, n + 1000],
                [e, n + 1000], [e, n]]
        obj = {
            "type": "FeatureCollection",
            "crs": {"type": "name",
                    "properties": {"name": "urn:ogc:def:crs:EPSG::32643"}},
            "features": [{"type": "Feature",
                          "geometry": {"type": "Polygon",
                                       "coordinates": [ring]},
                          "properties": {}}],
        }
        p = tmp_path / "utm.geojson"
        p.write_text(json.dumps(obj))
        lyr = open_vector(str(p)).get_layer(0)
        assert lyr.crs_epsg == 32643
        w = lyr.to_wgs84()
        b = w.features[0].geometry.bounds
        assert 72.8 < b[0] < 72.9 and 19.0 < b[1] < 19.1


class TestShapefile:
    def _write_minimal_shapefile(self, path, rings_list, props, epsg=4326):
        """Hand-roll a tiny polygon shapefile for reader tests."""
        import struct

        def shp_record(recno, rings):
            pts = np.concatenate(rings, axis=0)
            nparts = len(rings)
            npoints = len(pts)
            content = struct.pack("<i", 5)
            content += struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                                   pts[:, 0].max(), pts[:, 1].max())
            content += struct.pack("<ii", nparts, npoints)
            idx = 0
            for r in rings:
                content += struct.pack("<i", idx)
                idx += len(r)
            content += pts.astype("<f8").tobytes()
            hdr = struct.pack(">ii", recno, len(content) // 2)
            return hdr + content

        records = b""
        for i, rings in enumerate(rings_list):
            records += shp_record(i + 1, rings)
        total_len = (100 + len(records)) // 2
        allpts = np.concatenate([np.concatenate(r, axis=0)
                                 for r in rings_list], axis=0)
        hdr = struct.pack(">i", 9994) + b"\x00" * 20
        hdr += struct.pack(">i", total_len)
        hdr += struct.pack("<ii", 1000, 5)
        hdr += struct.pack("<4d", allpts[:, 0].min(), allpts[:, 1].min(),
                           allpts[:, 0].max(), allpts[:, 1].max())
        hdr += struct.pack("<4d", 0, 0, 0, 0)
        with open(path, "wb") as f:
            f.write(hdr + records)

        # minimal DBF with one numeric field "CLS"
        dbf = os.path.splitext(path)[0] + ".dbf"
        nrec = len(props)
        field = b"CLS".ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([10, 0]) + b"\x00" * 14
        hdr_size = 32 + 32 + 1
        rec_size = 1 + 10
        head = struct.pack("<BBBBIHH", 3, 24, 1, 1, nrec, hdr_size, rec_size)
        head += b"\x00" * 20
        body = field + b"\x0d"
        recs = b""
        for p in props:
            recs += b" " + str(p["CLS"]).rjust(10).encode()
        with open(dbf, "wb") as f:
            f.write(head + body + recs + b"\x1a")

    def test_read_shapefile(self, tmp_path):
        # clockwise ring (shapefile exterior convention, y-up)
        ring = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]],
                        dtype=float)
        p = str(tmp_path / "test.shp")
        self._write_minimal_shapefile(p, [[ring]], [{"CLS": 3}])
        ds = open_vector(p)
        lyr = ds.get_layer(0)
        assert len(lyr.features) == 1
        f = lyr.features[0]
        assert f.properties["CLS"] == 3
        assert f.geometry.bounds == (0.0, 0.0, 10.0, 10.0)


class TestGeoPackage:
    def test_write_read_roundtrip(self, tmp_path):
        from dl_image_segmentation_tpu.geo.gpkg import write_gpkg
        from dl_image_segmentation_tpu.geo.vector import (Feature,
                                                          VectorLayer,
                                                          open_vector)
        sq = Geometry.coerce({
            "type": "Polygon",
            "coordinates": [[[72.85, 19.05], [72.88, 19.05],
                             [72.88, 19.08], [72.85, 19.08],
                             [72.85, 19.05]]]})
        mp = Geometry.coerce({
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]],
                 [[5.2, 5.2], [5.8, 5.2], [5.8, 5.8], [5.2, 5.8],
                  [5.2, 5.2]]],
            ]})
        lyr = VectorLayer("labels", [Feature(sq, {"cls": 1, "name": "a"}),
                                     Feature(mp, {"cls": 2, "name": "b"})],
                          4326)
        p = str(tmp_path / "labels.gpkg")
        write_gpkg(p, lyr)
        ds = open_vector(p)
        assert ds.layer_names() == ["labels"]
        got = ds.get_layer("labels")
        assert got.crs_epsg == 4326
        assert len(got.features) == 2
        f0, f1 = got.features
        assert f0.properties["cls"] == 1
        np.testing.assert_allclose(f0.geometry.bounds,
                                   (72.85, 19.05, 72.88, 19.08))
        assert len(f1.geometry.polygons()) == 2
        assert len(f1.geometry.polygons()[1]) == 2  # hole preserved

    def test_gpkg_as_label_source(self, tmp_path):
        """GPKG plugs straight into the label pipeline."""
        from dl_image_segmentation_tpu.geo.gpkg import write_gpkg
        from dl_image_segmentation_tpu.geo.vector import (Feature,
                                                          VectorLayer)
        from dl_image_segmentation_tpu.geo import Tile
        from dl_image_segmentation_tpu.pipeline.chips import (
            create_label_array_for_tile)
        tile = Tile(60, 2, 10.0, 43, -380, 3491)
        x0, y0, x1, y1 = tile.bounds_unpadded
        ring_utm = np.array([[x0 + 100, y0 + 100], [x1 - 100, y0 + 100],
                             [x1 - 100, y1 - 100], [x0 + 100, y1 - 100],
                             [x0 + 100, y0 + 100]])
        lon, lat = crs.utm_to_lonlat(ring_utm[:, 0], ring_utm[:, 1], 43)
        g = Geometry([[np.stack([lon, lat], axis=1)]])
        p = str(tmp_path / "lbl.gpkg")
        write_gpkg(p, VectorLayer("lbl", [Feature(g, {"cls": 3})], 4326))
        arr = create_label_array_for_tile(tile, p, attrib_to_burn="cls",
                                          background_value=0)
        assert set(np.unique(arr)) == {0, 3}


class TestGeoPackageUTM:
    def test_utm_gpkg_reprojects_into_pipeline(self, tmp_path):
        """A GPKG authored in a UTM CRS reprojects through to_wgs84 and
        plans tiles correctly."""
        from dl_image_segmentation_tpu.geo.gpkg import write_gpkg
        from dl_image_segmentation_tpu.geo.vector import (Feature,
                                                          VectorLayer,
                                                          open_vector)
        e, n = crs.lonlat_to_utm(72.86, 19.06, 43)
        ring = np.array([[e, n], [e + 800, n], [e + 800, n + 600],
                         [e, n + 600], [e, n]], float)
        g = Geometry([[ring]])
        p = str(tmp_path / "utm.gpkg")
        write_gpkg(p, VectorLayer("l", [Feature(g, {"cls": 1})], 32643))
        lyr = open_vector(p).get_layer(0)
        assert lyr.crs_epsg == 32643
        w = lyr.to_wgs84()
        b = w.features[0].geometry.bounds
        assert 72.8 < b[0] < 72.9 and 19.0 < b[1] < 19.1
        tiles = tiles_from_shape(w.features[0].geometry, 10.0, 60, 2)
        assert len(tiles) >= 1


class TestShapefileWriter:
    def test_roundtrip_through_own_reader(self, tmp_path):
        from dl_image_segmentation_tpu.geo.vector import write_shapefile
        ext = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
        g = Geometry([[ext, hole]])
        lyr = VectorLayer("t", [Feature(g, {"cls": 3, "name": "abc"})],
                          4326)
        p = str(tmp_path / "out.shp")
        write_shapefile(p, lyr)
        for ext_ in (".shp", ".shx", ".dbf", ".prj"):
            assert os.path.exists(str(tmp_path / ("out" + ext_)))
        ds = open_vector(p)
        f = ds.get_layer(0).features[0]
        assert f.properties["cls"] == 3
        assert f.properties["name"] == "abc"
        polys = f.geometry.polygons()
        assert len(polys) == 1 and len(polys[0]) == 2  # hole preserved
        assert f.geometry.bounds == (0.0, 0.0, 10.0, 10.0)

    def test_tile_plan_to_shapefile_roundtrip(self, tmp_path):
        """The reference's save-tiles-to-shapefile resume flow (create
        nb cells 22-24) end to end."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_to_layer
        from dl_image_segmentation_tpu.geo.vector import write_shapefile
        tiles = [Tile.from_key("60:2:10.0:43:-380:3491"),
                 Tile.from_key("60:2:10.0:43:-379:3491")]
        p = str(tmp_path / "tiles.shp")
        write_shapefile(p, tiles_to_layer(tiles))
        lyr = open_vector(p).get_layer(0)
        keys = [f.properties["key"].strip() for f in lyr.features]
        assert keys == [t.key for t in tiles]


class TestGPKGFlags:
    def test_empty_flag_bit4(self, tmp_path):
        """Spec bit 4 (0x10) marks empty geometry; bit 5 (0x20) is the
        extension-encoding flag and must be rejected, not treated as
        empty (ADVICE r1)."""
        from dl_image_segmentation_tpu.geo.gpkg import _parse_gpkg_geom
        import struct
        # header: magic GP, version 0, flags, srs_id
        empty = b"GP\x00" + bytes([0x10 | 0x01]) + struct.pack("<i", 4326)
        assert _parse_gpkg_geom(empty) is None
        ext = b"GP\x00" + bytes([0x20 | 0x01]) + struct.pack("<i", 4326)
        with pytest.raises(ValueError, match="extension"):
            _parse_gpkg_geom(ext)


class TestZoneSplitting:
    def test_aoi_spanning_zone_boundary(self):
        """An AOI straddling the zone 43/44 boundary (lon 78) yields
        tiles from BOTH zones, assigned by centre longitude, jointly
        covering the AOI (the DL service's server-side splitting,
        _descartes_img_chips.py:421-425)."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        ring = [[77.95, 19.0], [78.05, 19.0], [78.05, 19.05],
                [77.95, 19.05], [77.95, 19.0]]
        shape = {"type": "Polygon", "coordinates": [ring]}
        tiles = tiles_from_shape(shape, resolution=10.0, tilesize=200,
                                 pad=0)
        zones = {t.zone for t in tiles}
        assert zones == {43, 44}
        # each tile's longitude range overlaps its own zone band
        # (band-overlap assignment: no coverage gaps at the seam)
        for t in tiles:
            lon_min, _, lon_max, _ = t.lonlat_bounds
            lon0 = (t.zone - 1) * 6.0 - 180.0
            assert lon_max > lon0 and lon_min < lon0 + 6.0
        # joint coverage: sample AOI points, each inside some tile
        import numpy as np
        from dl_image_segmentation_tpu.geo import crs
        for lon in np.linspace(77.951, 78.049, 15):
            for lat in (19.001, 19.025, 19.049):
                hit = False
                for t in tiles:
                    e, n = crs.lonlat_to_utm(lon, lat, t.zone)
                    x0, y0, x1, y1 = t.bounds_unpadded
                    if x0 <= e <= x1 and y0 <= n <= y1:
                        hit = True
                        break
                assert hit, (lon, lat)

    def test_single_zone_unchanged(self):
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        ring = [[72.85, 19.0], [72.90, 19.0], [72.90, 19.05],
                [72.85, 19.05], [72.85, 19.0]]
        tiles = tiles_from_shape({"type": "Polygon",
                                  "coordinates": [ring]},
                                 resolution=10.0, tilesize=200, pad=0)
        assert {t.zone for t in tiles} == {43}


class TestAntimeridian:
    def test_multipolygon_both_sides_of_antimeridian(self):
        """A Fiji-style AOI with parts just east and just west of the
        antimeridian touches zones {60, 1} only -- zone spans are
        per-part, so the global lon bounds (-179.9..179.9) must NOT
        enumerate all 60 zones (which also projects each part half a
        world from the zone meridian)."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        west = [[179.90, -17.0], [179.95, -17.0], [179.95, -16.95],
                [179.90, -16.95], [179.90, -17.0]]
        east = [[-179.95, -17.0], [-179.90, -17.0], [-179.90, -16.95],
                [-179.95, -16.95], [-179.95, -17.0]]
        shape = {"type": "MultiPolygon", "coordinates": [[west], [east]]}
        tiles = tiles_from_shape(shape, resolution=10.0, tilesize=200,
                                 pad=0)
        assert {t.zone for t in tiles} == {60, 1}

    def test_wide_part_spans_middle_zones_not_complement(self):
        """Regression: a lon-span>180 wrap heuristic would compute the
        COMPLEMENT of the right zone set for a genuinely wide AOI.
        Raw spans are taken at face value (RFC 7946 splits crossing
        geometries into parts), so a -100..100 part must touch the
        MIDDLE zones, never wrap around through 60/1."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        ring = [[-100.0, 10.0], [100.0, 10.0], [100.0, 10.01],
                [-100.0, 10.01], [-100.0, 10.0]]
        tiles = tiles_from_shape({"type": "Polygon",
                                  "coordinates": [ring]},
                                 resolution=10.0, tilesize=2000, pad=0)
        zones = {t.zone for t in tiles}
        assert min(zones) <= 15 and max(zones) >= 46  # middle covered
        assert 30 in zones  # smack in the middle, was empty pre-fix

    def test_wide_multizone_aoi_enumeration_bounded(self):
        """A ~3-zone-wide AOI stays band-bounded per zone: the number
        of tiles must be on the order of the AOI area, not the AOI
        width re-enumerated once per zone."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        ring = [[70.1, 19.0], [85.9, 19.0], [85.9, 19.02],
                [70.1, 19.02], [70.1, 19.0]]
        tiles = tiles_from_shape({"type": "Polygon",
                                  "coordinates": [ring]},
                                 resolution=10.0, tilesize=200, pad=0)
        zones = {t.zone for t in tiles}
        assert zones == {42, 43, 44, 45}
        # ~1,660 km x ~2.2 km AOI at 2 km tiles: ~840 columns x 2 rows
        # plus seam double coverage; far below a per-zone re-sweep
        # (which would be ~4x as many)
        assert len(tiles) < 2600


class TestShapefileDeletedRecords:
    def test_deleted_dbf_record_keeps_alignment(self, tmp_path):
        """A soft-deleted .dbf row (marker '*') must drop ITS geometry
        and keep every later attribute on the right geometry -- the
        old reader skipped the row and shifted all later attributes
        one feature back (silent wrong labels)."""
        from dl_image_segmentation_tpu.geo.vector import write_shapefile
        feats = []
        for i in range(3):
            ext = np.array([[i * 20, 0], [i * 20 + 10, 0],
                            [i * 20 + 10, 10], [i * 20, 10],
                            [i * 20, 0]], float)
            feats.append(Feature(Geometry([[ext]]), {"cls": i + 1}))
        p = str(tmp_path / "d.shp")
        write_shapefile(p, VectorLayer("d", feats, 4326))
        # soft-delete record 1 (middle): flip its deletion flag byte
        dbf = str(tmp_path / "d.dbf")
        data = bytearray(open(dbf, "rb").read())
        import struct as _struct
        hdr_size, rec_size = _struct.unpack("<HH", data[8:12])
        data[hdr_size + rec_size] = 0x2A  # b"*"
        open(dbf, "wb").write(bytes(data))
        ds = open_vector(p)
        fs = ds.get_layer(0).features
        assert len(fs) == 2
        assert [f.properties["cls"] for f in fs] == [1, 3]
        # geometry 2 (cls 3) is the one at x 40..50, not 20..30
        assert fs[1].geometry.bounds[0] == 40.0


class TestGeometry3D:
    def test_geojson_3d_coordinates_drop_z(self):
        """RFC 7946 allows [lon, lat, elev]; a blind reshape(-1, 2)
        interleaved x/y/z into garbage coordinates."""
        ring3 = [[0, 0, 5], [1, 0, 5], [1, 1, 5], [0, 1, 5], [0, 0, 5]]
        want = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        g = Geometry.coerce({"type": "Polygon", "coordinates": [ring3]})
        np.testing.assert_array_equal(g.polygons()[0][0], want)
        assert g.bounds == (0.0, 0.0, 1.0, 1.0)
        mp = Geometry.coerce({"type": "MultiPolygon",
                              "coordinates": [[ring3]]})
        assert mp.bounds == (0.0, 0.0, 1.0, 1.0)
        direct = Geometry([[np.asarray(ring3, float)]])
        np.testing.assert_array_equal(direct.polygons()[0][0], want)

    def test_empty_geometry_is_empty_and_bounds_raise(self):
        g = Geometry([])
        assert g.is_empty
        with pytest.raises(ValueError, match="empty"):
            g.bounds


class TestNorwayZoneException:
    def test_norway_band_part_keeps_coverage_in_multizone_plan(self):
        """A part in zone 32's Norway exception band (lon 3..6,
        lat 56..64) used to be clamped to the NOMINAL band (6..12) and
        contribute zero tiles whenever the plan was multi-zone."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        norway = [[4.0, 58.0], [4.05, 58.0], [4.05, 58.04],
                  [4.0, 58.04], [4.0, 58.0]]
        other = [[-3.0, 58.0], [-2.96, 58.0], [-2.96, 58.04],
                 [-3.0, 58.04], [-3.0, 58.0]]
        tiles = tiles_from_shape(
            {"type": "MultiPolygon", "coordinates": [[norway], [other]]},
            resolution=10.0, tilesize=200, pad=0)
        zones = {t.zone for t in tiles}
        assert 32 in zones and 30 in zones
        hit = False
        for t in tiles:
            if t.zone != 32:
                continue
            e, n = crs.lonlat_to_utm(4.02, 58.02, t.zone)
            x0, y0, x1, y1 = t.bounds_unpadded
            if x0 <= e <= x1 and y0 <= n <= y1:
                hit = True
        assert hit, "Norway-band part lost coverage"

    def test_lat_span_crossing_56_names_zone_32(self):
        """A part at lon 3..6 whose latitude span crosses 56N must plan
        zone-32 tiles for its Norway-band portion even though its
        mid-latitude is below the exception band."""
        from dl_image_segmentation_tpu.geo.tilegrid import tiles_from_shape
        part = [[4.0, 55.2], [4.05, 55.2], [4.05, 57.0], [4.0, 57.0],
                [4.0, 55.2]]
        other = [[-3.0, 55.5], [-2.96, 55.5], [-2.96, 55.54],
                 [-3.0, 55.54], [-3.0, 55.5]]
        tiles = tiles_from_shape(
            {"type": "MultiPolygon", "coordinates": [[part], [other]]},
            resolution=10.0, tilesize=2000, pad=0)
        zones = {t.zone for t in tiles}
        assert 31 in zones and 32 in zones
        # the lat>56 slice is covered (zone 32 owns lon 3..12 there)
        hit = False
        for t in tiles:
            if t.zone != 32:
                continue
            e, n = crs.lonlat_to_utm(4.02, 56.5, t.zone)
            x0, y0, x1, y1 = t.bounds_unpadded
            if x0 <= e <= x1 and y0 <= n <= y1:
                hit = True
        assert hit


class TestShapefileLongNames:
    def test_long_property_names_roundtrip(self, tmp_path):
        """DBF truncates names to 10 chars; values must still be
        looked up by the ORIGINAL key (long numeric names used to
        crash on int(''), long string names wrote blanks)."""
        from dl_image_segmentation_tpu.geo.vector import write_shapefile
        g = Geometry([[np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                                 [0, 0]], float)]])
        lyr = VectorLayer("t", [Feature(g, {"cloud_fraction": 0.12,
                                            "description_text": "abc",
                                            "sample_count_total": 7})],
                          4326)
        p = str(tmp_path / "ln.shp")
        write_shapefile(p, lyr)
        f = open_vector(p).get_layer(0).features[0]
        assert abs(float(f.properties["cloud_frac"]) - 0.12) < 1e-6
        assert str(f.properties["descriptio"]).strip() == "abc"
        assert int(f.properties["sample_cou"]) == 7


class TestGPKGRobustness:
    def test_null_shape_feature_roundtrips(self, tmp_path):
        """Shapefile null shapes arrive as empty Geometry; write_gpkg
        must skip them in the contents envelope instead of crashing."""
        from dl_image_segmentation_tpu.geo.gpkg import read_gpkg, write_gpkg
        good = Geometry([[np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                                    [0, 0]], float)]])
        lyr = VectorLayer("t", [Feature(Geometry([]), {"cls": 1}),
                                Feature(good, {"cls": 2})], 4326)
        p = str(tmp_path / "n.gpkg")
        write_gpkg(p, lyr)
        feats = read_gpkg(p).get_layer(0).features
        assert len(feats) == 1 and feats[0].properties["cls"] == 2

    def test_read_missing_gpkg_raises_without_creating_file(self, tmp_path):
        from dl_image_segmentation_tpu.geo.gpkg import read_gpkg
        p = str(tmp_path / "typo.gpkg")
        with pytest.raises(FileNotFoundError):
            read_gpkg(p)
        assert not os.path.exists(p)  # sqlite must not leave junk

    def test_invalid_envelope_code_rejected(self):
        from dl_image_segmentation_tpu.geo.gpkg import _parse_gpkg_geom
        import struct
        bad = (b"GP\x00" + bytes([(5 << 1) | 0x01])
               + struct.pack("<i", 4326) + b"\x00" * 8)
        with pytest.raises(ValueError, match="envelope"):
            _parse_gpkg_geom(bad)


class TestPublishedGoldens:
    """External CRS validation: published UTM<->geographic benchmark
    coordinates pinned as literals (NOT a second in-repo
    implementation). Sources:

    * GeographicLib GeoConvert man-page worked example
      (lat 33.3, lon 44.4 -> '38n 444140.54 3684706.36').
    * ICSM 'GDA Technical Manual' worked benchmarks Flinders Peak and
      Buninyong (MGA94/GRS80; GRS80 and WGS84 differ by ~1e-10 in
      flattening, sub-0.1 mm in these projected coordinates) --
      Buninyong is published in BOTH zones 54 and 55, exercising a
      far-from-central-meridian case.
    * Defining constants of UTM on WGS84: E=500000/N=0 at any central
      meridian x equator; the WGS84 quarter-meridian 10 001 965.7293 m
      and the meridian arc to 45 deg, 4 984 944.378 m, scaled by
      k0 = 0.9996 on the central meridian.
    """

    # (lon, lat, zone, easting, northing_equator_ref, tol_m)
    FORWARD = [
        # GeoConvert example (northern hemisphere, cm-published)
        (44.4, 33.3, 38, 444140.54, 3684706.36, 0.01),
        # Flinders Peak, MGA zone 55 (southern: N - 10,000,000)
        (144 + 25 / 60 + 29.52440 / 3600,
         -(37 + 57 / 60 + 3.72030 / 3600), 55,
         273741.297, 5796489.777 - 10_000_000.0, 0.005),
        # Buninyong in its own zone 54...
        (143 + 55 / 60 + 35.38390 / 3600,
         -(37 + 39 / 60 + 10.15610 / 3600), 54,
         758173.797, 5828674.340 - 10_000_000.0, 0.005),
        # ...and republished in zone 55 (far from the CM)
        (143 + 55 / 60 + 35.38390 / 3600,
         -(37 + 39 / 60 + 10.15610 / 3600), 55,
         228854.052, 5828259.038 - 10_000_000.0, 0.005),
        # defining anchors of the projection
        (3.0, 0.0, 31, 500_000.0, 0.0, 1e-6),
        (-75.0, 0.0, 18, 500_000.0, 0.0, 1e-6),
        # meridian arc to 45 deg x k0 (published arc 4,984,944.378 m)
        (3.0, 45.0, 31, 500_000.0, 0.9996 * 4_984_944.378, 0.002),
        # quarter meridian x k0 (published 10,001,965.7293 m)
        (3.0, 90.0, 31, 500_000.0, 0.9996 * 10_001_965.7293, 0.002),
    ]

    def test_forward_matches_published(self):
        for lon, lat, zone, e_exp, n_exp, tol in self.FORWARD:
            e, n = crs.lonlat_to_utm(lon, lat, zone)
            assert abs(e - e_exp) < tol, (lon, lat, zone, e, e_exp)
            assert abs(n - n_exp) < tol, (lon, lat, zone, n, n_exp)

    def test_inverse_matches_published(self):
        # the inverse can only be as exact as the published projected
        # coordinates are rounded (GeoConvert: cm, GDA: mm), so the
        # degree tolerance follows each point's metre tolerance
        # (1 m ~= 9e-6 deg; x2 slack for rounding in both coords)
        for lon, lat, zone, e, n, tol in self.FORWARD[:4]:
            lon2, lat2 = crs.utm_to_lonlat(e, n, zone)
            tol_deg = max(2e-8, 2 * tol * 9e-6)
            assert abs(lon2 - lon) < tol_deg, (zone, lon2, lon)
            assert abs(lat2 - lat) < tol_deg, (zone, lat2, lat)

    def test_zone_selection_norway_svalbard(self):
        """PROJ's documented +proj=utm zone exceptions."""
        z = crs.utm_zone_from_lonlat
        assert z(5.0, 60.0) == 32      # Norway 32V widening
        assert z(5.0, 50.0) == 31      # ...only between 56N and 64N
        assert z(5.0, 64.0) == 31
        assert z(9.0, 79.0) == 33      # Svalbard bands
        assert z(8.9, 79.0) == 31
        assert z(21.0, 78.0) == 35
        assert z(33.0, 75.0) == 37
        assert z(0.0, 0.0) == 31
        assert z(-180.0, 10.0) == 1
        assert z(179.999, 10.0) == 60
