"""Sentinel-2 .SAFE container walking (LocalCatalog.ingest_safe +
the ingest-safe CLI): the ESA distribution layout
(GRANULE/<id>/IMG_DATA/*_Bxx.jp2) registers as per-band scenes whose
JP2 members decode in-repo — the container-layout leg of the
reference's any-GDAL-readable ingestion
(/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:45-53)."""

import datetime as dt
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.catalog.local import LocalCatalog
from dl_image_segmentation_tpu.geo import Tile
from dl_image_segmentation_tpu.raster.jp2 import encode_jp2

ZONE = 43
TILE = Tile(60, 2, 10.0, ZONE, -380, 3491)

SAFE_NAME = ("S2A_MSIL1C_20201101T053939_N0209_R005_"
             "T43QBB_20201101T070000.SAFE")
GRANULE = "L1C_T43QBB_A027000_20201101T053939"
STEM = "T43QBB_20201101T053939"


def build_safe_tree(root, bands_10m=("B02", "B03", "B04"),
                    bands_20m=("B11",)):
    """Synthetic .SAFE product covering TILE: constant-valued bands
    (value = 10x band number) at realistic mixed resolutions, plus a
    TCI preview that ingestion must skip."""
    img = root / SAFE_NAME / "GRANULE" / GRANULE / "IMG_DATA"
    img.mkdir(parents=True)
    x0, y0, x1, y1 = TILE.bounds
    # scene extent comfortably covering the padded tile
    ox, oy = x0 - 200.0, y1 + 200.0
    w10 = int((x1 - x0 + 400) // 10)
    h10 = int((y1 - y0 + 400) // 10)

    def value(code):
        return {"B02": 20, "B03": 30, "B04": 40, "B11": 110}[code]

    for code in bands_10m:
        arr = np.full((h10, w10, 1), value(code), np.uint16)
        gt = (ox, 10.0, 0.0, oy, 0.0, -10.0)
        (img / f"{STEM}_{code}.jp2").write_bytes(
            encode_jp2(arr, geotransform=gt, epsg=32600 + ZONE))
    for code in bands_20m:
        arr = np.full((h10 // 2, w10 // 2, 1), value(code), np.uint16)
        gt = (ox, 20.0, 0.0, oy, 0.0, -20.0)
        (img / f"{STEM}_{code}.jp2").write_bytes(
            encode_jp2(arr, geotransform=gt, epsg=32600 + ZONE))
    # preview product: must NOT be ingested as a band
    tci = np.zeros((8, 8, 3), np.uint8)
    (img / f"{STEM}_TCI.jp2").write_bytes(encode_jp2(tci))
    return root / SAFE_NAME


class TestIngestSafe:
    def test_granule_registered_with_band_paths(self, tmp_path):
        safe = build_safe_tree(tmp_path)
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        n = cat.ingest_safe(str(safe))
        assert n == 1
        assert cat.products() == ["sentinel-2:L1C"]
        # canonical S2 order, 20m band after the 10m set; TCI skipped
        assert cat.bands("sentinel-2:L1C") == ["B02", "B03", "B04",
                                               "B11"]
        scenes = cat.search(TILE, "sentinel-2:L1C")
        assert len(scenes) == 1
        m = scenes[0]
        assert m.date == dt.date(2020, 11, 1)
        assert set(m.extra["band_paths"]) == {"B02", "B03", "B04",
                                              "B11"}

    def test_load_mixed_resolution_bands(self, tmp_path):
        safe = build_safe_tree(tmp_path)
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        cat.ingest_safe(str(safe))
        scenes = cat.search(TILE, "sentinel-2:L1C")
        stack, valid = cat.load(scenes, TILE, ["B04", "B02", "B11"])
        n = TILE.raster_size
        assert stack.shape == (1, n, n, 3)
        assert valid.all()
        # request order respected; the 20m band upsampled onto the
        # 10m tile grid
        assert (stack[0, :, :, 0] == 40).all()
        assert (stack[0, :, :, 1] == 20).all()
        assert (stack[0, :, :, 2] == 110).all()

    def test_missing_band_raises(self, tmp_path):
        safe = build_safe_tree(tmp_path)
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        cat.ingest_safe(str(safe))
        scenes = cat.search(TILE, "sentinel-2:L1C")
        with pytest.raises(KeyError, match="B09"):
            cat.load(scenes, TILE, ["B09"])

    def test_not_a_safe_tree(self, tmp_path):
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        with pytest.raises(FileNotFoundError, match="GRANULE"):
            cat.ingest_safe(str(tmp_path / "plain_dir"))

    def test_date_fallback_from_safe_name(self, tmp_path):
        # band files without a timestamp: the SAFE folder name dates
        safe = build_safe_tree(tmp_path)
        img = safe / "GRANULE" / GRANULE / "IMG_DATA"
        for f in sorted(img.iterdir()):
            if "_B" in f.name:
                f.rename(img / f.name.replace(STEM, "T43QBB"))
        cat = LocalCatalog.create(str(tmp_path / "cat"))
        cat.ingest_safe(str(safe))
        scenes = cat.search(TILE, "sentinel-2:L1C")
        assert scenes and scenes[0].date == dt.date(2020, 11, 1)


class TestIngestSafeCLI:
    def test_cli_then_create_chips(self, tmp_path, capsys):
        """ingest-safe registers the product, then create-chips cuts
        chip pairs straight from the SAFE-backed catalog."""
        from dl_image_segmentation_tpu.cli import main as cli_main
        from dl_image_segmentation_tpu.geo import crs
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        safe = build_safe_tree(tmp_path)
        cat_root = str(tmp_path / "cat")
        rc = cli_main(["ingest-safe", "--catalog", cat_root,
                       "--safe", str(safe),
                       "--cloud-fraction", "0.0"])
        assert rc == 0
        assert "1 granule(s) registered" in capsys.readouterr().out

        # labels polygon inside the tile
        import json
        x0, y0, x1, y1 = TILE.bounds_unpadded
        ring = [[x0 + 100, y0 + 100], [x1 - 100, y0 + 100],
                [x1 - 100, y1 - 100], [x0 + 100, y1 - 100],
                [x0 + 100, y0 + 100]]
        lonlat = [list(map(float, crs.utm_to_lonlat(px, py, ZONE)))
                  for px, py in ring]
        labels = tmp_path / "labels.geojson"
        labels.write_text(json.dumps({
            "type": "FeatureCollection",
            "features": [{"type": "Feature",
                          "geometry": {"type": "Polygon",
                                       "coordinates": [lonlat]},
                          "properties": {"cls": 1}}]}))
        out = str(tmp_path / "chips")
        rc = cli_main(["create-chips", "--labels", str(labels),
                       "--attribute", "cls",
                       "--product", "sentinel-2:L1C",
                       "--bands", "B04 B03 B02",
                       "--tile-size", "60", "--pad", "2",
                       "--resolution", "10.0", "--out", out,
                       "--tag", "safe", "--loc", "T43QBB",
                       "--year", "2020", "--ref-date", "2020-11-01",
                       "--catalog", cat_root, "--workers", "1"])
        assert rc == 0
        folder = [d for d in os.listdir(out) if d.startswith("safe")][0]
        imgs = os.listdir(os.path.join(out, folder, "images"))
        assert imgs
        g = read_geotiff(os.path.join(out, folder, "images", imgs[0]))
        assert g.array.shape[2] == 3
        vals = set(np.unique(g.array))
        assert {40, 30, 20} <= vals or vals <= {0, 20, 30, 40}
