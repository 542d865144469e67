"""Sentinel-2 .SAFE -> catalog -> chips, hermetically.

Builds a synthetic ESA-layout .SAFE product (per-band JP2s at mixed
10/20 m resolutions, GeoJP2 georeferencing), walks it into a
LocalCatalog with ``ingest_safe`` (the `dlseg-tpu ingest-safe` CLI
does the same), and cuts chip pairs from it with the standard
chip-creation pipeline — the container-layout leg of the reference's
any-GDAL-readable ingestion
(/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:45-53).

    python examples/safe_ingest_pipeline.py --out /tmp/safe_demo
"""

import argparse
import json
import os

import numpy as np

SAFE_NAME = ("S2A_MSIL1C_20201101T053939_N0209_R005_"
             "T43QBB_20201101T070000.SAFE")
GRANULE = "L1C_T43QBB_A027000_20201101T053939"
STEM = "T43QBB_20201101T053939"
ZONE = 43


def build_safe(root, tile):
    """Synthetic .SAFE: three 10 m bands + one 20 m band covering the
    tile, plus a TCI preview (skipped by ingestion)."""
    from dl_image_segmentation_tpu.raster.jp2 import encode_jp2
    img = os.path.join(root, SAFE_NAME, "GRANULE", GRANULE, "IMG_DATA")
    os.makedirs(img, exist_ok=True)
    x0, y0, x1, y1 = tile.bounds
    ox, oy = x0 - 200.0, y1 + 200.0
    w10 = int((x1 - x0 + 400) // 10)
    h10 = int((y1 - y0 + 400) // 10)
    rng = np.random.RandomState(0)
    for code, res in (("B02", 10), ("B03", 10), ("B04", 10),
                      ("B11", 20)):
        h, w = h10 * 10 // res, w10 * 10 // res
        arr = (rng.rand(h, w, 1) * 3000 + 500).astype(np.uint16)
        gt = (ox, float(res), 0.0, oy, 0.0, -float(res))
        with open(os.path.join(img, f"{STEM}_{code}.jp2"), "wb") as f:
            f.write(encode_jp2(arr, geotransform=gt,
                               epsg=32600 + ZONE))
    with open(os.path.join(img, f"{STEM}_TCI.jp2"), "wb") as f:
        f.write(encode_jp2(np.zeros((8, 8, 3), np.uint8)))
    return os.path.join(root, SAFE_NAME)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/safe_demo")
    args = ap.parse_args()

    from dl_image_segmentation_tpu.catalog.local import LocalCatalog
    from dl_image_segmentation_tpu.cli import main as cli_main
    from dl_image_segmentation_tpu.geo import Tile, crs

    tile = Tile(60, 2, 10.0, ZONE, -380, 3491)
    os.makedirs(args.out, exist_ok=True)
    safe = build_safe(args.out, tile)
    print(f"built synthetic SAFE tree at {safe}")

    cat_root = os.path.join(args.out, "catalog")
    cat = LocalCatalog.create(cat_root)
    n = cat.ingest_safe(safe, cloud_fraction=0.05)
    print(f"ingest_safe registered {n} granule(s); bands = "
          f"{cat.bands('sentinel-2:L1C')}")

    # labels polygon inside the tile -> chips straight from the SAFE
    x0, y0, x1, y1 = tile.bounds_unpadded
    ring = [[x0 + 80, y0 + 80], [x1 - 80, y0 + 80],
            [x1 - 80, y1 - 80], [x0 + 80, y1 - 80], [x0 + 80, y0 + 80]]
    lonlat = [list(map(float, crs.utm_to_lonlat(px, py, ZONE)))
              for px, py in ring]
    labels = os.path.join(args.out, "labels.geojson")
    with open(labels, "w") as f:
        json.dump({"type": "FeatureCollection",
                   "features": [{"type": "Feature",
                                 "geometry": {"type": "Polygon",
                                              "coordinates": [lonlat]},
                                 "properties": {"cls": 1}}]}, f)

    chips = os.path.join(args.out, "chips")
    rc = cli_main(["create-chips", "--labels", labels,
                   "--attribute", "cls",
                   "--product", "sentinel-2:L1C",
                   "--bands", "B04 B03 B02 B11",
                   "--tile-size", "60", "--pad", "2",
                   "--resolution", "10.0", "--out", chips,
                   "--tag", "safe", "--loc", "T43QBB",
                   "--year", "2020", "--ref-date", "2020-11-01",
                   "--catalog", cat_root, "--workers", "1"])
    assert rc == 0
    folder = next(d for d in os.listdir(chips) if d.startswith("safe"))
    imgs = os.listdir(os.path.join(chips, folder, "images"))
    print(f"create-chips wrote {len(imgs)} pair(s) into "
          f"{os.path.join(chips, folder)} (4-band: 10 m + upsampled "
          f"20 m SWIR stacked on the tile grid)")


if __name__ == "__main__":
    main()
