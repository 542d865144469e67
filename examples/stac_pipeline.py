#!/usr/bin/env python
"""Chips from a STAC endpoint — the open-standard catalog loop:

    STAC item-search API  ->  create-chips (COG windowed reads)
    chip pairs            ->  tifarr TFRecord shards

Hermetic: ``catalog.stacserver.StacBuilder`` authors a spec-shaped
static STAC tree (collections/items/COG assets) and ``StacServer``
serves it with a real ``POST /search`` endpoint, standing in for
Earth Search / Planetary Computer / any STAC API — the open successor
of the proprietary scene service the reference's chip engine consumed
(_descartes_img_chips.py:512-513, 612, 626). Point the same command
at a real endpoint by swapping the URL:

    dlseg-tpu create-chips --catalog stac+https://earth-search... ...
"""

import datetime as dt
import json
import os
import subprocess
import sys
import tempfile

import numpy as np


def main() -> int:
    import dl_image_segmentation_tpu
    from dl_image_segmentation_tpu.catalog.stacserver import (StacBuilder,
                                                              StacServer)
    from dl_image_segmentation_tpu.geo import crs

    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(
        dl_image_segmentation_tpu.__file__)))
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (pkg_parent, os.environ.get("PYTHONPATH")) if p)
    work = tempfile.mkdtemp(prefix="dlseg_stac_demo_")
    os.chdir(work)

    # -- labels near Mumbai (the reference's AOI) -------------------------
    feats = []
    for i, cls in enumerate([1, 2]):
        e0, n0 = crs.lonlat_to_utm(72.85 + 0.012 * i, 19.05, 43)
        ring = [[e0, n0], [e0 + 900, n0], [e0 + 900, n0 + 700],
                [e0, n0 + 700], [e0, n0]]
        lonlat = [list(map(float, crs.utm_to_lonlat(x, y, 43)))
                  for x, y in ring]
        feats.append({"type": "Feature",
                      "geometry": {"type": "Polygon",
                                   "coordinates": [lonlat]},
                      "properties": {"cls": cls}})
    with open("labels.geojson", "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)

    # -- a STAC tree with one Sentinel-2-shaped item ----------------------
    # band-per-asset layout at mixed resolutions, like real L2A items
    b = StacBuilder(os.path.join(work, "stac"))
    b.add_collection("sentinel-2-l2a", bands=["red", "green", "blue"])
    e, n = crs.lonlat_to_utm(72.83, 19.08, 43)
    gt10 = (float(e) // 10 * 10 - 2000, 10.0, 0.0,
            float(n) // 10 * 10 + 2000, 0.0, -10.0)
    gt20 = (gt10[0], 20.0, 0.0, gt10[3], 0.0, -20.0)
    rng = np.random.RandomState(0)
    b.add_item("sentinel-2-l2a", "S2A_demo", dt.date(2020, 11, 2), {
        "red": {"array": rng.randint(0, 3000, (1024, 1024, 1))
                .astype(np.uint16), "geotransform": gt10, "epsg": 32643},
        "green": {"array": rng.randint(0, 3000, (512, 512, 1))
                  .astype(np.uint16), "geotransform": gt20,
                  "epsg": 32643},
        "blue": {"array": rng.randint(0, 3000, (1024, 1024, 1))
                 .astype(np.uint16), "geotransform": gt10,
                 "epsg": 32643},
    }, cloud_cover=3.0, properties={"processing:level": "L2A"})

    cli = [sys.executable, "-m", "dl_image_segmentation_tpu.cli"]
    with StacServer(os.path.join(work, "stac"), api=True) as srv:
        print(f"STAC API at {srv.url}")
        subprocess.run(cli + [
            "create-chips", "--labels", "labels.geojson",
            "--attribute", "cls", "--product", "sentinel-2-l2a",
            "--bands", "red green blue", "--tile-size", "64",
            "--pad", "2", "--resolution", "10.0", "--out", "chips",
            "--tag", "s2stac", "--loc", "Mumbai", "--year", "2020",
            "--ref-date", "2020-11-01", "--processing-level", "L2A",
            "--catalog", "stac+" + srv.url, "--workers", "2"],
            check=True)
        print(f"windowed reads: {srv.range_requests} range requests, "
              f"{srv.bytes_served / 1e6:.2f} MB moved")

    folder = [os.path.join("chips", d) for d in os.listdir("chips")][0]
    subprocess.run(cli + [
        "to-tfrecords", "--name", "s2stac", "--directory", folder,
        "--out", "records", "--shards", "2", "--workers", "2",
        "--engine", "mp", "--store-as-array"], check=True)
    subprocess.run(cli + ["inspect", "--records", "records/s2stac-*",
                          "--verify-crc"], check=True)
    print(f"\ndone — chips in {folder}, shards in records/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
