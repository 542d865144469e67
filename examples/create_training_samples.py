"""Workload 1: AOI -> GeoTIFF chip pairs.

Script equivalent of the reference's create_training_samples.ipynb
(its cells 13, 70-87): configure an export, plan tiles, fan out
per-tile jobs with idempotent resume + retries.

Run with the synthetic catalog (no data needed):
    python examples/create_training_samples.py --out /tmp/chips
"""

import argparse
import datetime as dt
import json
import os

from dl_image_segmentation_tpu.catalog import SyntheticCatalog, LocalCatalog
from dl_image_segmentation_tpu.geo import crs
from dl_image_segmentation_tpu.pipeline.chips import (
    DLSampleCreationConfig, OGRLabelDataDesc)
from dl_image_segmentation_tpu.pipeline.export import run_export


def demo_labels(path: str) -> str:
    """A small two-class ground-truth dataset near Mumbai (the
    reference's AOI), as GeoJSON."""
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
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/chips_demo")
    ap.add_argument("--catalog", default="synthetic")
    ap.add_argument("--labels", default=None)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    labels = args.labels or demo_labels(os.path.join(args.out,
                                                     "labels.geojson"))
    catalog = (SyntheticCatalog() if args.catalog == "synthetic"
               else LocalCatalog(args.catalog))

    # equivalent of the notebook's S2 64px/10m run config (nb cell 13)
    cfg = DLSampleCreationConfig(
        tile_size=64, tile_padding=2, tile_res_m=10.0,
        dl_product="sentinel-2:L1C",
        bands="red green blue nir",
        sample_folder_root=args.out, source_tag="sentinel",
        label_data_config=OGRLabelDataDesc(labels, 0, "cls"),
        max_cloud_fraction=0,  # 0 + S2 => pixelwise cloud-masked median
        label_nodata_value=255,
        catalog=catalog)

    print(f"planning tiles over {labels} ...")
    tiles = cfg.get_tiles()
    print(f"{len(tiles)} tiles; first key: {tiles[0].key}")

    jobs = cfg.create_tile_job_configs(
        "Mumbai", 2020, ref_date=dt.date(2020, 11, 1),
        min_date=dt.date(2020, 1, 1), max_date=dt.date(2020, 12, 31))
    report = run_export(jobs, n_workers=8, max_attempts=20)
    print(f"chips in {cfg.images_dir_name('Mumbai', 2020)}")
    print(f"ok={report.ok} created={report.completed} "
          f"skipped={report.skipped_existing} failed={len(report.failed)}")


if __name__ == "__main__":
    main()
