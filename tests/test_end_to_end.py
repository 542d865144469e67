"""Golden-path integration test: everything a reference user does, in
one flow through the Python API -- synthetic catalog -> chip creation
(cloud-masked median + label burn) -> chips -> TFRecords -> training
feed -> U-Net training (device pool, augmented scan) -> prediction ->
mosaic stitching. All contracts checked along the way."""

import datetime as dt
import glob
import json
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu import (DLSampleCreationConfig,
                                       DLTileJobConfig, OGRLabelDataDesc,
                                       images_to_tfrecords_mp)
from dl_image_segmentation_tpu.catalog import SyntheticCatalog
from dl_image_segmentation_tpu.geo import Tile, crs
from dl_image_segmentation_tpu.pipeline.export import run_export
from dl_image_segmentation_tpu.pipeline.input import TFRecordFeed
from dl_image_segmentation_tpu.pipeline.stitch import stitch_folder
from dl_image_segmentation_tpu.raster.geotiff import read_geotiff, write_geotiff
from dl_image_segmentation_tpu.train.pool import DeviceDataPool
from dl_image_segmentation_tpu.train.trainer import TrainConfig, Trainer

ZONE = 43


def _make_aoi(path, n_tiles_x=2, n_tiles_y=1):
    """AOI spanning a small block of 32px/10m tiles near Mumbai."""
    # anchor genuinely inside zone 43 (easting ~270 km, Mumbai latitude)
    t0 = Tile(28, 2, 10.0, ZONE, -821, 7536)
    x0, y0, _, _ = t0.bounds_unpadded
    w = 28 * 10.0 * n_tiles_x - 40
    h = 28 * 10.0 * n_tiles_y - 40
    ring = [[x0 + 20, y0 + 20], [x0 + 20 + w, y0 + 20],
            [x0 + 20 + w, y0 + 20 + h], [x0 + 20, y0 + 20 + h],
            [x0 + 20, y0 + 20]]
    lonlat = [list(map(float, crs.utm_to_lonlat(x, y, ZONE)))
              for x, y in ring]
    feats = [{"type": "Feature",
              "geometry": {"type": "Polygon", "coordinates": [lonlat]},
              "properties": {"cls": 1}}]
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


def test_golden_path(tmp_path):
    labels = _make_aoi(str(tmp_path / "labels.geojson"))
    catalog = SyntheticCatalog(scenes_per_tile=5)

    # 1. plan + export chips (cloud-masked median dispatch)
    cfg = DLSampleCreationConfig(
        tile_size=32, tile_padding=2, tile_res_m=10.0,
        dl_product="sentinel-2:L1C", bands="red green blue",
        sample_folder_root=str(tmp_path), source_tag="s2",
        label_data_config=OGRLabelDataDesc(labels, 0, "cls"),
        max_cloud_fraction=0, label_nodata_value=255, catalog=catalog)
    jobs = cfg.create_tile_job_configs("T", 2020,
                                       ref_date=dt.date(2020, 11, 1))
    assert len(jobs) >= 2
    report = run_export(jobs, n_workers=2, max_attempts=3, progress=None)
    assert report.ok
    chip_dir = cfg.images_dir_name("T", 2020)
    # int 0 formats as 'cf0' (str(0)), float 0.0 as 'cf0p0' -- matching
    # the reference's str(cf).replace('.', 'p') naming rule
    assert chip_dir.endswith("s2-cf0_10.0m_2pad_32_T_2020")
    n_chips = len(os.listdir(os.path.join(chip_dir, "images")))
    assert n_chips == len(jobs)

    # 2. chips -> TFRecords (decoded-array mode)
    n = images_to_tfrecords_mp("gold", chip_dir, str(tmp_path / "recs"),
                               num_shards=2, num_proc=2,
                               store_as_array=True)
    assert n == n_chips

    # 3. feed -> device pool -> augmented scanned training
    feed = TFRecordFeed(str(tmp_path / "recs" / "gold-*"), "tifarr",
                        batch_size=4, image_size=32, shuffle_buffer=4,
                        num_workers=1)
    pool = DeviceDataPool.from_feed(feed.batches(), max(n_chips, 4))
    tcfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                       levels=1, image_size=32, batch_size=4,
                       label_nodata=255)
    trainer = Trainer(tcfg)
    out = trainer.train_scanned(pool, total_steps=10,
                                steps_per_dispatch=5, augment=True)
    assert np.isfinite(out["loss"])
    assert int(trainer.state.step) == 10

    # 4. evaluation over the same feed
    ev = trainer.evaluate(feed.batches(), max_batches=2)
    assert 0.0 <= ev["miou"] <= 1.0

    # 5. prediction chips with the source georeferencing
    pred_dir = str(tmp_path / "preds")
    os.makedirs(pred_dir)
    for f in sorted(glob.glob(os.path.join(chip_dir, "images", "*.tif"))):
        g = read_geotiff(f)
        # raw DNs, same distribution the tifarr feed trained on
        # (FloatList records store unscaled values)
        img = g.array.astype(np.float32)
        pred = trainer.predict(img[None])[0]
        write_geotiff(os.path.join(pred_dir, os.path.basename(f)),
                      pred.astype(np.uint8),
                      geotransform=g.info.geotransform, epsg=g.info.epsg)

    # 6. stitch into one mosaic
    mosaic_path = str(tmp_path / "mosaic.tif")
    n_st, shape = stitch_folder(pred_dir, mosaic_path)
    assert n_st == n_chips
    m = read_geotiff(mosaic_path)
    assert m.info.epsg == 32600 + ZONE
    # mosaic area = tiles x unpadded size
    assert shape[0] % 28 == 0 and shape[1] % 28 == 0
