#!/usr/bin/env python
"""The round-4 remote/cloud loop, self-contained and runnable anywhere:

    HTTP scene catalog  ->  create-chips (COG windowed reads, retries)
    local chips         ->  TFRecord shards on gs:// (fake GCS)
    gs:// shards        ->  training with gs:// managed checkpoints
    gs:// shards        ->  mirrored to s3:// and CRC-verified there

Everything remote is served by in-process fixtures so the example is
hermetic: ``catalog.httpserver.SceneServer`` plays the scene service
the reference's chip engine was a client of
(_descartes_img_chips.py:512-513), and ``storage.fake_gcs.FakeGCS``
plays GCS behind the standard ``STORAGE_EMULATOR_HOST`` convention.
Point the same code at a real scene server / real bucket by swapping
the URLs (and exporting GCS_OAUTH_TOKEN).
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
    from dl_image_segmentation_tpu.catalog import LocalCatalog
    from dl_image_segmentation_tpu.catalog.httpserver import SceneServer
    from dl_image_segmentation_tpu.geo import Tile, crs
    from dl_image_segmentation_tpu.storage.fake_gcs import FakeGCS

    # the CLI subprocesses below must resolve the package from any cwd
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(
        dl_image_segmentation_tpu.__file__)))
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (pkg_parent, os.environ.get("PYTHONPATH")) if p)
    work = tempfile.mkdtemp(prefix="dlseg_remote_demo_")
    os.chdir(work)

    # -- a catalog root the HTTP server will publish ---------------------
    tile = Tile(60, 2, 10.0, 43, -380, 3491)
    root = os.path.join(work, "catalog")
    cat = LocalCatalog.create(root)
    rng = np.random.RandomState(0)
    x0, y0, x1, y1 = tile.bounds
    scene = rng.randint(0, 3000, (256, 256, 3)).astype(np.uint16)
    gt = (x0 - 960.0, 10.0, 0.0, y1 + 960.0, 0.0, -10.0)
    cat.add_scene("sentinel-2:L1C", ["red", "green", "blue"], "demo",
                  dt.date(2020, 10, 20), scene, gt, epsg=32643,
                  cloud_fraction=0.05)

    # -- AOI labels -------------------------------------------------------
    feats = []
    for i, v in enumerate([1, 2]):
        fy0 = y0 + (i + 0.5) * (y1 - y0) / 3
        ring = [[x0 + 60, fy0], [x1 - 60, fy0], [x1 - 60, fy0 + 120],
                [x0 + 60, fy0 + 120], [x0 + 60, fy0]]
        lonlat = [list(map(float, crs.utm_to_lonlat(px, py, 43)))
                  for px, py in ring]
        feats.append({"type": "Feature",
                      "geometry": {"type": "Polygon",
                                   "coordinates": [lonlat]},
                      "properties": {"cls": v}})
    with open("labels.geojson", "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)

    def cli(*args):
        print("+ dlseg-tpu", " ".join(args), flush=True)
        subprocess.run([sys.executable, "-m",
                        "dl_image_segmentation_tpu.cli", *args],
                       check=True, env=os.environ)

    with SceneServer(root) as scenes, FakeGCS() as gcs:
        os.environ["STORAGE_EMULATOR_HOST"] = gcs.host
        # inject some flakiness: the retry protocol absorbs it
        scenes.fail_next(2, status=503)
        cli("create-chips", "--labels", "labels.geojson",
            "--attribute", "cls", "--product", "sentinel-2:L1C",
            "--tile-size", "60", "--pad", "2", "--resolution", "10.0",
            "--out", "chips", "--tag", "demo", "--loc", "Remote",
            "--year", "2020", "--ref-date", "2020-11-01",
            "--catalog", scenes.url, "--workers", "2")
        folder = "chips/demo_10.0m_2pad_60_Remote_2020"
        print("chip pairs:", sorted(os.listdir(f"{folder}/images")))
        print(f"scene server: {scenes.requests} requests, "
              f"{scenes.range_requests} ranged, "
              f"{scenes.bytes_served} bytes (scene file is "
              f"{os.path.getsize(os.path.join(root, 'scenes', 'demo.tif'))})")

        cli("to-tfrecords", "--name", "demo", "--directory", folder,
            "--out", "gs://bucket/recs", "--shards", "2",
            "--workers", "1", "--engine", "mp", "--store-as-array")
        # chips are (tile-size - 2*pad) + 2*pad = 60 px on disk (the
        # reference's net-of-padding size convention)
        cli("train", "--records", "gs://bucket/recs/demo-*",
            "--mode", "tifarr", "--classes", "3", "--channels", "3",
            "--features", "8", "--levels", "2", "--image-size", "60",
            "--batch-size", "4", "--steps", "3", "--log-every", "1",
            "--checkpoint", "gs://bucket/ckpt", "--save-every", "3")
        ckpt_objects = [n for (_b, n) in gcs.objects
                        if n.startswith("ckpt/")]
        print(f"gs://bucket now holds {len(gcs.objects)} objects "
              f"({len(ckpt_objects)} checkpoint files)")

        # -- second cloud: mirror the shards to s3:// and verify them
        # there (the storage layer dispatches per scheme, so the same
        # CLI reads either bucket)
        from dl_image_segmentation_tpu import storage
        from dl_image_segmentation_tpu.storage.fake_s3 import FakeS3
        with FakeS3() as s3:
            os.environ["AWS_ENDPOINT_URL_S3"] = s3.endpoint
            for shard in storage.glob("gs://bucket/recs/demo-*"):
                storage.write_bytes(
                    "s3://mirror/recs/" + storage.basename(shard),
                    storage.read_bytes(shard))
            cli("inspect", "--records", "s3://mirror/recs/demo-*",
                "--verify-crc")
            print(f"s3://mirror holds {len(s3.objects)} shard objects")
    print("remote/cloud pipeline complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
