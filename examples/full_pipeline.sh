#!/usr/bin/env bash
# The complete production loop, end to end (the three reference
# notebooks plus everything downstream of them), against the synthetic
# catalog -- runnable anywhere the package is importable:
#
#   chips -> TFRecords -> train -> eval -> predict -> stitch -> map
#   -> re-ingest predictions as a catalog product -> push shards
set -euo pipefail
WORK=${1:-/tmp/dlseg_demo}
mkdir -p "$WORK" && cd "$WORK"

python - <<'PY'
import json
from dl_image_segmentation_tpu.geo import crs
feats = []
for i, v in enumerate([1, 2]):
    e0, n0 = crs.lonlat_to_utm(72.85 + 0.01 * i, 19.05, 43)
    ring = [[e0, n0], [e0+900, n0], [e0+900, n0+700], [e0, n0+700],
            [e0, n0]]
    lonlat = [list(map(float, crs.utm_to_lonlat(x, y, 43)))
              for x, y in ring]
    feats.append({"type": "Feature",
                  "geometry": {"type": "Polygon",
                               "coordinates": [lonlat]},
                  "properties": {"cls": v}})
json.dump({"type": "FeatureCollection", "features": feats},
          open("labels.geojson", "w"))
PY

dlseg() { python -m dl_image_segmentation_tpu.cli "$@"; }

dlseg create-chips --labels labels.geojson --attribute cls \
  --product sentinel-2:L1C --tile-size 64 --pad 2 --resolution 10.0 \
  --out chips --tag demo --loc Mumbai --year 2020 \
  --ref-date 2020-11-01 --max-cloud-fraction 0 --catalog synthetic \
  --workers 4 --batch-tiles 8
CHIPDIR=$(ls -d chips/*/)

dlseg to-tfrecords --name demo --directory "$CHIPDIR" --out recs \
  --shards 3 --workers 3 --engine mp --store-as-array
dlseg inspect --records 'recs/demo-*' --verify-crc
dlseg inspect --records 'recs/demo-*' --class-stats
dlseg train --records 'recs/demo-*' --mode tifarr --classes 3 \
  --channels 3 --features 8 --levels 2 --image-size 64 \
  --batch-size 4 --steps 10 --log-every 5 --checkpoint ckpt \
  --eval-records 'recs/demo-*' --eval-every 5 --metrics-log metrics.jsonl
dlseg eval --records 'recs/demo-*' --checkpoint ckpt --mode tifarr \
  --classes 3 --channels 3 --features 8 --levels 2 --image-size 64
# --scale none: the checkpoint was trained on tifarr records, whose
# FloatList payloads carry RAW DNs (no normalization) -- predict must
# feed the same distribution, not dtype-scaled [0,1]
dlseg predict --images "$CHIPDIR/images" --checkpoint ckpt \
  --out preds --classes 3 --channels 3 --features 8 --levels 2 \
  --image-size 64 --batch-size 4 --scale none
dlseg stitch --chips preds --out prediction_map.tif
dlseg map --chips "$CHIPDIR/images" --labels labels.geojson \
  --out map.html
dlseg push --records 'recs/demo-*' --dest store

# predictions become a catalog product for multi-product stacking
# (the reference's prior-model-outputs flow):
python - <<'PY'
import datetime as dt
from dl_image_segmentation_tpu.catalog import LocalCatalog
lc = LocalCatalog.create("catalog")
n = lc.ingest_chips("model:v1", ["class"], "preds", dt.date(2021, 1, 1))
print(f"re-ingested {n} prediction chips as product model:v1")
PY
echo "FULL PIPELINE OK in $WORK"
