"""Workload 2: chip folders -> sharded TFRecords.

Script equivalent of translate_chips_to_tfrecords.ipynb cell 16: the
MP engine in both storage modes (decoded-array and raw-bytes) over
GeoTIFF chips. The MT engine (cell 12) takes PNG/JPG chips -- see
examples/tf_data_pipeline.py for that flow.

    python examples/translate_chips_to_tfrecords.py \
        --chips /tmp/chips_demo/sentinel-cf0_10.0m_2pad_64_Mumbai_2020
"""

import argparse

from dl_image_segmentation_tpu import images_to_tfrecords_mp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", required=True)
    ap.add_argument("--out", default="/tmp/records_demo")
    ap.add_argument("--shards", type=int, default=12)
    args = ap.parse_args()

    # notebook cell 16: GDAL-format chips, decoded-array storage
    n = images_to_tfrecords_mp(
        "demo_arr", args.chips, args.out,
        num_shards=args.shards, num_proc=args.shards,
        file_ext="tif", store_as_array=True)
    print(f"array mode: {n} examples")

    # notebook cell 12 equivalent needs PNG/JPG chips; raw GeoTIFF
    # bytes go through the MP engine with store_as_array=False
    n = images_to_tfrecords_mp(
        "demo_raw", args.chips, args.out,
        num_shards=args.shards, num_proc=args.shards,
        file_ext="tif", store_as_array=False)
    print(f"raw mode: {n} examples")


if __name__ == "__main__":
    main()
