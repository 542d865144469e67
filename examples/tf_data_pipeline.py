"""Feeding a tf.data pipeline from our shards (TF-user migration path).

Our TFRecords are bit-identical to TF-written ones, and the exported
``parse_*_proto_tf`` functions are graph-mode drop-ins for the
reference's parse functions -- so its downstream tf.data training flow
(parse nb cells 4, 30-36) works unchanged against this framework's
output:

    python examples/tf_data_pipeline.py --records '/tmp/records_demo/demo_arr-*'
"""

import argparse
import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", required=True)
    ap.add_argument("--mode", default="tifarr",
                    choices=["rgbraw", "rgbarr", "tifraw", "tifarr"])
    args = ap.parse_args()

    import tensorflow as tf

    from dl_image_segmentation_tpu.records.parsers_tf import (
        parse_8bit_array_proto_tf, parse_encoded_gdal_proto_wrapped_tf,
        parse_encoded_rgb_img_proto_tf, parse_higher_dtype_array_proto_tf)

    parse_fn = {
        "rgbraw": parse_encoded_rgb_img_proto_tf,
        "rgbarr": parse_8bit_array_proto_tf,
        "tifraw": parse_encoded_gdal_proto_wrapped_tf,
        "tifarr": parse_higher_dtype_array_proto_tf,
    }[args.mode]

    files = sorted(glob.glob(args.records))
    ds = tf.data.TFRecordDataset(files)
    # identifier dropped for batching (shapes vary); the reference's
    # ds.map(parse_fn, 8) pattern, parse nb cells 30/33
    ds = ds.map(lambda raw: parse_fn(raw)[:2], num_parallel_calls=8)
    ds = ds.batch(4).prefetch(2)
    for imgs, lbls in ds.take(2):
        print("batch:", imgs.shape, imgs.dtype, "labels:", lbls.shape)


if __name__ == "__main__":
    main()
