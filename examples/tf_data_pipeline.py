"""Feeding a tf.data pipeline from our shards (TF-user migration path).

Our TFRecords are bit-identical to TF-written ones, and the exported
feature templates are genuine tf.io specs when TF is importable -- so
the reference's downstream tf.data training flow (parse nb cells 4,
30-36) works unchanged against this framework's output:

    python examples/tf_data_pipeline.py --records '/tmp/records_demo/demo_arr-*'
"""

import argparse
import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", required=True)
    ap.add_argument("--mode", default="tifarr",
                    choices=["rgbraw", "tifarr"])
    args = ap.parse_args()

    import tensorflow as tf

    from dl_image_segmentation_tpu.records.parsers import (
        featuretemplate_bytestring_imagechip,
        featuretemplate_ndarray_imagechip)

    files = sorted(glob.glob(args.records))
    ds = tf.data.TFRecordDataset(files)

    if args.mode == "rgbraw":
        def parse(raw):
            f = tf.io.parse_single_example(
                raw, featuretemplate_bytestring_imagechip)
            img = tf.io.decode_image(f["image/image_data"],
                                     expand_animations=False)
            lbl = tf.io.decode_image(f["target/target_data"],
                                     expand_animations=False)
            return img, lbl
    else:
        def parse(raw):
            f = tf.io.parse_single_example(
                raw, featuretemplate_ndarray_imagechip)
            h = tf.cast(f["image/height"], tf.int32)
            w = tf.cast(f["image/width"], tf.int32)
            c = tf.cast(f["image/channels"], tf.int32)
            img = tf.reshape(f["image/image_data"], tf.stack([h, w, c]))
            lbl = tf.reshape(f["target/target_data"], tf.stack([h, w]))
            return img, lbl

    ds = ds.map(parse, num_parallel_calls=8).batch(4).prefetch(2)
    for imgs, lbls in ds.take(2):
        print("batch:", imgs.shape, imgs.dtype, "labels:", lbls.shape)


if __name__ == "__main__":
    main()
