"""Workload 3: parse TFRecords and feed U-Net training.

Script equivalent of parse_tfrecords.ipynb (all five storage modes,
augmentation) plus the training loop the reference never had.

    python examples/parse_and_train.py --records '/tmp/records_demo/demo_arr-*'
"""

import argparse

import jax
import numpy as np

from dl_image_segmentation_tpu.ops.augment import augment_pairs
from dl_image_segmentation_tpu.pipeline.input import (DevicePrefetcher,
                                                      TFRecordFeed)
from dl_image_segmentation_tpu.records import parsers
from dl_image_segmentation_tpu.records.tfrecord import read_records
from dl_image_segmentation_tpu.train.trainer import TrainConfig, Trainer


def demo_parse_one(shard: str, mode: str):
    """Parse a single record with the parser matching its storage
    mode (parse nb cells 12-37)."""
    from dl_image_segmentation_tpu.pipeline.input import PARSE_FNS
    rec = next(iter(read_records(shard)))
    img, lbl, ident = PARSE_FNS[mode](rec)
    print(f"{mode}: img {img.shape} {img.dtype}, lbl {lbl.shape}, "
          f"identifier {ident.decode()!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", required=True)
    ap.add_argument("--mode", default="tifarr")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import glob
    demo_parse_one(sorted(glob.glob(args.records))[0], args.mode)

    cfg = TrainConfig(num_classes=args.classes, in_channels=args.channels,
                      base_features=16, levels=2,
                      image_size=args.image_size, batch_size=8)
    trainer = Trainer(cfg)
    feed = TFRecordFeed(args.records, args.mode, batch_size=8,
                        image_size=args.image_size, num_workers=2)

    key = jax.random.PRNGKey(0)

    def augmented(batches):
        for i, (imgs, lbls) in enumerate(batches):
            ai, al = augment_pairs(jax.random.fold_in(key, i),
                                   imgs, lbls)
            yield np.asarray(ai), np.asarray(al)

    with DevicePrefetcher(augmented(feed.batches()),
                          trainer.place_batch) as pf:
        it = iter(pf)
        for step in range(args.steps):
            imgs, lbls = next(it)
            m = trainer.train_step(imgs, lbls)
            if step % 5 == 0:
                print(f"step {step}: loss={m['loss']:.4f} "
                      f"acc={m['accuracy']:.4f}")
    print(trainer.throughput_stats())


if __name__ == "__main__":
    main()
