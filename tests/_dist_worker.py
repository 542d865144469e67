"""Worker for the REAL 2-process jax.distributed test (launched by
tests/test_distributed.py, one subprocess per process id).

Each process brings 4 virtual CPU devices (8 global) and exercises the
code paths that are structurally dead in the single-process suite:

* parallel.distributed.initialize with a local coordinator,
* shard_batch_local's make_array_from_process_local_data branch
  (parallel/sharding.py) assembling a GLOBAL batch from per-process
  halves, followed by one data-parallel train step whose gradients
  all-reduce ACROSS the two processes,
* pipeline.input.host_shard_files per-host slicing,
* the multi-host writer partition (host_index/host_count) whose merged
  output must be bit-identical to a single-host run (asserted by the
  parent test).

Results land in result_<pid>.json for the parent to assert on.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    chips = sys.argv[3]
    out = sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")

    from dl_image_segmentation_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()
    res = {"process_index": jax.process_index(),
           "is_primary": distributed.is_primary()}

    # per-host shard ownership (round-robin)
    from dl_image_segmentation_tpu.pipeline.input import host_shard_files
    files = [f"shard-{k:05d}" for k in range(10)]
    res["my_files"] = host_shard_files(files)

    # one DP train step over the 2-process global mesh: each process
    # contributes its LOCAL half of the global batch of 8
    import numpy as np
    from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                         Trainer)
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                      levels=1, image_size=16, batch_size=8, seed=0)
    tr = Trainer(cfg)
    rng = np.random.RandomState(pid)
    imgs = rng.rand(4, 16, 16, 3).astype(np.float32)
    lbls = (imgs[:, :, :, 0] > 0.5).astype(np.int32)
    placed_i, placed_l = tr.place_batch(imgs, lbls)
    assert placed_i.shape[0] == 8, placed_i.shape  # global batch
    assert not placed_i.sharding.is_fully_replicated
    m = tr.train_step(placed_i, placed_l)
    res["loss"] = m["loss"]
    res["accuracy"] = m["accuracy"]

    # the same GLOBAL data summed through a jitted collective must see
    # BOTH processes' halves (value checked by the parent)
    from dl_image_segmentation_tpu.parallel.sharding import (
        make_mesh, shard_batch_local)
    mesh = make_mesh()
    marker = np.full((4, 1), float(pid + 1), np.float32)
    g = shard_batch_local(mesh, marker)
    res["global_sum"] = float(jax.jit(lambda x: x.sum())(g))

    # multi-host writer: this host's half of the shard range
    from dl_image_segmentation_tpu.records.writers import (
        images_to_tfrecords_mp)
    n = images_to_tfrecords_mp("d", chips, os.path.join(out, "recs_mh"),
                               num_shards=4, num_proc=1,
                               store_as_array=True,
                               host_index=jax.process_index(),
                               host_count=2)
    res["written"] = n

    with open(os.path.join(out, f"result_{pid}.json"), "w") as f:
        json.dump(res, f)
    print(f"WORKER_OK {pid}")


if __name__ == "__main__":
    main()
