"""REAL 2-process jax.distributed test (VERDICT r2 item 3): two
subprocesses with 4 virtual CPU devices each form an 8-device global
mesh through a local coordinator and execute the multi-process code
paths that single-process tests can only shim:
make_array_from_process_local_data, cross-process gradient all-reduce,
host_shard_files, and the multi-host writer whose merged output must
be bit-identical to a single-host run."""

import glob
import json
import os
import socket
import subprocess
import sys

import numpy as np


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_chips(root, n=8, size=24):
    from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
    rng = np.random.RandomState(3)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for i in range(n):
        key = f"{size}:2:10.0:43:{-800 + i}:8400"
        fn = key.replace(":", "#") + ".tif"
        img = rng.randint(0, 4000, (size, size, 4)).astype(np.uint16)
        lbl = rng.randint(0, 3, (size, size)).astype(np.uint8)
        gt = (272696.0 + i * 240, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        write_geotiff(os.path.join(root, "images", fn), img,
                      geotransform=gt, epsg=32643)
        write_geotiff(os.path.join(root, "labels", fn), lbl,
                      geotransform=gt, epsg=32643, nodata=255)


def test_two_process_distributed(tmp_path):
    # bounded by the workers' communicate(timeout=420) below -- no
    # pytest-timeout plugin on this box
    chips = str(tmp_path / "chips")
    out = str(tmp_path)
    _make_chips(chips)
    port = _free_port()

    env = dict(os.environ)
    # each worker gets 4 virtual devices (the parent suite's conftest
    # forces 8 in THIS process; workers override their own env)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    worker = os.path.join(REPO, "tests", "_dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), chips, out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout}"
        assert f"WORKER_OK {pid}" in stdout

    r0 = json.load(open(os.path.join(out, "result_0.json")))
    r1 = json.load(open(os.path.join(out, "result_1.json")))

    # identity + primary election
    assert r0["process_index"] == 0 and r1["process_index"] == 1
    assert r0["is_primary"] and not r1["is_primary"]

    # host_shard_files: disjoint round-robin halves covering everything
    assert set(r0["my_files"]) & set(r1["my_files"]) == set()
    assert sorted(r0["my_files"] + r1["my_files"]) == [
        f"shard-{k:05d}" for k in range(10)]

    # the global array really contained BOTH processes' halves:
    # 4 rows of 1.0 (pid 0) + 4 rows of 2.0 (pid 1)
    assert r0["global_sum"] == r1["global_sum"] == 12.0

    # the train step executed globally: identical replicated metrics
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["accuracy"], r1["accuracy"],
                               rtol=1e-6)
    assert np.isfinite(r0["loss"])

    # multi-host writer: merged 2-host output bit-identical to 1-host
    assert r0["written"] + r1["written"] == 8
    from dl_image_segmentation_tpu.records.writers import (
        images_to_tfrecords_mp)
    ref_dir = str(tmp_path / "recs_1h")
    n_ref = images_to_tfrecords_mp("d", chips, ref_dir, num_shards=4,
                                   num_proc=1, store_as_array=True)
    assert n_ref == 8
    mh = sorted(glob.glob(os.path.join(out, "recs_mh", "d-*")))
    sh = sorted(glob.glob(os.path.join(ref_dir, "d-*")))
    assert [os.path.basename(f) for f in mh] == \
        [os.path.basename(f) for f in sh] and len(mh) == 4
    for a, b in zip(mh, sh):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), \
                f"shard {os.path.basename(a)} differs between 2-host " \
                "and 1-host runs"
