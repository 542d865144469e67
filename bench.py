#!/usr/bin/env python
"""Headline benchmark: 256x256 RGB chips -> sharded TFRecords.

Mirrors the reference's flagship translation workload
(/root/reference/translate_chips_to_tfrecords.ipynb cell 12: ~6,000
256x256 RGB chips through images_to_tfrecords_mt with raw-bytes
storage, "a few seconds" on a 12-core machine per README.md:29).
Baseline: 2,000 chips/s/host (the BASELINE.json north-star floor and
the midpoint of the reference's 1,200-3,000 chips/s claim).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "chips/s", "vs_baseline": N}
"""

import contextlib
import io
import json
import os
import shutil
import time
import zlib


def _out_root() -> str:
    """Benchmark OUTPUT location: tmpfs when available. The metric is
    the translation engine's throughput (like the reference's
    page-cache-bound runs, README.md:29), not this VM's disk writeback
    -- a cold fixture generation right before the timed run was
    observed to collapse the numbers 10x via writeback contention."""
    if os.path.isdir("/dev/shm"):
        return "/dev/shm/dlseg_bench"
    return DATA_DIR

import numpy as np

# worker counts sized to the host: these writers are CPU-bound through
# GIL-free native code, so threads beyond the core count only add
# scheduler churn (measured -16% at 8 threads on a 1-core box).
# Rounded down to a power of two so num_shards % workers == 0 holds.


def _pow2_workers(cap: int) -> int:
    n = max(1, os.cpu_count() or 1)
    w = 1
    while w * 2 <= min(cap, n):
        w *= 2
    return w


NWORK_MT = _pow2_workers(8)
NWORK_MP = _pow2_workers(4)

# Calibrated host-speed probe (VERDICT r4 item 1): a fixed pure-CPU
# spin whose idle-host time is pinned below. On a loaded/slow host the
# spin takes longer and host_speed_index drops below ~0.9, making
# "regression vs shared-VM noise" decidable from the bench artifact
# alone. Calibration: min-of-10 = 0.0895 s on this box, idle
# (loadavg 0.0), 2026-08-20.
_PROBE_CAL_S = 0.0895
_PROBE_BUF = bytes(range(256)) * (8 * 1024 * 1024 // 256)  # 8 MiB


def host_speed_probe() -> float:
    """host_speed_index: 1.0 = the calibrated idle host; <1 = slower
    (contention or a weaker VM). Min of 5 spins after 2 warmups --
    the first spins absorb CPU frequency ramp-up."""
    def spin() -> float:
        t0 = time.perf_counter()
        crc = 0
        for _ in range(48):
            crc = zlib.crc32(_PROBE_BUF, crc)
        return time.perf_counter() - t0

    spin(), spin()
    best = min(spin() for _ in range(5))
    return round(_PROBE_CAL_S / best, 3)


def _median(vals):
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _rate_stats(rates, probes) -> dict:
    """Median + spread over per-rep throughputs (the r4 verdict's
    required shape: a best-of capture can't distinguish a slow host
    from a regression; median(spread) + per-rep probes can). probes
    has len(rates)+1 entries bracketing every rep; ``clean_value`` is
    the median over only the reps whose BOTH bracketing probes read
    >= 0.9 -- the framework's speed with neighbor-VM contention
    factored out, present only when at least 2 reps ran clean."""
    med = _median(rates)
    clean = [r for i, r in enumerate(rates)
             if probes[i] >= 0.9 and probes[i + 1] >= 0.9]
    out = {
        "value": round(med, 1),
        "reps": [round(r, 1) for r in rates],
        "best": round(max(rates), 1),
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / med, 1),
        "probe_reps": probes,
        "host_speed_index": min(probes),
    }
    if len(clean) >= 2:
        out["clean_value"] = round(_median(clean), 1)
        out["clean_reps"] = len(clean)
    return out

N_CHIPS = 6000
SIZE = 256
BASELINE_CHIPS_PER_SEC = 2000.0
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".benchmark_data")


def ensure_chip_folder(root: str, n: int = N_CHIPS) -> str:
    """Synthetic chip folder (cached across runs, ~4 min to generate
    cold): smooth-ish uint8 RGB imagery + binary labels,
    default-compression PNG (realistic chip sizes), DLTile-key
    filenames."""
    from dl_image_segmentation_tpu.raster.image import encode_png

    chip_dir = os.path.join(root, f"chips_{n}_{SIZE}")
    marker = os.path.join(chip_dir, ".complete")
    if os.path.exists(marker):
        return chip_dir
    shutil.rmtree(chip_dir, ignore_errors=True)
    os.makedirs(os.path.join(chip_dir, "images"))
    os.makedirs(os.path.join(chip_dir, "labels"))
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    for i in range(n):
        key = f"{SIZE - 4}:2:1.0:43:{-900 + i % 300}:{8300 + i // 300}"
        fn = key.replace(":", "#") + ".png"
        phase = rng.rand(3, 2) * 0.1
        img = np.stack([
            (128 + 100 * np.sin(xx * phase[c, 0] + yy * phase[c, 1])
             + rng.randn(SIZE, SIZE) * 10)
            for c in range(3)], axis=-1).clip(0, 255).astype(np.uint8)
        lbl = (img[:, :, 0] > 150).astype(np.uint8)
        with open(os.path.join(chip_dir, "images", fn), "wb") as f:
            f.write(encode_png(img))
        with open(os.path.join(chip_dir, "labels", fn), "wb") as f:
            f.write(encode_png(lbl[:, :, None]))
    open(marker, "w").close()
    return chip_dir


def ensure_tif_folder(root: str, n: int = 600) -> str:
    """Synthetic uint16 4-band LZW GeoTIFF chip folder (cached): the
    decoded-array translation workload (reference
    translate_chips_to_tfrecords.ipynb cell 16, _img_to_tf_mp.py with
    store_as_array=True over Sentinel-2-style rasters)."""
    from dl_image_segmentation_tpu.raster.geotiff import write_geotiff

    chip_dir = os.path.join(root, f"tifchips_{n}_{SIZE}")
    marker = os.path.join(chip_dir, ".complete")
    if os.path.exists(marker):
        return chip_dir
    shutil.rmtree(chip_dir, ignore_errors=True)
    os.makedirs(os.path.join(chip_dir, "images"))
    os.makedirs(os.path.join(chip_dir, "labels"))
    rng = np.random.RandomState(1)
    base = np.cumsum(rng.randn(SIZE + 64, SIZE + 64, 4), axis=0) * 50 + 2000
    for i in range(n):
        key = f"{SIZE - 4}:2:10.0:43:{-900 + i % 300}:{8300 + i // 300}"
        fn = key.replace(":", "#") + ".tif"
        oy, ox = (i * 7) % 64, (i * 13) % 64
        img = (base[oy:oy + SIZE, ox:ox + SIZE]
               + rng.randn(SIZE, SIZE, 4) * 20).astype(np.uint16)
        lbl = rng.randint(0, 3, (SIZE, SIZE)).astype(np.uint8)
        gt = (272696.0 + ox * 10, 10.0, 0.0, 2115548.0 - oy * 10, 0.0,
              -10.0)
        write_geotiff(os.path.join(chip_dir, "images", fn), img,
                      geotransform=gt, epsg=32643)
        write_geotiff(os.path.join(chip_dir, "labels", fn), lbl,
                      geotransform=gt, epsg=32643, nodata=255)
    open(marker, "w").close()
    return chip_dir


def bench_tifarr() -> dict:
    """Secondary metric (printed before the driver-parsed last line):
    uint16 4-band LZW GeoTIFF pairs -> decoded-array TFRecords.
    vs_r1 compares against round 1's self-reported ~180 pairs/s."""
    from dl_image_segmentation_tpu.records.writers import (
        images_to_tfrecords_mp)

    sink = io.StringIO()
    chip_dir = ensure_tif_folder(DATA_DIR)
    os.sync()  # fixture writeback must not bleed into the timed run
    out_dir = os.path.join(_out_root(), "recs_tif_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    with contextlib.redirect_stdout(sink):  # warm page cache
        images_to_tfrecords_mp("warm", chip_dir, out_dir, num_shards=4,
                               num_proc=NWORK_MP, store_as_array=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.sync()
    rates, probes = [], [host_speed_probe()]
    for _ in range(7):
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sink):
            n = images_to_tfrecords_mp("btif", chip_dir, out_dir,
                                       num_shards=4, num_proc=NWORK_MP,
                                       store_as_array=True)
        dt = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        rates.append(n / dt)
        probes.append(host_speed_probe())
    stats = _rate_stats(rates, probes)
    # per-core normalization vs the reference (VERDICT r2 item 7): the
    # reference translates ~6,000 chips in "a few seconds" on a
    # 12-VCORE laptop (README.md:29, translate nb cells 12/16), i.e.
    # 1,200-3,000 pairs/s total = 100-250 pairs/s per vcore (midpoint
    # 175). This box exposes os.cpu_count() cores; the per-core rate
    # here is directly comparable.
    ncores = os.cpu_count() or 1
    per_core = stats["value"] / ncores
    return {
        "metric": "256x256 uint16 4-band LZW GeoTIFF pairs -> "
                  "decoded-array TFRecords (tifarr, 4 shards)",
        **stats,
        "unit": "pairs/s",
        "vs_r1": round(stats["value"] / 180.0, 2),
        "cores": ncores,
        "pairs_per_sec_per_core": round(per_core, 1),
        "vs_ref_per_core": round(per_core / 175.0, 2),
    }


def main() -> None:
    from dl_image_segmentation_tpu.records.writers import (
        images_to_tfrecords_mt)

    os.makedirs(DATA_DIR, exist_ok=True)
    chip_dir = ensure_chip_folder(DATA_DIR)
    os.sync()
    out_dir = os.path.join(_out_root(), "recs_out")
    shutil.rmtree(out_dir, ignore_errors=True)

    # warm the native extension build + page cache
    sink = io.StringIO()
    warm_dir = os.path.join(_out_root(), "recs_warm")
    shutil.rmtree(warm_dir, ignore_errors=True)
    with contextlib.redirect_stdout(sink):
        images_to_tfrecords_mt("warm", chip_dir, warm_dir, num_shards=8,
                               num_threads=NWORK_MT, store_as_array=False)
    shutil.rmtree(warm_dir, ignore_errors=True)
    # flush the warm run's dirty pages so background writeback doesn't
    # steal bandwidth from the timed run
    os.sync()

    # 9 timed reps, reported as median(spread) + a host-speed probe
    # bracketing every rep: a single pass is hostage to transient
    # page-cache / writeback / neighbor-VM state on this shared box,
    # and a best-of capture can't distinguish a slow host from a real
    # regression (the r4 lesson: -14% driver capture, cause
    # undecidable from the artifact).
    rates, probes = [], [host_speed_probe()]
    for _ in range(9):
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sink):
            n = images_to_tfrecords_mt("bench", chip_dir, out_dir,
                                       num_shards=8, num_threads=NWORK_MT,
                                       store_as_array=False)
        dt = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        rates.append(n / dt)
        probes.append(host_speed_probe())
    stats = _rate_stats(rates, probes)
    headline = {
        "metric": "256x256 RGB chips -> sharded TFRecords (raw-bytes "
                  "mode, 8 shards)",
        **stats,
        "unit": "chips/s",
        "vs_baseline": round(stats["value"] / BASELINE_CHIPS_PER_SEC, 3),
    }
    # headline RUNS first (cleanest cache state) but PRINTS last: the
    # driver parses the final stdout line
    print(json.dumps(bench_tifarr()))
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
