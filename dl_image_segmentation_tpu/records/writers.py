"""Sharded chips -> TFRecords writers.

Re-implements the reference's two translation engines with identical
on-disk output and call signatures:

* ``process_dataset_multithreaded`` (aliased ``images_to_tfrecords_mt``)
  -- 8-bit PNG/JPG pairs, thread-parallel
  (/root/reference/dl_segmentation_utils/_img_to_tf_threaded.py:321-349)
* ``process_dataset_mp`` (aliased ``images_to_tfrecords_mp``)
  -- any supported raster format, originally process-parallel because
  GDAL holds the GIL (_img_to_tf_mp.py:1-4). This framework's decode
  path (own GeoTIFF codec via the C++ extension + PIL) releases the
  GIL, so both engines run on a shared thread-pool core; the
  ``num_proc`` argument simply sets worker count.

Contracts preserved:
* shard files named '%s-%.5d-of-%.5d' (_img_to_tf_threaded.py:177)
* deterministic shuffle with random.seed(12345)
  (_img_to_tf_threaded.py:310, _img_to_tf_mp.py:222)
* num_shards % num_workers == 0 (_img_to_tf_threaded.py:164,346)
* identifier = filename '#'->':' (DLTile key) or
  '{filename}|{geotransform}|{crs}' (_img_to_tf_mp.py:60-67)
* per-image try/except skip with message (_img_to_tf_mp.py:127-136)

Deliberate fix over the reference (SURVEY.md "quirks"): images and
labels are paired by FILENAME, not by positional index after two
independent globs, so mismatched folders fail loudly instead of
silently mispairing. The shuffle (seed 12345) is applied to the paired
list, preserving the reference's record order when folders match.
"""

from __future__ import annotations

import os
import random
import sys
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..raster.image import (decode_image_bytes, decode_jpeg, decode_png,
                            png_to_jpeg, sniff_image_info)
from .example import write_example_framed
from .tfrecord import TFRecordWriter, shard_filename


def _tile_key_from_filename(path: str) -> str:
    base = os.path.basename(path)
    stem = ".".join(base.split(os.extsep)[:-1])
    return stem.replace("#", ":")


def _find_image_files(data_dir: str,
                      file_ext: Optional[Sequence[str]] = None,
                      ) -> Tuple[List[str], List[str]]:
    """Pair image/label files by name, deterministic shuffled order.

    file_ext: list of extensions to glob; default PNG+JPG (MT engine,
    _img_to_tf_threaded.py:297-304) -- the MP engine passes ['tif'].
    """
    from .. import storage

    exts = list(file_ext) if file_ext else ["png", "jpg"]
    img_dir = storage.join(data_dir, "images")
    lbl_dir = storage.join(data_dir, "labels")
    suffixes = tuple(f".{e}" for e in exts)
    if storage.is_remote(data_dir):
        # gs:// chip folders: one prefix-list per folder (the remote
        # analogue of the scandir below; same pairing semantics)
        try:
            img_names = sorted(n for n in storage.listdir(img_dir)
                               if not n.startswith(".")
                               and n.endswith(suffixes))
        except FileNotFoundError:
            img_names = []
        try:
            lbl_names = set(storage.listdir(lbl_dir))
        except FileNotFoundError:
            lbl_names = set()
    else:
        # one scandir per folder instead of glob + a stat per label:
        # the directory listings are the same information, ~5x cheaper
        # at 6,000-pair scale (and this runs before any worker starts)
        try:
            img_names = sorted(
                e.name for e in os.scandir(img_dir)
                if not e.name.startswith(".")
                and e.name.endswith(suffixes))
        except FileNotFoundError:
            img_names = []
        try:
            lbl_names = {e.name for e in os.scandir(lbl_dir)}
        except FileNotFoundError:
            lbl_names = set()

    filenames = []
    labels = []
    missing = []
    for name in img_names:
        if name in lbl_names:
            filenames.append(storage.join(img_dir, name))
            labels.append(storage.join(lbl_dir, name))
        else:
            missing.append(storage.join(img_dir, name))
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} images have no matching label file, e.g. "
            f"{missing[0]!r} (images and labels must be identically named, "
            "README.md:16-17)")

    shuffled = list(range(len(filenames)))
    random.seed(12345)
    random.shuffle(shuffled)
    filenames = [filenames[i] for i in shuffled]
    labels = [labels[i] for i in shuffled]
    print(f"Found {len(filenames)} image files and {len(labels)} label "
          f"files inside {data_dir}.")
    return filenames, labels


def _load_mt(path: str, dltile_from_filename: bool, png_to_jpg: bool,
             decode: bool):
    """MT-engine loader: PNG/JPG only, 8-bit, <=3 bands
    (_img_to_tf_threaded.py:75-121).

    The reference always full-decodes "to validate shape" even when
    only raw bytes are stored (:105-112). Here raw-bytes mode validates
    via header parsing (sniff_image_info) -- same checks, no pixel
    decode -- which is what lets the translation path run IO-bound."""
    from .. import storage
    data = storage.read_bytes(path)
    is_png = ".png" in path  # substring test, reference quirk (:65-72)
    if is_png and png_to_jpg and not decode:
        data = png_to_jpeg(data)
        is_png = False
    if decode:
        image = decode_png(data) if is_png else decode_jpeg(data)
        h, w, bands = image.shape
    else:
        info = sniff_image_info(data)
        h, w, bands = info.height, info.width, info.count
        assert bands <= 3
        image = None
    if dltile_from_filename:
        key = _tile_key_from_filename(path)
    else:
        key = os.path.basename(path)
    if decode:
        return image, h, w, bands, key
    return data, h, w, bands, key


def _load_any(path: str, dltile_from_filename: bool, decode: bool):
    """MP-engine loader: any raster format via our codecs
    (_img_to_tf_mp.py:22-75 equivalent; byte reads go through the
    storage layer like the reference's tf.io.gfile, :43-44). Raw-bytes
    mode reads only the container header (shape + geotransform + CRS
    come from tags)."""
    from .. import storage
    data = storage.read_bytes(path)
    if decode:
        # base_dir + origin let multi-file containers (VRT sources,
        # the ENVI flat binary) resolve their siblings
        g = decode_image_bytes(data, base_dir=storage.dirname(path),
                               origin=storage.basename(path))
        info = g.info
    else:
        info = sniff_image_info(data)
    h, w, bands = info.height, info.width, info.count
    if dltile_from_filename:
        key = _tile_key_from_filename(path)
    else:
        gt = info.geotransform
        crs = info.crs
        if gt is not None and crs is not None:
            key = "|".join((os.path.basename(path), str(list(gt)), crs))
        else:
            key = os.path.basename(path)
    if decode:
        arr = g.array
        assert (h, w, bands) == arr.shape
        return arr, h, w, bands, key
    return data, h, w, bands, key


def _worker(worker_index: int, ranges, name: str,
            img_files: Sequence[str], lbl_files: Sequence[str],
            out_dir: str, num_shards: int, loader, loader_args: tuple,
            store_as_array: bool, progress_every: int,
            shard_base: int = 0, total_shards: Optional[int] = None,
            resume: bool = False) -> Tuple[int, dict]:
    """Writes this worker's contiguous range of shards. Returns
    (examples written, {skip reason: count}). ``num_shards`` is this host's shard
    count; ``shard_base``/``total_shards`` keep shard numbering global
    in multi-host runs."""
    if total_shards is None:
        total_shards = num_shards
    num_workers = len(ranges)
    assert not num_shards % num_workers
    shards_per_worker = num_shards // num_workers
    shard_ranges = np.linspace(ranges[worker_index][0],
                               ranges[worker_index][1],
                               shards_per_worker + 1).astype(int)
    files_in_worker = ranges[worker_index][1] - ranges[worker_index][0]
    # fully-native pair path: applicable to raw-bytes PNG/JPG mode with
    # no transcode (the headline translation workload); C++ reads both
    # files straight into the framed output buffer
    from .. import _native, storage
    # the C++ fast paths read input files by path; gs:// inputs go
    # through the Python loaders (which read via the storage layer)
    local_inputs = not (img_files and storage.is_remote(img_files[0]))
    use_native_pair = (loader is _load_mt and not store_as_array
                       and not loader_args[1] and local_inputs
                       and _native.available())
    # decoded-array GeoTIFF mode: fused TIFF-decode + Example-encode in
    # C++ (per-pair fallback to the Python codecs for anything outside
    # the chip-contract TIFF subset)
    use_native_tifarr = (loader is _load_any and store_as_array
                         and loader_args[0] and local_inputs
                         and _native.available())

    counter = 0
    skipped: dict = {}  # reason -> count, surfaced in the run summary
    for s in range(shards_per_worker):
        shard = shard_base + worker_index * shards_per_worker + s
        output_file = storage.join(
            out_dir, shard_filename(name, shard, total_shards))
        if resume and storage.exists(output_file):
            # writers are atomic (tmp + rename), so existence means the
            # shard completed in a previous run
            print(f"{datetime.now()} [worker {worker_index}]: shard "
                  f"{output_file} exists, skipping (resume)")
            continue
        native_mode = ("pair" if use_native_pair
                       else "tifarr" if use_native_tifarr else None)
        writer = TFRecordWriter(output_file,
                                buffering=0 if native_mode else -1)
        try:
            shard_counter, shard_skips = _write_one_shard(
                writer, worker_index, img_files, lbl_files,
                list(range(shard_ranges[s], shard_ranges[s + 1])),
                loader, loader_args, store_as_array, native_mode,
                progress_every, counter, files_in_worker)
        except BaseException:
            # leave the .tmp in place (never renamed): an existing
            # final shard file always means a COMPLETE shard
            writer.abort()
            raise
        counter += shard_counter
        for k, v in shard_skips.items():
            skipped[k] = skipped.get(k, 0) + v
        writer.close()
        print(f"{datetime.now()} [worker {worker_index}]: Wrote "
              f"{shard_counter} images to {output_file}")
        sys.stdout.flush()
    return counter, skipped


def _write_one_shard(writer, worker_index: int, img_files, lbl_files,
                     indices, loader, loader_args: tuple,
                     store_as_array: bool, native_mode,
                     progress_every: int, counter_base: int,
                     files_in_worker: int) -> Tuple[int, dict]:
    """Write one shard's records; returns (count written, {skip reason:
    count}). Raises on unrecoverable write errors (caller aborts the
    shard, leaving the .tmp so the atomic-rename resume invariant
    holds)."""
    from .. import _native
    from ..raster.image import UnsupportedFormatError

    shard_counter = 0
    skipped: dict = {}
    counter = counter_base
    if native_mode and indices:
        # whole shard in native code (no per-record Python); pairs the
        # native path can't handle are retried below through the Python
        # path (which produces the reference's SKIPPED diagnostics for
        # genuinely bad files). Known deviation from the reference's
        # record order: natively-rejected pairs land at the END of the
        # shard rather than at their seed-12345 shuffled position (the
        # record SET per shard is identical).
        keys = [
            (_tile_key_from_filename(img_files[i])
             if loader_args[0]
             else os.path.basename(img_files[i])).encode()
            for i in indices]
        native_fn = (_native.write_shard if native_mode == "pair"
                     else _native.write_shard_tifarr)
        result = native_fn(
            [img_files[i] for i in indices],
            [lbl_files[i] for i in indices],
            keys, writer.fileobj.fileno())
        if result is not None:
            written, failed_idx = result
            shard_counter += written
            counter += written
            indices = [indices[k] for k in failed_idx]
    for i in indices:
        filename = img_files[i]
        label = lbl_files[i]
        try:
            img_buf, ih, iw, ib, ikey = loader(
                filename, *loader_args, store_as_array)
            lbl_buf, lh, lw, lb, lkey = loader(
                label, *loader_args, store_as_array)
            assert ikey == lkey
        except Exception as e:  # noqa: BLE001 -- skip-and-continue contract
            print(e)
            print(f"SKIPPED: Unexpected error while decoding {filename}.")
            from ..raster.image import CorruptRasterError
            if isinstance(e, UnsupportedFormatError):
                reason = str(e).split(".")[0]  # "unsupported ...: JP2"
            elif isinstance(e, CorruptRasterError):
                # "corrupt or unreadable HDF5 container" — keep the
                # format name in the summary line
                reason = str(e).split(";")[0]
            else:
                reason = type(e).__name__
            skipped[reason] = skipped.get(reason, 0) + 1
            continue
        # labels are single-band rasters; drop the band axis so the
        # target stores (h, w) like the reference's 2-D label arrays
        if store_as_array and isinstance(lbl_buf, np.ndarray) \
                and lbl_buf.ndim == 3 and lbl_buf.shape[2] == 1:
            lbl_buf = lbl_buf[:, :, 0]
        write_example_framed(writer.fileobj, img_buf, lbl_buf, ih, iw, ib,
                             lh, lw, ikey)
        shard_counter += 1
        counter += 1
        if progress_every and not counter % progress_every:
            print(f"{datetime.now()} [worker {worker_index}]: Processed "
                  f"{counter} of {files_in_worker} images in batch.")
            sys.stdout.flush()
    return shard_counter, skipped


def _process_dataset(name: str, directory: str, out_directory: str,
                     num_shards: int, num_workers: int,
                     loader, loader_args: tuple,
                     store_as_array: bool,
                     file_ext: Optional[Sequence[str]],
                     progress_every: int,
                     host_index: int = 0, host_count: int = 1,
                     resume: bool = False) -> int:
    assert not num_shards % num_workers, (
        "Num shards must be a multiple of num workers (incl 1*)")
    img_files, lbl_files = _find_image_files(directory, file_ext)
    shard_base = 0
    local_shards = num_shards
    if host_count > 1:
        # multi-host: each host owns a contiguous slice of the (already
        # deterministically shuffled) file list and a matching shard
        # range; shard numbering stays global so the combined output is
        # identical to a single-host run (SURVEY.md section 2.3 P2)
        assert not num_shards % host_count, (
            "num_shards must divide evenly across hosts")
        n = len(img_files)
        lo = n * host_index // host_count
        hi = n * (host_index + 1) // host_count
        img_files = img_files[lo:hi]
        lbl_files = lbl_files[lo:hi]
        local_shards = num_shards // host_count
        shard_base = local_shards * host_index
        assert not local_shards % num_workers, (
            "per-host shard count must be a multiple of num workers")
    from .. import storage
    storage.makedirs(out_directory, exist_ok=True)
    spacing = np.linspace(0, len(img_files), num_workers + 1).astype(int)
    ranges = [[spacing[i], spacing[i + 1]] for i in range(num_workers)]
    print(f"Launching {num_workers} workers for spacings: {ranges}")
    sys.stdout.flush()
    # Worker COUNT fixes the shard assignment (on-disk bytes); pool
    # WIDTH is capped at the hardware so oversubscribing a small box
    # doesn't timeslice N compute-bound shard loops against each other
    # (~25% throughput loss measured at 4 workers on 1 core). Same
    # worker tasks, same outputs -- just not all in flight at once.
    pool_width = min(num_workers, os.cpu_count() or num_workers)
    if num_workers == 1:
        results = [_worker(0, ranges, name, img_files, lbl_files,
                           out_directory, local_shards, loader, loader_args,
                           store_as_array, progress_every,
                           shard_base=shard_base, total_shards=num_shards,
                           resume=resume)]
    else:
        with ThreadPoolExecutor(max_workers=pool_width) as ex:
            futs = [
                ex.submit(_worker, w, ranges, name, img_files, lbl_files,
                          out_directory, local_shards, loader, loader_args,
                          store_as_array, progress_every,
                          shard_base, num_shards, resume)
                for w in range(num_workers)
            ]
            results = [f.result() for f in futs]
    total = sum(r[0] for r in results)
    skipped: dict = {}
    for _, sk in results:
        for k, v in sk.items():
            skipped[k] = skipped.get(k, 0) + v
    print(f"{datetime.now()}: Finished writing all {len(img_files)} images "
          "in data set.")
    for reason, n in sorted(skipped.items()):
        print(f"WARNING: {n} file(s) skipped: {reason}")
    sys.stdout.flush()
    return total


def process_dataset_multithreaded(name: str, directory: str,
                                  out_directory: str, num_shards: int,
                                  num_threads: Optional[int] = None,
                                  dltile_from_filename: bool = True,
                                  convert_png_to_jpg: bool = False,
                                  store_as_array: bool = False,
                                  host_index: int = 0,
                                  host_count: int = 1,
                                  resume: bool = False) -> int:
    """PNG/JPG chips -> sharded TFRecords (reference:
    _img_to_tf_threaded.py:321-349). Returns examples written.
    host_index/host_count partition files + shard numbers across hosts
    (combined output identical to a single-host run)."""
    if not num_threads:
        num_threads = num_shards // host_count
    return _process_dataset(
        name, directory, out_directory, num_shards, num_threads,
        _load_mt, (dltile_from_filename, convert_png_to_jpg),
        store_as_array, None, progress_every=1000,
        host_index=host_index, host_count=host_count, resume=resume)


def process_dataset_mp(name: str, directory: str, out_directory: str,
                       num_shards: int, num_proc: Optional[int] = None,
                       dltile_from_filename: bool = True,
                       file_ext: str = "tif",
                       store_as_array: bool = True,
                       host_index: int = 0, host_count: int = 1,
                       resume: bool = False) -> int:
    """Any-format chips -> sharded TFRecords (reference:
    _img_to_tf_mp.py:233-275). Returns examples written."""
    if not num_proc:
        num_proc = num_shards // host_count
    return _process_dataset(
        name, directory, out_directory, num_shards, num_proc,
        _load_any, (dltile_from_filename,),
        store_as_array, [file_ext], progress_every=100,
        host_index=host_index, host_count=host_count, resume=resume)


# facade aliases matching dl_segmentation_utils/__init__.py:9-10
images_to_tfrecords_mt = process_dataset_multithreaded
images_to_tfrecords_mp = process_dataset_mp
