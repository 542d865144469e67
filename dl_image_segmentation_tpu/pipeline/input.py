"""Training input feed: sharded TFRecords -> parse -> decode -> augment
-> batch -> device prefetch.

Replaces the reference's tf.data stack (TFRecordDataset + ds.map(parse,
8) + batch, /root/reference/parse_tfrecords.ipynb cells 4, 30-36) with
a JAX-native host pipeline built for TPU duty cycle:

* shard files are partitioned per host (jax.process_index()) -- the
  per-host data plane of SURVEY.md section 2.4;
* parse + decode run on a thread pool (our codecs release the GIL in
  the C++ extension / PIL, unlike the reference's GIL-bound GDAL path
  flagged at _tfrecord_image_translation.py:124-126);
* batches are assembled pinned-shape and double-buffered onto the mesh
  (device_put overlapped with the running step) so the device never
  waits on the host;
* augmentation runs on device (ops/augment.py), fused into the step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax

from ..records import parsers
from ..records.tfrecord import read_records

PARSE_FNS = {
    "rgbraw": parsers.parse_encoded_rgb_img_proto,
    "rgbarr": parsers.parse_8bit_array_proto,
    "tifraw": parsers.parse_encoded_gdal_proto_wrapped,
    "tifraw_eager": parsers.parse_encoded_gdal_proto_eager,
    "tifarr": parsers.parse_higher_dtype_array_proto,
}


def host_shard_files(files: Sequence[str]) -> List[str]:
    """This host's slice of the shard list (round-robin by process).

    Whole shards are assigned, so with ``repeat=False`` hosts may
    yield UNEQUAL batch counts when shard record counts differ --
    fine for training (repeating feeds), but a multi-process
    evaluation must bound the loop (Trainer.evaluate docstring) or
    the per-batch collectives deadlock on the ragged tail."""
    n = jax.process_count()
    i = jax.process_index()
    return [f for k, f in enumerate(sorted(files)) if k % n == i]


class TFRecordFeed:
    """Iterable over (images, labels) batches from sharded TFRecords.

    parse_mode: one of rgbraw | rgbarr | tifraw | tifarr (the on-disk
    storage modes, parse nb cell 1). Labels are int32 (nodata preserved
    for loss masking). Image scaling (``scale``): None = dtype-
    appropriate [0,1] scaling for integer-dtype parses; a float =
    explicit multiplier (float32 output); the string ``"raw"`` = keep
    the parsed dtype untouched (for uint8 device pools, 4x less HBM).
    NOTE the raw-DN modes: ``tifraw`` (the reference's GDAL-wrapped
    parser) decodes to float32 RAW digital numbers, and ``tifarr``
    stores raw-DN FloatLists -- float passes through EVERY scale
    setting un-normalized, so models train on raw DNs in both modes
    (predict with ``--scale none`` to match). Use ``tifraw_eager`` for
    source-dtype parses that scale to [0,1] under scale=None.

    ``verify_crc``: validate each record's TFRecord frame CRCs while
    feeding (off by default -- the array modes would otherwise accept
    silently corrupt payloads that reshape cleanly).
    """

    def __init__(self, shard_pattern, parse_mode: str, batch_size: int,
                 image_size: Optional[int] = None,
                 shuffle_buffer: int = 256, seed: int = 0,
                 num_workers: int = 4, repeat: bool = True,
                 scale: Optional[float] = None,
                 drop_remainder: bool = True,
                 per_host: bool = True,
                 interleave: int = 4,
                 verify_crc: bool = False):
        if isinstance(shard_pattern, str):
            # local glob or gs:// prefix-list (training data on real
            # pods lives in GCS; the reference's tf.data shard globs
            # accepted GCS URIs the same way, parse nb cell 4)
            from .. import storage
            files = storage.glob(shard_pattern)
        else:
            files = sorted(shard_pattern)
        # aborted writers deliberately leave .tmp shards; never read them
        files = [f for f in files if not f.endswith(".tmp")]
        if not files:
            raise FileNotFoundError(f"no shards match {shard_pattern!r}")
        self.files = host_shard_files(files) if per_host else list(files)
        if not self.files:
            raise RuntimeError("this host received zero shards; use more "
                               "shards than hosts")
        self.parse = PARSE_FNS[parse_mode]
        self.parse_mode = parse_mode
        self.batch_size = batch_size
        self.image_size = image_size
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.repeat = repeat
        self.scale = scale
        self.drop_remainder = drop_remainder
        self.interleave = interleave
        self.verify_crc = verify_crc
        # throughput counters (SURVEY.md section 5: per-stage metrics)
        self.records_read = 0
        self.bytes_read = 0
        self._parse_failures = 0
        self._any_parse_success = False

    # -- record iteration ---------------------------------------------------
    def _record_stream(self) -> Iterator[bytes]:
        """Records from all shards, interleaved round-robin across
        ``interleave`` concurrently-open shards (improves shuffle
        quality far beyond the buffer alone; tf.data's interleave
        equivalent), shard order re-permuted every epoch."""
        rng = np.random.RandomState(self.seed)
        width = max(1, min(self.interleave, len(self.files)))
        while True:
            order = list(rng.permutation(len(self.files)))
            open_iters = []
            while order or open_iters:
                while order and len(open_iters) < width:
                    open_iters.append(read_records(
                        self.files[order.pop()],
                        verify_crc=self.verify_crc))
                alive = []
                for it in open_iters:
                    rec = next(it, None)
                    if rec is None:
                        continue
                    self.bytes_read += len(rec)
                    yield rec
                    alive.append(it)
                open_iters = alive
            if not self.repeat:
                return

    def _parsed_stream(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Parse records on a worker pool, preserving a shuffle buffer."""
        recs = self._record_stream()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 8)
        stop = threading.Event()
        lock = threading.Lock()

        def put(item) -> bool:
            """Queue put that gives up when the consumer is gone (so
            worker threads never leak blocked on a full queue)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                while not stop.is_set():
                    with lock:
                        try:
                            rec = next(recs)
                        except StopIteration:
                            break
                    try:
                        # named span so a jax.profiler timeline shows
                        # host decode overlapping device dispatch
                        # windows (tpu_evidence trace_overlap section);
                        # a no-op TraceMe when no trace is active
                        with jax.profiler.TraceAnnotation("feed.parse"):
                            img, lbl, _ident = self.parse(rec)
                    except Exception:  # skip corrupt records, keep feeding
                        with lock:
                            self._parse_failures += 1
                            failures = self._parse_failures
                        # every record failing = wrong parse_mode; a
                        # repeating stream would otherwise spin forever.
                        # Gate on producer-side successes, NOT the
                        # consumer-side records_read counter: a slow
                        # consumer (or one bad leading shard) must not
                        # abort a feed whose other records parse fine.
                        if (not self._any_parse_success
                                and failures >= 1000):
                            put(RuntimeError(
                                f"all {failures} records "
                                f"failed to parse with parse_mode="
                                f"{self.parse_mode!r}; wrong storage "
                                "mode for these shards?"))
                            return
                        continue
                    self._any_parse_success = True
                    if not put((img, lbl)):
                        return
            except BaseException as e:
                # IO errors from the record stream (truncated/corrupt
                # shard) must fail the consumer loudly, not strand it
                # waiting on a sentinel that never comes.
                put(e)
                return
            put(None)

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        finished = 0
        rng = np.random.RandomState(self.seed + 1)
        buf: List[Tuple[np.ndarray, np.ndarray]] = []
        try:
            while finished < len(threads):
                item = out_q.get()
                if item is None:
                    finished += 1
                    continue
                if isinstance(item, BaseException):
                    raise item
                self.records_read += 1
                if self.shuffle_buffer > 1:
                    buf.append(item)
                    if len(buf) >= self.shuffle_buffer:
                        k = rng.randint(len(buf))
                        buf[k], buf[-1] = buf[-1], buf[k]
                        yield buf.pop()
                else:
                    yield item
            while buf:
                k = rng.randint(len(buf))
                buf[k], buf[-1] = buf[-1], buf[k]
                yield buf.pop()
        finally:
            stop.set()

    # -- batching -------------------------------------------------------------
    def _to_float_image(self, img: np.ndarray) -> np.ndarray:
        if img.ndim == 2:
            img = img[:, :, None]
        img = np.asarray(img)
        if self.scale == "raw":
            # keep the source dtype untouched (uint8 pools: 4x less
            # HBM than float32; DeviceDataPool scales at sample time)
            return img
        if self.scale is not None:
            return img.astype(np.float32) * self.scale
        if img.dtype == np.uint8:
            return img.astype(np.float32) / 255.0
        if img.dtype == np.uint16:
            return img.astype(np.float32) / 65535.0
        return img.astype(np.float32)

    def batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        imgs: List[np.ndarray] = []
        lbls: List[np.ndarray] = []
        seen = 0
        yielded = 0
        for img, lbl in self._parsed_stream():
            seen += 1
            img = self._to_float_image(img)
            if lbl.ndim == 3:
                lbl = lbl[:, :, 0]
            usable = not (self.image_size is not None and (
                img.shape[0] != self.image_size
                or img.shape[1] != self.image_size))
            if usable:
                imgs.append(img)
                lbls.append(lbl.astype(np.int32))
                if len(imgs) == self.batch_size:
                    yield np.stack(imgs), np.stack(lbls)
                    yielded += 1
                    imgs, lbls = [], []
            if yielded == 0 and len(imgs) == 0 and seen >= 10000:
                raise RuntimeError(
                    f"input feed produced no usable examples after "
                    f"{seen} records: check parse_mode="
                    f"{self.parse_mode!r} and image_size="
                    f"{self.image_size} against the shards")
        if seen == 0:
            raise RuntimeError(
                f"input feed produced no examples at all: every record "
                f"failed to parse with parse_mode={self.parse_mode!r}")
        if imgs and not self.drop_remainder:
            yield np.stack(imgs), np.stack(lbls)

    def __iter__(self):
        return self.batches()


class DevicePrefetcher:
    """Overlap host batch assembly + H2D transfer with device compute.

    Keeps ``depth`` batches in flight: while the device executes step N
    the host is placing batch N+1 (device_put is async). This is the
    double-buffering that XLA infeed / tf.data prefetch provided in the
    reference's world."""

    def __init__(self, batches: Iterator, place: Callable, depth: int = 2):
        self.src = iter(batches)
        self.place = place
        self.depth = depth
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exhausted = False
        self.thread = threading.Thread(target=self._fill, daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        """Queue put that gives up once close() is called, so the fill
        thread (plus its device-resident batches) never leaks when the
        consumer stops early (e.g. a fixed-step training loop over a
        repeating feed)."""
        while not self._stop.is_set():
            try:
                self.q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _fill(self):
        try:
            for batch in self.src:
                if self._stop.is_set() or not self._put(self.place(*batch)):
                    return
            self._put(None)
        except BaseException as e:  # propagate to the consumer thread
            self._put(e)

    def close(self):
        """Stop the fill thread and release queued device batches."""
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return self

    def __next__(self):
        if self._exhausted:
            # the fill thread exited after its None sentinel; a blind
            # q.get() here would block forever on a dead queue
            raise StopIteration
        item = self.q.get()
        if item is None:
            self._exhausted = True
            raise StopIteration
        if isinstance(item, BaseException):
            # the fill thread died delivering this; a caller that
            # catches the error and calls next() again must get
            # StopIteration, not block forever on the dead queue
            self._exhausted = True
            raise item
        return item
