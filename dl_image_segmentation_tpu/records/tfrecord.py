"""TFRecord container framing: length-prefixed, masked-CRC32C records.

Bit-identical to TF's C++ RecordWriter/RecordReader (reference reaches
it via tf.io.TFRecordWriter / tf.data.TFRecordDataset,
/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:119,141 and
parse_tfrecords.ipynb cell 4). Frame layout per record:

    uint64  length         (little-endian)
    uint32  masked_crc32c(length bytes)
    bytes   data[length]
    uint32  masked_crc32c(data)

The native C++ writer/reader (records.native) is used automatically
when available; this module is the pure-Python implementation and the
correctness oracle.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, Union

from .crc32c import masked_crc32c as _py_masked_crc32c


def _get_masked_crc():
    """Native masked CRC32C when the extension is built, Python otherwise."""
    from .. import _native
    if _native.available():
        return _native.masked_crc32c
    return _py_masked_crc32c


def masked_crc32c(data) -> int:
    return _get_masked_crc()(bytes(data))


def writeall(fileobj, data) -> int:
    """Write ALL of ``data``, looping on short writes. Raw (unbuffered)
    file objects may legally write fewer bytes than requested (e.g. a
    transient ENOSPC that later clears, or an interrupting signal); a
    single ignored-return write() would leave a torn frame mid-shard
    that close()'s atomic rename then blesses as complete."""
    view = memoryview(data) if not isinstance(data, memoryview) else data
    total = len(view)
    written = 0
    while written < total:
        n = fileobj.write(view[written:])
        if n is None:  # buffered writers return None only on success
            return total
        if n <= 0:
            raise IOError("write() made no progress")
        written += n
    return total


class TFRecordWriter:
    """Streaming TFRecord writer. Frame assembly runs in the native
    extension when available (single memcpy + hardware CRC32C).

    Crash-safe: data streams to ``<path>.tmp`` and is renamed into
    place on close(), so an existing final file always means a COMPLETE
    shard -- which is what makes shard-level resume sound
    (records.writers ``resume=True``)."""

    def __init__(self, path: str, atomic: bool = True,
                 buffering: int = -1):
        from .. import storage
        self._path = path
        self._remote = storage.is_remote(path)
        # gs:// shards spool to a local temp file and upload whole on
        # close() -- GCS object creation is atomic, so 'shard exists'
        # still means 'shard complete' (the resume invariant)
        if atomic or self._remote:
            self._spool = storage.SpooledWriter(path, buffering=buffering)
            self._f = self._spool.fileobj
        else:
            self._spool = None
            # buffering=0 (unbuffered) when the caller writes whole
            # frames and may interleave direct-fd writes (native path)
            self._f = open(path, "wb", buffering=buffering)
        self._atomic = atomic
        from .. import _native
        self._native_frame = _native.tfrecord_frame if _native.available() \
            else None

    @property
    def fileobj(self):
        """The underlying binary file (for pre-framed writes, see
        records.example.write_example_framed)."""
        return self._f

    def write(self, record: Union[bytes, memoryview]) -> None:
        record = bytes(record)
        if self._native_frame is not None:
            writeall(self._f, self._native_frame(record))
            return
        header = struct.pack("<Q", len(record))
        writeall(self._f, header)
        writeall(self._f, struct.pack("<I", _py_masked_crc32c(header)))
        writeall(self._f, record)
        writeall(self._f, struct.pack("<I", _py_masked_crc32c(record)))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            if self._spool is not None:
                self._spool.close()  # rename / upload into place
            else:
                self._f.close()

    def abort(self) -> None:
        """Close WITHOUT renaming into place: the shard stays a .tmp
        (ignored by readers, resume, and push), preserving the
        "existing shard == complete shard" invariant after a write
        failure that can't be rolled back. With atomic=False there is
        no .tmp indirection, so the torn file at the final path is
        REMOVED instead."""
        if not self._f.closed:
            if self._spool is not None:
                self._spool.abort()  # local: keeps the .tmp; remote:
                return               # nothing was ever uploaded
            self._f.close()
            if not self._atomic:
                try:
                    os.unlink(self._path)
                except OSError:
                    pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc and exc[0] is not None:
            self.abort()
        else:
            self.close()


def read_records(path: str, verify_crc: bool = True) -> Iterator[bytes]:
    """Iterate raw record payloads from one TFRecord file (local path
    or gs:// object, like the reference's tf.data shard globs over GCS
    URIs, parse_tfrecords.ipynb cell 4)."""
    from .. import storage
    with storage.open_read(path) as f:
        while True:
            header = f.read(8)
            if not header:
                return
            if len(header) < 8:
                raise IOError(f"truncated record header in {path}")
            (length,) = struct.unpack("<Q", header)
            hcrc_raw = f.read(4)
            if len(hcrc_raw) < 4:  # IOError like every other
                raise IOError(f"truncated record header in {path}")
            (hcrc,) = struct.unpack("<I", hcrc_raw)
            if verify_crc and masked_crc32c(header) != hcrc:
                raise IOError(f"corrupt record header CRC in {path}")
            data = f.read(length)
            if len(data) < length:
                raise IOError(f"truncated record in {path}")
            dcrc_raw = f.read(4)
            if len(dcrc_raw) < 4:
                raise IOError(f"truncated record in {path}")
            (dcrc,) = struct.unpack("<I", dcrc_raw)
            if verify_crc and masked_crc32c(data) != dcrc:
                raise IOError(f"corrupt record data CRC in {path}")
            yield data


def shard_filename(name: str, shard: int, num_shards: int) -> str:
    """Shard naming contract: '%s-%.5d-of-%.5d'
    (reference: _img_to_tf_threaded.py:177, _img_to_tf_mp.py:115)."""
    return "%s-%.5d-of-%.5d" % (name, shard, num_shards)


def list_shards(directory: str, name: str) -> List[str]:
    """All final shards of a named dataset in a directory (local or
    gs://; never the .tmp files aborted writers leave)."""
    from .. import storage
    return storage.glob(storage.join(directory,
                                     f"{name}-?????-of-?????"))
