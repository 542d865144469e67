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
        self._path = path
        self._tmp_path = path + ".tmp" if atomic else path
        # buffering=0 (unbuffered) when the caller writes whole frames
        # and may interleave direct-fd writes (native pair path)
        self._f = open(self._tmp_path, "wb", buffering=buffering)
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
            self._f.close()
            if self._atomic:
                os.replace(self._tmp_path, self._path)

    def abort(self) -> None:
        """Close WITHOUT renaming into place: the shard stays a .tmp
        (ignored by readers, resume, and push), preserving the
        "existing shard == complete shard" invariant after a write
        failure that can't be rolled back. With atomic=False there is
        no .tmp indirection, so the torn file at the final path is
        REMOVED instead."""
        if not self._f.closed:
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
    """Iterate raw record payloads from one TFRecord file."""
    with open(path, "rb") as f:
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
    """All final shards of a named dataset in a directory (never the
    .tmp files aborted writers leave)."""
    import glob
    return sorted(glob.glob(os.path.join(
        directory, f"{name}-?????-of-?????")))
