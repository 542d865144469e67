"""CRC32C (Castagnoli) + TFRecord masking, pure-Python fallback.

The TFRecord frame checksums every record with a masked CRC32C
(reference reaches this through TF's C++ TFRecordWriter,
/root/reference/dl_segmentation_utils/_img_to_tf_threaded.py:182).
The fast path lives in the C++ extension (_native/fastrecord.cc,
SSE4.2/table slicing); this module is the dependency-free fallback and
the reference implementation the native one is tested against.
"""

from __future__ import annotations

import numpy as np

_POLY = 0x82F63B78  # reflected Castagnoli polynomial

_TABLE8 = None  # (8, 256) uint32 slicing-by-8 tables


def _build_tables():
    global _TABLE8
    t = np.zeros((8, 256), dtype=np.uint64)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (_POLY if crc & 1 else 0)
        t[0, i] = crc
    for k in range(1, 8):
        for i in range(256):
            prev = int(t[k - 1, i])
            t[k, i] = (prev >> 8) ^ int(t[0, prev & 0xFF])
    _TABLE8 = t.astype(np.uint32)


_build_tables()
_T = [_TABLE8[k] for k in range(8)]


def crc32c(data, initial: int = 0) -> int:
    """CRC32C of bytes-like data. Table-driven slicing-by-8."""
    buf = np.frombuffer(memoryview(data), dtype=np.uint8)
    crc = (~initial) & 0xFFFFFFFF
    n = len(buf)
    head = n % 8
    i = 0
    # leading bytes to reach 8-alignment of the remaining length
    for i in range(head):
        crc = (crc >> 8) ^ int(_T[0][(crc ^ int(buf[i])) & 0xFF])
    i = head
    if n - head:
        chunk = buf[head:].reshape(-1, 8)
        T = _T
        for row in chunk:
            crc ^= int(row[0]) | (int(row[1]) << 8) | (int(row[2]) << 16) \
                | (int(row[3]) << 24)
            crc = (int(T[7][crc & 0xFF])
                   ^ int(T[6][(crc >> 8) & 0xFF])
                   ^ int(T[5][(crc >> 16) & 0xFF])
                   ^ int(T[4][(crc >> 24) & 0xFF])
                   ^ int(T[3][int(row[4])])
                   ^ int(T[2][int(row[5])])
                   ^ int(T[1][int(row[6])])
                   ^ int(T[0][int(row[7])]))
    return (~crc) & 0xFFFFFFFF


def masked_crc32c(data) -> int:
    """TFRecord's masked CRC: rotate right by 15 and add a constant."""
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF
