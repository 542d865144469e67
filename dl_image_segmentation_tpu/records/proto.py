"""Hand-rolled protobuf wire-format primitives for tf.train.Example.

The reference relies on the protobuf C++ runtime via the tensorflow
python package (/root/reference/dl_segmentation_utils/
_tfrecord_image_translation.py:16,35,52,211). This framework encodes
the Example message directly -- the schema is tiny and fixed, and a
direct encoder is both dependency-free and faster than generic
protobuf for the bytes-dominated payloads chips produce.

Wire contract (validated bit-identically against
tf.train.Example.SerializeToString(deterministic=True) in
tests/test_records.py):

    message Example  { Features features = 1; }
    message Features { map<string, Feature> feature = 1; }
    message Feature  { oneof kind { BytesList bytes_list = 1;
                                    FloatList float_list = 2;
                                    Int64List int64_list = 3; } }
    message BytesList { repeated bytes value = 1; }
    message FloatList { repeated float value = 1 [packed]; }
    message Int64List { repeated int64 value = 1 [packed]; }

Map entries are serialized sorted by key (protobuf deterministic mode).
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Sequence, Tuple, Union

import numpy as np

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5


def encode_varint(value: int) -> bytes:
    """Unsigned LEB128; negative int64 values encode as 10-byte
    two's-complement (protobuf int64 convention)."""
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")
    return result, pos


def decode_signed_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    v, pos = decode_varint(buf, pos)
    if v >= 1 << 63:
        v -= 1 << 64
    return v, pos


def _tag(field: int, wire: int) -> bytes:
    return encode_varint((field << 3) | wire)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _tag(field, _WIRE_LEN) + encode_varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# Feature encoders
# ---------------------------------------------------------------------------

def encode_bytes_list_feature(values: Sequence[bytes]) -> bytes:
    """Feature{ bytes_list: BytesList{ value: values } }"""
    inner = b"".join(_len_delimited(1, v) for v in values)
    return _len_delimited(1, inner)


def encode_float_list_feature(values) -> bytes:
    """Feature{ float_list: FloatList{ value: packed f32 } }.

    Accepts any array-like; float64 is cast to float32 exactly as the
    protobuf runtime does (C double->float conversion).
    """
    arr = np.ascontiguousarray(values, dtype="<f4")
    payload = arr.tobytes()
    if not payload:
        # TF omits the packed field entirely for an empty list (an
        # explicit zero-length field would break byte-identity)
        return _len_delimited(2, b"")
    inner = _tag(1, _WIRE_LEN) + encode_varint(len(payload)) + payload
    return _len_delimited(2, inner)


def encode_int64_list_feature(values: Sequence[int]) -> bytes:
    """Feature{ int64_list: Int64List{ value: packed varints } }"""
    payload = b"".join(encode_varint(int(v)) for v in values)
    if not payload:
        return _len_delimited(3, b"")
    inner = _tag(1, _WIRE_LEN) + encode_varint(len(payload)) + payload
    return _len_delimited(3, inner)


def encode_example(features: Dict[str, bytes]) -> bytes:
    """Serialize Example given already-encoded Feature payloads, with map
    entries sorted by key (deterministic mode)."""
    body = bytearray()
    for key in sorted(features):
        kb = key.encode("utf-8")
        feat = features[key]
        entry = _len_delimited(1, kb) + _len_delimited(2, feat)
        body += _len_delimited(1, entry)
    return bytes(_len_delimited(1, bytes(body)))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class FeatureValue:
    """Decoded Feature: exactly one of bytes_list / float_list / int64_list.

    float_list is returned as a zero-copy float32 numpy view over the
    record buffer where alignment allows.
    """

    __slots__ = ("kind", "bytes_list", "float_list", "int64_list")

    def __init__(self, kind, bytes_list=None, float_list=None, int64_list=None):
        self.kind = kind
        self.bytes_list = bytes_list
        self.float_list = float_list
        self.int64_list = int64_list


def _iter_fields(buf, start: int, end: int) -> Iterator[Tuple[int, int, object]]:
    pos = start
    while pos < end:
        tag, pos = decode_varint(buf, pos)
        field = tag >> 3
        wire = tag & 7
        if wire == _WIRE_VARINT:
            val, pos = decode_varint(buf, pos)
            yield field, wire, val
        elif wire == _WIRE_LEN:
            ln, pos = decode_varint(buf, pos)
            yield field, wire, (pos, pos + ln)
            pos += ln
        elif wire == _WIRE_I64:
            yield field, wire, struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wire == _WIRE_I32:
            yield field, wire, struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_feature(buf, start: int, end: int) -> FeatureValue:
    for field, wire, val in _iter_fields(buf, start, end):
        if wire != _WIRE_LEN:
            continue
        s, e = val
        if field == 1:  # BytesList
            items: List[bytes] = []
            for f2, w2, v2 in _iter_fields(buf, s, e):
                if f2 == 1 and w2 == _WIRE_LEN:
                    items.append(bytes(buf[v2[0]:v2[1]]))
            return FeatureValue("bytes", bytes_list=items)
        if field == 2:  # FloatList
            # packed payloads may legally arrive in MULTIPLE length-
            # delimited segments (protobuf parsers must concatenate);
            # TF never splits, but foreign writers can
            segs = []
            for f2, w2, v2 in _iter_fields(buf, s, e):
                if f2 == 1 and w2 == _WIRE_LEN:
                    segs.append(np.frombuffer(buf, dtype="<f4",
                                              count=(v2[1] - v2[0]) // 4,
                                              offset=v2[0]))
                elif f2 == 1 and w2 == _WIRE_I32:
                    segs.append(np.frombuffer(struct.pack("<i", v2),
                                              dtype="<f4"))
            if not segs:
                floats = np.empty(0, np.float32)
            elif len(segs) == 1:
                floats = segs[0]  # zero-copy view in the common case
            else:
                floats = np.concatenate(segs)
            return FeatureValue("float", float_list=floats)
        if field == 3:  # Int64List
            ints: List[int] = []
            for f2, w2, v2 in _iter_fields(buf, s, e):
                if f2 == 1 and w2 == _WIRE_LEN:
                    p = v2[0]
                    while p < v2[1]:
                        iv, p = decode_signed_varint(buf, p)
                        ints.append(iv)
                elif f2 == 1 and w2 == _WIRE_VARINT:
                    ints.append(v2 if v2 < 1 << 63 else v2 - (1 << 64))
            return FeatureValue("int64", int64_list=ints)
    return FeatureValue("empty")


def decode_example(buf: Union[bytes, memoryview]) -> Dict[str, FeatureValue]:
    """Parse a serialized tf.train.Example into {name: FeatureValue}."""
    if isinstance(buf, memoryview):
        buf = bytes(buf)
    out: Dict[str, FeatureValue] = {}
    for field, wire, val in _iter_fields(buf, 0, len(buf)):
        if field != 1 or wire != _WIRE_LEN:
            continue
        fs, fe = val  # Features message
        for f2, w2, v2 in _iter_fields(buf, fs, fe):
            if f2 != 1 or w2 != _WIRE_LEN:
                continue
            es, ee = v2  # map entry
            key = None
            feat = None
            for f3, w3, v3 in _iter_fields(buf, es, ee):
                if f3 == 1 and w3 == _WIRE_LEN:
                    key = bytes(buf[v3[0]:v3[1]]).decode("utf-8")
                elif f3 == 2 and w3 == _WIRE_LEN:
                    feat = v3
            if key is not None and feat is not None:
                out[key] = _decode_feature(buf, feat[0], feat[1])
    return out
