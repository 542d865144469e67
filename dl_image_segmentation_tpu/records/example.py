"""Example codec: (image, label) pair -> serialized tf.train.Example.

Re-implements the reference's convert_to_example
(/root/reference/dl_segmentation_utils/_tfrecord_image_translation.py:55-211)
with bit-identical output (deterministic map ordering), including its
storage-promotion rule (:160-197):

* the image qualifies for bytes storage if it is a raw ``bytes`` object
  OR a uint8 ndarray;
* the target qualifies if it is raw ``bytes`` OR a uint8 ndarray *and*
  the image already qualified;
* both are stored as BytesList only if BOTH qualify, otherwise both are
  stored as (float32) FloatList.

Schema (:199-209):
    image/image_data, image/height, image/width, image/channels,
    target/target_data, target/height, target/width, identifier
"""

from __future__ import annotations

import numpy as np

from . import proto


class Example:
    """A serialized-on-construction Example with a TF-compatible
    SerializeToString(), so call sites written against tf.train.Example
    keep working."""

    __slots__ = ("_data",)

    def __init__(self, data: bytes):
        self._data = data

    def SerializeToString(self) -> bytes:  # noqa: N802 (TF API compat)
        return self._data

    def __bytes__(self) -> bytes:
        return self._data

    def __len__(self) -> int:
        return len(self._data)


def _is_uint8_array(x) -> bool:
    return isinstance(x, np.ndarray) and x.dtype == np.uint8


def _as_flat_float(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return np.ascontiguousarray(x).reshape(-1)
    return np.asarray([x], dtype=np.float32).reshape(-1)


def _as_bytes_payload(x) -> bytes:
    if isinstance(x, bytes):
        return x
    if isinstance(x, np.ndarray):
        return np.ascontiguousarray(x).tobytes()
    raise TypeError(f"cannot store {type(x)!r} as bytes feature")


def encode_example_features(img_data, target_data, img_h, img_w, img_b,
                            target_h, target_w, identifier) -> bytes:
    """Serialize the 8-feature Example. Returns raw bytes."""
    image_is_bytes = isinstance(img_data, bytes) or _is_uint8_array(img_data)
    target_is_bytes = isinstance(target_data, bytes) or (
        _is_uint8_array(target_data) and image_is_bytes)

    if image_is_bytes and target_is_bytes:
        img_feat = proto.encode_bytes_list_feature(
            [_as_bytes_payload(img_data)])
        tgt_feat = proto.encode_bytes_list_feature(
            [_as_bytes_payload(target_data)])
    else:
        img_feat = proto.encode_float_list_feature(_as_flat_float(img_data))
        tgt_feat = proto.encode_float_list_feature(_as_flat_float(target_data))

    if isinstance(identifier, str):
        identifier = identifier.encode("utf-8")

    features = {
        "image/image_data": img_feat,
        "image/height": proto.encode_int64_list_feature([int(img_h)]),
        "image/width": proto.encode_int64_list_feature([int(img_w)]),
        "image/channels": proto.encode_int64_list_feature([int(img_b)]),
        "target/target_data": tgt_feat,
        "target/height": proto.encode_int64_list_feature([int(target_h)]),
        "target/width": proto.encode_int64_list_feature([int(target_w)]),
        "identifier": proto.encode_bytes_list_feature([identifier]),
    }
    return proto.encode_example(features)


def storage_payloads(img_data, target_data):
    """Apply the promotion rule and materialise wire payloads.

    Returns (img_payload, tgt_payload, is_bytes): raw bytes for
    BytesList storage, little-endian float32 bytes for FloatList."""
    image_is_bytes = isinstance(img_data, bytes) or _is_uint8_array(img_data)
    target_is_bytes = isinstance(target_data, bytes) or (
        _is_uint8_array(target_data) and image_is_bytes)
    if image_is_bytes and target_is_bytes:
        return (_as_bytes_payload(img_data),
                _as_bytes_payload(target_data), True)
    img = np.ascontiguousarray(_as_flat_float(img_data),
                               dtype="<f4").tobytes()
    tgt = np.ascontiguousarray(_as_flat_float(target_data),
                               dtype="<f4").tobytes()
    return img, tgt, False


def write_example_framed(fileobj, img_data, target_data, img_h, img_w,
                         img_b, target_h, target_w, identifier) -> int:
    """Serialize + frame one example straight into an open file.

    Uses the fused native encoder (one memcpy + one CRC pass) when
    built; otherwise the Python encoder + framer. Output bytes are
    identical either way. Returns bytes written."""
    from .. import _native
    if isinstance(identifier, str):
        identifier = identifier.encode("utf-8")
    mv = None
    if _native.available():
        # payloads are only materialized for the native encoder; the
        # Python fallback recomputes them inside
        # encode_example_features, and a float chip's byte copy is not
        # free on that already-slower path
        img_p, tgt_p, is_bytes = storage_payloads(img_data, target_data)
        mv = _native.encode_example_framed_view(
            img_p, is_bytes, tgt_p, is_bytes,
            int(img_h), int(img_w), int(img_b),
            int(target_h), int(target_w), identifier)
    from .tfrecord import writeall
    if mv is not None:
        writeall(fileobj, mv)
        return len(mv)
    rec = encode_example_features(img_data, target_data, img_h, img_w,
                                  img_b, target_h, target_w, identifier)
    import struct
    from .crc32c import masked_crc32c
    header = struct.pack("<Q", len(rec))
    writeall(fileobj, header)
    writeall(fileobj, struct.pack("<I", masked_crc32c(header)))
    writeall(fileobj, rec)
    writeall(fileobj, struct.pack("<I", masked_crc32c(rec)))
    return len(rec) + 16


def convert_to_example(img_data, target_data, img_h, img_w, img_b,
                       target_h, target_w, identifier) -> Example:
    """Drop-in equivalent of the reference convert_to_example
    (_tfrecord_image_translation.py:55): returns an object whose
    SerializeToString() yields the serialized Example.

    img_data / target_data may be raw encoded ``bytes`` (PNG/JPG/GeoTIFF
    file content) or numpy ndarrays. uint8 arrays (and raw bytes) are
    stored as BytesList; anything else as float32 FloatList -- with the
    both-or-neither promotion rule documented in the module docstring.
    TF/JAX tensors are accepted and converted via numpy, matching the
    reference's tensor handling (:166, 183).
    """
    if not isinstance(img_data, (bytes, np.ndarray)):
        img_data = np.asarray(img_data)
    if not isinstance(target_data, (bytes, np.ndarray)):
        target_data = np.asarray(target_data)
    return Example(encode_example_features(
        img_data, target_data, img_h, img_w, img_b,
        target_h, target_w, identifier))
