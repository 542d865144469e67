"""TFRecord example parsers: the five storage-mode parse functions.

Mirrors /root/reference/dl_segmentation_utils/
_tfrecord_image_translation.py:214-415 with numpy outputs (the
reference returns TF tensors; this framework's training feed converts
batches to JAX arrays on device in pipeline/input.py).

The five on-disk storage modes (parse nb cell 1):
  'rgbraw'  encoded PNG/JPG bytes      -> parse_encoded_rgb_img_proto
  'rgbarr'  uint8 array bytes          -> parse_8bit_array_proto
  'tifraw'  encoded GeoTIFF bytes      -> parse_encoded_gdal_proto_wrapped
                                          / parse_encoded_gdal_proto_eager
  'tifarr'  float32 FloatList arrays   -> parse_higher_dtype_array_proto

Feature templates are exposed both as framework-native spec dicts and,
when tensorflow is importable, as genuine tf.io templates so existing
tf.data pipelines keep working unchanged.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import proto
from ..raster.image import decode_image, decode_image_bytes

# ---------------------------------------------------------------------------
# feature templates (reference :214-241)
# ---------------------------------------------------------------------------

_BYTES_TEMPLATE_SPEC = {
    "image/image_data": ("fixed", "string"),
    "image/height": ("fixed", "int64"),
    "image/width": ("fixed", "int64"),
    "image/channels": ("fixed", "int64"),
    "target/target_data": ("fixed", "string"),
    "target/height": ("fixed", "int64"),
    "target/width": ("fixed", "int64"),
    "identifier": ("fixed", "string"),
}

_ARRAY_TEMPLATE_SPEC = {
    "image/image_data": ("var", "float32"),
    "image/height": ("fixed", "int64"),
    "image/width": ("fixed", "int64"),
    "image/channels": ("fixed", "int64"),
    "target/target_data": ("var", "float32"),
    "target/height": ("fixed", "int64"),
    "target/width": ("fixed", "int64"),
    "identifier": ("fixed", "string"),
}


def _build_templates():
    """tf.io templates when TF is available, spec dicts otherwise."""
    try:
        import tensorflow as tf  # noqa: F401
    except Exception:
        return dict(_BYTES_TEMPLATE_SPEC), dict(_ARRAY_TEMPLATE_SPEC)
    import tensorflow as tf

    def conv(spec):
        out = {}
        for k, (kind, dt) in spec.items():
            if kind == "fixed":
                out[k] = tf.io.FixedLenFeature(
                    [], tf.string if dt == "string" else tf.int64)
            else:
                out[k] = tf.io.FixedLenSequenceFeature(
                    [], dtype=tf.float32, allow_missing=True)
        return out

    return conv(_BYTES_TEMPLATE_SPEC), conv(_ARRAY_TEMPLATE_SPEC)


_templates_cache = None


def _templates():
    global _templates_cache
    if _templates_cache is None:
        _templates_cache = _build_templates()
    return _templates_cache


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------

def _parse_byteslist_proto(example_proto: bytes):
    """Shared bytes-mode pre-parse (reference :244-266). Returns
    (img_bytes, (ih,iw,ic), target_bytes, (th,tw), identifier)."""
    d = proto.decode_example(example_proto)
    ih = int(d["image/height"].int64_list[0])
    iw = int(d["image/width"].int64_list[0])
    ic = int(d["image/channels"].int64_list[0])
    th = int(d["target/height"].int64_list[0])
    tw = int(d["target/width"].int64_list[0])
    img_bytes = d["image/image_data"].bytes_list[0]
    tgt_bytes = d["target/target_data"].bytes_list[0]
    identifier = d["identifier"].bytes_list[0]
    return img_bytes, (ih, iw, ic), tgt_bytes, (th, tw), identifier


def parse_encoded_rgb_img_proto(example_proto: bytes
                                ) -> Tuple[np.ndarray, np.ndarray, bytes]:
    """Encoded PNG/JPG image + label bytes -> decoded arrays
    (reference :269-293). Returns (img, target, identifier)."""
    img_bytes, _ishp, tgt_bytes, _tshp, identifier = (
        _parse_byteslist_proto(example_proto))
    img_arr = decode_image(img_bytes)
    target_arr = decode_image(tgt_bytes)
    return img_arr, target_arr, identifier


def parse_8bit_array_proto(example_proto: bytes
                           ) -> Tuple[np.ndarray, np.ndarray, bytes]:
    """Raw uint8 array bytes -> reshaped arrays (reference :296-316)."""
    img_bytes, im_shp, tgt_bytes, tgt_shp, identifier = (
        _parse_byteslist_proto(example_proto))
    img_1d = np.frombuffer(img_bytes, dtype=np.uint8)
    assert img_1d.shape[0] == im_shp[0] * im_shp[1] * im_shp[2], \
        "Decoded shape is %r - does not match" % (img_1d.shape,)
    img_arr = img_1d.reshape(im_shp)
    tgt_1d = np.frombuffer(tgt_bytes, dtype=np.uint8)
    assert tgt_1d.shape[0] == tgt_shp[0] * tgt_shp[1]
    target_arr = tgt_1d.reshape(tgt_shp)
    return img_arr, target_arr, identifier


def _decode_f32(data: bytes) -> np.ndarray:
    """Raster bytes -> float32 array: single-pass C++ TIFF decode when
    the container is in the chip-contract subset, Python codecs
    otherwise."""
    from .. import _native
    if _native.available():
        out = _native.tiff_decode_f32(data)
        if out is not None:
            return out
    return decode_image_bytes(data).array.astype(np.float32)


def parse_encoded_gdal_proto_wrapped(example_proto: bytes
                                     ) -> Tuple[np.ndarray, np.ndarray, bytes]:
    """Encoded any-format raster bytes -> float32 arrays (reference
    :332-346; fixed float32 output like the tf.numpy_function wrapper).
    Unlike the reference's GDAL path, decode happens in our C++/PIL
    codecs which release the GIL, so this is pipeline-safe."""
    img_bytes, _ishp, tgt_bytes, _tshp, identifier = (
        _parse_byteslist_proto(example_proto))
    img_arr = _decode_f32(img_bytes)
    target_arr = _decode_f32(tgt_bytes)
    return img_arr, target_arr, identifier


def parse_encoded_gdal_proto_eager(example_proto: bytes
                                   ) -> Tuple[np.ndarray, np.ndarray, bytes]:
    """Encoded any-format raster bytes -> arrays in the SOURCE dtype
    (reference :349-386)."""
    img_bytes, im_shp, tgt_bytes, tgt_shp, identifier = (
        _parse_byteslist_proto(example_proto))
    img_arr = decode_image_bytes(img_bytes).array
    assert img_arr.shape == im_shp
    target_arr = decode_image_bytes(tgt_bytes).array
    assert target_arr.shape[0] == tgt_shp[0]
    assert target_arr.shape[1] == tgt_shp[1]
    return img_arr, target_arr, identifier


def parse_higher_dtype_array_proto(example_proto: bytes
                                   ) -> Tuple[np.ndarray, np.ndarray, bytes]:
    """FloatList arrays -> reshaped float32 arrays (reference :389-415).
    Image is (h, w, c); target is (h, w)."""
    d = proto.decode_example(example_proto)
    ih = int(d["image/height"].int64_list[0])
    iw = int(d["image/width"].int64_list[0])
    ic = int(d["image/channels"].int64_list[0])
    th = int(d["target/height"].int64_list[0])
    tw = int(d["target/width"].int64_list[0])
    img_raw = d["image/image_data"].float_list.reshape(ih, iw, ic)
    target_raw = d["target/target_data"].float_list.reshape(th, tw)
    identifier = d["identifier"].bytes_list[0]
    return img_raw, target_raw, identifier


# Legacy aliases: the reference's docstrings and parse notebook use
# pre-rename function names (parse_gdal_example_py / _tf,
# parse_8bit_array_example, parse_encoded_rgb_img_example,
# parse_higher_example -- _tfrecord_image_translation.py:107,122,132
# and parse_tfrecords.ipynb cells 16/19/30); kept working here.
parse_gdal_example_py = parse_encoded_gdal_proto_eager
parse_gdal_example_tf = parse_encoded_gdal_proto_wrapped
parse_8bit_array_example = parse_8bit_array_proto
parse_encoded_rgb_img_example = parse_encoded_rgb_img_proto
parse_higher_example = parse_higher_dtype_array_proto


def __getattr__(name):
    """Lazy attributes: the graph-mode ``*_tf`` parser variants (in
    parsers_tf.py) and the feature templates. Both would otherwise
    import TensorFlow (~5 s, ~1 GB RSS) at module import time even for
    the pure-numpy training feed, which only needs PARSE_FNS."""
    if name.startswith("parse_") and name.endswith("_tf"):
        from . import parsers_tf
        return getattr(parsers_tf, name)
    if name == "featuretemplate_bytestring_imagechip":
        return _templates()[0]
    if name == "featuretemplate_ndarray_imagechip":
        return _templates()[1]
    raise AttributeError(name)
