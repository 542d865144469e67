"""Record codec tests: bit-identical Example serialization vs
tensorflow, TFRecord framing interop both directions, CRC32C vectors."""

import os
import struct

import numpy as np
import pytest

from dl_image_segmentation_tpu.records import proto
from dl_image_segmentation_tpu.records.crc32c import crc32c, masked_crc32c
from dl_image_segmentation_tpu.records.example import convert_to_example
from dl_image_segmentation_tpu.records.tfrecord import (
    TFRecordWriter, read_records, shard_filename)

tf = pytest.importorskip("tensorflow")


def tf_example(img, tgt, ih, iw, ib, th, tw, ident):
    """Build the Example exactly as the reference does
    (_tfrecord_image_translation.py:160-211)."""
    def bytes_f(v):
        if isinstance(v, np.ndarray):
            v = [v.tobytes()]
        elif not isinstance(v, list):
            v = [v]
        return tf.train.Feature(bytes_list=tf.train.BytesList(value=v))

    def float_f(v):
        if isinstance(v, np.ndarray):
            v = v.flatten()
        elif not isinstance(v, list):
            v = [v]
        return tf.train.Feature(float_list=tf.train.FloatList(value=v))

    def int_f(v):
        if not isinstance(v, list):
            v = [v]
        return tf.train.Feature(int64_list=tf.train.Int64List(value=v))

    image_is_bytes = isinstance(img, bytes) or (
        isinstance(img, np.ndarray) and img.dtype == "uint8")
    target_is_bytes = isinstance(tgt, bytes) or (
        isinstance(tgt, np.ndarray) and tgt.dtype == "uint8"
        and image_is_bytes)
    if image_is_bytes and target_is_bytes:
        wi, wt = bytes_f(img), bytes_f(tgt)
    else:
        wi, wt = float_f(img), float_f(tgt)
    feats = {
        "image/image_data": wi,
        "image/height": int_f(ih),
        "image/width": int_f(iw),
        "image/channels": int_f(ib),
        "target/target_data": wt,
        "target/height": int_f(th),
        "target/width": int_f(tw),
        "identifier": bytes_f(tf.compat.as_bytes(ident)),
    }
    return tf.train.Example(
        features=tf.train.Features(feature=feats))


CASES = [
    # (img, tgt) builders -> description
    ("uint8 arrays (BytesList)",
     lambda: (np.random.RandomState(0).randint(0, 255, (8, 8, 3), np.uint8),
              np.random.RandomState(1).randint(0, 2, (8, 8), np.uint8))),
    ("raw bytes both (BytesList)",
     lambda: (b"\x89PNG-fake-image-data", b"\x89PNG-fake-label")),
    ("uint16 image promotes both to FloatList",
     lambda: (np.random.RandomState(2).randint(0, 4000, (8, 8, 4), np.uint16),
              np.random.RandomState(3).randint(0, 2, (8, 8), np.uint8))),
    ("float32 arrays (FloatList)",
     lambda: (np.random.RandomState(4).rand(8, 8, 13).astype(np.float32),
              np.random.RandomState(5).rand(8, 8).astype(np.float32))),
    ("float64 arrays (FloatList, f64->f32 cast)",
     lambda: (np.random.RandomState(6).rand(4, 4, 2),
              np.random.RandomState(7).rand(4, 4))),
]


class TestExampleBitIdentical:
    @pytest.mark.parametrize("desc,builder", CASES, ids=[c[0] for c in CASES])
    def test_vs_tensorflow_deterministic(self, desc, builder):
        img, tgt = builder()
        ih, iw = 8, 8
        ib = img.shape[2] if isinstance(img, np.ndarray) and img.ndim == 3 else 3
        ident = "256:2:1.0:43:-902:8394"
        ours = convert_to_example(img, tgt, ih, iw, ib, ih, iw,
                                  ident).SerializeToString()
        theirs = tf_example(img, tgt, ih, iw, ib, ih, iw,
                            ident).SerializeToString(deterministic=True)
        assert ours == theirs

    def test_tf_can_parse_ours(self):
        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        tgt = np.ones((8, 8), np.uint8)
        rec = convert_to_example(img, tgt, 8, 8, 3, 8, 8,
                                 "k:1").SerializeToString()
        feats = tf.io.parse_single_example(rec, {
            "image/image_data": tf.io.FixedLenFeature([], tf.string),
            "image/height": tf.io.FixedLenFeature([], tf.int64),
            "identifier": tf.io.FixedLenFeature([], tf.string),
        })
        assert feats["image/height"].numpy() == 8
        assert feats["identifier"].numpy() == b"k:1"
        arr = np.frombuffer(feats["image/image_data"].numpy(), np.uint8)
        np.testing.assert_array_equal(arr, img.reshape(-1))

    def test_our_decoder_roundtrip(self):
        img = np.random.RandomState(0).rand(8, 8, 4).astype(np.float32)
        tgt = np.random.RandomState(1).randint(0, 3, (8, 8), np.uint8)
        rec = convert_to_example(img, tgt, 8, 8, 4, 8, 8,
                                 "id|gt|crs").SerializeToString()
        d = proto.decode_example(rec)
        assert set(d) == {"image/image_data", "image/height", "image/width",
                          "image/channels", "target/target_data",
                          "target/height", "target/width", "identifier"}
        assert d["image/height"].int64_list == [8]
        assert d["identifier"].bytes_list == [b"id|gt|crs"]
        np.testing.assert_array_equal(
            d["image/image_data"].float_list.reshape(8, 8, 4), img)
        # uint8 target promoted to float because image was float
        np.testing.assert_array_equal(
            d["target/target_data"].float_list.reshape(8, 8),
            tgt.astype(np.float32))


    def test_split_packed_float_segments_concatenate(self):
        # packed fields may legally arrive in multiple length-delimited
        # segments; parsers must concatenate (TF never splits, foreign
        # writers can). Build Example{features{feature{"f": FloatList}}}
        # with the 4 floats split 1+3 across two packed segments.
        vals = np.array([1.5, -2.0, 3.25, 4.0], np.float32)
        seg1, seg2 = vals[:1].tobytes(), vals[1:].tobytes()
        packed = (proto._tag(1, 2) + proto.encode_varint(len(seg1)) + seg1
                  + proto._tag(1, 2) + proto.encode_varint(len(seg2)) + seg2)
        feat = proto._len_delimited(2, packed)        # Feature.float_list
        entry = (proto._len_delimited(1, b"f")
                 + proto._len_delimited(2, feat))     # map entry
        rec = proto._len_delimited(1, proto._len_delimited(1, entry))
        d = proto.decode_example(rec)
        np.testing.assert_array_equal(d["f"].float_list, vals)


class TestVarint:
    @pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2 ** 32, 2 ** 63 - 1,
                                   -1, -2 ** 63])
    def test_roundtrip(self, v):
        enc = proto.encode_varint(v)
        dec, pos = proto.decode_signed_varint(enc, 0)
        assert dec == v and pos == len(enc)


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 / kernel test vectors
        assert crc32c(b"") == 0
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_unaligned_lengths(self):
        rng = np.random.RandomState(0)
        data = rng.randint(0, 256, 1000, np.uint8).tobytes()
        for n in (0, 1, 7, 8, 9, 63, 64, 65, 999, 1000):
            # incremental == one-shot (slicing path consistency)
            whole = crc32c(data[:n])
            ref = _bitwise_crc32c(data[:n])
            assert whole == ref, n


def _bitwise_crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


class TestTFRecordFraming:
    def test_tf_reads_our_file(self, tmp_path):
        path = str(tmp_path / "ours.tfrecord")
        payloads = [b"hello", b"world" * 100, b""]
        with TFRecordWriter(path) as w:
            for p in payloads:
                w.write(p)
        got = [r.numpy() for r in tf.data.TFRecordDataset([path])]
        assert got == payloads

    def test_we_read_tf_file(self, tmp_path):
        path = str(tmp_path / "theirs.tfrecord")
        payloads = [b"alpha", b"beta" * 50]
        with tf.io.TFRecordWriter(path) as w:
            for p in payloads:
                w.write(p)
        assert list(read_records(path)) == payloads

    def test_bytes_identical_to_tf(self, tmp_path):
        ours = str(tmp_path / "a")
        theirs = str(tmp_path / "b")
        payload = os.urandom(1000)
        with TFRecordWriter(ours) as w:
            w.write(payload)
        with tf.io.TFRecordWriter(theirs) as w:
            w.write(payload)
        assert open(ours, "rb").read() == open(theirs, "rb").read()

    def test_corruption_detected(self, tmp_path):
        path = str(tmp_path / "c.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(b"payload-data")
        raw = bytearray(open(path, "rb").read())
        raw[15] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(read_records(path))

    def test_shard_naming(self):
        assert shard_filename("train", 2, 10) == "train-00002-of-00010"


def test_list_shards_skips_tmp(tmp_path):
    from dl_image_segmentation_tpu.records.tfrecord import (TFRecordWriter,
                                                            list_shards)
    for i in range(2):
        with TFRecordWriter(str(tmp_path / ("d-%.5d-of-00002" % i))) as w:
            w.write(b"x")
    (tmp_path / "d-00009-of-00002.tmp").write_bytes(b"torn")
    out = list_shards(str(tmp_path), "d")
    assert len(out) == 2 and not any(f.endswith(".tmp") for f in out)


class TestEmptyListFeatures:
    def test_empty_float_and_int64_lists_match_tf(self):
        """TF omits the packed field for empty lists; an explicit
        zero-length field diverges byte-for-byte (regression)."""
        tf = pytest.importorskip("tensorflow")
        from dl_image_segmentation_tpu.records import proto
        ours_f = proto.encode_float_list_feature([])
        tf_f = tf.train.Feature(float_list=tf.train.FloatList(
            value=[])).SerializeToString(deterministic=True)
        assert ours_f == tf_f
        ours_i = proto.encode_int64_list_feature([])
        tf_i = tf.train.Feature(int64_list=tf.train.Int64List(
            value=[])).SerializeToString(deterministic=True)
        assert ours_i == tf_i


class TestTruncatedShardEdges:
    def test_truncation_inside_crc_raises_ioerror(self, tmp_path):
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter, read_records)
        p = str(tmp_path / "s")
        with TFRecordWriter(p) as w:
            w.write(b"payload-bytes")
        data = open(p, "rb").read()
        # cut inside the header CRC (8 header bytes + 2)
        open(p, "wb").write(data[:10])
        with pytest.raises(IOError):
            list(read_records(p))
        # cut inside the data CRC (8 + 4 + payload + 2)
        open(p, "wb").write(data[:8 + 4 + 13 + 2])
        with pytest.raises(IOError):
            list(read_records(p))
