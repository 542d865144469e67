"""End-to-end chips -> TFRecords -> parse tests covering all five
storage modes, with TF interop checks (tf.data reads our shards, our
parsers match tf.io parsing)."""

import glob
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.records.writers import (
    images_to_tfrecords_mp, images_to_tfrecords_mt)
from dl_image_segmentation_tpu.records.tfrecord import read_records
from dl_image_segmentation_tpu.records import parsers
from dl_image_segmentation_tpu.raster.image import encode_png
from dl_image_segmentation_tpu.raster.geotiff import write_geotiff


def make_png_dataset(root, n=12, size=32, seed=0):
    """Synthetic uint8 RGB chip folder with DLTile-key filenames."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    truth = {}
    for i in range(n):
        key = f"{size}:2:10.0:43:{-900 + i}:8394"
        fn = key.replace(":", "#") + ".png"
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        lbl = rng.randint(0, 2, (size, size), np.uint8)
        with open(os.path.join(root, "images", fn), "wb") as f:
            f.write(encode_png(img))
        with open(os.path.join(root, "labels", fn), "wb") as f:
            f.write(encode_png(lbl[:, :, None]))
        truth[key] = (img, lbl)
    return truth


def make_tif_dataset(root, n=8, size=24, bands=4, dtype=np.uint16, seed=1):
    """Synthetic multi-band GeoTIFF chip folder (Sentinel-2 style)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    truth = {}
    for i in range(n):
        key = f"{size}:2:10.0:43:{-800 + i}:8400"
        fn = key.replace(":", "#") + ".tif"
        img = rng.randint(0, 4000, (size, size, bands)).astype(dtype)
        lbl = rng.randint(0, 3, (size, size)).astype(np.uint8)
        gt = (272696.0 + i * 240, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        write_geotiff(os.path.join(root, "images", fn), img,
                      geotransform=gt, epsg=32643)
        write_geotiff(os.path.join(root, "labels", fn), lbl,
                      geotransform=gt, epsg=32643, nodata=255)
        truth[key] = (img, lbl)
    return truth


class TestMTWriter:
    def test_rgbraw_roundtrip(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_png_dataset(root)
        n = images_to_tfrecords_mt("train", root, out, num_shards=4,
                                   num_threads=2, store_as_array=False)
        assert n == len(truth)
        shards = sorted(glob.glob(os.path.join(out, "train-*")))
        assert len(shards) == 4
        assert shards[0].endswith("train-00000-of-00004")
        seen = set()
        for s in shards:
            for rec in read_records(s):
                img, lbl, ident = parsers.parse_encoded_rgb_img_proto(rec)
                key = ident.decode()
                exp_img, exp_lbl = truth[key]
                np.testing.assert_array_equal(img, exp_img)
                np.testing.assert_array_equal(lbl[:, :, 0], exp_lbl)
                seen.add(key)
        assert seen == set(truth)

    def test_rgbarr_roundtrip(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_png_dataset(root)
        images_to_tfrecords_mt("train", root, out, num_shards=2,
                               num_threads=1, store_as_array=True)
        for s in glob.glob(os.path.join(out, "train-*")):
            for rec in read_records(s):
                img, lbl, ident = parsers.parse_8bit_array_proto(rec)
                exp_img, exp_lbl = truth[ident.decode()]
                np.testing.assert_array_equal(img, exp_img)
                np.testing.assert_array_equal(lbl, exp_lbl)

    def test_native_rejection_preserves_record_set(self, tmp_path,
                                                    monkeypatch):
        """Documented deviation (records/writers.py native path): a
        pair the C++ engine rejects is retried through the Python path
        and lands at the END of the shard rather than at its shuffled
        position. The record SET must be bit-identical to a pure-Python
        run; only the order may differ."""
        from dl_image_segmentation_tpu import _native
        if not _native.available():
            pytest.skip("native extension unavailable")
        root = str(tmp_path / "chips")
        truth = make_tif_dataset(root, n=6)
        # rewrite one mid-list image as Deflate: outside the native
        # none/LZW TIFF subset, so fc_write_shard_tifarr rejects it
        keys = sorted(truth)
        odd = keys[2]
        fn = odd.replace(":", "#") + ".tif"
        gt = (272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        write_geotiff(os.path.join(root, "images", fn), truth[odd][0],
                      geotransform=gt, epsg=32643, compress="deflate")

        out_native = str(tmp_path / "recs_native")
        n1 = images_to_tfrecords_mp("t", root, out_native, num_shards=1,
                                    num_proc=1, store_as_array=True)
        monkeypatch.setattr(_native, "available", lambda: False)
        out_py = str(tmp_path / "recs_py")
        n2 = images_to_tfrecords_mp("t", root, out_py, num_shards=1,
                                    num_proc=1, store_as_array=True)
        assert n1 == n2 == 6
        rec_n = list(read_records(
            os.path.join(out_native, "t-00000-of-00001")))
        rec_p = list(read_records(
            os.path.join(out_py, "t-00000-of-00001")))
        # set identity, bit-exact records
        assert sorted(rec_n) == sorted(rec_p)
        # the rejected pair is the LAST native record; in the Python
        # run it sits at its seed-12345 shuffled position
        _, _, last_ident = parsers.parse_higher_dtype_array_proto(
            rec_n[-1])
        assert last_ident.decode() == odd
        py_pos = [parsers.parse_higher_dtype_array_proto(r)[2].decode()
                  for r in rec_p].index(odd)
        assert py_pos != len(rec_p) - 1  # genuinely reordered

    def test_shard_divisibility_enforced(self, tmp_path):
        root = str(tmp_path / "chips")
        make_png_dataset(root, n=4)
        with pytest.raises(AssertionError):
            images_to_tfrecords_mt("t", root, str(tmp_path / "o"),
                                   num_shards=3, num_threads=2)

    def test_mispaired_folders_fail_loudly(self, tmp_path):
        root = str(tmp_path / "chips")
        make_png_dataset(root, n=4)
        # remove one label
        lbl = sorted(os.listdir(os.path.join(root, "labels")))[0]
        os.remove(os.path.join(root, "labels", lbl))
        with pytest.raises(FileNotFoundError):
            images_to_tfrecords_mt("t", root, str(tmp_path / "o"),
                                   num_shards=1, num_threads=1)


class TestMPWriter:
    def test_tifarr_roundtrip(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_tif_dataset(root)
        n = images_to_tfrecords_mp("s2", root, out, num_shards=4,
                                   num_proc=4, store_as_array=True)
        assert n == len(truth)
        for s in glob.glob(os.path.join(out, "s2-*")):
            for rec in read_records(s):
                img, lbl, ident = parsers.parse_higher_dtype_array_proto(rec)
                exp_img, exp_lbl = truth[ident.decode()]
                np.testing.assert_array_equal(img, exp_img.astype(np.float32))
                np.testing.assert_array_equal(lbl, exp_lbl.astype(np.float32))

    def test_tifraw_roundtrip_both_parsers(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_tif_dataset(root)
        images_to_tfrecords_mp("s2", root, out, num_shards=2,
                               num_proc=1, store_as_array=False)
        for s in glob.glob(os.path.join(out, "s2-*")):
            for rec in read_records(s):
                img, lbl, ident = parsers.parse_encoded_gdal_proto_eager(rec)
                exp_img, exp_lbl = truth[ident.decode()]
                assert img.dtype == np.uint16  # source dtype preserved
                np.testing.assert_array_equal(img, exp_img)
                np.testing.assert_array_equal(lbl[:, :, 0], exp_lbl)
                imgf, lblf, _ = parsers.parse_encoded_gdal_proto_wrapped(rec)
                assert imgf.dtype == np.float32  # wrapped: fixed f32
                np.testing.assert_array_equal(
                    imgf, exp_img.astype(np.float32))

    def test_identifier_gt_crs_variant(self, tmp_path):
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        make_tif_dataset(root, n=2)
        images_to_tfrecords_mp("s2", root, out, num_shards=1, num_proc=1,
                               dltile_from_filename=False,
                               store_as_array=False)
        recs = []
        for s in glob.glob(os.path.join(out, "s2-*")):
            recs.extend(read_records(s))
        for rec in recs:
            _, _, ident = parsers.parse_encoded_gdal_proto_eager(rec)
            parts = ident.decode().split("|")
            assert len(parts) == 3
            assert parts[0].endswith(".tif")
            assert parts[2] == "EPSG:32643"
            gt = eval(parts[1])  # noqa: S307 - test-only
            assert gt[1] == 10.0 and gt[5] == -10.0


class TestTFInterop:
    def test_tfdata_reads_our_shards(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_png_dataset(root, n=6)
        images_to_tfrecords_mt("train", root, out, num_shards=2,
                               num_threads=1, store_as_array=False)
        shards = sorted(glob.glob(os.path.join(out, "train-*")))
        ds = tf.data.TFRecordDataset(shards)
        count = 0
        for raw in ds:
            feats = tf.io.parse_single_example(
                raw.numpy(), parsers.featuretemplate_bytestring_imagechip)
            img = tf.io.decode_image(feats["image/image_data"],
                                     expand_animations=False).numpy()
            key = feats["identifier"].numpy().decode()
            np.testing.assert_array_equal(img, truth[key][0])
            count += 1
        assert count == len(truth)

    def test_tf_template_parses_array_mode(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_tif_dataset(root, n=2)
        images_to_tfrecords_mp("s2", root, out, num_shards=1, num_proc=1,
                               store_as_array=True)
        shards = glob.glob(os.path.join(out, "s2-*"))
        for raw in tf.data.TFRecordDataset(shards):
            feats = tf.io.parse_single_example(
                raw.numpy(), parsers.featuretemplate_ndarray_imagechip)
            h = int(feats["image/height"].numpy())
            w = int(feats["image/width"].numpy())
            c = int(feats["image/channels"].numpy())
            img = feats["image/image_data"].numpy().reshape(h, w, c)
            key = feats["identifier"].numpy().decode()
            np.testing.assert_array_equal(
                img, truth[key][0].astype(np.float32))


class TestFailureProtocol:
    def test_corrupt_file_skipped(self, tmp_path, capsys):
        """A garbage file in images/ is skipped with a message and the
        rest of the dataset still writes (reference skip protocol,
        _img_to_tf_mp.py:127-136)."""
        root = str(tmp_path / "chips")
        truth = make_png_dataset(root, n=4)
        bad = os.path.join(root, "images", "64#0#10.0#43#1#1.png")
        with open(bad, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\nnot really a png")
        with open(os.path.join(root, "labels",
                               os.path.basename(bad)), "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\nnot really a png")
        out = str(tmp_path / "recs")
        n = images_to_tfrecords_mt("t", root, out, num_shards=1,
                                   num_threads=1, store_as_array=True)
        assert n == len(truth)  # corrupt pair skipped, others written
        assert "SKIPPED" in capsys.readouterr().out


class TestHostSharding:
    def test_host_shard_files_partition(self, monkeypatch):
        import jax
        from dl_image_segmentation_tpu.pipeline.input import (
            host_shard_files)
        files = [f"s-{i:05d}" for i in range(10)]
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        got = []
        for pidx in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
            got.append(host_shard_files(files))
        # disjoint, complete, round-robin
        flat = [f for g in got for f in g]
        assert sorted(flat) == files
        assert got[0] == ["s-00000", "s-00004", "s-00008"]


class TestMultiHostWriter:
    def test_hosts_produce_identical_union(self, tmp_path):
        """Running per-host partitions produces exactly the shards a
        single-host run produces."""
        root = str(tmp_path / "chips")
        truth = make_png_dataset(root, n=8)
        single = str(tmp_path / "single")
        images_to_tfrecords_mt("t", root, single, num_shards=4,
                               num_threads=2, store_as_array=True)
        multi = str(tmp_path / "multi")
        for h in range(2):
            images_to_tfrecords_mt("t", root, multi, num_shards=4,
                                   num_threads=2, store_as_array=True,
                                   host_index=h, host_count=2)
        s_files = sorted(os.listdir(single))
        m_files = sorted(os.listdir(multi))
        assert s_files == m_files
        for f in s_files:
            a = open(os.path.join(single, f), "rb").read()
            b = open(os.path.join(multi, f), "rb").read()
            assert a == b, f


class TestAtomicAndResume:
    def test_no_tmp_left_and_resume_skips(self, tmp_path, capsys):
        root = str(tmp_path / "chips")
        make_png_dataset(root, n=8)
        out = str(tmp_path / "recs")
        images_to_tfrecords_mt("t", root, out, num_shards=2,
                               num_threads=1, store_as_array=True)
        files = sorted(os.listdir(out))
        assert files == ["t-00000-of-00002", "t-00001-of-00002"]
        assert not any(f.endswith(".tmp") for f in files)
        # delete one shard; resume rewrites only that one
        mtime0 = os.path.getmtime(os.path.join(out, files[0]))
        os.remove(os.path.join(out, files[1]))
        n = images_to_tfrecords_mt("t", root, out, num_shards=2,
                                   num_threads=1, store_as_array=True,
                                   resume=True)
        assert n == 4  # only the missing shard's examples rewritten
        assert os.path.getmtime(os.path.join(out, files[0])) == mtime0
        assert os.path.exists(os.path.join(out, files[1]))


class TestFormatGuardrails:
    """Failures stay loud and NAMED (VERDICT r1 #8), across both
    regimes: truly unknown containers raise UnsupportedFormatError,
    and CORRUPT files of recognized formats raise CorruptRasterError
    naming the format (every container in this class became a
    supported format during rounds 3-4); the writer summary reports
    skip counts either way."""

    HDF = b"\x89HDF\r\n\x1a\n" + b"\x00" * 64

    def test_sniff_names_the_format(self):
        from dl_image_segmentation_tpu.raster.image import (
            CorruptRasterError, sniff_image_info)
        with pytest.raises(CorruptRasterError, match="HDF5"):
            sniff_image_info(self.HDF)
        with pytest.raises(CorruptRasterError, match="NetCDF"):
            sniff_image_info(b"CDF\x01" + b"\x00" * 32)
        with pytest.raises(CorruptRasterError, match="VRT"):
            sniff_image_info(b"<VRTDataset rasterXSize='4'>")

    def test_decode_names_the_format(self):
        from dl_image_segmentation_tpu.raster.image import (
            CorruptRasterError, UnsupportedFormatError,
            decode_image_bytes)
        with pytest.raises(CorruptRasterError, match="HDF5"):
            decode_image_bytes(self.HDF)
        with pytest.raises(UnsupportedFormatError, match="unknown"):
            decode_image_bytes(b"\x00\x11\x22\x33" + bytes(32))

    def test_writer_summary_reports_skips(self, tmp_path, capsys):
        from dl_image_segmentation_tpu.raster.image import encode_png
        root = tmp_path / "chips"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.RandomState(0)
        for i in range(3):
            name = f"64#0#10.0#43#-{i}#5.tif"
            if i == 0:  # one HDF5 blob masquerading under .tif
                (root / "images" / name).write_bytes(self.HDF)
            else:
                img = rng.randint(0, 255, (16, 16, 3), np.uint8)
                (root / "images" / name).write_bytes(encode_png(img))
            lbl = rng.randint(0, 2, (16, 16, 1), np.uint8)
            (root / "labels" / name).write_bytes(encode_png(lbl))
        n = images_to_tfrecords_mp("t", str(root), str(tmp_path / "recs"),
                                   num_shards=1, num_proc=1,
                                   store_as_array=True)
        assert n == 2
        out = capsys.readouterr().out
        assert "1 file(s) skipped" in out
        assert "HDF5" in out


class TestGraphModeParsers:
    """The exported *_proto_tf graph-mode parse functions are drop-ins
    for the reference's ds.map(parse_fn, 8) flow (parse nb cells 30-33)
    and match the numpy parsers byte-for-byte."""

    def _map_and_compare(self, tmp_path, writer_kwargs, mode, tf_fn_name,
                         np_fn, dataset=make_png_dataset, cast=None):
        tf = pytest.importorskip("tensorflow")
        from dl_image_segmentation_tpu.records import parsers_tf
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        dataset(root)
        images_to_tfrecords_mt("t", root, out, num_shards=1,
                               num_threads=1, **writer_kwargs) \
            if "mt" == mode else images_to_tfrecords_mp(
                "t", root, out, num_shards=1, num_proc=1, **writer_kwargs)
        files = sorted(glob.glob(os.path.join(out, "t-*")))
        tf_fn = getattr(parsers_tf, tf_fn_name)
        ds = tf.data.TFRecordDataset(files).map(tf_fn,
                                                num_parallel_calls=8)
        tf_out = list(ds)
        np_out = [np_fn(r) for f in files for r in read_records(f)]
        assert len(tf_out) == len(np_out)
        for (ti, tt, tid), (ni, nt, nid) in zip(tf_out, np_out):
            np.testing.assert_array_equal(ti.numpy(),
                                          np.asarray(ni, ti.numpy().dtype))
            tgt = tt.numpy()
            ntgt = np.asarray(nt, tgt.dtype)
            # only a trailing singleton band axis may differ between
            # the tf and numpy parsers; any other rank mismatch is a
            # parser regression the squeeze must not mask
            assert tgt.squeeze().shape == ntgt.squeeze().shape, \
                (tgt.shape, ntgt.shape)
            np.testing.assert_array_equal(tgt.squeeze(), ntgt.squeeze())
            assert tid.numpy() == nid

    def test_rgbraw_graph_mode(self, tmp_path):
        self._map_and_compare(
            tmp_path, {}, "mt", "parse_encoded_rgb_img_proto_tf",
            parsers.parse_encoded_rgb_img_proto)

    def test_rgbarr_graph_mode(self, tmp_path):
        self._map_and_compare(
            tmp_path, {"store_as_array": True}, "mt",
            "parse_8bit_array_proto_tf", parsers.parse_8bit_array_proto)

    def test_tifarr_graph_mode(self, tmp_path):
        self._map_and_compare(
            tmp_path, {"store_as_array": True}, "mp",
            "parse_higher_dtype_array_proto_tf",
            parsers.parse_higher_dtype_array_proto,
            dataset=make_tif_dataset)

    def test_tifraw_graph_mode_numpy_function(self, tmp_path):
        self._map_and_compare(
            tmp_path, {"store_as_array": False}, "mp",
            "parse_encoded_gdal_proto_wrapped_tf",
            parsers.parse_encoded_gdal_proto_wrapped,
            dataset=make_tif_dataset)

    def test_facade_exports(self):
        import dl_image_segmentation_tpu as pkg
        for n in ("parse_encoded_rgb_img_proto_tf",
                  "parse_8bit_array_proto_tf",
                  "parse_higher_dtype_array_proto_tf",
                  "parse_encoded_gdal_proto_wrapped_tf"):
            assert callable(getattr(pkg, n))
            from dl_image_segmentation_tpu.records import parsers as P
            assert callable(getattr(P, n))


class TestMappedShardAssembly:
    """The native shard writers assemble frames directly in an mmap'd
    window of the shard file (fastcodec.cc FC_MAPPED_ENCODE)."""

    def test_large_frames_grow_the_populate_watermark(self, tmp_path):
        """Frames far larger than the initial populate-ahead estimate
        (4 MB) force the cap_short retry loop: watermark doubling and,
        near a window edge, repositioning. Bytes must round-trip."""
        root = str(tmp_path / "chips")
        out = str(tmp_path / "recs")
        truth = make_tif_dataset(root, n=2, size=1024)  # ~17 MB frames
        n = images_to_tfrecords_mp("big", root, out, num_shards=1,
                                   num_proc=1, store_as_array=True)
        assert n == 2
        seen = 0
        for s in glob.glob(os.path.join(out, "big-*")):
            for rec in read_records(s):
                img, lbl, ident = parsers.parse_higher_dtype_array_proto(rec)
                exp_img, exp_lbl = truth[ident.decode()]
                np.testing.assert_array_equal(img,
                                              exp_img.astype(np.float32))
                np.testing.assert_array_equal(lbl,
                                              exp_lbl.astype(np.float32))
                seen += 1
        assert seen == 2

    def test_worker_count_fixes_bytes_not_concurrency(self, tmp_path):
        """num_proc sets the shard ASSIGNMENT; the execution pool is
        capped at os.cpu_count(). 4 workers and 1 worker must produce
        byte-identical shards (what makes the capping sound)."""
        root = str(tmp_path / "chips")
        make_tif_dataset(root, n=8)
        out4 = str(tmp_path / "w4")
        out1 = str(tmp_path / "w1")
        images_to_tfrecords_mp("s2", root, out4, num_shards=4,
                               num_proc=4, store_as_array=True)
        images_to_tfrecords_mp("s2", root, out1, num_shards=4,
                               num_proc=1, store_as_array=True)
        files4 = sorted(os.listdir(out4))
        assert files4 == sorted(os.listdir(out1))
        for f in files4:
            a = open(os.path.join(out4, f), "rb").read()
            b = open(os.path.join(out1, f), "rb").read()
            assert a == b, f
