"""CLI smoke tests (in-process, CPU): the full three-workload flow
through the argparse surface, plus tile-plan persistence."""

import json
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.cli import main as cli_main
from dl_image_segmentation_tpu.geo import crs, Tile
from dl_image_segmentation_tpu.geo.tilegrid import tiles_to_layer
from dl_image_segmentation_tpu.geo.vector import open_vector, write_geojson


@pytest.fixture()
def labels_path(tmp_path):
    feats = []
    e0, n0 = crs.lonlat_to_utm(72.85, 19.05, 43)
    ring = [[e0, n0], [e0 + 500, n0], [e0 + 500, n0 + 400],
            [e0, n0 + 400], [e0, n0]]
    lonlat = [list(map(float, crs.utm_to_lonlat(x, y, 43)))
              for x, y in ring]
    feats.append({"type": "Feature",
                  "geometry": {"type": "Polygon",
                               "coordinates": [lonlat]},
                  "properties": {"cls": 1}})
    p = tmp_path / "labels.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection",
                             "features": feats}))
    return str(p)


class TestCLIFlow:
    def test_full_flow(self, tmp_path, labels_path, capsys):
        chips = str(tmp_path / "chips")
        rc = cli_main([
            "create-chips", "--labels", labels_path, "--attribute", "cls",
            "--product", "sentinel-2:L1C", "--bands", "red green blue",
            "--tile-size", "32", "--pad", "2", "--resolution", "10.0",
            "--out", chips, "--tag", "s2", "--loc", "T", "--year", "2020",
            "--ref-date", "2020-11-01", "--catalog", "synthetic",
            "--workers", "2", "--max-attempts", "2"])
        assert rc == 0
        chip_dir = os.path.join(chips, "s2_10.0m_2pad_32_T_2020")
        assert os.path.isdir(os.path.join(chip_dir, "images"))
        n_chips = len(os.listdir(os.path.join(chip_dir, "images")))
        assert n_chips >= 1

        recs = str(tmp_path / "recs")
        rc = cli_main([
            "to-tfrecords", "--name", "t", "--directory", chip_dir,
            "--out", recs, "--shards", "2", "--workers", "2",
            "--engine", "mp", "--store-as-array"])
        assert rc == 0

        rc = cli_main(["inspect", "--records", os.path.join(recs, "t-*"),
                       "--verify-crc"])
        assert rc == 0
        out = capsys.readouterr().out
        assert f"{n_chips} records" in out
        assert "image/image_data" in out

        ck = str(tmp_path / "ck")
        rc = cli_main([
            "train", "--records", os.path.join(recs, "t-*"),
            "--mode", "tifarr", "--classes", "2", "--channels", "3",
            "--features", "8", "--levels", "1", "--image-size", "32",
            "--batch-size", "8", "--steps", "2", "--log-every", "1",
            "--checkpoint", ck])
        assert rc == 0
        assert os.path.exists(ck)
        out = capsys.readouterr().out
        assert "loss=" in out

        preds = str(tmp_path / "preds")
        rc = cli_main([
            "predict", "--images", os.path.join(chip_dir, "images"),
            "--checkpoint", ck, "--out", preds, "--classes", "2",
            "--channels", "3", "--features", "8", "--levels", "1",
            "--image-size", "32", "--batch-size", "4",
            "--precision", "fp32"])
        assert rc == 0
        assert len(os.listdir(preds)) == n_chips

        mosaic = str(tmp_path / "map.tif")
        rc = cli_main(["stitch", "--chips", preds, "--out", mosaic])
        assert rc == 0
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        g = read_geotiff(mosaic)
        assert g.info.epsg == 32643
        assert set(np.unique(g.array)) <= {0, 1}

        # probability maps: float32, one band per class, rows sum to 1
        probs_dir = str(tmp_path / "probs")
        rc = cli_main([
            "predict", "--images", os.path.join(chip_dir, "images"),
            "--checkpoint", ck, "--out", probs_dir, "--classes", "2",
            "--channels", "3", "--features", "8", "--levels", "1",
            "--image-size", "32", "--batch-size", "4",
            "--precision", "fp32", "--probs"])
        assert rc == 0
        pg = read_geotiff(os.path.join(
            probs_dir, sorted(os.listdir(probs_dir))[0]))
        assert pg.array.dtype == np.float32 and pg.array.shape[2] == 2
        np.testing.assert_allclose(pg.array.sum(axis=2), 1.0, atol=1e-5)
        # argmax of the probability map == the class map prediction
        cg = read_geotiff(os.path.join(preds,
                                       sorted(os.listdir(preds))[0]))
        np.testing.assert_array_equal(pg.array.argmax(axis=2),
                                      cg.array.squeeze())

        # probability chips stitch too (dtype/band-general mosaic):
        # argmax of the stitched probability mosaic == the class mosaic
        pmosaic = str(tmp_path / "probs_map.tif")
        rc = cli_main(["stitch", "--chips", probs_dir, "--out", pmosaic])
        assert rc == 0
        pm = read_geotiff(pmosaic)
        assert pm.array.dtype == np.float32 and pm.array.shape[2] == 2
        np.testing.assert_array_equal(pm.array.argmax(axis=2),
                                      g.array.squeeze())

        # machine-readable eval
        rc = cli_main(["eval", "--records", os.path.join(recs, "t-*"),
                       "--checkpoint", ck, "--mode", "tifarr",
                       "--classes", "2", "--channels", "3",
                       "--features", "8", "--levels", "1",
                       "--image-size", "32", "--batch-size", "8",
                       "--precision", "fp32", "--json"])
        assert rc == 0
        line = [ln for ln in capsys.readouterr().out.splitlines()
                if ln.startswith("{")][-1]
        ev = json.loads(line)
        assert {"loss", "accuracy", "miou", "batches"} <= set(ev)


class TestManagedCheckpointTraining:
    def _write_records(self, tmp_path):
        from dl_image_segmentation_tpu.records.example import (
            convert_to_example)
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter, shard_filename)
        rng = np.random.RandomState(0)
        recs = tmp_path / "recs"
        recs.mkdir()
        path = str(recs / shard_filename("t", 0, 1))
        with TFRecordWriter(path) as w:
            for _ in range(16):
                img = rng.rand(16, 16, 3).astype(np.float32)
                lbl = rng.randint(0, 2, (16, 16), np.uint8)
                w.write(convert_to_example(
                    img, lbl, 16, 16, 3, 16, 16,
                    "60:2:10.0:43:-380:3491").SerializeToString())
        return os.path.join(str(recs), "t-*")

    def test_save_every_and_auto_resume(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        ck = str(tmp_path / "ckpts")

        def args(steps):
            return ["train", "--records", pattern, "--mode", "tifarr",
                    "--classes", "2", "--channels", "3",
                    "--features", "4", "--levels", "1",
                    "--image-size", "16", "--batch-size", "8",
                    "--steps", str(steps), "--log-every", "1",
                    "--workers", "1", "--checkpoint", ck,
                    "--save-every", "2", "--keep", "2"]

        assert cli_main(args(4)) == 0
        out = capsys.readouterr().out
        assert "managed checkpoint saved at step 2" in out
        assert "managed checkpoint saved at step 4" in out
        # rotation: only the newest --keep step dirs survive
        steps = sorted(int(d) for d in os.listdir(ck) if d.isdigit())
        assert steps == [2, 4]

        # same command line again: resumes at 4, runs nothing, and does
        # NOT double-save the existing step
        assert cli_main(args(4)) == 0
        out = capsys.readouterr().out
        assert "resumed from managed checkpoint step 4" in out
        assert "managed checkpoint saved" not in out

        # a higher budget trains only the remainder and rotates
        assert cli_main(args(6)) == 0
        out = capsys.readouterr().out
        assert "resumed from managed checkpoint step 4" in out
        assert "managed checkpoint saved at step 6" in out
        steps = sorted(int(d) for d in os.listdir(ck) if d.isdigit())
        assert steps == [4, 6]

    def test_photometric_augment_flags(self, tmp_path, capsys):
        """--augment-invert/-brightness/-contrast train without
        --augment (photometric-only), in both step mode and scan
        mode; losses stay finite and steps complete."""
        pattern = self._write_records(tmp_path)
        base = ["train", "--records", pattern, "--mode", "tifarr",
                "--classes", "2", "--channels", "3",
                "--features", "4", "--levels", "1",
                "--image-size", "16", "--batch-size", "8",
                "--steps", "2", "--log-every", "1", "--workers", "1",
                "--augment-invert", "0.5",
                "--augment-brightness", "0.1",
                "--augment-contrast", "0.2"]
        assert cli_main(base) == 0
        out = capsys.readouterr().out
        assert "loss=" in out and "nan" not in out
        assert cli_main(base + ["--scan-steps", "2",
                                "--pool-size", "16"]) == 0
        out = capsys.readouterr().out
        assert "loss=" in out and "nan" not in out

    def test_restore_finetune_runs_full_step_budget(self, tmp_path,
                                                    capsys):
        # --restore is a FINE-TUNE: the checkpoint's step counter comes
        # back (here 3), but --steps still means "run this many steps
        # now" -- unlike the managed auto-resume's total-budget
        # semantics (which would train zero steps for --steps <= 3)
        pattern = self._write_records(tmp_path)
        ck = str(tmp_path / "single_ckpt")
        base = ["train", "--records", pattern, "--mode", "tifarr",
                "--classes", "2", "--channels", "3", "--features", "4",
                "--levels", "1", "--image-size", "16",
                "--batch-size", "8", "--log-every", "1",
                "--workers", "1"]
        assert cli_main(base + ["--steps", "3",
                                "--checkpoint", ck]) == 0
        capsys.readouterr()
        assert cli_main(base + ["--steps", "2", "--restore", ck]) == 0
        out = capsys.readouterr().out
        # two steps actually ran, numbered from the restored counter
        assert "step 3:" in out and "step 4:" in out

    def test_augmented_training_both_modes(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        base = ["train", "--records", pattern, "--mode", "tifarr",
                "--classes", "2", "--channels", "3", "--features", "4",
                "--levels", "1", "--image-size", "16",
                "--batch-size", "8", "--steps", "2", "--log-every", "1",
                "--workers", "1", "--augment"]
        assert cli_main(base) == 0              # per-step feed path
        assert "loss=" in capsys.readouterr().out
        assert cli_main(base + ["--scan-steps", "2",
                                "--pool-size", "16"]) == 0  # pool path
        assert "loss=" in capsys.readouterr().out

    def test_schedule_and_clip_flags(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        rc = cli_main(["train", "--records", pattern, "--mode", "tifarr",
                       "--classes", "2", "--channels", "3",
                       "--features", "4", "--levels", "1",
                       "--image-size", "16", "--batch-size", "8",
                       "--steps", "3", "--log-every", "1",
                       "--workers", "1", "--schedule", "cosine",
                       "--warmup-steps", "1", "--grad-clip-norm", "1.0",
                       "--weight-decay", "0.01", "--seed", "7",
                       "--class-weights", "1,4"])
        assert rc == 0
        assert "loss=" in capsys.readouterr().out

    def test_metrics_log_jsonl(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        mlog = str(tmp_path / "metrics.jsonl")
        base = ["train", "--records", pattern, "--mode", "tifarr",
                "--classes", "2", "--channels", "3", "--features", "4",
                "--levels", "1", "--image-size", "16",
                "--batch-size", "8", "--log-every", "1",
                "--workers", "1", "--metrics-log", mlog]
        assert cli_main(base + ["--steps", "2"]) == 0
        lines = [json.loads(ln) for ln in open(mlog)]
        assert [ln["step"] for ln in lines] == [0, 1]
        for ln in lines:
            assert {"step", "loss", "accuracy", "examples_per_sec",
                    "duty_cycle"} <= set(ln)
        # scan mode APPENDS to the same file, one line per dispatch chunk
        assert cli_main(base + ["--steps", "2", "--scan-steps", "2",
                                "--pool-size", "16"]) == 0
        lines = [json.loads(ln) for ln in open(mlog)]
        assert len(lines) == 3 and lines[-1]["step"] == 2
        capsys.readouterr()

    def test_eval_during_training(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        mlog = str(tmp_path / "m.jsonl")
        base = ["train", "--records", pattern, "--mode", "tifarr",
                "--classes", "2", "--channels", "3", "--features", "4",
                "--levels", "1", "--image-size", "16",
                "--batch-size", "8", "--log-every", "1",
                "--workers", "1", "--eval-records", pattern,
                "--metrics-log", mlog]
        # per-step mode: eval at step 2 (cadence) + the final eval
        assert cli_main(base + ["--steps", "4",
                                "--eval-every", "2"]) == 0
        out = capsys.readouterr().out
        assert "val step 2:" in out and "val step 4:" in out
        assert out.count("miou=") == 2
        vals = [json.loads(ln) for ln in open(mlog)
                if "val_miou" in ln]
        assert [v["step"] for v in vals] == [2, 4]
        # scan mode: eval at each dispatch-chunk boundary + final
        assert cli_main(base + ["--steps", "4", "--scan-steps", "2",
                                "--pool-size", "16",
                                "--checkpoint", str(tmp_path / "ck"),
                                "--save-every", "2"]) == 0
        out = capsys.readouterr().out
        assert "val step 2:" in out and "val step 4:" in out

    def test_predict_from_records(self, tmp_path, capsys):
        """predict --records: no chip folder needed; outputs named and
        georeferenced from record identifiers; argmax matches the
        offline predict of the same parsed arrays."""
        from dl_image_segmentation_tpu.records.example import (
            convert_to_example)
        from dl_image_segmentation_tpu.records.tfrecord import (
            TFRecordWriter, shard_filename)
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        rng = np.random.RandomState(7)
        recs = tmp_path / "recs_p"
        recs.mkdir()
        imgs = rng.rand(5, 16, 16, 3).astype(np.float32)
        with TFRecordWriter(str(recs / shard_filename("p", 0, 1))) as w:
            for i in range(5):
                lbl = rng.randint(0, 2, (16, 16), np.uint8)
                w.write(convert_to_example(
                    imgs[i], lbl, 16, 16, 3, 16, 16,
                    f"16:0:10.0:43:{i}:100").SerializeToString())
        ckdir = str(tmp_path / "ckp")
        train = ["train", "--records", str(recs / "p-*"),
                 "--mode", "tifarr", "--classes", "2", "--channels", "3",
                 "--features", "4", "--levels", "1", "--image-size", "16",
                 "--batch-size", "8", "--steps", "1", "--workers", "1",
                 "--checkpoint", ckdir]
        assert cli_main(train) == 0
        out_dir = str(tmp_path / "preds_r")
        assert cli_main(["predict", "--records", str(recs / "p-*"),
                         "--mode", "tifarr", "--checkpoint", ckdir,
                         "--out", out_dir, "--classes", "2",
                         "--channels", "3", "--features", "4",
                         "--levels", "1", "--image-size", "16",
                         "--batch-size", "8"]) == 0
        names = sorted(os.listdir(out_dir))
        assert len(names) == 5 and names[0] == "16#0#10.0#43#0#100.tif"
        g = read_geotiff(os.path.join(out_dir, names[0]))
        assert g.array.dtype == np.uint8 and g.info.epsg == 32643
        # probability variant: argmax of band stack == the class map
        probs_dir = str(tmp_path / "probs_r")
        assert cli_main(["predict", "--records", str(recs / "p-*"),
                         "--mode", "tifarr", "--checkpoint", ckdir,
                         "--out", probs_dir, "--classes", "2",
                         "--channels", "3", "--features", "4",
                         "--levels", "1", "--image-size", "16",
                         "--batch-size", "8", "--probs"]) == 0
        pg = read_geotiff(os.path.join(probs_dir, names[0]))
        assert pg.array.dtype == np.float32 and pg.array.shape[2] == 2
        np.testing.assert_array_equal(pg.array.argmax(axis=2),
                                      g.array.squeeze())
        capsys.readouterr()

    def test_inspect_preview_sheet(self, tmp_path, capsys):
        from dl_image_segmentation_tpu.raster.image import decode_png
        pattern = self._write_records(tmp_path)
        out = str(tmp_path / "sheet.png")
        assert cli_main(["inspect", "--records", pattern,
                         "--preview", out, "--preview-count", "3",
                         "--mode", "tifarr"]) == 0
        sheet = decode_png(open(out, "rb").read())
        # 3 rows of 16px panels + 4px gaps; 2 panels wide
        assert sheet.shape == (3 * 16 + 4 * 4, 2 * 16 + 3 * 4, 3)
        assert sheet.dtype == np.uint8
        # label panel uses palette colors (not all white/black)
        assert len(np.unique(sheet.reshape(-1, 3), axis=0)) > 3
        # explicit band order + count works on 3-band imagery
        assert cli_main(["inspect", "--records", pattern,
                         "--preview", out, "--preview-count", "1",
                         "--rgb-bands", "2,1,0",
                         "--mode", "tifarr"]) == 0
        assert "1-pair preview sheet" in capsys.readouterr().out
        # out-of-range band indices fail loudly
        with pytest.raises(ValueError, match="out of range"):
            cli_main(["inspect", "--records", pattern,
                      "--preview", out, "--rgb-bands", "9,1,0",
                      "--mode", "tifarr"])

    def test_inspect_class_stats(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        assert cli_main(["inspect", "--records", pattern,
                         "--class-stats", "--mode", "tifarr"]) == 0
        out = capsys.readouterr().out
        assert f"label pixels: {16 * 16 * 16} valid" in out
        assert "class 0:" in out and "class 1:" in out
        # suggested weights: max-count class gets 1, the other >= 1
        line = [ln for ln in out.splitlines()
                if ln.startswith("suggested --class-weights")][0]
        w = [float(x) for x in line.split()[-1].split(",")]
        assert len(w) == 2 and min(w) == 1.0 and max(w) >= 1.0

    def test_save_every_requires_checkpoint(self, tmp_path, capsys):
        pattern = self._write_records(tmp_path)
        rc = cli_main(["train", "--records", pattern, "--mode", "tifarr",
                       "--classes", "2", "--channels", "3",
                       "--features", "4", "--levels", "1",
                       "--image-size", "16", "--batch-size", "8",
                       "--steps", "2", "--save-every", "1",
                       "--workers", "1"])
        assert rc == 2


class TestTilePlanPersistence:
    def test_roundtrip_via_geojson(self, tmp_path):
        tiles = [Tile.from_key("60:2:10.0:43:-380:3491"),
                 Tile.from_key("60:2:10.0:43:-379:3491")]
        layer = tiles_to_layer(tiles)
        p = str(tmp_path / "tiles.geojson")
        write_geojson(p, layer)
        lyr = open_vector(p).get_layer(0)
        keys = [f.properties["key"] for f in lyr.features]
        assert keys == [t.key for t in tiles]
        # footprints should contain the tile centres
        for f, t in zip(lyr.features, tiles):
            lon, lat = t.center_lonlat
            b = f.geometry.bounds
            assert b[0] <= lon <= b[2] and b[1] <= lat <= b[3]


class TestMapCommand:
    def test_map_writes_selfcontained_html(self, tmp_path):
        import json as _json

        from dl_image_segmentation_tpu.cli import main
        from dl_image_segmentation_tpu.geo import crs
        from dl_image_segmentation_tpu.raster.image import encode_png

        chips = tmp_path / "images"
        chips.mkdir()
        for i in range(3):
            fn = f"60#2#10.0#43#{-380 + i}#3491.png"
            (chips / fn).write_bytes(encode_png(
                np.zeros((8, 8, 3), np.uint8)))
        # label polygon near the tiles
        e0, n0 = crs.lonlat_to_utm(72.85, 19.05, 43)
        ring = [[e0, n0], [e0 + 500, n0], [e0 + 500, n0 + 500],
                [e0, n0 + 500], [e0, n0]]
        lonlat = [list(map(float, crs.utm_to_lonlat(x, y, 43)))
                  for x, y in ring]
        lbl = tmp_path / "labels.geojson"
        lbl.write_text(_json.dumps({
            "type": "FeatureCollection",
            "features": [{"type": "Feature",
                          "geometry": {"type": "Polygon",
                                       "coordinates": [lonlat]},
                          "properties": {"cls": 1}}]}))
        out = tmp_path / "map.html"
        rc = main(["map", "--chips", str(chips), "--labels", str(lbl),
                   "--out", str(out)])
        assert rc == 0
        html = out.read_text()
        assert "leaflet" in html
        gj = html.split("var tiles = ")[1].split(";\n")[0]
        tiles = _json.loads(gj)
        assert len(tiles["features"]) == 3
        assert tiles["features"][0]["properties"]["key"].startswith("60:")
        lj = html.split("var labels = ")[1].split(";\n")[0]
        labels = _json.loads(lj)
        assert labels["features"][0]["properties"]["cls"] == 1


class TestDoctor:
    def test_doctor_all_ok(self, capsys):
        from dl_image_segmentation_tpu.cli import main
        rc = main(["doctor"])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.count("OK ") >= 5 and "FAIL" not in out


class TestWebmapEscaping:
    def test_script_closing_tag_in_properties_is_escaped(self, tmp_path):
        """A label attribute containing a closing script tag must not
        terminate the inline <script> element (broken map / markup
        injection)."""
        from dl_image_segmentation_tpu.geo.vector import (Feature,
                                                          VectorLayer)
        from dl_image_segmentation_tpu.geo.geometry import Geometry
        from dl_image_segmentation_tpu.utils.webmap import write_html_map
        import json as _json2

        import numpy as _np
        ring = _np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        evil = "</script><script>alert(1)</script>"
        lyr = VectorLayer("l", [Feature(Geometry([[ring]]),
                                        {"name": evil})], 4326)
        out = str(tmp_path / "m.html")
        write_html_map(out, [], lyr, title="<t>")
        html = open(out).read()
        # exactly the template's own closing tags, none from the data
        assert html.count("</script>") == 2
        assert "\\u003c/script" in html
        assert "<t>" not in html  # title escaped
        lj = html.split("var labels = ")[1].split(";\n")[0]
        assert _json2.loads(lj)["features"][0]["properties"]["name"] == evil
