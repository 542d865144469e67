"""Batched multi-tile chip creation: byte-identity with the per-tile
path, failure protocol, row-window isolation."""

import datetime as dt
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.catalog import SyntheticCatalog
from dl_image_segmentation_tpu.geo import Tile
from dl_image_segmentation_tpu.pipeline.batch import (
    create_chips_for_tiles_batched)
from dl_image_segmentation_tpu.pipeline.chips import (DLTileJobConfig,
                                                      create_chips_for_tile)

from tests.test_pipeline import ZONE, write_labels_geojson

TILES = [Tile(60, 2, 10.0, ZONE, -380 + i, 3491) for i in range(5)]


def make_jobs(tmp_path, out_name, catalog, product="sentinel-2:L1C",
              mcf=0, tiles=None):
    labels = write_labels_geojson(str(tmp_path / "l.geojson"),
                                  tile=TILES[1])
    return [DLTileJobConfig(
        dltile=t, out_folder_base=str(tmp_path / out_name),
        dl_product=product, bands="red green blue",
        ref_date=dt.date(2020, 11, 1), max_cloud_fraction=mcf,
        labels_data=labels, label_attr="cls", label_nodata_value=255,
        catalog=catalog) for t in (tiles or TILES)]


def read_all(folder):
    out = {}
    for sub in ("images", "labels"):
        d = os.path.join(folder, sub)
        for f in sorted(os.listdir(d)):
            out[f"{sub}/{f}"] = open(os.path.join(d, f), "rb").read()
    return out


class TestBatchedChips:
    @pytest.mark.parametrize("mcf", [0, None])
    def test_byte_identical_to_per_tile(self, tmp_path, mcf):
        """Median (mcf=0) and nearest-date (mcf=None) modes: batched
        output GeoTIFFs equal the per-tile path byte-for-byte."""
        cat = SyntheticCatalog(scenes_per_tile=6)
        jobs_a = make_jobs(tmp_path, "per_tile", cat, mcf=mcf)
        for j in jobs_a:
            create_chips_for_tile(j)
        jobs_b = make_jobs(tmp_path, "batched", cat, mcf=mcf)
        results = create_chips_for_tiles_batched(jobs_b, batch_tiles=3)
        assert all(r[1] is not None for r in results)
        a = read_all(str(tmp_path / "per_tile"))
        b = read_all(str(tmp_path / "batched"))
        assert a.keys() == b.keys() and len(a) == 2 * len(TILES)
        for k in a:
            assert a[k] == b[k], f"mismatch in {k}"

    def test_failure_protocol(self, tmp_path):
        """Tiles with no scenes return (job, None, None), others
        succeed -- the reference's retry contract."""
        cat = SyntheticCatalog(scenes_per_tile=6)

        class Dropping(SyntheticCatalog):
            def search(self, tile, product, **kw):
                if tile.ti == TILES[2].ti:
                    return []
                return super().search(tile, product, **kw)

        jobs = make_jobs(tmp_path, "fail", Dropping(scenes_per_tile=6),
                         mcf=None)
        results = create_chips_for_tiles_batched(jobs, batch_tiles=5)
        oks = [r for r in results if r[1] is not None]
        fails = [r for r in results if r[1] is None]
        assert len(oks) == 4 and len(fails) == 1
        assert fails[0][0].DLTILE.ti == TILES[2].ti

    def test_row_window_isolation(self, tmp_path):
        """A label polygon north of tile k must not bleed into the
        adjacent tile's rows of the shared burn canvas: each tile's
        batched label equals its per-tile label exactly."""
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        cat = SyntheticCatalog(scenes_per_tile=6)
        # vertically adjacent tiles: the polygon inside TILES_V[1]
        # is out-of-bounds geometry for TILES_V[0] and TILES_V[2]
        tiles_v = [Tile(60, 2, 10.0, ZONE, -380, 3490 + i)
                   for i in range(3)]
        jobs_a = make_jobs(tmp_path, "vp", cat, mcf=None, tiles=tiles_v)
        for j in jobs_a:
            create_chips_for_tile(j)
        jobs_b = make_jobs(tmp_path, "vb", cat, mcf=None, tiles=tiles_v)
        create_chips_for_tiles_batched(jobs_b, batch_tiles=3)
        for t in tiles_v:
            fn = t.key.replace(":", "#") + ".tif"
            a = read_geotiff(str(tmp_path / "vp" / "labels" / fn)).array
            b = read_geotiff(str(tmp_path / "vb" / "labels" / fn)).array
            np.testing.assert_array_equal(a, b)


class TestBatchedExport:
    def test_run_export_batched_equals_per_tile(self, tmp_path):
        from dl_image_segmentation_tpu.pipeline.export import run_export
        cat = SyntheticCatalog(scenes_per_tile=6)
        jobs_a = make_jobs(tmp_path, "rep_a", cat, mcf=None)
        r_a = run_export(jobs_a, n_workers=2, progress=None)
        jobs_b = make_jobs(tmp_path, "rep_b", cat, mcf=None)
        r_b = run_export(jobs_b, n_workers=2, progress=None,
                         batch_tiles=4)
        assert r_a.ok and r_b.ok
        a = read_all(str(tmp_path / "rep_a"))
        b = read_all(str(tmp_path / "rep_b"))
        assert a == b
