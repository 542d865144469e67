"""STAC catalog backend: static-tree walk and API item-search modes,
band resolution across band-per-asset and multi-band-asset layouts
(mixed per-asset resolutions), windowed COG reads, paging, retry
protocol, and a full chip export — the open-standard successor of the
scene service role the reference's chip engine consumed
(_descartes_img_chips.py:512-513, 612, 626)."""

import datetime as dt
import json
import os

import numpy as np
import pytest

from dl_image_segmentation_tpu.catalog import LocalCatalog
from dl_image_segmentation_tpu.catalog.stac import STACCatalog
from dl_image_segmentation_tpu.catalog.stacserver import (StacBuilder,
                                                          StacServer)

from test_pipeline import TILE, ZONE, write_labels_geojson

EPSG = 32600 + ZONE


@pytest.fixture(scope="module")
def stac_root(tmp_path_factory):
    """One collection, three items:
    - 'multi': one 3-band asset on the tile grid (eo:bands named)
    - 'perband': red/green/blue as separate assets; green at HALF
      resolution (the Sentinel-2 L2A shape)
    - 'cloudy' + 'late': filter fodder (cloud cover, date)
    plus a 'levels' collection with processing:level properties."""
    root = str(tmp_path_factory.mktemp("stac") / "tree")
    b = StacBuilder(root)
    b.add_collection("s2", bands=["red", "green", "blue"])
    rng = np.random.RandomState(11)
    x0, y0, x1, y1 = TILE.bounds
    n = TILE.raster_size

    multi = rng.randint(0, 3000, (n, n, 3)).astype(np.uint16)
    b.add_item("s2", "multi", dt.date(2020, 10, 20),
               {"data": {"array": multi, "geotransform": TILE.geotrans,
                         "epsg": EPSG,
                         "eo_bands": ["red", "green", "blue"]}},
               cloud_cover=5.0)

    red = rng.randint(0, 3000, (n, n, 1)).astype(np.uint16)
    blue = rng.randint(0, 3000, (n, n, 1)).astype(np.uint16)
    green20 = rng.randint(0, 3000, (n // 2, n // 2, 1)).astype(np.uint16)
    gt20 = (TILE.geotrans[0], 20.0, 0.0, TILE.geotrans[3], 0.0, -20.0)
    b.add_item("s2", "perband", dt.date(2020, 11, 5),
               {"red": {"array": red, "geotransform": TILE.geotrans,
                        "epsg": EPSG},
                "green": {"array": green20, "geotransform": gt20,
                          "epsg": EPSG},
                "blue": {"array": blue, "geotransform": TILE.geotrans,
                         "epsg": EPSG}},
               cloud_cover=1.0)

    b.add_item("s2", "cloudy", dt.date(2020, 11, 6),
               {"data": {"array": multi, "geotransform": TILE.geotrans,
                         "epsg": EPSG,
                         "eo_bands": ["red", "green", "blue"]}},
               cloud_cover=80.0)
    b.add_item("s2", "late", dt.date(2021, 3, 1),
               {"data": {"array": multi, "geotransform": TILE.geotrans,
                         "epsg": EPSG,
                         "eo_bands": ["red", "green", "blue"]}},
               cloud_cover=0.0)
    # far away: bbox-filtered out (same zone, 500 km north)
    gt_far = (x0, 10.0, 0.0, y1 + 500_000.0, 0.0, -10.0)
    b.add_item("s2", "far", dt.date(2020, 10, 21),
               {"data": {"array": multi[:32, :32],
                         "geotransform": gt_far, "epsg": EPSG,
                         "eo_bands": ["red", "green", "blue"]}},
               cloud_cover=0.0)

    surf = np.full((n, n, 1), 100, np.uint16)
    toa = np.full((n, n, 1), 200, np.uint16)
    b.add_item("levels", "lv-sr", dt.date(2020, 6, 1),
               {"b": {"array": surf, "geotransform": TILE.geotrans,
                      "epsg": EPSG}},
               properties={"processing:level": "L2A"})
    b.add_item("levels", "lv-toa", dt.date(2020, 6, 2),
               {"b": {"array": toa, "geotransform": TILE.geotrans,
                      "epsg": EPSG}},
               properties={"processing:level": "L1C"})
    return root


def _expected_stack(stac_root):
    """Host-side oracle for the s2 search window below."""
    def arr(item, key):
        from dl_image_segmentation_tpu.raster.geotiff import read_geotiff
        return read_geotiff(
            os.path.join(stac_root, "assets", f"{item}_{key}.tif")).array
    return arr


class TestStaticMode:
    def test_walk_products_bands(self, stac_root):
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url)
            assert cat.products() == ["levels", "s2"]
            assert cat.bands("s2") == ["red", "green", "blue"]

    def test_search_filters(self, stac_root):
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url)
            metas = cat.search(TILE, "s2",
                               start=dt.date(2020, 1, 1),
                               end=dt.date(2020, 12, 31),
                               max_cloud_fraction=0.5)
            # cloudy (80%), late (2021) and far (bbox) are filtered
            assert [m.scene_id for m in metas] == ["multi", "perband"]
            assert metas[0].cloud_fraction == pytest.approx(0.05)
            # date order ascending, the reference's semantics
            assert metas[0].date < metas[1].date

    def test_load_multiband_and_perband(self, stac_root):
        arr = _expected_stack(stac_root)
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url)
            metas = cat.search(TILE, "s2", end=dt.date(2020, 12, 31),
                               max_cloud_fraction=0.5)
            stack, valid = cat.load(metas, TILE,
                                    ["red", "green", "blue"])
            n = TILE.raster_size
            assert stack.shape == (2, n, n, 3)
            assert valid.all()
            np.testing.assert_array_equal(stack[0],
                                          arr("multi", "data"))
            np.testing.assert_array_equal(stack[1][:, :, 0],
                                          arr("perband", "red")[:, :, 0])
            np.testing.assert_array_equal(stack[1][:, :, 2],
                                          arr("perband", "blue")[:, :, 0])
            # the 20 m green band upsamples 2x nearest onto the grid
            g20 = arr("perband", "green")[:, :, 0]
            np.testing.assert_array_equal(
                stack[1][:, :, 1], np.repeat(np.repeat(g20, 2, 0), 2, 1))

    def test_band_subset_and_order(self, stac_root):
        arr = _expected_stack(stac_root)
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url)
            metas = cat.search(TILE, "s2", end=dt.date(2020, 10, 31))
            stack, _ = cat.load(metas, TILE, ["blue", "red"])
            np.testing.assert_array_equal(stack[0][:, :, 0],
                                          arr("multi", "data")[:, :, 2])
            np.testing.assert_array_equal(stack[0][:, :, 1],
                                          arr("multi", "data")[:, :, 0])

    def test_unknown_band_loud(self, stac_root):
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url)
            metas = cat.search(TILE, "s2", end=dt.date(2020, 10, 31))
            with pytest.raises(ValueError, match="no asset carrying"):
                cat.load(metas, TILE, ["swir16"])

    def test_processing_level_property_filter(self, stac_root):
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url, processing_level="L2A")
            metas = cat.search(TILE, "levels")
            assert [m.scene_id for m in metas] == ["lv-sr"]
            stack, _ = cat.load(metas, TILE, ["b"])
            assert (stack == 100).all()
            # per-call override beats the constructor default
            metas = cat.search(TILE, "levels", processing_level="L1C")
            assert [m.scene_id for m in metas] == ["lv-toa"]


class TestMixedDtypeAssets:
    def test_load_promotes_across_asset_dtypes(self, tmp_path):
        """Requested bands living in assets of DIFFERENT dtypes (the
        Sentinel-2 shape: uint8 SCL next to uint16 reflectance) must
        assemble under the promoted dtype — not silently wrap the
        wider values into the first asset's narrow dtype."""
        root = str(tmp_path / "tree")
        b = StacBuilder(root)
        b.add_collection("mix", bands=["scl", "red"])
        n = TILE.raster_size
        scl = np.full((n, n, 1), 4, np.uint8)
        red = np.full((n, n, 1), 1500, np.uint16)
        b.add_item("mix", "item", dt.date(2020, 5, 1),
                   {"scl": {"array": scl, "geotransform": TILE.geotrans,
                            "epsg": EPSG},
                    "red": {"array": red, "geotransform": TILE.geotrans,
                            "epsg": EPSG}})
        with StacServer(root) as srv:
            cat = STACCatalog(srv.url)
            metas = cat.search(TILE, "mix")
            # scl FIRST: the narrow asset must not set the result dtype
            stack, valid = cat.load(metas, TILE, ["scl", "red"])
            assert valid.all()
            assert stack.dtype == np.uint16
            assert (stack[0, :, :, 0] == 4).all()
            assert (stack[0, :, :, 1] == 1500).all()


class TestAPIMode:
    def test_search_paged_and_server_filtered(self, stac_root):
        with StacServer(stac_root, api=True) as srv:
            cat = STACCatalog(srv.url)
            assert cat._search_url is not None  # picked API mode
            metas = cat.search(TILE, "s2",
                               start=dt.date(2020, 1, 1),
                               end=dt.date(2020, 12, 31),
                               max_cloud_fraction=0.5)
            assert [m.scene_id for m in metas] == ["multi", "perband"]
            assert srv.search_requests >= 1

    def test_paging_follows_next_links(self, stac_root):
        with StacServer(stac_root, api=True) as srv:
            cat = STACCatalog(srv.url)
            # force page size 1 so every item is its own page
            items = cat._api_search("s2", [-180, -90, 180, 90],
                                    None, None)
            one = STACCatalog(srv.url)
            import dl_image_segmentation_tpu.catalog.stac as stac_mod
            before = srv.search_requests
            body_pages = one._api_search("s2", [-180, -90, 180, 90],
                                         None, None)
            assert {i["id"] for i in body_pages} \
                == {i["id"] for i in items}
            # now with limit=1 via a direct query to prove the server
            # pages: 5 s2 items -> 5 pages
            import urllib.request
            q = {"collections": ["s2"], "limit": 1}
            ids = []
            url = f"{srv.url}/search"
            for _ in range(10):
                req = urllib.request.Request(
                    url, data=json.dumps(q).encode(), method="POST",
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req) as r:
                    page = json.loads(r.read())
                ids += [f["id"] for f in page["features"]]
                nxt = [l for l in page["links"] if l["rel"] == "next"]
                if not nxt:
                    break
                q = nxt[0]["body"]
            assert len(ids) == 5 and len(set(ids)) == 5

    def test_load_in_api_mode_matches_static(self, stac_root):
        with StacServer(stac_root, api=True) as srv_api, \
                StacServer(stac_root) as srv_static:
            c_api = STACCatalog(srv_api.url)
            c_st = STACCatalog(srv_static.url)
            m_api = c_api.search(TILE, "s2", end=dt.date(2020, 10, 31))
            m_st = c_st.search(TILE, "s2", end=dt.date(2020, 10, 31))
            s_api, v_api = c_api.load(m_api, TILE, ["red", "green"])
            s_st, v_st = c_st.load(m_st, TILE, ["red", "green"])
            np.testing.assert_array_equal(s_api, s_st)
            np.testing.assert_array_equal(v_api, v_st)


class TestTransportDiscipline:
    def test_windowed_reads_stay_small(self, tmp_path):
        """A chip window from a big COG asset must NOT fetch the
        scene (the same property tests pin for HTTPCatalog)."""
        root = str(tmp_path / "tree")
        b = StacBuilder(root)
        rng = np.random.RandomState(3)
        big = rng.randint(0, 3000, (2048, 2048, 3)).astype(np.uint16)
        x0, y0, x1, y1 = TILE.bounds
        gt = (x0 - 9600.0, 10.0, 0.0, y1 + 9600.0, 0.0, -10.0)
        b.add_item("s2", "big", dt.date(2020, 10, 20),
                   {"data": {"array": big, "geotransform": gt,
                             "epsg": EPSG,
                             "eo_bands": ["red", "green", "blue"]}})
        with StacServer(root) as srv:
            cat = STACCatalog(srv.url)
            metas = cat.search(TILE, "s2")
            assert [m.scene_id for m in metas] == ["big"]
            stack, valid = cat.load(metas, TILE, ["red", "blue"])
            assert valid.all()
            size = os.path.getsize(
                os.path.join(root, "assets", "big_data.tif"))
            assert srv.range_requests > 0
            assert srv.bytes_served < size * 0.1, (
                f"fetched {srv.bytes_served} of {size}")

    def test_bearer_token_auth(self, stac_root, monkeypatch):
        """Commercial STAC APIs gate everything behind bearer auth:
        the token rides every request (search AND asset ranges); a
        missing/wrong token is a hard 401, not a retry loop."""
        from dl_image_segmentation_tpu.storage.gcs import GCSError
        with StacServer(stac_root, api=True,
                        require_token="sekrit") as srv:
            with pytest.raises(GCSError) as ei:
                STACCatalog(srv.url)
            assert ei.value.status == 401
            cat = STACCatalog(srv.url, token="sekrit")
            metas = cat.search(TILE, "s2", end=dt.date(2020, 10, 31))
            stack, _ = cat.load(metas, TILE, ["red"])
            assert stack.shape[0] == 1
            # env-var default, like the GCS client's GCS_OAUTH_TOKEN
            monkeypatch.setenv("STAC_AUTH_TOKEN", "sekrit")
            cat2 = STACCatalog(srv.url)
            assert cat2.products() == ["levels", "s2"]

    def test_transient_failures_retry(self, stac_root):
        with StacServer(stac_root) as srv:
            cat = STACCatalog(srv.url, max_attempts=4)
            srv.fail_next(2, status=503)
            metas = cat.search(TILE, "s2", end=dt.date(2020, 10, 31))
            stack, _ = cat.load(metas, TILE, ["red"])
            assert stack.shape[0] == 1


class TestEndToEndExport:
    def test_create_chips_against_stac(self, stac_root, tmp_path):
        """The full chip pipeline with a STAC backend, flaky server
        included — the reference's operating regime against its scene
        service (create nb cells 76, 82-83)."""
        from dl_image_segmentation_tpu.pipeline.chips import (
            DLSampleCreationConfig, OGRLabelDataDesc)
        from dl_image_segmentation_tpu.pipeline.export import run_export

        labels = write_labels_geojson(str(tmp_path / "labels.geojson"))
        with StacServer(stac_root, api=True) as srv:
            remote = STACCatalog(srv.url, max_attempts=2)
            cfg = DLSampleCreationConfig(
                tile_size=56, tile_padding=2, tile_res_m=10.0,
                dl_product="s2", bands="red green blue",
                sample_folder_root=str(tmp_path / "chips"),
                source_tag="s2stac",
                label_data_config=OGRLabelDataDesc(labels, 0, "cls"),
                max_cloud_fraction=0.5, catalog=remote)
            jobs = cfg.create_tile_job_configs(
                "Mumbai", 2020, ref_date=dt.date(2020, 11, 1),
                min_date=dt.date(2020, 1, 1),
                max_date=dt.date(2020, 12, 31))
            assert jobs
            srv.fail_next(3, status=503)
            result = run_export(jobs, n_workers=2, max_attempts=5,
                                progress=None)
            assert result.ok and result.failed == []
            out_root = jobs[0].OUTFOLDER
            imgs = sorted(os.listdir(os.path.join(out_root, "images")))
            lbls = sorted(os.listdir(os.path.join(out_root, "labels")))
            assert imgs == lbls and len(imgs) == len(jobs)
