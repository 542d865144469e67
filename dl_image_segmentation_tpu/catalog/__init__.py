"""Imagery catalog abstraction.

The reference's scene source is the remote Descartes Labs API
(dl.scenes.search / .mosaic / .stack,
/root/reference/dl_segmentation_utils/_descartes_img_chips.py:512-561,
612-626). There is no DL server; the framework defines a pluggable
Catalog interface with two backends:

* LocalCatalog -- GeoTIFF scenes on disk indexed by a JSON manifest
  (the hermetic stand-in recommended by SURVEY.md section 4)
* SyntheticCatalog -- procedurally generated scenes, deterministic per
  (product, tile, scene index); used by tests and benchmarks
* HTTPCatalog (catalog.http) -- a REMOTE scene service over plain
  HTTP: same index schema, COG-style ranged windowed reads, bounded
  retries, real ``processing_level`` asset selection -- the role the
  DL API played for the reference (catalog/httpserver.py is the
  hermetic server fixture)
* STACCatalog (catalog.stac) -- SpatioTemporal Asset Catalog client,
  static trees AND item-search APIs: collections as products, items
  as scenes, band-per-asset or multi-band assets read windowed over
  HTTP ranges (catalog/stacserver.py is the hermetic fixture +
  static-tree builder)

``search`` returns scene metadata (date, cloud fraction); ``load``
materialises a (S, H, W, B) stack + (S, H, W) validity mask windowed
and nearest-resampled onto a tile's geocontext -- the device
compositing kernels (ops/compositing.py) do the rest.
"""

from .base import Catalog, SceneMeta, set_default_catalog, get_default_catalog
from .http import HTTPCatalog
from .local import LocalCatalog
from .stac import STACCatalog
from .synthetic import SyntheticCatalog

__all__ = [
    "Catalog", "SceneMeta", "LocalCatalog", "SyntheticCatalog",
    "HTTPCatalog", "STACCatalog", "set_default_catalog",
    "get_default_catalog",
]
