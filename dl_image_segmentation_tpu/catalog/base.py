"""Catalog interface + default-catalog registry."""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class SceneMeta:
    """Metadata for one scene of one product."""
    scene_id: str
    product: str
    date: _dt.date
    cloud_fraction: Optional[float] = None
    path: Optional[str] = None  # backend-specific locator
    extra: dict = field(default_factory=dict)

    @property
    def properties(self) -> dict:
        """DL-scene-like property access (scene.properties['date'],
        reference _descartes_img_chips.py:466)."""
        return {"date": _dt.datetime.combine(self.date, _dt.time()),
                "cloud_fraction": self.cloud_fraction, **self.extra}


class Catalog:
    """Scene source for chip creation. Implementations must be
    thread-safe for concurrent per-tile loads."""

    def products(self) -> List[str]:
        raise NotImplementedError

    def bands(self, product: str) -> List[str]:
        raise NotImplementedError

    def search(self, tile, product: str,
               start: Optional[_dt.date] = None,
               end: Optional[_dt.date] = None,
               max_cloud_fraction: Optional[float] = None
               ) -> List[SceneMeta]:
        """Scenes of ``product`` intersecting ``tile``, date-filtered
        (inclusive) and cloud-filtered (strict <, matching the
        reference's `cloud_fraction < max` query,
        _descartes_img_chips.py:610). Sorted by date ascending."""
        raise NotImplementedError

    def load(self, scenes: Sequence[SceneMeta], tile,
             bands: Sequence[str]
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Materialise the scene stack on the tile's padded geocontext.

        Returns (stack (S, H, W, B) source dtype, valid (S, H, W) bool)
        where H = W = tile.raster_size, nearest-resampled."""
        raise NotImplementedError


_default: Optional[Catalog] = None


def set_default_catalog(catalog: Optional[Catalog]) -> None:
    global _default
    _default = catalog


def get_default_catalog() -> Catalog:
    """The process-default catalog. Resolution order: explicit
    set_default_catalog(); $DLSEG_CATALOG (path to a LocalCatalog
    root); error otherwise."""
    global _default
    if _default is not None:
        return _default
    root = os.environ.get("DLSEG_CATALOG")
    if root:
        from .local import LocalCatalog
        _default = LocalCatalog(root)
        return _default
    raise RuntimeError(
        "no catalog configured: call set_default_catalog(...) or set "
        "$DLSEG_CATALOG to a local catalog root")


def equator_referenced_gt(gt: Sequence[float],
                          epsg: Optional[int]) -> Tuple[float, ...]:
    """Normalize a geotransform to the grid's internal
    equator-referenced frame: UTM-south CRSes (EPSG:327xx) carry a
    10^7 m false northing that is subtracted here, so scene rasters
    from either hemisphere convention compare directly against
    ``tile.bounds`` / ``tile.geotrans_equator``."""
    gt = tuple(float(v) for v in gt)
    if epsg is not None and 32701 <= int(epsg) <= 32760:
        return gt[:3] + (gt[3] - 10_000_000.0,) + gt[4:]
    return gt


def resample_to_tile(src: np.ndarray, src_gt: Sequence[float], tile,
                     nodata: Optional[float] = None,
                     src_epsg: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-neighbour resample of a source raster (H', W', B) with
    geotransform ``src_gt`` (same UTM zone as the tile; pass
    ``src_epsg`` so a southern false northing is normalized away) onto
    the tile's padded grid. Returns (out (H, W, B), valid (H, W)).

    This is the local equivalent of the server-side windowing/resample
    the DL API performed for ctx-shaped mosaics."""
    src_gt = equator_referenced_gt(src_gt, src_epsg)
    n = tile.raster_size
    gt = tile.geotrans_equator
    rows = np.arange(n, dtype=np.float64) + 0.5
    cols = np.arange(n, dtype=np.float64) + 0.5
    x = gt[0] + cols * gt[1]          # (W,)
    y = gt[3] + rows * gt[5]          # (H,)
    sc = np.floor((x - src_gt[0]) / src_gt[1]).astype(np.int64)   # (W,)
    sr = np.floor((y - src_gt[3]) / src_gt[5]).astype(np.int64)   # (H,)
    h_src, w_src = src.shape[:2]
    in_c = (sc >= 0) & (sc < w_src)
    in_r = (sr >= 0) & (sr < h_src)
    scc = np.clip(sc, 0, w_src - 1)
    srr = np.clip(sr, 0, h_src - 1)
    out = src[srr[:, None], scc[None, :]]
    valid = in_r[:, None] & in_c[None, :]
    if nodata is not None:
        valid = valid & ~np.all(out == nodata, axis=-1)
    out = np.where(valid[:, :, None], out, 0).astype(src.dtype)
    return out, valid
