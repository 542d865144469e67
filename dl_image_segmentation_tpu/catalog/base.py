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
        _descartes_img_chips.py:610). Sorted by date ascending.

        Implementations may accept a ``processing_level`` keyword
        (e.g. "surface", the reference's surface-reflectance request at
        _descartes_img_chips.py:617-627) for remote backends that
        serve multiple processing levels; the local backends store
        scenes at a single level and ignore it."""
        raise NotImplementedError

    def load(self, scenes: Sequence[SceneMeta], tile,
             bands: Sequence[str], resampler: str = "near"
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Materialise the scene stack on the tile's padded geocontext.

        Returns (stack (S, H, W, B) source dtype, valid (S, H, W) bool)
        where H = W = tile.raster_size, resampled with ``resampler``
        ("near" or "bilinear", matching the reference's mosaic
        resampler argument, _descartes_img_chips.py:483, 512-513)."""
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


RESAMPLERS = ("near", "bilinear")


def validate_resampler(name: str) -> None:
    """Reject unknown resampler names with one shared message (used by
    every entry point that accepts the reference's ``resampler``
    argument, _descartes_img_chips.py:483, 512-513)."""
    if name not in RESAMPLERS:
        raise ValueError(f"unknown resampler {name!r} "
                         "(expected 'near' or 'bilinear')")


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
                     src_epsg: Optional[int] = None,
                     method: str = "near"
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Resample a source raster (H', W', B) with geotransform
    ``src_gt`` (same UTM zone as the tile; pass ``src_epsg`` so a
    southern false northing is normalized away) onto the tile's padded
    grid. Returns (out (H, W, B), valid (H, W)).

    method: "near" (nearest neighbour) or "bilinear" (4-neighbour
    weighted; a target pixel is valid only when every source pixel
    with NONZERO interpolation weight is in-bounds and not nodata --
    zero-weight corners are don't-care, so a source exactly aligned
    with the tile grid keeps its full extent; still conservative vs
    GDAL's nodata-excluding weights, documented deviation). Matches
    the reference's resampler values passed to SceneCollection.mosaic
    (_descartes_img_chips.py:483, 512-513).

    This is the local equivalent of the server-side windowing/resample
    the DL API performed for ctx-shaped mosaics."""
    validate_resampler(method)
    src_gt = equator_referenced_gt(src_gt, src_epsg)
    n = tile.raster_size
    gt = tile.geotrans_equator
    rows = np.arange(n, dtype=np.float64) + 0.5
    cols = np.arange(n, dtype=np.float64) + 0.5
    x = gt[0] + cols * gt[1]          # (W,)
    y = gt[3] + rows * gt[5]          # (H,)
    h_src, w_src = src.shape[:2]
    if method == "bilinear":
        # fractional source pixel-CENTRE coordinates
        fx = (x - src_gt[0]) / src_gt[1] - 0.5                    # (W,)
        fy = (y - src_gt[3]) / src_gt[5] - 0.5                    # (H,)
        # valid where the target centre lies within the span of source
        # centres; corner indices clamp so the boundary case (wx or wy
        # exactly 0/1, e.g. a grid-aligned source) reads in-bounds
        # pixels and zero-weight corners never invalidate.
        in_bounds = (((fy >= 0.0) & (fy <= h_src - 1.0))[:, None]
                     & ((fx >= 0.0) & (fx <= w_src - 1.0))[None, :])
        r0 = np.clip(np.floor(fy).astype(np.int64), 0,
                     max(h_src - 2, 0))
        c0 = np.clip(np.floor(fx).astype(np.int64), 0,
                     max(w_src - 2, 0))
        wx = np.clip(fx - c0, 0.0, 1.0)[None, :, None]            # (1,W,1)
        wy = np.clip(fy - r0, 0.0, 1.0)[:, None, None]            # (H,1,1)
        r1 = np.minimum(r0 + 1, h_src - 1)
        c1 = np.minimum(c0 + 1, w_src - 1)
        q00 = src[r0[:, None], c0[None, :]].astype(np.float64)
        q01 = src[r0[:, None], c1[None, :]].astype(np.float64)
        q10 = src[r1[:, None], c0[None, :]].astype(np.float64)
        q11 = src[r1[:, None], c1[None, :]].astype(np.float64)
        res = (q00 * (1 - wx) * (1 - wy) + q01 * wx * (1 - wy)
               + q10 * (1 - wx) * wy + q11 * wx * wy)
        valid = in_bounds
        if nodata is not None:
            w00 = ((1 - wx) * (1 - wy))[:, :, 0]
            w01 = (wx * (1 - wy))[:, :, 0]
            w10 = ((1 - wx) * wy)[:, :, 0]
            w11 = (wx * wy)[:, :, 0]
            corner_nodata = (
                ((w00 > 0) & np.all(q00 == nodata, axis=-1))
                | ((w01 > 0) & np.all(q01 == nodata, axis=-1))
                | ((w10 > 0) & np.all(q10 == nodata, axis=-1))
                | ((w11 > 0) & np.all(q11 == nodata, axis=-1)))
            valid = valid & ~corner_nodata
        if np.issubdtype(src.dtype, np.integer):
            res = np.rint(res)
        out = np.where(valid[:, :, None], res, 0).astype(src.dtype)
        return out, valid
    sc = np.floor((x - src_gt[0]) / src_gt[1]).astype(np.int64)   # (W,)
    sr = np.floor((y - src_gt[3]) / src_gt[5]).astype(np.int64)   # (H,)
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
