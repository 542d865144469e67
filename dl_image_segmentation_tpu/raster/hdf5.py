"""HDF5 / NetCDF-4 raster decode via h5py.

The reference read HDF-family containers through rasterio/GDAL's
universal decode (/root/reference/dl_segmentation_utils/
_img_to_tf_mp.py:45-53). Here the container parsing rides h5py
(libhdf5, releases the GIL like the other native codecs, so HDF
chips flow through the same thread-parallel writers); variable
selection and CF georeferencing follow the same rules as the classic
netCDF decoder (NetCDF-4 files ARE HDF5 files — dimension scales +
CF attributes — so one decoder covers both).

Decode-only, like GIF and classic netCDF: exports are GeoTIFF pairs
per the chip contract.
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import cf
from .geotiff import GeoTIFF, RasterInfo

__all__ = ["is_hdf5", "decode_hdf5", "sniff_hdf5_info", "hdf5_variables"]

_HDF5_SIG = b"\x89HDF\r\n\x1a\n"


def is_hdf5(data: bytes) -> bool:
    # the superblock may start at 0 or at any power-of-two offset
    # >= 512 (userblock); check the common ones
    if data[:8] == _HDF5_SIG:
        return True
    off = 512
    while off + 8 <= len(data) and off <= 65536:
        if data[off:off + 8] == _HDF5_SIG:
            return True
        off *= 2
    return False


def _open(data: bytes):
    import h5py
    return h5py.File(io.BytesIO(data), "r")


def _is_dimension_scale(ds) -> bool:
    cls = ds.attrs.get("CLASS")
    if isinstance(cls, bytes):
        cls = cls.decode("latin-1", "replace")
    return cls == "DIMENSION_SCALE"


def _walk_datasets(f) -> List:
    import h5py
    out = []
    def visit(_name, obj):
        if isinstance(obj, h5py.Dataset):
            out.append(obj)
    f.visititems(visit)
    return out


def _numeric(ds) -> bool:
    return ds.dtype.kind in "iufb"


def _pick_dataset(f, variable: Optional[str]):
    if variable is not None:
        if variable not in f:
            raise ValueError(
                f"HDF5 dataset {variable!r} not found; file has: "
                f"{sorted(n for n, s in hdf5_paths(f))}")
        return f[variable]
    best, best_px = None, -1
    for ds in _walk_datasets(f):
        if not _numeric(ds) or ds.ndim < 2 or _is_dimension_scale(ds):
            continue
        px = int(ds.shape[-1]) * int(ds.shape[-2])
        if px > best_px:
            best, best_px = ds, px
    if best is None:
        raise ValueError(
            "no 2-D+ numeric raster dataset in HDF5 file; datasets: "
            + str(dict(hdf5_paths(f))))
    return best


def hdf5_paths(f) -> List[Tuple[str, Tuple[int, ...]]]:
    return [(ds.name, tuple(ds.shape)) for ds in _walk_datasets(f)]


def hdf5_variables(data: bytes) -> Dict[str, Tuple[int, ...]]:
    """path -> shape for every dataset (inspection helper)."""
    with _open(data) as f:
        return dict(hdf5_paths(f))


def _coord_array(f, ds, axis_index: int, want_x: bool
                 ) -> Optional[np.ndarray]:
    """1-D coordinate for one axis of ``ds``: the attached dimension
    scale (NetCDF-4) if present, else a sibling 1-D dataset with
    CF axis attrs and the matching length."""
    try:
        dims = ds.dims
        if axis_index < len(dims) and len(dims[axis_index]) > 0:
            scale = dims[axis_index][0]
            arr = np.asarray(scale[()], dtype=np.float64)
            if arr.ndim == 1 and arr.size == ds.shape[axis_index]:
                return arr
    except Exception:
        pass
    parent = ds.parent
    import h5py
    for name, obj in parent.items():
        if not isinstance(obj, h5py.Dataset) or obj is ds:
            continue
        if obj.ndim != 1 or obj.shape[0] != ds.shape[axis_index]:
            continue
        if not _numeric(obj):
            continue
        ok = (cf.is_x_coordinate(name, obj.attrs) if want_x
              else cf.is_y_coordinate(name, obj.attrs))
        if ok:
            return np.asarray(obj[()], dtype=np.float64)
    return None


def _georeference(f, ds, info: RasterInfo) -> None:
    nd = ds.ndim
    x = _coord_array(f, ds, nd - 1, want_x=True)
    y = _coord_array(f, ds, nd - 2, want_x=False)
    info.geotransform = cf.geotransform_from_coords(x, y)
    gm_name = ds.attrs.get("grid_mapping")
    if gm_name is not None:
        gm_name = cf._text(gm_name)
        gm = None
        if gm_name in ds.parent:
            gm = ds.parent[gm_name]
        elif gm_name in f:
            gm = f[gm_name]
        if gm is not None:
            info.epsg, info.wkt = cf.epsg_from_grid_mapping(gm.attrs)
            return
    # no grid_mapping: bare lon/lat coordinate scales imply WGS84
    # (GDAL's netCDF driver default). Identified by degree units on
    # the x-axis scale (attached dimension scale or CF sibling).
    if x is None or y is None:
        return
    lon_like = False
    try:
        dims = ds.dims
        if len(dims) and len(dims[nd - 1]) > 0:
            scale = dims[nd - 1][0]
            lon_like = cf._text(
                scale.attrs.get("units", b"")).lower().startswith("degrees")
    except Exception:
        pass
    if not lon_like:
        import h5py
        for name, obj in ds.parent.items():
            if (isinstance(obj, h5py.Dataset) and obj.ndim == 1
                    and obj.shape[0] == ds.shape[nd - 1]
                    and cf.is_x_coordinate(name, obj.attrs)
                    and cf._text(obj.attrs.get("units", b"")).lower()
                    .startswith("degrees")):
                lon_like = True
                break
    if lon_like:
        info.epsg = 4326


def _nodata(ds) -> Optional[float]:
    for key in ("_FillValue", "missing_value"):
        v = ds.attrs.get(key)
        if v is not None and not isinstance(v, (bytes, str)):
            return float(np.asarray(v).ravel()[0])
    return None


def decode_hdf5(data: bytes, variable: Optional[str] = None) -> GeoTIFF:
    """HDF5 / NetCDF-4 bytes -> bands-last GeoTIFF container.

    Same selection and layout rules as ``decode_netcdf``: default
    variable = the non-coordinate numeric dataset with the most
    pixels; dims (..., y, x) with leading dims flattened into bands;
    raw values (scale/offset stay metadata)."""
    with _open(data) as f:
        ds = _pick_dataset(f, variable)
        arr = np.asarray(ds[()])
        if arr.ndim < 2:
            raise ValueError(
                f"HDF5 dataset {ds.name!r} is not a raster "
                f"(shape {arr.shape})")
        h, w = arr.shape[-2], arr.shape[-1]
        arr = arr.reshape(-1, h, w).transpose(1, 2, 0)
        if arr.dtype.byteorder not in ("=", "|"):
            arr = arr.astype(arr.dtype.newbyteorder("="))
        info = RasterInfo(width=w, height=h, count=arr.shape[2],
                          dtype=arr.dtype.name, nodata=_nodata(ds))
        _georeference(f, ds, info)
        return GeoTIFF(np.ascontiguousarray(arr), info)


def sniff_hdf5_info(data: bytes, variable: Optional[str] = None
                    ) -> RasterInfo:
    """Shape/geo sniff without reading the raster payload (h5py reads
    only metadata + the 1-D coordinate scales)."""
    with _open(data) as f:
        ds = _pick_dataset(f, variable)
        shape = tuple(ds.shape)
        h, w = shape[-2], shape[-1]
        count = 1
        for s in shape[:-2]:
            count *= int(s)
        info = RasterInfo(
            width=w, height=h, count=count,
            dtype=np.dtype(ds.dtype).newbyteorder("=").name,
            nodata=_nodata(ds))
        _georeference(f, ds, info)
        return info
