"""JPEG 2000 (JP2/J2K) support: decode, georeferencing, header sniff.

Sentinel-2 distributes band rasters as JPEG 2000 — the headline format
the reference ingested through rasterio/GDAL's universal decode
(/root/reference/dl_segmentation_utils/_img_to_tf_mp.py:45-53) that
this framework previously rejected with UnsupportedFormatError.

Pieces:

* pixel decode/encode ride PIL's bundled OpenJPEG (lossless 5/3
  reversible — the S2 profile — and lossy 9/7 both decode; encode is
  reversible by default here). OpenJPEG releases the GIL like the
  libjpeg path, so JP2 chips flow through the same thread-parallel
  writers.
* georeferencing is parsed HERE (PIL ignores it): both conventions in
  the wild are handled — **GeoJP2** (a UUID box carrying a degenerate
  GeoTIFF whose tags we parse with this framework's own TIFF tag
  reader) and **GMLJP2** (the XML convention Sentinel-2 uses: a
  RectifiedGrid origin + offsetVectors + EPSG srsName). GML origins
  are interpreted as the upper-left pixel CORNER, matching Sentinel-2
  practice (their origins are round corner coordinates).
* header-only sniffing reads the codestream SIZ segment (size,
  components, bit depth) without decoding pixels, so raw-bytes
  translation stays IO-bound like the other formats.
"""

from __future__ import annotations

import io
import re
import struct
from typing import Iterator, Optional, Tuple

import numpy as np

from .geotiff import RasterInfo, decode_geotiff_info

__all__ = ["decode_jp2", "encode_jp2", "sniff_jp2_info", "is_jp2"]

_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
_J2K_SOC = b"\xff\x4f\xff\x51"
# GeoJP2 UUID (GeoTIFF-in-JP2), universally used by GDAL
_GEOJP2_UUID = bytes.fromhex("b14bf8bd083d4b43a5ae8cd7d5a6ce03")


def is_jp2(data: bytes) -> bool:
    return data[:12] == _JP2_SIG or data[:4] == _J2K_SOC


def _boxes(data: bytes, start: int = 0, end: Optional[int] = None
           ) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (box type, payload offset, payload length) over a JP2 box
    sequence (handles XL 64-bit and to-end-of-file lengths)."""
    i = start
    n = len(data) if end is None else end
    while i + 8 <= n:
        (ln,) = struct.unpack(">I", data[i:i + 4])
        typ = data[i + 4:i + 8]
        if ln == 1:
            if i + 16 > n:
                return
            (ln,) = struct.unpack(">Q", data[i + 8:i + 16])
            hdr = 16
        elif ln == 0:
            ln = n - i
            hdr = 8
        else:
            hdr = 8
        if ln < hdr:
            return
        yield typ, i + hdr, ln - hdr
        i += ln


def _find_codestream(data: bytes) -> Tuple[int, int]:
    """(offset, length) of the JPEG 2000 codestream."""
    if data[:4] == _J2K_SOC:
        return 0, len(data)
    for typ, off, ln in _boxes(data):
        if typ == b"jp2c":
            return off, ln
    raise ValueError("JP2 container has no codestream (jp2c) box")


def _parse_gml_geo(xml: str, info: RasterInfo) -> bool:
    """Best-effort GMLJP2 RectifiedGrid parse (the Sentinel-2
    convention). Returns True when a geotransform was extracted."""
    m = re.search(r"srsName=\"[^\"]*?(?:EPSG|epsg)[:#]+(\d+)", xml)
    if m:
        info.epsg = int(m.group(1))
    om = re.search(
        r"<gml:origin>.*?<gml:pos>([-\d.eE]+)\s+([-\d.eE]+)</gml:pos>",
        xml, re.S)
    vecs = re.findall(
        r"<gml:offsetVector[^>]*>([-\d.eE]+)\s+([-\d.eE]+)"
        r"</gml:offsetVector>", xml)
    if om and len(vecs) >= 2:
        ox, oy = float(om.group(1)), float(om.group(2))
        (a, b), (c, d) = (tuple(map(float, v)) for v in vecs[:2])
        # origin = upper-left pixel corner (S2 practice; see module
        # docstring); first vector steps columns, second steps rows
        info.geotransform = (ox, a, b, oy, c, d)
        return True
    return False


def _geo_from_boxes(data: bytes, info: RasterInfo) -> None:
    """Fill geotransform/EPSG from GeoJP2 or GMLJP2 boxes, if any."""
    if data[:4] == _J2K_SOC:
        return  # raw codestream: no boxes
    xml_payloads = []
    for typ, off, ln in _boxes(data):
        if typ == b"uuid" and ln > 16 \
                and data[off:off + 16] == _GEOJP2_UUID:
            try:
                geo = decode_geotiff_info(data[off + 16:off + ln])
            except Exception:  # noqa: BLE001 -- malformed geo box only
                continue
            info.geotransform = geo.geotransform
            info.epsg = geo.epsg
            info.wkt = geo.wkt
            if geo.nodata is not None:
                info.nodata = geo.nodata
            return
        if typ in (b"xml ", b"asoc"):
            xml_payloads.append(data[off:off + ln])
    for payload in xml_payloads:
        try:
            xml = payload.decode("utf-8", "ignore")
        except Exception:  # noqa: BLE001
            continue
        if "RectifiedGrid" in xml and _parse_gml_geo(xml, info):
            if info.epsg and 32601 <= info.epsg <= 32660:
                from ..geo import crs as _crs
                info.wkt = _crs.utm_wkt(info.epsg - 32600, north=True)
            elif info.epsg and 32701 <= info.epsg <= 32760:
                from ..geo import crs as _crs
                info.wkt = _crs.utm_wkt(info.epsg - 32700, north=False)
            return


def sniff_jp2_info(data: bytes) -> RasterInfo:
    """Shape/bands/dtype (+geo) from headers only: the codestream SIZ
    segment, no pixel decode."""
    off, ln = _find_codestream(data)
    cs = data[off:off + ln]
    if cs[:4] != _J2K_SOC:
        raise ValueError("corrupt JPEG 2000 codestream (no SOC+SIZ)")
    # after SOC(2) + SIZ marker(2): Lsiz(2) Rsiz(2) Xsiz(4) Ysiz(4)
    # XOsiz(4) YOsiz(4) XTsiz(4) YTsiz(4) XTOsiz(4) YTOsiz(4) Csiz(2)
    (xsiz, ysiz, xo, yo) = struct.unpack(">IIII", cs[8:24])
    (csiz,) = struct.unpack(">H", cs[40:42])
    ssiz = cs[42]  # first component
    depth = (ssiz & 0x7F) + 1
    signed = bool(ssiz & 0x80)
    if depth <= 8:
        dtype = "int8" if signed else "uint8"
    elif depth <= 16:
        dtype = "int16" if signed else "uint16"
    else:
        dtype = "int32" if signed else "uint32"
    info = RasterInfo(width=xsiz - xo, height=ysiz - yo, count=csiz,
                      dtype=dtype)
    _geo_from_boxes(data, info)
    return info


def decode_jp2(data: bytes):
    """JP2/J2K bytes -> GeoTIFF-like (array bands-last, RasterInfo with
    geo tags when the container carries GeoJP2/GMLJP2)."""
    from PIL import Image

    from .geotiff import GeoTIFF

    img = Image.open(io.BytesIO(data))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    # PIL maps >8-bit JP2 to int32 ("I") — restore the SIZ dtype so a
    # 12/16-bit Sentinel-2 band round-trips as uint16 like rasterio
    sniff = sniff_jp2_info(data)
    want = np.dtype(sniff.dtype)
    if arr.dtype != want and want.kind in "iu":
        ii = np.iinfo(want)
        arr = np.clip(arr, ii.min, ii.max).astype(want)
    info = RasterInfo(width=arr.shape[1], height=arr.shape[0],
                      count=arr.shape[2], dtype=arr.dtype.name,
                      geotransform=sniff.geotransform, epsg=sniff.epsg,
                      wkt=sniff.wkt, nodata=sniff.nodata)
    return GeoTIFF(np.ascontiguousarray(arr), info)


def encode_jp2(array: np.ndarray,
               geotransform: Optional[Tuple[float, ...]] = None,
               epsg: Optional[int] = None,
               nodata: Optional[float] = None) -> bytes:
    """Encode an array as lossless (reversible 5/3) JP2; geo metadata
    is embedded as a GeoJP2 UUID box (a degenerate 1x1 GeoTIFF built
    with this framework's own encoder). Used for tests, the convert
    flow, and catalog fixtures."""
    from PIL import Image

    arr = np.asarray(array)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.dtype == np.uint16:
        if arr.ndim != 2:
            raise ValueError("uint16 JP2 encode is single-band "
                             "(the Sentinel-2 profile)")
        img = Image.frombuffer("I;16", (arr.shape[1], arr.shape[0]),
                               np.ascontiguousarray(arr).tobytes(),
                               "raw", "I;16", 0, 1)
    else:
        img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG2000", irreversible=False)
    data = buf.getvalue()
    if geotransform is None and epsg is None:
        return data
    from .geotiff import encode_geotiff
    degenerate = encode_geotiff(np.zeros((1, 1), np.uint8),
                                geotransform=geotransform, epsg=epsg,
                                nodata=nodata, compress="none",
                                tiled=False)
    payload = _GEOJP2_UUID + degenerate
    box = struct.pack(">I", 8 + len(payload)) + b"uuid" + payload
    # insert the uuid box before the codestream box
    off, ln = _find_codestream(data)
    # find the start of the jp2c BOX header (payload offset - header)
    pos = data.rfind(b"jp2c", 0, off)
    if pos < 4:  # raw J2K codestream: nowhere to put a geo box
        raise ValueError("encoder produced no JP2 container (raw "
                         "codestream) — cannot embed GeoJP2")
    hdr_start = pos - 4
    return data[:hdr_start] + box + data[hdr_start:]
