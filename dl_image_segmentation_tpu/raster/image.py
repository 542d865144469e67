"""PNG/JPG codec + universal decode-from-bytes dispatch.

Replaces the reference's two decode stacks: TF's libpng/libjpeg ops
(/root/reference/dl_segmentation_utils/_img_to_tf_threaded.py:36-62)
and rasterio/GDAL MemoryFile (_img_to_tf_mp.py:45-53). PNG/JPG decode
goes through PIL (libpng/libjpeg, releases the GIL); GeoTIFF through
our own codec (raster/geotiff.py). ``decode_image_bytes`` sniffs the
container from magic bytes, so any supported format can be mixed.
"""

from __future__ import annotations

import io
import numpy as np

from .geotiff import GeoTIFF, RasterInfo, decode_geotiff


class UnsupportedFormatError(ValueError):
    """Raised when bytes are a recognisable raster container that this
    framework does not decode (the reference read these via
    rasterio/GDAL, _img_to_tf_mp.py:45-53). The message names the
    detected format so a user hits an actionable error instead of the
    silent skip-every-file path.

    Supported matrix: GeoTIFF incl. BigTIFF (LZW/Deflate/PackBits/
    uncompressed, tiled + striped,
    uint8/uint16/int16/uint32/float32/float64), PNG, JPEG,
    JPEG 2000 (JP2/J2K incl. GeoJP2/GMLJP2 georeferencing — the
    Sentinel-2 distribution format), BMP; decode-only: GIF, NetCDF
    classic (CDF-1/2/5), HDF5 / NetCDF-4, GRIB2 (simple/PNG/JPEG2000
    packing on regular lat/lon grids), GDAL VRT mosaics.
    """


class CorruptRasterError(ValueError):
    """A RECOGNIZED container failed to parse/decode. Distinct from
    UnsupportedFormatError (unknown container): the message names the
    format so writer skip summaries stay diagnosable
    (test_writers_parsers.py::TestFormatGuardrails)."""


def _named(fmt: str, fn, *args, **kwargs):
    """Run a container decoder, wrapping its failures with the format
    name; the original message is preserved for substring matching."""
    try:
        return fn(*args, **kwargs)
    except (CorruptRasterError, UnsupportedFormatError):
        raise
    except Exception as e:
        raise CorruptRasterError(
            f"corrupt or unreadable {fmt} container; "
            f"{type(e).__name__}: {e}") from e


_KNOWN_MAGICS = ()


def _identify_unsupported(data: bytes) -> str:
    """Name the container for an unsupported byte blob (best effort)."""
    for magic, name in _KNOWN_MAGICS:
        if data[:len(magic)] == magic:
            return name
    return f"unknown container (magic bytes {data[:4]!r})"


def _unsupported(data: bytes) -> UnsupportedFormatError:
    name = _identify_unsupported(data)
    return UnsupportedFormatError(
        f"unsupported raster format: {name}. Supported formats: "
        "GeoTIFF, PNG, JPEG, JPEG 2000, BMP, NetCDF, HDF4, HDF5, "
        "GRIB (1+2), ENVI, VRT (GIF decode-only); convert other "
        "containers (e.g. with gdal_translate) before ingestion.")


def _is_png(data: bytes) -> bool:
    return data[:8] == b"\x89PNG\r\n\x1a\n"


def _is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


def _is_tiff(data: bytes) -> bool:
    # classic TIFF (version 42) or BigTIFF (version 43)
    return data[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+")


def _is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def _is_gif(data: bytes) -> bool:
    return data[:4] == b"GIF8"


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, B) array. Mirrors ImageCoder.decode_png
    asserts: 3-D result, <=3 bands (_img_to_tf_threaded.py:56-62).

    Fast path: the C++ libdeflate decoder for 8-bit non-interlaced
    grey/RGB (the chip contract; ~2x PIL on the training-feed lane,
    byte-identical -- tests/test_native.py); PIL for everything
    else."""
    arr = _decode_png_arr(data)
    assert arr.ndim == 3
    assert arr.shape[2] <= 3
    return arr


def decode_jpeg(data: bytes) -> np.ndarray:
    arr = _pil_decode(data)
    assert arr.ndim == 3
    assert arr.shape[2] <= 3
    return arr


def _pil_decode(data: bytes) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(data))
    if img.mode == "P":
        # palette images expand to RGB -- tf.image.decode_png semantics
        # (the reference's decoder, _img_to_tf_threaded.py:56-62); raw
        # palette INDICES are not pixel values. Covers paletted PNGs
        # and GIF first frames.
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _decode_png_arr(data: bytes) -> np.ndarray:
    """Native libdeflate fast path, PIL for the rest of the format
    space -- the single implementation behind decode_png AND
    decode_image_bytes (the fast-path conditions must not diverge)."""
    from .._native import png_decode
    arr = png_decode(data)
    if arr is None:
        arr = _pil_decode(data)
    return arr


def encode_png(array: np.ndarray) -> bytes:
    from PIL import Image
    arr = np.asarray(array)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def encode_jpeg(array: np.ndarray, quality: int = 100) -> bytes:
    from PIL import Image
    arr = np.asarray(array)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def png_to_jpeg(data: bytes, quality: int = 100) -> bytes:
    """PNG -> JPEG transcode (ImageCoder.png_to_jpeg,
    _img_to_tf_threaded.py:36-46)."""
    return encode_jpeg(decode_png(data), quality=quality)


def decode_image_bytes(data: bytes, base_dir: str = None,
                       origin: str = None) -> GeoTIFF:
    """Decode any supported raster from bytes, with georeferencing when
    the container carries it. The GDAL-universal decode equivalent
    (rasterio MemoryFile, _img_to_tf_mp.py:45-53). Returns bands-last.

    ``base_dir`` is only consulted for multi-file containers (VRT
    sources, the ENVI flat binary next to its header), resolved
    relative to the origin file's directory; ``origin`` is the origin
    FILENAME (ENVI derives the data-file stem from it). Loaders that
    know the origin path pass both."""
    if _is_tiff(data):
        return _named("GeoTIFF", decode_geotiff, data)
    from .jp2 import is_jp2
    if is_jp2(data):
        # Sentinel-2's native format: OpenJPEG decode via PIL
        # (GIL-releasing), GeoJP2/GMLJP2 georeferencing parsed in-repo
        from .jp2 import decode_jp2
        return _named("JPEG 2000", decode_jp2, data)
    if _is_png(data) or _is_jpeg(data) or _is_bmp(data) or _is_gif(data):
        if _is_png(data):
            # libdeflate fast path (the training-feed hot lane);
            # PIL handles the rest of the format space
            arr = _named("PNG", _decode_png_arr, data)
        else:
            arr = _named("image", _pil_decode, data)
        info = RasterInfo(width=arr.shape[1], height=arr.shape[0],
                          count=arr.shape[2], dtype=arr.dtype.name)
        return GeoTIFF(arr, info)
    from .netcdf import is_netcdf_classic
    if is_netcdf_classic(data):
        from .netcdf import decode_netcdf
        return _named("NetCDF", decode_netcdf, data)
    from .hdf5 import is_hdf5
    if is_hdf5(data):
        # covers NetCDF-4 too (an HDF5 container with CF attrs)
        from .hdf5 import decode_hdf5
        return _named("HDF5", decode_hdf5, data)
    from .grib import is_grib
    if is_grib(data):
        from .grib import decode_grib
        return _named("GRIB", decode_grib, data)
    from .vrt import is_vrt
    if is_vrt(data):
        from .vrt import decode_vrt
        return _named("VRT", decode_vrt, data, base_dir=base_dir)
    from .envi import is_envi_header
    if is_envi_header(data):
        from .envi import decode_envi
        return _named("ENVI", decode_envi, data, base_dir=base_dir,
                      origin=origin)
    from .hdf4 import is_hdf4
    if is_hdf4(data):
        # MODIS's container: in-repo DD-chain/SDS parser
        from .hdf4 import decode_hdf4
        return _named("HDF4", decode_hdf4, data)
    from .nitf import is_nitf
    if is_nitf(data):
        # the defense/VHR container (MIL-STD-2500C): NC blocks +
        # single-block C8 (JPEG 2000) in-repo
        from .nitf import decode_nitf
        return _named("NITF", decode_nitf, data)
    from .gpkg_raster import is_gpkg
    if is_gpkg(data):
        # OGC GeoPackage tile pyramids: stdlib sqlite3 + in-repo
        # PNG/JPEG tile decode
        from .gpkg_raster import decode_gpkg
        return _named("GeoPackage", decode_gpkg, data)
    raise _unsupported(data)


def decode_image(data: bytes) -> np.ndarray:
    """tf.io.decode_image equivalent: bytes -> (H, W, B) uint8/uint16
    array for PNG/JPG/BMP/GIF (first frame), any supported raster
    otherwise (_tfrecord_image_translation.py:283)."""
    return decode_image_bytes(data).array


# ---------------------------------------------------------------------------
# header-only shape sniffing
# ---------------------------------------------------------------------------

def sniff_image_info(data: bytes) -> RasterInfo:
    """Read (height, width, bands, dtype [, geo tags]) from container
    HEADERS without decoding pixels.

    The reference always full-decodes just to validate shape even when
    storing raw bytes (_img_to_tf_threaded.py:105-112 "we always decode
    the image regardless"); header parsing gives the same validation at
    a tiny fraction of the cost, which is what makes the raw-bytes
    chips->TFRecords path IO-bound instead of codec-bound."""
    if _is_png(data):
        if len(data) < 26 or data[12:16] != b"IHDR":
            raise ValueError("corrupt PNG header")
        import struct
        w, h = struct.unpack(">II", data[16:24])
        bit_depth = data[24]
        color_type = data[25]
        # palette (type 3) expands to RGB at decode, so the sniffed
        # band count must match what the decoder will produce
        bands = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}[color_type]
        dtype = "uint16" if bit_depth == 16 else "uint8"
        if color_type == 3:
            dtype = "uint8"  # palette entries are 8-bit RGB
        return RasterInfo(width=w, height=h, count=bands, dtype=dtype)
    if _is_jpeg(data):
        import struct
        i = 2
        n = len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:  # fill byte before a marker (spec-legal)
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                bands = data[i + 9]
                return RasterInfo(width=w, height=h, count=bands,
                                  dtype="uint8")
            i += 2 + seglen
        raise ValueError("no JPEG SOF marker found")
    if _is_tiff(data):
        from .geotiff import decode_geotiff_info
        return _named("GeoTIFF", decode_geotiff_info, data)
    from .jp2 import is_jp2
    if is_jp2(data):
        from .jp2 import sniff_jp2_info
        return _named("JPEG 2000", sniff_jp2_info, data)
    if _is_bmp(data):
        import struct
        w, h = struct.unpack("<ii", data[18:26])
        (bpp,) = struct.unpack("<H", data[28:30])
        # band count AFTER decode (PIL): 16/24-bpp -> RGB, 32-bpp keeps
        # alpha, 1-bpp is bilevel; 4/8-bpp depends on the palette --
        # PIL yields "L" (1 band) for an all-grey palette, "P" -> RGB
        # (3 bands) otherwise
        if bpp == 32:
            count = 4
        elif bpp == 1:
            count = 1
        elif bpp in (4, 8):
            (hdr_sz,) = struct.unpack("<I", data[14:18])
            (used,) = struct.unpack("<I", data[46:50]) \
                if hdr_sz >= 36 else (0,)
            n_ent = used or (1 << bpp)
            pal_off = 14 + hdr_sz
            pal = data[pal_off:pal_off + 4 * n_ent]
            grey = all(pal[j] == pal[j + 1] == pal[j + 2]
                       for j in range(0, len(pal) - 3, 4))
            count = 1 if grey else 3
        else:
            count = 3
        return RasterInfo(width=w, height=abs(h), count=count,
                          dtype="uint8")
    if _is_gif(data):
        import struct
        w, h = struct.unpack("<HH", data[6:10])
        flags = data[10]
        # band count AFTER decode (PIL first frame): a grayscale
        # identity-ramp global color table opens as "L" (1 band);
        # anything else is "P" which _pil_decode expands to RGB
        count = 3
        if flags & 0x80:
            n_ent = 2 << (flags & 0x07)
            pal = data[13:13 + 3 * n_ent]
            if len(pal) == 3 * n_ent and all(
                    pal[3 * i] == pal[3 * i + 1] == pal[3 * i + 2] == i
                    for i in range(n_ent)):
                count = 1
        return RasterInfo(width=w, height=h, count=count,
                          dtype="uint8")
    from .netcdf import is_netcdf_classic
    if is_netcdf_classic(data):
        from .netcdf import sniff_netcdf_info
        return _named("NetCDF", sniff_netcdf_info, data)
    from .hdf5 import is_hdf5
    if is_hdf5(data):
        from .hdf5 import sniff_hdf5_info
        return _named("HDF5", sniff_hdf5_info, data)
    from .grib import is_grib
    if is_grib(data):
        from .grib import sniff_grib_info
        return _named("GRIB", sniff_grib_info, data)
    from .vrt import is_vrt
    if is_vrt(data):
        from .vrt import sniff_vrt_info
        return _named("VRT", sniff_vrt_info, data)
    from .envi import is_envi_header
    if is_envi_header(data):
        # shape/dtype/geo live entirely in the header text
        from .envi import sniff_envi_info
        return _named("ENVI", sniff_envi_info, data)
    from .hdf4 import is_hdf4
    if is_hdf4(data):
        from .hdf4 import sniff_hdf4_info
        return _named("HDF4", sniff_hdf4_info, data)
    from .nitf import is_nitf
    if is_nitf(data):
        from .nitf import sniff_nitf_info
        return _named("NITF", sniff_nitf_info, data)
    from .gpkg_raster import is_gpkg
    if is_gpkg(data):
        from .gpkg_raster import sniff_gpkg_info
        return _named("GeoPackage", sniff_gpkg_info, data)
    raise _unsupported(data)
