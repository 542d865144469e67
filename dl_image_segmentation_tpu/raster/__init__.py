"""Raster codecs: GeoTIFF (own implementation, LZW/deflate, tiled,
geo tags), PNG/JPG (PIL-backed), TIFF-LZW reference codec."""

from .geotiff import (GeoTIFF, RasterInfo, decode_geotiff, encode_geotiff,
                      read_geotiff, write_geotiff)
from .image import (decode_image, decode_image_bytes, decode_jpeg,
                    decode_png, encode_jpeg, encode_png, png_to_jpeg)

__all__ = [
    "GeoTIFF", "RasterInfo", "decode_geotiff", "encode_geotiff",
    "read_geotiff", "write_geotiff",
    "decode_image", "decode_image_bytes", "decode_jpeg", "decode_png",
    "encode_jpeg", "encode_png", "png_to_jpeg",
]
