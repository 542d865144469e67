"""Geo core: tile grid math, CRS transforms, geometry, vector IO.

TPU-native replacement for the reference's geo stack (Descartes Labs
DLTile service + GDAL/OGR + GEOS/PROJ via geopandas)."""

from .tilegrid import (Tile, tile_from_key, tiles_from_shape,
                       tiles_from_bounds_utm, tiles_to_layer)
from .georef import georef_from_identifier, tile_from_identifier
from .geometry import Geometry, points_in_polygon, polygon_intersects_rect
from .vector import (VectorDataset, VectorLayer, Feature, open_vector,
                     write_geojson, write_shapefile)
from . import crs

__all__ = [
    "Tile", "tile_from_key", "tiles_from_shape", "tiles_from_bounds_utm",
    "tiles_to_layer", "georef_from_identifier", "tile_from_identifier",
    "Geometry", "points_in_polygon", "polygon_intersects_rect",
    "VectorDataset", "VectorLayer", "Feature", "open_vector",
    "write_geojson", "write_shapefile", "crs",
]
