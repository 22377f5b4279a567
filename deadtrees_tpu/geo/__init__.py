from deadtrees_tpu.geo.mosaic import merge_tiles
from deadtrees_tpu.geo.raster import bbox_intersects, rasterize, world_to_pixel
from deadtrees_tpu.geo.retile import retile
from deadtrees_tpu.geo.shapefile import (
    read_dbf,
    read_shapefile,
    read_shp,
    ring_signed_area,
)

__all__ = [
    "bbox_intersects",
    "merge_tiles",
    "rasterize",
    "read_dbf",
    "read_shapefile",
    "read_shp",
    "retile",
    "ring_signed_area",
    "world_to_pixel",
]
