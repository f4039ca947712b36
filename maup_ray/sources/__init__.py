"""Input sources beyond parquet (shapefile zips, GeoJSON, …)."""

from .geopackage import (
    geopackage_dataset,
    geopackage_layers,
    read_geopackage,
)
from .geojson import (
    geojson_dataset,
    read_geojson,
    table_to_geojson,
    write_geojson,
)
from .images import (
    IMAGE_SCHEMA,
    conform_image_batch,
    read_image_table,
)
from .jsonl import jsonl_dataset, read_jsonl, write_jsonl
from .shapefile import read_shapefile_zip, shapefile_dataset

__all__ = [
    "IMAGE_SCHEMA",
    "conform_image_batch",
    "read_image_table",
    "read_jsonl",
    "jsonl_dataset",
    "write_jsonl",
    "read_geopackage",
    "geopackage_layers",
    "geopackage_dataset",
    "read_shapefile_zip",
    "shapefile_dataset",
    "read_geojson",
    "geojson_dataset",
    "table_to_geojson",
    "write_geojson",
]
