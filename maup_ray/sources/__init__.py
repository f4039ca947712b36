"""Input sources beyond parquet (shapefile zips, …)."""

from .shapefile import read_shapefile_zip, shapefile_dataset

__all__ = ["read_shapefile_zip", "shapefile_dataset"]
