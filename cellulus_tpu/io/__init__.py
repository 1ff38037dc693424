"""Host-side I/O: zarr container store and dataset metadata."""

from . import zarr
from .meta_data import DatasetMetaData

__all__ = ["zarr", "DatasetMetaData"]
