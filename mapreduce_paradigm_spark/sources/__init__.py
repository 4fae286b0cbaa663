"""Sources: parquet table loaders and text/manifest scans."""

from mapreduce_paradigm_spark.sources.tables import (
    TABLES,
    load_all,
    load_table,
    register_views,
    table_path,
)
from mapreduce_paradigm_spark.sources.text import (
    read_documents_from_manifest,
    read_manifest,
)

__all__ = [
    "TABLES",
    "load_all",
    "load_table",
    "register_views",
    "table_path",
    "read_documents_from_manifest",
    "read_manifest",
]
