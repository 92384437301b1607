"""Versioned store: SCD-2 merge writer, EAV long table + pivot
views, dimension upserts, write-audit-publish with provenance."""

from gerrydb_etl_spark.store.scd2 import current_view, scd2_merge
from gerrydb_etl_spark.store.eav import melt_to_eav, pivot_from_eav
from gerrydb_etl_spark.store.wap import VersionedTable

__all__ = [
    "scd2_merge",
    "current_view",
    "melt_to_eav",
    "pivot_from_eav",
    "VersionedTable",
]
