from gerrydb_etl_spark.sources.registry import (
    TABLE_SCHEMAS,
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "TABLE_SCHEMAS", "load_table", "load_tables", "register_views"]
