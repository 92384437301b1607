from gerrydb_etl_spark.functions.numeric import dec, dsum
from gerrydb_etl_spark.functions.strings import (
    pathify,
    prefixed_key,
    rstrip_charset,
    slash_to_dashes,
    trailing_class,
)

__all__ = [
    "dec",
    "dsum",
    "pathify",
    "prefixed_key",
    "rstrip_charset",
    "slash_to_dashes",
    "trailing_class",
]
