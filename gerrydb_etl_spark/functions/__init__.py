from gerrydb_etl_spark.functions.numeric import dec, dsum_expr
from gerrydb_etl_spark.functions.strings import (
    pathify,
    prefixed_key,
    slash_to_dashes,
)

__all__ = ["dec", "dsum_expr", "pathify", "prefixed_key", "slash_to_dashes"]
