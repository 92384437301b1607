"""Grouped sequential CUSUM scan via applyInPandas.

The one-sided CUSUM recursion c_t = max(0, c_{t-1} + dev_t) is a
non-linear scan: the max-with-zero reset makes it inexpressible as a
window aggregate (running SUM has no reset; Spark has no generic
scan-with-combine). This is exactly the documented tier for
applyInPandas (SURVEY §2.12 / the build brief's custom-operator
ladder): per-key Arrow-batched sequential state where built-in
expressions genuinely cannot express the semantics. Everything
around the recursion stays JVM-side — the deviations and thresholds
arrive precomputed as integer columns, and the pandas kernel is a
single cumulative pass per group.

Scale: parallelism is key-cardinality (one group = one time series);
per-group state is O(1) and the group's rows stream through Arrow
once. A series too long for one task is chunked by the standard
two-phase trick (per-chunk scan + carry merge) — not needed at any
tested scale and deliberately not implemented until it is.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def cusum_scan(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    dev_col: str,
    threshold_col: str,
) -> DataFrame:
    """Per-key one-sided CUSUM over integer deviations.

    Adds ``cusum`` (BIGINT) = max(0, prev + dev) scanning in
    ``order_col`` order within each key group, and ``is_alarm`` =
    cusum > threshold. All other columns pass through.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cusum bigint, is_alarm boolean"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        dev = pdf[dev_col].to_numpy()
        out = dev.copy()
        c = 0
        for i, d in enumerate(dev):
            c = max(0, c + int(d))
            out[i] = c
        pdf["cusum"] = out
        pdf["is_alarm"] = pdf["cusum"] > pdf[threshold_col]
        return pdf

    return df.groupBy(*key_cols).applyInPandas(scan, out_schema)
