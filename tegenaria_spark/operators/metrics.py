"""Round metrics (A1/A8): replace mutable atomic counters with aggregates.

Reference counters (/root/reference/stats.go:39-48): ``requests``,
``items``, ``errors``, ``download_fail`` plus one counter per observed
HTTP status (stats.go:162-167).  Here a round's metrics are one
``groupBy().count()`` over that round's fetch_log (partial aggregation
map-side, tiny shuffle) plus the item count — appended as rows of the
``metrics`` table, never mutated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def round_metrics(fetch_log: DataFrame, n_items: int, round_no: int) -> DataFrame:
    """Build metric rows for one round from its fetch_log slice."""
    attempts = fetch_log.filter(F.col("outcome").isin("fetched", "failed"))

    per_status = (
        attempts.filter(F.col("status").isNotNull() & (F.col("status") > 0))
        .groupBy(F.col("status").cast("string").alias("metric"))
        .agg(F.count("*").alias("value"))
    )
    per_outcome = fetch_log.groupBy(
        F.concat(F.lit("outcome_"), F.col("outcome")).alias("metric")
    ).agg(F.count("*").alias("value"))

    scalar = attempts.agg(
        F.count("*").alias("requests"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        F.sum(
            F.when(
                F.col("error").isNotNull() & ~F.col("error").startswith("disallowed status"),
                1,
            ).otherwise(0)
        ).alias("download_fail"),
    )
    scalar_rows = scalar.selectExpr(
        "stack(4, 'requests', requests, 'items', cast({} as bigint), "
        "'errors', errors, 'download_fail', download_fail) as (metric, value)".format(int(n_items))
    )

    return (
        scalar_rows.unionByName(per_status)
        .unionByName(per_outcome)
        .select(
            F.lit(round_no).cast("int").alias("round"),
            F.col("metric"),
            F.coalesce(F.col("value"), F.lit(0)).cast("long").alias("value"),
        )
    )
