"""Bucketed-table co-location for corpus-sized equi-joins.

At 100 TB the curation pipeline joins the SAME corpus on the SAME key
over and over — doc_id for pairs→clusters→canonical→quality gates,
the url fingerprint for frontier⋈url_seen.  Each such join pays a full
shuffle of both sides unless the storage layout already agrees with
the join key.  Spark's bucketed tables ARE that agreement: rows are
hash-partitioned into a fixed bucket count AT WRITE TIME (and
optionally sorted within buckets), and Catalyst then plans equi-joins
/ groupBys on the bucket key with ZERO Exchange — the single biggest
shuffle eliminator available for repeated-key workloads.  (``sort_cols``
additionally elides the merge-join Sort, but only when each bucket is
a single file — repartition to one task per bucket before writing if
that matters; the Sort is local and cheap either way.)

Reference counterpart: none (tegenaria's Go engine keeps its dedup
set in Redis — wetrycode/tegenaria distributed/distributed.go); this
is the Spark-native answer to the same "co-locate by key once, probe
cheaply forever" need, applied to the analytics side.

Scale notes:
- bucket count is a layout contract: both sides of a co-located join
  must use the same count (or an integer multiple — AQE coalesces).
  Pick ~(corpus size / 128 MB) rounded to a power of two; changing it
  is a rewrite, so size for the target corpus, not the test corpus.
- writes per bucket stream through one task; skew in the bucket key
  (a viral doc_id can't repeat, so none here) would need salting —
  not applicable to unique-key corpora.
- the catalog entry (not the parquet footer) carries the bucket spec:
  ``read_table`` must go through the session catalog, a plain
  ``spark.read.parquet(path)`` forgets the layout and re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist *df* as a parquet table bucketed (and bucket-sorted) by
    the join key.  ``path`` makes it an external table (tests point
    this at tmpfs); without it the table lands in the warehouse dir."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — preserves the bucket spec (see module docstring)."""
    return spark.table(name)


def exchange_count(df: DataFrame) -> int:
    """Number of *shuffle* Exchange operators in the executed plan —
    the assertion co-location tests care about (0 = no shuffle).
    Broadcast exchanges don't count: a BroadcastExchange ships the
    small side to every executor, it does not repartition the corpus
    (r3 ADVICE: the old ``'Exchange' in line`` match falsely counted
    broadcast-join plans as shuffling)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )
