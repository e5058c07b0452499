"""Structured Streaming skins over the batch-round engine.

The reference is a continuous pull loop (engine.go:217-247) — an
unbounded stream with no event-time semantics.  The rebuild's primary
mode is batch rounds (SURVEY.md §2.6); these wrappers give the same
round function a streaming surface:

- ``stream_fetch_log_metrics``: a live metrics query over the growing
  fetch_log directory (file-source stream + stateful aggregation) — the
  streaming rendering of the reference's stats watcher
  (stats.go:143-205 + events.go:102-148).
- ``run_rounds_foreachBatch``: drive crawl rounds from a rate stream —
  each micro-batch executes one frontier round, so trigger intervals
  become the reference's round_interval wall-clock pacing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tegenaria_spark.schemas import FETCH_LOG_SCHEMA


def fetch_log_stream(spark: SparkSession, store_root: str) -> DataFrame:
    """readStream over the store's fetch_log appends (new round dirs
    appear as the crawl progresses; the file source picks them up)."""
    return (
        spark.readStream.schema(FETCH_LOG_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "64")
        .parquet(f"{store_root}/logs/fetch_log")
    )


def stream_fetch_log_metrics(
    spark: SparkSession,
    store_root: str,
    checkpoint_dir: str,
    query_name: str = "fetch_metrics",
):
    """Continuous outcome/status counters (stats.go:39-48 as a stateful
    streaming aggregation).  Complete-mode memory sink: read the live
    counters with ``spark.sql(f"SELECT * FROM {query_name}")``."""
    agg = (
        fetch_log_stream(spark, store_root)
        .groupBy("outcome")
        .agg(F.count("*").alias("n"), F.max("round").alias("last_round"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_counts(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 day",
) -> DataFrame:
    """Event-time tumbling-window counts as a Structured Streaming job
    over a parquet directory, drained with ``availableNow`` — the
    streaming rendering of the A3 count-over-time rollup (stats.go
    count-over-time via InfluxDB).  Returns the final BATCH DataFrame of
    the aggregation (the memory sink's table), so callers — including
    the driver's oracle gate — can compare it 1:1 against the batch
    ``groupBy(to_date(ts))`` form.

    Complete-mode stateful aggregation: deterministic for any file
    order (no watermark-dependent late-data drops; watermarks matter
    for unbounded streams — this surface certifies the stateful
    streaming plan itself)."""
    import os
    import uuid

    batch_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(batch_schema)
    if os.path.isfile(path):
        # the file stream source requires a directory basePath: stream
        # the parent dir with a glob pinned to this one file
        base, fname = os.path.split(path)
        reader = reader.option("pathGlobFilter", fname)
        path = base
    agg = (
        reader.parquet(path)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.to_date(F.col("win.start")).alias("day"), F.col(key_col), F.col("n")
        )
    )
    name = f"swc_{uuid.uuid4().hex[:8]}"
    import tempfile

    # tmpfs for the checkpoint: the commit log is many tiny fsync'd
    # writes — on the VM disk they dominate the drain wall
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(prefix="swc-ckpt-", dir=ckpt_base) as ckpt:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    return spark.table(name)


def run_rounds_foreachBatch(
    engine,
    max_rounds: int = 10,
    interval: str = "1 second",
):
    """Drive the engine from a rate stream: one round per micro-batch.

    The rate source exists only as a ticker; the round reads its real
    input from the committed frontier snapshot (same as batch mode), so
    exactly-once comes from the store's commit markers, not the stream.
    """
    spark = engine.spark
    start = engine.store.last_committed_round()
    if start is None:
        # mirror CrawlEngine.run's resume check — an un-bootstrapped
        # store has no frontier snapshot for the first tick to read
        raise RuntimeError("store has no committed snapshot — bootstrap before streaming rounds")
    # max_rounds is a budget relative to where we resume, not an
    # absolute round index (else resuming at round ≥ max_rounds no-ops)
    state = {"round": start, "end": start + max_rounds, "done": False}

    def tick(_batch_df, _batch_id):
        if state["done"] or state["round"] >= state["end"]:
            state["done"] = True
            return
        r = state["round"]
        frontier, url_seen = engine._read_state(r)
        if frontier.isEmpty():
            state["done"] = True
            return
        engine.run_round(r, frontier, url_seen)
        state["round"] = r + 1

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .writeStream.foreachBatch(tick)
        .trigger(processingTime=interval)
        .start()
    )


def stream_windowed_counts_watermarked(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    ckpt_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> None:
    """Watermarked APPEND-mode windowed counts — the unbounded-stream
    form of A3: a window is emitted exactly once, when the watermark
    passes its end, and events arriving later than *watermark* behind
    the observed max event time are DROPPED (never re-open an emitted
    window).  State is bounded by the watermark horizon — the property
    that lets a 100 TB/day fetch-log stream run forever, unlike the
    complete-mode variant whose state grows with distinct windows.

    One ``availableNow`` drain per call; call again as new files land
    in *in_dir* — the shared checkpoint carries the watermark across
    drains (restart-safe, exactly-once through the parquet sink commit
    log).  Results accumulate in *out_dir* (parquet).
    """
    batch_schema = spark.read.parquet(in_dir).schema
    agg = (
        spark.readStream.schema(batch_schema)
        .parquet(in_dir)
        # watermarks require TIMESTAMP (tz-aware); parquet written from
        # naive pandas timestamps arrives as TIMESTAMP_NTZ
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"), F.col(key_col), F.col("n")
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout with the query
    # STILL RUNNING — returning then would let a second drain against
    # the same checkpoint race this one (r3 ADVICE).  Stop and raise.
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(
            "stream_windowed_counts_watermarked: availableNow drain did not "
            "complete within 600 s"
        )
