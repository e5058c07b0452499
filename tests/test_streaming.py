"""Structured Streaming skins over the engine's stores."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.plans.engine import CrawlEngine
from tegenaria_spark.sources.store import LocalSnapshotStore
from tegenaria_spark.sources.synth import SiteConfig, seed_urls
from tegenaria_spark.streaming.rounds import stream_fetch_log_metrics

CFG = EngineConfig(shuffle_partitions=4)


def test_stream_windowed_counts_matches_batch(spark):
    """The Structured Streaming tumbling-window rollup equals the batch
    to_date groupBy — the A3 streaming skin's contract."""
    from tegenaria_spark.streaming.rounds import stream_windowed_counts

    path = "/root/testdata/sf0.001/events.parquet"
    got = {
        (str(r["day"]), r["event_type"]): r["n"]
        for r in stream_windowed_counts(spark, path).collect()
    }
    batch = {
        (str(r["day"]), r["event_type"]): r["n"]
        for r in spark.read.parquet(path)
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch


def test_stateful_running_counts_matches_batch(spark):
    """applyInPandasWithState per-key state machine: running totals over
    the events stream settle to the batch groupBy counts."""
    import tempfile

    from tegenaria_spark.streaming.stateful import final_counts, stream_running_counts

    path = "/root/testdata/sf0.001/events.parquet"
    with tempfile.TemporaryDirectory() as ckpt:
        q = stream_running_counts(spark, path, "event_type", ckpt, query_name="rc_test")
        q.awaitTermination(120)
    got = {r["key"]: r["n"] for r in final_counts(spark, "rc_test").collect()}
    batch = {
        r["event_type"]: r["count"]
        for r in spark.read.parquet(path).groupBy("event_type").count().collect()
    }
    assert got == batch


def test_fetch_log_metrics_stream_matches_batch(spark, tmp_store_dir):
    site = SiteConfig(n_domains=2, pages_per_domain=6)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG)
    engine.run(seed_urls(site, n_seeds=4), max_rounds=3)

    with tempfile.TemporaryDirectory() as ckpt:
        q = stream_fetch_log_metrics(spark, tmp_store_dir, ckpt, query_name="fm_test")
        q.awaitTermination(120)

    streamed = {
        r["outcome"]: r["n"] for r in spark.sql("SELECT * FROM fm_test").collect()
    }
    batch = {
        r["outcome"]: r["count"]
        for r in store.read_log("fetch_log").groupBy("outcome").count().collect()
    }
    assert streamed == batch
