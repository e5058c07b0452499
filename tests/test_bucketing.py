"""Bucketed-table co-location: the join/groupBy on the bucket key must
plan with ZERO shuffle Exchange (the 100 TB repeated-join layout)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tegenaria_spark.sources.bucketing import (
    exchange_count,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_docs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    rows = [(i, f"lang{i % 3}", f"text {'w ' * (i % 9)}{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    write_bucketed(df, "tb_docs", "doc_id", 4, path=str(base / "docs"))
    yield read_table(spark, "tb_docs")
    spark.sql("DROP TABLE IF EXISTS tb_docs")


def test_bucketed_selfjoin_is_exchange_free(spark, bucketed_docs):
    # force SMJ (no broadcast) so the assertion is about bucketing,
    # not about the optimizer hiding the shuffle behind a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bucketed_docs.select("doc_id", "lang")
        b = bucketed_docs.select("doc_id", F.length("text").alias("n_chars"))
        joined = a.join(b, "doc_id")
        assert exchange_count(joined) == 0
        assert joined.count() == 300
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_is_exchange_free(spark, bucketed_docs):
    agg = bucketed_docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert exchange_count(agg) == 0
    assert agg.count() == 300


def test_unbucketed_baseline_does_shuffle(spark, bucketed_docs):
    # sanity: the same self-join over a NON-bucketed copy of the data
    # plans exchanges — proving the zero above comes from the layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = bucketed_docs.sparkSession.createDataFrame(
            bucketed_docs.collect(), bucketed_docs.schema
        )
        joined = plain.select("doc_id", "lang").join(
            plain.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
        )
        assert exchange_count(joined) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_mismatched_bucket_count_still_correct(spark, bucketed_docs, tmp_path_factory):
    # a 2-bucket side joined to the 4-bucket side must stay CORRECT
    # whatever the planner does (coalesced buckets or a shuffle)
    base = tmp_path_factory.mktemp("bucketed2")
    half = bucketed_docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    write_bucketed(half, "tb_docs_half", "doc_id", 2, path=str(base / "half"))
    try:
        j = read_table(spark, "tb_docs_half").join(
            bucketed_docs.select("doc_id", "text"), "doc_id"
        )
        assert j.count() == 150
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_docs_half")
