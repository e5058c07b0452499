"""Scheduler semantics: budget window (limiter_test.go analogue),
robots gate, deferral, salting."""

from __future__ import annotations

from datetime import datetime, timezone

import pyspark.sql.functions as F

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.operators.schedule import (
    budget_select,
    robots_gate,
    salt_for_fetch,
    split_ready,
)
from tegenaria_spark.schemas import DOMAIN_BUDGET_SCHEMA, ROBOTS_SCHEMA

CFG = EngineConfig(shuffle_partitions=8)


def _ts(round_no: int):
    return datetime.fromtimestamp(
        (CFG.epoch_ms + round_no * CFG.round_interval_s * 1000) / 1000, tz=timezone.utc
    )


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows,
        "ctx_id string, canon_url string, domain string, priority int, "
        "enqueue_seq bigint, next_fetch_time timestamp",
    )


def test_budget_64_requests_rate_16_takes_4_rounds(spark):
    """limiter_test.go:17-29: 64 acquisitions at rate 16/s need >2s —
    in batch semantics: 64 same-domain requests, budget 16 ⇒ exactly 4
    rounds of 16."""
    rows = [
        (f"c{i}", f"http://d.io/p/{i}?", "d.io", 0, i, _ts(0)) for i in range(64)
    ]
    frontier = _frontier(spark, rows)
    budgets = spark.createDataFrame([("d.io", 16, 128)], DOMAIN_BUDGET_SCHEMA)
    fetched_per_round = []
    for r in range(5):
        ready, sleeping = split_ready(frontier, r, CFG)
        selected, deferred = budget_select(ready, budgets, r, CFG)
        n = selected.count()
        fetched_per_round.append(n)
        frontier = sleeping.unionByName(deferred)
        if frontier.isEmpty():
            break
    assert fetched_per_round == [16, 16, 16, 16]


def test_budget_orders_by_priority_then_seq(spark):
    rows = [
        ("low", "http://d.io/a?", "d.io", 5, 1, _ts(0)),
        ("hi-late", "http://d.io/b?", "d.io", 0, 9, _ts(0)),
        ("hi-early", "http://d.io/c?", "d.io", 0, 2, _ts(0)),
    ]
    budgets = spark.createDataFrame([("d.io", 2, 128)], DOMAIN_BUDGET_SCHEMA)
    selected, deferred = budget_select(_frontier(spark, rows), budgets, 0, CFG)
    assert {r["ctx_id"] for r in selected.collect()} == {"hi-early", "hi-late"}
    assert [r["ctx_id"] for r in deferred.collect()] == ["low"]


def test_budget_default_when_domain_unknown(spark):
    rows = [(f"c{i}", "http://x.io/p?", "x.io", 0, i, _ts(0)) for i in range(40)]
    budgets = spark.createDataFrame([], DOMAIN_BUDGET_SCHEMA)
    selected, deferred = budget_select(_frontier(spark, rows), budgets, 0, CFG)
    assert selected.count() == CFG.default_budget_per_round
    assert deferred.count() == 40 - CFG.default_budget_per_round


def test_split_ready_defers_future_rows(spark):
    rows = [
        ("now", "http://d.io/a?", "d.io", 0, 1, _ts(0)),
        ("later", "http://d.io/b?", "d.io", 0, 2, _ts(3)),
    ]
    ready, sleeping = split_ready(_frontier(spark, rows), 0, CFG)
    assert [r["ctx_id"] for r in ready.collect()] == ["now"]
    assert [r["ctx_id"] for r in sleeping.collect()] == ["later"]


def test_robots_longest_prefix_wins(spark):
    rows = [
        ("ok", "http://d.io/pub/x?", "d.io", 0, 1, _ts(0)),
        ("blocked", "http://d.io/private/x?", "d.io", 0, 2, _ts(0)),
        ("nested-ok", "http://d.io/private/open/x?", "d.io", 0, 3, _ts(0)),
        ("no-rules", "http://other.io/x?", "other.io", 0, 4, _ts(0)),
    ]
    robots = spark.createDataFrame(
        [
            ("d.io", "/", True),
            ("d.io", "/private", False),
            ("d.io", "/private/open", True),
        ],
        ROBOTS_SCHEMA,
    )
    allowed, blocked = robots_gate(_frontier(spark, rows), robots)
    assert {r["ctx_id"] for r in allowed.collect()} == {"ok", "nested-ok", "no-rules"}
    assert {r["ctx_id"] for r in blocked.collect()} == {"blocked"}


def test_salting_spreads_hot_domain(spark):
    rows = [(f"c{i}", f"http://hot.io/p/{i}?", "hot.io", 0, i, _ts(0)) for i in range(200)]
    salted = salt_for_fetch(_frontier(spark, rows), CFG)
    pids = salted.select(F.spark_partition_id().alias("pid")).distinct().count()
    # one hot domain must land on >1 task (salt width 4)
    assert pids > 1
