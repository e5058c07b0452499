"""Snapshot store protocol: atomic markers, resume reads, lineage."""

from __future__ import annotations

import json
import os

import pytest

from tegenaria_spark.schemas import URL_SEEN_SCHEMA
from tegenaria_spark.sources.store import LocalSnapshotStore


def _seen(spark, fps, rnd=0):
    return spark.createDataFrame([(f, rnd) for f in fps], URL_SEEN_SCHEMA)


def test_commit_marker_is_the_visibility_point(spark, tmp_store_dir):
    store = LocalSnapshotStore(tmp_store_dir, spark)
    assert store.last_committed_round() is None
    frontier = _seen(spark, [1, 2, 3]).withColumnRenamed("fp", "x")
    sid, counts = store.commit_round(
        0, frontier, _seen(spark, [1, 2, 3]), {}, {"phase": "t"}
    )
    assert store.last_committed_round() == 0
    assert sid.startswith("snap-0-")
    assert counts["frontier"] == 3 and counts["url_seen"] == 3

    # orphan data without a marker is invisible
    os.makedirs(store._state_path("frontier", 5), exist_ok=True)
    assert store.last_committed_round() == 0


def test_url_seen_union_and_total(spark, tmp_store_dir):
    store = LocalSnapshotStore(tmp_store_dir, spark)
    f = _seen(spark, [0]).withColumnRenamed("fp", "x")
    store.commit_round(0, f, _seen(spark, [1, 2]), {}, {})
    store.commit_round(1, f, _seen(spark, [3], rnd=1), {}, {})
    got = {r["fp"] for r in store.read_url_seen(1).collect()}
    assert got == {1, 2, 3}
    assert {r["fp"] for r in store.read_url_seen(0).collect()} == {1, 2}
    assert store.url_seen_total(1) == 3  # from markers, no Spark job


def test_commit_overwrites_crashed_attempt(spark, tmp_store_dir):
    store = LocalSnapshotStore(tmp_store_dir, spark)
    f = _seen(spark, [9]).withColumnRenamed("fp", "x")
    # simulate a crashed round-0 attempt: data dir exists, no marker
    path = store._state_path("frontier", 0)
    os.makedirs(path, exist_ok=True)
    open(os.path.join(path, "garbage"), "w").write("crash leftovers")
    sid, counts = store.commit_round(0, f, _seen(spark, [9]), {}, {})
    assert not os.path.exists(os.path.join(path, "garbage"))
    assert counts["frontier"] == 1


def test_marker_contents(spark, tmp_store_dir):
    store = LocalSnapshotStore(tmp_store_dir, spark)
    f = _seen(spark, [1]).withColumnRenamed("fp", "x")
    store.commit_round(0, f, _seen(spark, [1]), {}, {"phase": "bootstrap"})
    with open(os.path.join(tmp_store_dir, "commits", "round-0.json")) as fh:
        m = json.load(fh)
    assert m["round"] == 0
    assert m["stats"]["phase"] == "bootstrap"
    assert "row_counts" in m and "write_times" in m


def test_lineage_counts_match_rows(spark, tmp_store_dir):
    store = LocalSnapshotStore(tmp_store_dir, spark)
    f = _seen(spark, list(range(100))).withColumnRenamed("fp", "x")
    store.commit_round(0, f, _seen(spark, list(range(100))), {}, {})
    lineage = store.read_log("lineage", 0)
    rows = lineage.collect()
    by_table = {}
    for r in rows:
        by_table[r["table"]] = by_table.get(r["table"], 0) + r["n_rows"]
    assert by_table["frontier"] == 100
    assert by_table["url_seen"] == 100
