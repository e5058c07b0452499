"""Dedup gate semantics (mirrors dupefilters_test.go + bloom math)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from tegenaria_spark.operators.dedup import (
    Bloom,
    bloom_maybe_seen_udf,
    build_bloom,
    dedup_gate,
    optimal_num_of_bits,
    optimal_num_of_hash_functions,
    url_seen_delta,
)

CAND_SCHEMA = "ctx_id string, fp bigint, do_not_filter boolean, enqueue_seq bigint"


def _cands(spark, rows):
    return spark.createDataFrame(rows, CAND_SCHEMA)


def _seen(spark, fps):
    return spark.createDataFrame([(f, 0) for f in fps], "fp bigint, first_round int")


def test_bloom_math_matches_reference():
    # utils.go:78-87 with the defaults from components.go:71
    n, p = 1_048_576, 0.001
    m = optimal_num_of_bits(n, p)
    k = optimal_num_of_hash_functions(n, m)
    assert m == int(-n * np.log(p) / (np.log(2) ** 2))
    assert k == 10  # ln(0.001)/ln2 ≈ 9.97 → round(m/n·ln2) = 10


def test_bloom_no_false_negatives():
    b = Bloom.for_capacity(10_000, 0.01)
    rng = np.random.RandomState(3)
    fps = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    b.add_many(fps)
    assert b.contains_many(fps).all()
    other = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    fpr = b.contains_many(other).mean()
    assert fpr < 0.05  # p=0.01 target with slack


def test_dedup_drops_seen(spark):
    cands = _cands(
        spark,
        [("a", 1, False, 10), ("b", 2, False, 11), ("c", 3, False, 12)],
    )
    fresh, dup = dedup_gate(cands, _seen(spark, [2]))
    assert {r["ctx_id"] for r in fresh.collect()} == {"a", "c"}
    assert {r["ctx_id"] for r in dup.collect()} == {"b"}


def test_do_not_filter_bypasses(spark):
    # dupefilters.go:132-134: DoNotFilter requests pass AND never register
    cands = _cands(spark, [("a", 2, True, 10)])
    fresh, dup = dedup_gate(cands, _seen(spark, [2]))
    assert [r["ctx_id"] for r in fresh.collect()] == ["a"]
    assert dup.isEmpty()
    assert url_seen_delta(fresh, 1).isEmpty()


def test_within_batch_keeps_first_by_seq(spark):
    cands = _cands(
        spark,
        [("late", 7, False, 20), ("early", 7, False, 5), ("other", 8, False, 6)],
    )
    fresh, dup = dedup_gate(cands, _seen(spark, []))
    assert {r["ctx_id"] for r in fresh.collect()} == {"early", "other"}
    assert {r["ctx_id"] for r in dup.collect()} == {"late"}


def test_bloom_prefilter_same_result(spark):
    rng = np.random.RandomState(5)
    seen_fps = [int(x) for x in rng.randint(-(2**62), 2**62, size=500, dtype=np.int64)]
    cand_rows = [(f"s{i}", fp, False, i) for i, fp in enumerate(seen_fps[:200])] + [
        (f"n{i}", int(x), False, 1000 + i)
        for i, x in enumerate(rng.randint(-(2**62), 2**62, size=300, dtype=np.int64))
    ]
    cands = _cands(spark, cand_rows)
    seen = _seen(spark, seen_fps)
    bloom = build_bloom(seen, 10_000, 0.01)
    udf = bloom_maybe_seen_udf(spark, bloom)
    fresh_b, dup_b = dedup_gate(cands, seen, udf)
    fresh_p, dup_p = dedup_gate(cands, seen, None)
    assert {r["ctx_id"] for r in fresh_b.collect()} == {r["ctx_id"] for r in fresh_p.collect()}
    assert {r["ctx_id"] for r in dup_b.collect()} == {r["ctx_id"] for r in dup_p.collect()}


def test_url_seen_delta_distinct(spark):
    fresh = _cands(spark, [("a", 1, False, 1), ("b", 1, True, 2)])
    delta = url_seen_delta(fresh, 3)
    rows = delta.collect()
    assert len(rows) == 1 and rows[0]["fp"] == 1 and rows[0]["first_round"] == 3
