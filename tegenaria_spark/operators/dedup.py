"""Dedup gate: exact anti-join ground truth + bloom-filter prefilter.

Reference semantics (/root/reference/engine.go:346-377 writeCache +
dupefilters.go:131-141 DoDupeFilter):

- requests with ``do_not_filter`` bypass the gate entirely and are
  never registered in the seen-set (dupefilters.go:132-134);
- otherwise the fingerprint is tested-and-added against a bloom filter
  sized by the optimal m,k formulas (utils.go:78-87).

The rebuild keeps the bloom as an *accelerator only*: the north_rule
demands the URL-seen set exactly, and a bloom alone has false
positives, so ground truth is a left-anti join against the ``url_seen``
table (hash-partitioned by fp).  The bloom (built once per round from
url_seen, broadcast to executors) splits candidates into
"definitely-new" (skip the join entirely — at crawl steady state the
overwhelming majority) and "maybe-seen" (the only rows that shuffle
into the anti-join).  False positives therefore cost speed, never
correctness.

Within-batch duplicates (two outlinks to the same URL in one round) are
resolved keep-first-by-enqueue_seq, which is exactly what the
reference's sequential TestOrAdd does for free.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


# ---------------------------------------------------------------------------
# Bloom math — ported from /root/reference/utils.go:78-87
# ---------------------------------------------------------------------------


def optimal_num_of_bits(n: int, p: float) -> int:
    """m = -n·ln p / ln²2 (utils.go:85-87)."""
    return int(-float(n) * math.log(p) / (math.log(2) ** 2))


def optimal_num_of_hash_functions(n: int, m: int) -> int:
    """k = max(1, round(m/n · ln 2)) (utils.go:78-82)."""
    return int(max(1, round(float(m) / float(n) * math.log(2))))


class Bloom:
    """Bitset bloom over signed-int64 fingerprints, numpy-vectorized.

    Positions use double hashing h_i = h1 + i·h2 (the standard
    Kirsch-Mitzenmacher construction) over the 64-bit fp itself — the
    fp is already a high-quality hash, so no re-hashing is needed.
    """

    def __init__(self, m_bits: int, k: int, bits: Optional[np.ndarray] = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = bits if bits is not None else np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, n: int, p: float) -> "Bloom":
        m = optimal_num_of_bits(n, p)
        return cls(m, optimal_num_of_hash_functions(n, m))

    def _positions(self, fps: np.ndarray) -> np.ndarray:
        u = fps.astype(np.int64).view(np.uint64)
        h1 = u
        h2 = ((u >> np.uint64(17)) | (u << np.uint64(47))) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, fps: np.ndarray) -> None:
        if len(fps) == 0:
            return
        pos = self._positions(np.asarray(fps)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, fps: np.ndarray) -> np.ndarray:
        if len(fps) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(fps))
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)

    def union(self, other: "Bloom") -> "Bloom":
        assert self.m == other.m and self.k == other.k
        return Bloom(self.m, self.k, np.bitwise_or(self.bits, other.bits))


def build_bloom(url_seen: DataFrame, n: int, p: float) -> Bloom:
    """Distributed build: each partition folds its fps into a local
    bitmap; bitmaps OR-reduce on the driver (tree-reduce shape).  At the
    10^10 design point this becomes one bloom per fp-bucket (bitmaps
    stay ≤ a few MB each and co-partition with the anti-join); the
    sandbox build is the single-bucket case."""
    m = optimal_num_of_bits(n, p)
    k = optimal_num_of_hash_functions(n, m)

    def fold(it):
        b = Bloom(m, k)
        for pdf in it:
            b.add_many(pdf["fp"].to_numpy())
        yield pd.DataFrame({"bits": [b.bits.tobytes()]})

    parts = url_seen.select("fp").mapInPandas(fold, "bits binary").collect()
    out = Bloom(m, k)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


# ---------------------------------------------------------------------------
# Per-bucket bloom state (the 10^10 design): one bitmap per
# pmod(fp, B) bucket, built and merged entirely on executors, persisted
# as a tiny state table per round and updated incrementally from each
# round's url_seen delta.  No driver-side bitmap ever materializes and
# no O(|url_seen|) rebuild happens per round — the two scale-killers of
# the single-global-bitmap build (round-1 VERDICT "What's wrong" #4).
#
# Sizing at the design point: n=10^10, p=0.001 ⇒ m ≈ 17 GB total; with
# B = 2^10 buckets each bitmap is ~17 MB — an executor-comfortable
# cogroup row, vs a driver-OOM broadcast.
# ---------------------------------------------------------------------------

BLOOM_STATE_SCHEMA = "bucket int, bits binary"


def bloom_bucket_params(n: int, p: float, n_buckets: int) -> tuple[int, int]:
    """(m_bits_per_bucket, k) sized for n/B expected fps per bucket."""
    per = max(1, n // max(1, n_buckets))
    m = optimal_num_of_bits(per, p)
    return m, optimal_num_of_hash_functions(per, m)


def bloom_delta_state(fps: DataFrame, n_buckets: int, m_bits: int, k: int) -> DataFrame:
    """Per-bucket bitmaps for a batch of fps — grouped-map build, one
    shuffle on the bucket key, bitmaps never leave the executors."""

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = Bloom(m_bits, k)
        b.add_many(pdf["fp"].to_numpy())
        return pd.DataFrame({"bucket": [int(key[0])], "bits": [b.bits.tobytes()]})

    return (
        fps.select(F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int").alias("bucket"), "fp")
        .groupBy("bucket")
        .applyInPandas(build, BLOOM_STATE_SCHEMA)
    )


def bloom_merge_state(old: Optional[DataFrame], delta: DataFrame) -> DataFrame:
    """OR bitmaps per bucket (grouped-map over the union)."""
    if old is None:
        return delta

    def orfold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        acc: Optional[np.ndarray] = None
        for raw in pdf["bits"]:
            arr = np.frombuffer(raw, dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame({"bucket": [int(key[0])], "bits": [acc.tobytes()]})

    return old.unionByName(delta).groupBy("bucket").applyInPandas(orfold, BLOOM_STATE_SCHEMA)


def bloom_fp_verdicts(
    candidates: DataFrame, bloom_state: DataFrame, n_buckets: int, m_bits: int, k: int
) -> DataFrame:
    """(fp, _maybe) per distinct candidate fp — cogroup on the bucket
    key so each bitmap meets exactly its candidate slice; the bitmap is
    deserialized once per (bucket, task), never per row, and never
    broadcast through the driver."""
    cand_fps = (
        candidates.select("fp")
        .distinct()
        .withColumn("_bb", F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int"))
    )

    def mark(key, cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty:
            return pd.DataFrame({"fp": pd.Series([], dtype="int64"), "_maybe": pd.Series([], dtype=bool)})
        if bpdf.empty:
            return pd.DataFrame({"fp": cpdf["fp"], "_maybe": False})
        b = Bloom(m_bits, k, np.frombuffer(bpdf["bits"].iloc[0], dtype=np.uint8))
        return pd.DataFrame({"fp": cpdf["fp"], "_maybe": b.contains_many(cpdf["fp"].to_numpy())})

    return (
        cand_fps.groupBy("_bb")
        .cogroup(bloom_state.groupBy("bucket"))
        .applyInPandas(mark, "fp long, _maybe boolean")
    )


def bloom_maybe_seen_udf(spark, bloom: Bloom):
    """Broadcast the bitmap once; return a vectorized membership UDF."""
    bc = spark.sparkContext.broadcast((bloom.m, bloom.k, bloom.bits.tobytes()))

    @pandas_udf(BooleanType())
    def maybe_seen(fps: pd.Series) -> pd.Series:
        m, k, raw = bc.value
        b = Bloom(m, k, np.frombuffer(raw, dtype=np.uint8))
        return pd.Series(b.contains_many(fps.to_numpy()))

    return maybe_seen


# ---------------------------------------------------------------------------
# The dedup gate (F1 + A6)
# ---------------------------------------------------------------------------


def dedup_within_batch(candidates: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Keep-first-by-enqueue_seq per fp among filterable rows; every
    do_not_filter row passes (they never register, so they can't shadow
    each other).  Returns (kept, dropped)."""
    filt = candidates.filter(~F.col("do_not_filter"))
    bypass = candidates.filter(F.col("do_not_filter"))
    w = Window.partitionBy("fp").orderBy("enqueue_seq")
    ranked = filt.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") == 1).drop("_rn").unionByName(bypass)
    dropped = ranked.filter(F.col("_rn") > 1).drop("_rn")
    return kept, dropped


def dedup_gate(
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom_udf=None,
    bloom_verdicts: Optional[DataFrame] = None,
) -> tuple[DataFrame, DataFrame]:
    """F1: drop candidates whose fp is already in url_seen (unless
    do_not_filter).  Returns (fresh, dup_dropped).

    With a bloom prefilter the anti-join only sees maybe-seen rows;
    definitely-new rows bypass the shuffle entirely.  Two prefilter
    forms: ``bloom_udf`` (broadcast bitmap — fine while the bitmap is
    driver-sized) and ``bloom_verdicts`` (a (fp, _maybe) DataFrame from
    :func:`bloom_fp_verdicts` — the per-bucket sharded form that never
    touches the driver; the join on fp is batch×batch, tiny next to the
    anti-join's url_seen side it prunes).
    """
    kept, batch_dups = dedup_within_batch(candidates)
    filt = kept.filter(~F.col("do_not_filter"))
    bypass = kept.filter(F.col("do_not_filter"))
    # one left join with a marker instead of anti+semi twins — fp is
    # unique in url_seen (each fp registers exactly once), so the join
    # never fans out and both outputs fall out of a single shuffle
    seen = url_seen.select("fp").withColumn("_seen", F.lit(True))

    if bloom_verdicts is not None:
        tagged = filt.join(bloom_verdicts, "fp")
    elif bloom_udf is not None:
        tagged = filt.withColumn("_maybe", bloom_udf(F.col("fp")))
    else:
        tagged = None

    if tagged is not None:
        surely_new = tagged.filter(~F.col("_maybe")).drop("_maybe")
        maybe = tagged.filter(F.col("_maybe")).drop("_maybe")
        marked = maybe.join(seen, "fp", "left")
        fresh = surely_new.unionByName(marked.filter(F.col("_seen").isNull()).drop("_seen"))
        dup = marked.filter(F.col("_seen").isNotNull()).drop("_seen")
    else:
        marked = filt.join(seen, "fp", "left")
        fresh = marked.filter(F.col("_seen").isNull()).drop("_seen")
        dup = marked.filter(F.col("_seen").isNotNull()).drop("_seen")

    return fresh.unionByName(bypass), batch_dups.unionByName(dup)


def url_seen_delta(fresh: DataFrame, round_no: int) -> DataFrame:
    """New seen-set rows: fps of freshly enqueued filterable requests
    (do_not_filter rows never register — dupefilters.go:132-134)."""
    return (
        fresh.filter(~F.col("do_not_filter"))
        .select("fp")
        .distinct()
        .withColumn("first_round", F.lit(round_no).cast("int"))
    )
