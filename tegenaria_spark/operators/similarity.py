"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random hyperplane / SRP) variant as the scale path: at 100 TB the
cross join is infeasible, so candidates come from hamming-near SRP
buckets and only candidates get exact scoring.

All arithmetic is JVM-side (``F.zip_with``/``F.aggregate`` fold in
element order) — no Python in the scoring loop; the SRP signature is
one vectorized pandas UDF (numpy matmul per Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    The query set is broadcast (it's the small side by construction);
    the corpus streams once per query batch — no shuffle of the corpus.
    Rank ties break by neighbor id (deterministic)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    scored = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    ).crossJoin(q).filter(F.col("neighbor_id") != F.col("query_id")).withColumn(
        "cosine", cosine_col(F.col("qvec"), F.col("vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def srp_signature_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Signed random projection signature (n_bits hyperplanes → int64)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_bits)).astype(np.float64)

    @pandas_udf(LongType())
    def srp(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(n_bits, dtype=np.uint64))
        vals = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    return srp


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an SRP bucket
    with the query in any of n_tables hash tables, then exact cosine
    over candidates only.  Recall grows with n_tables; the bucket join
    is the only shuffle and its keys include the table index, so one
    dense region cannot collapse into a single task."""
    tagged_v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    tagged_q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    v_parts = []
    q_parts = []
    for t in range(n_tables):
        udf = srp_signature_udf(dim, n_bits, seed=1000 + t)
        v_parts.append(
            tagged_v.withColumn("bucket", udf(F.col("vec"))).withColumn("table", F.lit(t))
        )
        q_parts.append(
            tagged_q.withColumn("bucket", udf(F.col("qvec"))).withColumn("table", F.lit(t))
        )
    v_all = v_parts[0]
    q_all = q_parts[0]
    for p in v_parts[1:]:
        v_all = v_all.unionByName(p)
    for p in q_parts[1:]:
        q_all = q_all.unionByName(p)

    cands = (
        v_all.join(F.broadcast(q_all), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("cosine", cosine_col(F.col("qvec"), F.col("vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact; LSH-bucketed variant =
    cosine_topk_lsh with queries=vectors for the 100 TB path)."""
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= min_cosine)
        .select("vec_a", "vec_b", "cosine")
    )
