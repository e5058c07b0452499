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


def hash_sample_vectors(
    vectors: DataFrame, id_col: str, vec_col: str, sample_size: int
) -> list:
    """Deterministic ~*sample_size*-row sample for centroid fitting,
    WITHOUT a corpus-wide sort: keep rows whose ``pmod(xxhash64(id), B)``
    is 0 with B = n // sample_size (a stateless hash-bucket filter — one
    column-pruned scan, no TakeOrdered; the old ``orderBy(id).limit(n)``
    was a full scan-sort at 100 TB).  The survivors (≈ sample_size rows,
    < 2× worst case) are collected, sorted by id on the driver, and
    capped at *sample_size* — fully deterministic, and re-derivable by
    the pure-Python oracle twin via the same XXH64 + pmod rule
    (functions/xxh64.py matches ``F.xxhash64`` bit-for-bit).

    Returns the collected Rows (id, vec) sorted by id, length ≤
    sample_size.

    Contract: *id_col* must be an integral column — a non-numeric id
    would cast to NULL for every row, collapsing all rows into one hash
    bucket so the filter keeps everything or nothing (r4 ADVICE)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = vectors.schema[id_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"hash_sample_vectors: id column {id_col!r} must be integral "
            f"(got {dt.simpleString()}) — hash a numeric surrogate id instead"
        )
    n = vectors.count()
    if n == 0:
        return []
    b = max(1, n // sample_size)
    rows = (
        vectors.select(id_col, vec_col)
        .filter(F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(b)) == 0)
        .collect()
    )
    rows.sort(key=lambda r: r[0])
    return rows[:sample_size]


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


def srp_planes_int(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Fixed-point SRP hyperplanes: N(0,1) draws scaled by 2^10 and
    rounded to int64.  Integer planes make the bucket assignment
    *bit-exact* everywhere: the projection below is pure int64
    arithmetic, so the Spark UDF and the pure-Python oracle twin agree
    regardless of BLAS blocking / summation order (a float plane can
    flip a sign near 0 between engines)."""
    rng = np.random.RandomState(seed)
    return np.rint(rng.normal(size=(dim, n_bits)) * 1024.0).astype(np.int64)


def srp_bucket_matrix(mat_f64: np.ndarray, planes_int: np.ndarray) -> np.ndarray:
    """int64 bucket id per row of *mat_f64*.  Vectors are scaled to
    fixed point (×2^20, rounded) so the sign decision is exact integer
    math: |v_int| ≤ ~2^24, |plane| ≤ ~2^13, dim ≤ 2^7 ⇒ dots < 2^44,
    no overflow."""
    v_int = np.rint(mat_f64 * float(1 << 20)).astype(np.int64)
    proj = v_int @ planes_int  # integer matmul — exact, order-independent
    bits = proj > 0
    weights = 1 << np.arange(planes_int.shape[1], dtype=np.uint64)
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1).astype(np.int64)


def srp_signature_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Signed random projection signature (n_bits hyperplanes → int64)."""
    planes = srp_planes_int(dim, n_bits, seed)

    @pandas_udf(LongType())
    def srp(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(srp_bucket_matrix(mat, planes))

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


def ivf_quantize_rows(mat: np.ndarray, bits: int = 20) -> np.ndarray:
    """Row-normalize, then fixed-point quantize (×2^bits, rint).
    Returns float64 holding exact integers.  Every step is row-local
    (norm, divide, rint), so the result for a given row is identical
    no matter how rows are batched into Arrow chunks."""
    return np.rint(_normalize_rows(mat) * float(1 << bits))


def ivf_fit_centroids_int(
    sample_mat: np.ndarray, k: int, cent_bits: int = 10, seed: int = 7, iters: int = 8
) -> np.ndarray:
    """Spherical-k-means centroids quantized to ×2^cent_bits integers
    (float64-held).  Quantizing the centroids makes every projection
    below EXACT integer arithmetic: |row| ≤ 2^20, |centroid| ≤ 2^10,
    dim ≤ 2^7 ⇒ every dot < 2^37 — exact in float64 GEMM regardless of
    BLAS blocking, so cell assignment can never differ between the
    Spark UDF and the single-threaded oracle twin (a float centroid
    could flip an argmax near a tie)."""
    cent = _fit_centroids(_normalize_rows(sample_mat), k, iters=iters, seed=seed)
    return np.rint(cent * float(1 << cent_bits))


def ivf_project(mat_f64: np.ndarray, cent_int: np.ndarray) -> np.ndarray:
    """Exact integer projections of every row onto every centroid."""
    return ivf_quantize_rows(mat_f64) @ cent_int.T


def ivf_assign(mat_f64: np.ndarray, cent_int: np.ndarray) -> np.ndarray:
    """Cell id per row: argmax projection, ties to the LOWEST cell id
    (np.argmax's first-max rule — deterministic, twin-identical)."""
    return np.argmax(ivf_project(mat_f64, cent_int), axis=1).astype(np.int32)


def ivf_probes(mat_f64: np.ndarray, cent_int: np.ndarray, nprobe: int) -> np.ndarray:
    """Top-*nprobe* cells per query row, ordered by (−projection, cell
    id): stable argsort on exact integers — deterministic everywhere."""
    proj = ivf_project(mat_f64, cent_int)
    order = np.argsort(-proj, axis=1, kind="stable")
    return order[:, :nprobe].astype(np.int32)


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 32,
    nprobe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k neighbors via an IVF (inverted-file) index —
    the centroid-blocked scale path next to :func:`cosine_topk_lsh`'s
    hyperplane one.

    Build: fit K spherical-k-means centroids on a driver-side sample
    (O(K·dim) driver state, broadcast to executors in the UDF closure),
    then one ``mapInPandas`` pass assigns every corpus vector to its
    nearest cell — no shuffle; the index IS the cluster column.
    Search: each query probes its *nprobe* nearest cells, candidates
    come from a broadcast join on the cell id (the corpus never
    shuffles; per-query work is the ~nprobe/K fraction of the corpus),
    and only candidates get exact fold-cosine scoring + window top-k.
    Recall is tunable: nprobe = K degrades to exact brute force.

    All cell decisions are exact integer arithmetic (see
    :func:`ivf_fit_centroids_int`), so results are bit-reproducible
    against the single-threaded oracle twin; the final cosine is the
    same JVM fold every other similarity operator uses.

    At 100 TB: the corpus pass is embarrassingly parallel, the probe
    join's build side is queries×nprobe rows (broadcast), and a skewed
    cell (many vectors in one dense region) spreads across tasks
    because the scoring is a map-side operation on the corpus
    partitioning — no per-cell shuffle exists to collapse."""
    spark = vectors.sparkSession
    sample_rows = hash_sample_vectors(vectors, id_col, vec_col, sample_size)
    if not sample_rows:
        return spark.createDataFrame([], "query_id long, neighbor_id long, rank int")
    smat = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    kc = max(1, min(n_clusters, len(smat)))
    cent_int = ivf_fit_centroids_int(smat, kc)

    def assign_batches(it):
        for pdf in it:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].values,
                    "vec": pdf[vec_col].values,
                    "cell": ivf_assign(mat, cent_int),
                }
            )

    corpus = vectors.select(id_col, vec_col).mapInPandas(
        assign_batches, "neighbor_id long, vec array<float>, cell int"
    )

    def probe_batches(it):
        for pdf in it:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            probes = ivf_probes(mat, cent_int, min(nprobe, cent_int.shape[0]))
            n_p = probes.shape[1]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[query_id_col].values, n_p),
                    "qvec": np.repeat(pdf[vec_col].values, n_p),
                    "cell": probes.reshape(-1),
                }
            )

    probed = queries.select(query_id_col, vec_col).mapInPandas(
        probe_batches, "query_id long, qvec array<float>, cell int"
    )

    scored = (
        corpus.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("qvec"), F.col("vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_neardup_pairs_exact(
    vectors: DataFrame,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine near-dup via crossJoin — the tiny-scale oracle
    mode only.  O(n²) rows materialize; never run this at scale."""
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= min_cosine)
        .select("vec_a", "vec_b", "cosine")
    )


def _fit_centroids(mat: np.ndarray, k: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Spherical k-means on the driver over a bounded sample (numpy).
    Returns L2-normalized centroids; deterministic for a fixed sample."""
    rng = np.random.RandomState(seed)
    k = min(k, len(mat))
    idx = np.sort(rng.choice(len(mat), size=k, replace=False))
    cent = mat[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for j in range(k):
            sel = mat[assign == j]
            if len(sel):
                v = sel.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[j] = v / n
    return cent


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)


def embedding_neardup_pairs(
    vectors: DataFrame,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 64,
    sample_size: int = 4096,
    gemm_chunk: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-dup pairs — EXACT, IVF-pruned.

    The cartesian plan is replaced by centroid blocking with a
    triangle-inequality guarantee (classic IVF all-pairs):

    1. fit K spherical-k-means centroids on a driver-side sample;
    2. assign every vector to its nearest centroid (one ``mapInPandas``
       pass, broadcast centroid matrix) and record its angle to it;
    3. per-cluster radius r_c = max member angle (one tiny groupBy);
    4. a cluster pair (c1, c2) can contain a qualifying pair only if
       angle(c1,c2) ≤ arccos(t) + r1 + r2 (spherical triangle
       inequality) — infeasible pairs are pruned on the driver (K² is
       small) with an epsilon of slack, which only ever ADDS candidate
       pairs, so no true pair is lost;
    5. feasible cluster pairs verify with a cogrouped
       ``applyInPandas`` doing chunked numpy GEMM — vectorized float64
       matmul instead of per-pair array folds.

    Worst case (uniformly random vectors, nothing prunes) this is a
    blocked exact GEMM all-pairs — still ~50× the per-pair throughput
    of the old crossJoin fold.  On clustered corpora (the near-dup use
    case) the feasibility test prunes most of the K² blocks.  For an
    approximate-but-cheaper scale path use the SRP machinery
    (:func:`cosine_topk_lsh` with queries=vectors).

    The ACCEPT decision is integer-exact (engine-portable): vectors
    quantize as Q = floor(v · 2^20) (power-of-two scale + floor — both
    bit-identical in every engine), and with t = p/q the rule is
    ``dot(Qa,Qb) > 0  ∧  q²·dot² ≥ p²·|Qa|²·|Qb|²`` in unbounded
    integers.  All dots/norms are exact: every partial is an integer
    < 2^53, so even float64 GEMM computes them exactly.  The float
    cosine only PREFILTERS (with an epsilon that covers quantization
    error), never decides — no cross-engine float-threshold flakes.
    """
    from fractions import Fraction

    if not 0 < min_cosine < 1:
        raise ValueError("min_cosine must be in (0, 1) for the integer decision rule")
    frac = Fraction(str(min_cosine))  # str(): 0.4 → 2/5, not the binary float
    t_p, t_q = frac.numerator, frac.denominator
    Q_SCALE = float(1 << 20)
    spark = vectors.sparkSession
    n = vectors.count()
    if n == 0:
        return spark.createDataFrame([], f"vec_a long, vec_b long, cosine double")
    k = max(1, min(n_clusters, int(np.sqrt(n)) + 1, n))

    sample_rows = hash_sample_vectors(vectors, id_col, vec_col, sample_size)
    smat = _normalize_rows(
        np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    )
    cent = _fit_centroids(smat, k)

    out_assign = f"{id_col} long, {vec_col} array<float>, cluster int, cos_c double"

    def assign_batches(it):
        for pdf in it:
            mat = _normalize_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            sims = mat @ cent.T
            cl = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    vec_col: pdf[vec_col].values,
                    "cluster": cl.astype(np.int32),
                    "cos_c": sims[np.arange(len(cl)), cl],
                }
            )

    # pin the assignment: radius + both join sides must see ONE
    # materialization (argmax near-ties may flip between recomputes)
    assigned = vectors.select(id_col, vec_col).mapInPandas(
        assign_batches, out_assign
    ).localCheckpoint(eager=True)

    radius_rows = assigned.groupBy("cluster").agg(F.min("cos_c").alias("min_cos")).collect()
    r = np.zeros(k)
    for row in radius_rows:
        r[row["cluster"]] = np.arccos(np.clip(row["min_cos"], -1.0, 1.0))
    theta = np.arccos(np.clip(cent @ cent.T, -1.0, 1.0))
    t_ang = np.arccos(np.clip(min_cosine, -1.0, 1.0))
    # slack 1e-4 covers both float round-off AND the quantized decision
    # boundary (|cos_Q − cos_float| ≲ 1e-5 at 2^20 scale) — slack only
    # ever ADDS candidate blocks, so completeness is preserved
    feasible = [
        (int(i), int(j))
        for i in range(k)
        for j in range(i, k)
        if theta[i, j] <= t_ang + r[i] + r[j] + 1e-4
    ]
    # two independent tiny pair frames + per-side column names: the two
    # cogroup inputs share the checkpointed `assigned` lineage, and
    # identical attribute ids on both sides trip the ambiguous-self-join
    # check otherwise
    pairs_a = F.broadcast(spark.createDataFrame(feasible, "a_lo int, a_hi int"))
    pairs_b = F.broadcast(spark.createDataFrame(feasible, "b_lo int, b_hi int"))
    a_side = assigned.join(pairs_a, assigned.cluster == pairs_a.a_lo).select(
        "a_lo", "a_hi", F.col(id_col).alias("_lid"), F.col(vec_col).alias("_lvec")
    )
    b_side = assigned.join(pairs_b, assigned.cluster == pairs_b.b_hi).select(
        "b_lo", "b_hi", F.col(id_col).alias("_rid"), F.col(vec_col).alias("_rvec")
    )

    def verify(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        c_lo, c_hi = int(key[0]), int(key[1])
        if left.empty or right.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        lids = left["_lid"].to_numpy()
        rids = right["_rid"].to_numpy()
        lraw = np.stack([np.asarray(v, dtype=np.float64) for v in left["_lvec"]])
        rraw = np.stack([np.asarray(v, dtype=np.float64) for v in right["_rvec"]])
        lmat = _normalize_rows(lraw)
        rmat = _normalize_rows(rraw)
        # quantized copies: float64 holding exact integers (|Q| < 2^20),
        # so the GEMMs below are exact (every partial < 2^53)
        lq = np.floor(lraw * Q_SCALE)
        rq = np.floor(rraw * Q_SCALE)
        lnorm2 = (lq * lq).sum(axis=1)
        rnorm2 = (rq * rq).sum(axis=1)
        pp, qq = t_p * t_p, t_q * t_q
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(lmat), gemm_chunk):
            sims = lmat[s : s + gemm_chunk] @ rmat.T
            # float PREFILTER only — 1e-4 covers quantization skew; the
            # integer rule below makes the accept/reject decision
            if c_lo == c_hi:
                mask = (sims >= min_cosine - 1e-4) & (
                    lids[s : s + gemm_chunk, None] < rids[None, :]
                )
            else:
                mask = sims >= min_cosine - 1e-4
            ii, jj = np.nonzero(mask)
            if len(ii):
                d = (lq[s + ii] * rq[jj]).sum(axis=1)  # exact int dots
                di = d.astype(np.int64).astype(object)  # unbounded ints:
                na = lnorm2[s + ii].astype(np.int64).astype(object)  # d²
                nb = rnorm2[jj].astype(np.int64).astype(object)  # ~2^90
                keep = (d > 0) & (qq * di * di >= pp * na * nb).astype(bool)
                ii, jj = ii[keep], jj[keep]
            la = lids[s + ii]
            rb = rids[jj]
            out_a.append(np.minimum(la, rb))
            out_b.append(np.maximum(la, rb))
            out_c.append(sims[ii, jj])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else [],
                "cosine": np.concatenate(out_c) if out_c else [],
            }
        )

    return (
        a_side.groupBy("a_lo", "a_hi")
        .cogroup(b_side.groupBy("b_lo", "b_hi"))
        .applyInPandas(verify, "vec_a long, vec_b long, cosine double")
    )
