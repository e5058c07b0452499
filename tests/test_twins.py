"""Parity tests for the oracle twins (tegenaria_spark/oracle_twins.py)
and the exactness guarantees of the pruned operators.

These lock the contracts the expected-fixture oracles rely on:
- Spark's ``F.aggregate`` double fold ≡ the twin's ``np.cumsum`` fold;
- JVM simhash / winnowing ≡ their single-threaded Python twins;
- fixed-point SRP buckets are bit-identical Spark vs numpy;
- IVF-pruned near-dup ≡ the all-pairs crossJoin (exactness of the
  triangle-inequality pruning).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(1234)


def test_fold_dot_matches_spark_aggregate(spark, rng):
    from tegenaria_spark.oracle_twins import fold_cosine

    vecs = rng.normal(size=(20, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], [float(x) for x in vecs[(i + 1) % 20]]) for i in range(20)],
        "i long, a array<float>, b array<float>",
    )
    from tegenaria_spark.operators.similarity import cosine_col

    got = {r["i"]: r["c"] for r in df.select("i", cosine_col(F.col("a"), F.col("b")).alias("c")).collect()}
    for i in range(20):
        want = fold_cosine(vecs[i], vecs[(i + 1) % 20])
        assert got[i] == want, f"fold mismatch at {i}: {got[i]!r} != {want!r}"


def test_simhash_jvm_matches_python_twin(spark):
    from tegenaria_spark.operators.textdedup import py_simhash, simhash_table

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, ""),
        (3, "   "),
        (4, "único cañón über tokens ünïcode"),
        (5, "repeated repeated repeated words words"),
    ]
    got = {r["doc_id"]: r["simhash"] for r in simhash_table(_docs(spark, rows)).collect()}
    for did, text in rows:
        assert got[did] == py_simhash(text), f"simhash mismatch doc {did}"


def test_winnow_jvm_matches_python_twin(spark):
    from tegenaria_spark.operators.textstats import doc_fingerprints, py_winnow_fp
    from tegenaria_spark.functions.xxh64 import xxh64_str

    rows = [
        (0, "short"),
        (1, "exactly8!"),
        (2, "a much longer document body with enough characters to winnow"),
        (3, ""),
        (4, "0123456789" * 13),
    ]
    out = {r["doc_id"]: r for r in doc_fingerprints(_docs(spark, rows)).collect()}
    for did, text in rows:
        assert out[did]["winnow_fp"] == py_winnow_fp(text), f"winnow mismatch doc {did}"
        assert out[did]["content_hash"] == xxh64_str(text)


def test_srp_bucket_bit_identical(spark, rng):
    from tegenaria_spark.operators.similarity import (
        srp_bucket_matrix,
        srp_planes_int,
        srp_signature_udf,
    )

    dim, n_bits, seed = 16, 8, 77
    vecs = rng.normal(size=(50, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)], "i long, v array<float>"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", srp_signature_udf(dim, n_bits, seed)(F.col("v")).alias("b")).collect()
    }
    want = srp_bucket_matrix(vecs.astype(np.float64), srp_planes_int(dim, n_bits, seed))
    for i in range(50):
        assert got[i] == int(want[i])


def test_ivf_neardup_equals_crossjoin(spark, rng):
    from tegenaria_spark.operators.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_exact,
    )

    # clustered data: 30 base vectors, each with 2 noisy near-dups
    base = rng.normal(size=(30, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):
            v = b + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v.astype(np.float32)]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs_exact(df, min_cosine=0.6).collect()
    }
    pruned = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(df, min_cosine=0.6, n_clusters=8, sample_size=90).collect()
    }
    assert pruned == exact
    assert len(exact) >= 30  # the seeded near-dups are found


def test_ppjoin_filters_are_exact(spark, rng):
    """Length+positional-filtered prefix join ≡ naive all-pairs Jaccard."""
    from tegenaria_spark.operators.textdedup import word_jaccard_pairs

    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        k = 5 + int(rng.randint(0, 10))
        words = list(rng.choice(vocab, size=k, replace=False))
        rows.append((i, " ".join(words)))
        if i % 3 == 0:  # a clone with one word changed — high Jaccard
            w2 = list(words)
            w2[-1] = "zz" + str(i)
            rows.append((1000 + i, " ".join(w2)))
    docs = _docs(spark, rows)

    got = {
        (r["doc_a"], r["doc_b"]) for r in word_jaccard_pairs(docs, threshold_pct=80).collect()
    }

    # naive twin
    sets = {did: {w for w in text.lower().split(" ") if w} for did, text in rows}
    want = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and i * 100 >= 80 * u:
                want.add((a, b))
    assert got == want


def test_fetch_stage_survives_multiple_arrow_batches(spark):
    """Regression: per-batch option handling must survive >1 Arrow batch
    per partition (a loop variable once shadowed the option helper and
    only the second batch crashed — single-batch tests missed it)."""
    from datetime import datetime, timezone

    from tegenaria_spark.config import EngineConfig
    from tegenaria_spark.functions.canonical import with_canonical, with_fingerprint
    from tegenaria_spark.operators.fetch import fetch_stage
    from tegenaria_spark.schemas import FRONTIER_SCHEMA
    from tegenaria_spark.sources.synth import SiteConfig, seed_urls

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        site = SiteConfig(n_domains=2, pages_per_domain=10)
        ts0 = datetime.fromtimestamp(1_700_000_000, tz=timezone.utc)
        rows = [
            {**r, "next_fetch_time": ts0}
            for r in seed_urls(site, n_seeds=40, option_ratio=0.5)
        ]
        df = with_fingerprint(with_canonical(spark.createDataFrame(rows, FRONTIER_SCHEMA)))
        df = df.filter("valid").coalesce(1)  # 1 partition ⇒ 5 Arrow batches
        out = fetch_stage(df, site, EngineConfig()).collect()
        assert len(out) == 40
        assert all(r["status"] is not None for r in out)
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_ivf_twin_catches_planted_fit_bug(rng):
    """r4 verdict #5 (carried ADVICE): the IVF oracle twin must be
    sensitive to centroid-FIT bugs.  The twin re-derives the fit with
    its own numpy code (oracle_twins._twin_ivf_centroids_int); this
    locks (a) the two independent implementations agree on the spec,
    and (b) a seeded bug planted in the operator's fit (one Lloyd
    iteration short) produces different centroids AND flips cell
    assignments — i.e. the driver gate would fail, not silently pass."""
    import numpy as np

    from tegenaria_spark.operators.similarity import ivf_assign, ivf_fit_centroids_int
    from tegenaria_spark.oracle_twins import (
        _twin_ivf_centroids_int,
        _twin_ivf_project,
    )

    mat = rng.standard_normal((512, 32))
    good = ivf_fit_centroids_int(mat, 16)
    twin = _twin_ivf_centroids_int(mat, 16)
    assert np.array_equal(good, twin)

    planted = ivf_fit_centroids_int(mat, 16, iters=7)  # the seeded bug
    assert not np.array_equal(planted, twin)
    assign_bug = ivf_assign(mat, planted)
    assign_twin = np.argmax(_twin_ivf_project(mat, twin), axis=1)
    # the fit bug propagates to visible cell-assignment differences —
    # candidate sets (and thus the gate's value hash) diverge
    assert (assign_bug != assign_twin).any()
