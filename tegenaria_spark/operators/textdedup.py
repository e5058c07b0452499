"""Document deduplication suite — the training-data-pipeline operators.

These have no counterpart in the reference (its dedup is URL-level,
dupefilters.go); they are the corpus-level dedup a 100 TB crawl store
needs before training.  All are pure DataFrame compositions (shuffles
on content keys) except MinHash, whose signature step is a vectorized
pandas UDF.

Scale notes (100 TB):
- exact dedup: hash-shuffle on a 64/128-bit content hash, never on the
  raw text; group state is one row per hash.
- MinHash/LSH: signatures are fixed-width (n_perm × 8 bytes); the
  band-bucket explode multiplies rows by n_bands (constant), and the
  candidate join is per-bucket — hot buckets are bounded because a
  bucket key includes the band index.  Verification joins only
  candidate pairs, never the cross product.
- word-Jaccard: the token explode is the expensive step; PPJoin prefix
  filtering (join only the lowest-document-frequency prefix tokens,
  plus length + positional prunes — all EXACT) bounds the
  O(pairs-sharing-token) join, so a token shared by every document
  never generates the naive join's O(N²) candidates.  No lossy df_max
  cutoff is needed: the df-ascending prefix order already keeps
  ubiquitous tokens out of candidate generation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per identical text.  Groups by (hash, text) —
    exactly group-by-text even under a 64-bit hash collision, while the
    hash leads the grouping key so partitioning never clusters on long
    shared text prefixes."""
    return (
        docs.withColumn("_h", F.xxhash64(F.col(text_col)))
        .groupBy("_h", text_col)
        .agg(F.min(F.col(id_col)).alias("kept_doc_id"), F.count("*").alias("group_size"))
        .select("kept_doc_id", "group_size")
    )


# ---------------------------------------------------------------------------
# word-set Jaccard pairs (oracle-checkable near-dup)
# ---------------------------------------------------------------------------


def word_jaccard_pairs(
    docs: DataFrame,
    threshold_pct: int = 95,
    text_col: str = "text",
    id_col: str = "doc_id",
    bitset_max: int = 4096,
) -> DataFrame:
    """Near-dup pairs by word-set Jaccard ≥ threshold_pct/100 — EXACT,
    via prefix filtering (PPJoin-style).

    Candidate generation joins only each document's *prefix* tokens —
    the first ``n − ⌈t·n⌉ + 1`` under a global (doc-frequency asc,
    token) order.  Standard guarantee: two sets with Jaccard ≥ t must
    share at least one prefix token under the same global order, so no
    pair is missed; a token shared by every document (e.g. "the") never
    generates the O(N²) candidate explosion the naive token join does.
    Candidates are then verified on their FULL token sets, so results
    are identical to the naive join (the DuckDB oracle runs the naive
    form).  Comparison is integer cross-multiplied (i·100 ≥
    t·(na+nb−i)) — no float boundary cases.

    Two further PPJoin prunes (both EXACT — they only discard pairs
    that provably cannot reach the threshold):

    - length filter: J(a,b) ≥ t ⟹ t·|b| ≤ 100·|a| and t·|a| ≤ 100·|b|
      (the overlap is at most min(|a|,|b|)), so docs whose sizes differ
      by more than the ratio t never pair;
    - positional filter: a candidate matched at prefix positions
      (ra, rb) can overlap at most 1 + min(|a|−ra, |b|−rb); J ≥ t
      needs overlap ≥ t·(|a|+|b|)/(100+t), so matches too deep in both
      prefixes are discarded before the distinct.

    Without these, a homogeneous corpus (many same-length docs sharing
    rare tokens) explodes the candidate join — this was 56% of the
    sf0.1 bench suite before the filters landed.
    """
    from tegenaria_spark.operators.curation import spread_to_parallelism

    words = (
        spread_to_parallelism(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    return _jaccard_pairs_ppjoin(words, threshold_pct, bitset_max)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold_pct: int = 90,
    text_col: str = "text",
    id_col: str = "doc_id",
    bitset_max: int = 4096,
) -> DataFrame:
    """Near-dup pairs by character n-gram SET Jaccard — the shingle
    variant of :func:`word_jaccard_pairs` (robust to word-boundary
    edits that word tokens miss), same exact PPJoin machinery.

    Tokens are the distinct lowercase char n-grams.  Texts shorter than
    *n* chars (or NULL) contribute no tokens and therefore never pair,
    on both engines.

    r6 (guide §4.2): the gram set is built by a vectorized
    ``mapInArrow`` tokenizer — C-level string slicing into a per-doc
    ``set`` — instead of the interpreted Catalyst
    ``transform(sequence, substring)`` + explode + corpus-wide
    ``distinct``: the HOF build measured ~4 s at sf0.1, and the per-doc
    set emits the distinct (doc, gram) pairs directly, so the 1.5M-row
    distinct exchange disappears.  Python/JVM/DuckDB ``lower`` agree on
    this corpus (ASCII); char slicing is code-point identical."""

    def toks_gen(batches):
        import pyarrow as pa

        for batch in batches:
            pdf = batch.to_pandas()
            ids, ws = [], []
            for did, txt in zip(pdf["_id"], pdf["_t"]):
                lt = (txt or "").lower()
                for g in {lt[i : i + n] for i in range(len(lt) - n + 1)}:
                    ids.append(did)
                    ws.append(g)
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "w": ws})
            )

    from tegenaria_spark.operators.curation import spread_to_parallelism

    toks = spread_to_parallelism(
        docs.select(F.col(id_col).cast("long").alias("_id"), F.col(text_col).alias("_t"))
    ).mapInArrow(toks_gen, "doc_id long, w string")
    return _jaccard_pairs_ppjoin(toks, threshold_pct, bitset_max)


def _jaccard_pairs_ppjoin(
    words: DataFrame, threshold_pct: int, bitset_max: int = 4096
) -> DataFrame:
    """The PPJoin prefix/length/positional candidate join + exact
    verification over a distinct (doc_id, w) token table — shared by the
    word- and n-gram-tokenized entry points (docstrings above give the
    pruning-rule proofs).

    ADAPTIVE, both paths exact:

    - vocabulary ≤ *bitset_max* distinct tokens: tokens map to dense
      integer ids (df-ascending, so id order IS the PPJoin global
      order), candidates join on int keys, and verification intersects
      fixed-width BITMASKS (``bit_count`` over ≤ bitset_max/64 longs
      per doc) — measured 20× faster than intersecting string arrays
      at sf0.1 (0.7 s vs 15.6 s for 1.8M candidates).  The id map is a
      broadcast dim; the one global row_number window sorts ≤
      bitset_max rows on one task — trivially cheap by construction.
    - open vocabulary: the classic string-keyed PPJoin; verification
      re-joins candidate pairs against the token table and counts
      intersections in a shuffle aggregation (no global id assignment
      exists at 10^8+ distinct tokens without a sort bottleneck, and
      hashing ids would trade exactness for speed).

    The vocabulary count that picks the path is one tiny aggregate on
    the (checkpointed) token table the plan needs anyway.

    r6 (guide §1/§2.4): the fork-point pins are EAGER.  The lazy form
    let the downstream branches (per-doc counts, the two prefix-window
    sides, the mask build) race to materialize the shared subtree inside
    one job, recomputing the explode+distinct up to 3× — at sf0.1 every
    stage of this query measures < 1 s pinned, yet the lazy end-to-end
    plan ran 9-12 s."""
    words = words.localCheckpoint(eager=True)  # reused by both paths
    doc_freq = words.groupBy("w").agg(F.count("*").alias("df"))
    vocab = doc_freq.count()
    if vocab <= bitset_max:
        return _jaccard_pairs_bitset(words, doc_freq, threshold_pct, vocab)

    counts = words.groupBy("doc_id").agg(F.count("*").alias("n"))
    order = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("w").asc())
    ranked = (
        words.join(doc_freq, "w")
        .withColumn("_rn", F.row_number().over(order))
        .join(counts, "doc_id")
    )
    prefix_len = F.col("n") - F.ceil(F.col("n") * threshold_pct / 100) + 1
    # pinned: _ppjoin_candidates consumes the prefix table TWICE (both
    # self-join sides) — lazy, each side recomputed the window
    prefix = (
        ranked.filter(F.col("_rn") <= prefix_len)
        .select("doc_id", "w", "n", "_rn")
        .localCheckpoint(eager=True)
    )

    cands = _ppjoin_candidates(prefix, "w", threshold_pct)
    # exact verification on full token sets, restricted to candidates
    inter = (
        cands.join(words.select(F.col("doc_id").alias("da"), "w"), "da")
        .join(words.select(F.col("doc_id").alias("db"), "w"), ["db", "w"])
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    ca = counts.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "da")
        .join(cb, "db")
        .filter(
            F.col("i") * 100 >= F.lit(threshold_pct) * (F.col("na") + F.col("nb") - F.col("i"))
        )
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("i").alias("n_common"),
            (F.col("na") + F.col("nb") - F.col("i")).alias("n_union"),
        )
    )


def _ppjoin_candidates(prefix: DataFrame, key: str, threshold_pct: int) -> DataFrame:
    """Self-join the prefix-token table on *key* with the PPJoin length
    and positional prunes (both EXACT — they only discard pairs that
    provably cannot reach the threshold):

    - length filter: J(a,b) ≥ t ⟹ t·|b| ≤ 100·|a| and t·|a| ≤ 100·|b|
      (the overlap is at most min(|a|,|b|));
    - positional filter: a candidate matched at prefix positions
      (ra, rb) can overlap at most 1 + min(|a|−ra, |b|−rb); J ≥ t
      needs overlap ≥ t·(|a|+|b|)/(100+t), integer cross-multiplied.
    """
    t = F.lit(threshold_pct)
    pa = prefix.select(
        F.col("doc_id").alias("da"), key, F.col("n").alias("na"), F.col("_rn").alias("ra")
    )
    pb = prefix.select(
        F.col("doc_id").alias("db"), key, F.col("n").alias("nb"), F.col("_rn").alias("rb")
    )
    max_overlap = F.lit(1) + F.least(F.col("na") - F.col("ra"), F.col("nb") - F.col("rb"))
    return (
        pa.join(pb, key)
        .filter(F.col("da") < F.col("db"))
        .filter((F.col("na") * 100 >= t * F.col("nb")) & (F.col("nb") * 100 >= t * F.col("na")))
        .filter(max_overlap * (100 + t) >= t * (F.col("na") + F.col("nb")))
        .select("da", "db")
        .distinct()
    )


def _jaccard_pairs_bitset(
    words: DataFrame, doc_freq: DataFrame, threshold_pct: int, vocab: int
) -> DataFrame:
    """Small-vocabulary PPJoin: dense integer token ids + bitmask
    verification (docstring above).  ``wid`` ascending is exactly the
    (df asc, w asc) global prefix order, so the prefix guarantee is
    unchanged; verification is popcount over the AND of two fixed-width
    bitmasks — pure codegen integer ops, no arrays of strings."""
    wid = doc_freq.withColumn(
        "wid",
        F.row_number().over(Window.orderBy(F.col("df").asc(), F.col("w").asc())) - 1,
    ).select("w", "wid")
    # EAGER (r6): counts, the prefix window, and the mask build all fork
    # from this table inside one job — a lazy pin let them race and
    # recompute the token join (see _jaccard_pairs_ppjoin docstring)
    iwords = words.join(F.broadcast(wid), "w").select("doc_id", "wid")
    iwords = iwords.localCheckpoint(eager=True)  # candidates + masks reuse
    counts = iwords.groupBy("doc_id").agg(F.count("*").alias("n"))

    order = Window.partitionBy("doc_id").orderBy(F.col("wid").asc())
    ranked = iwords.withColumn("_rn", F.row_number().over(order)).join(counts, "doc_id")
    prefix_len = F.col("n") - F.ceil(F.col("n") * threshold_pct / 100) + 1
    # NOT pinned: both self-join sides recompute the window from the
    # iwords pin (~0.3 s each) — cheaper than another checkpoint
    # barrier + its first-run codegen (measured)
    prefix = ranked.filter(F.col("_rn") <= prefix_len).select(
        "doc_id", "wid", "n", "_rn"
    )
    cands = _ppjoin_candidates(prefix, "wid", threshold_pct)

    # per-doc fixed-width bitmask: word ids bucket into 64-bit lanes
    n_lanes = (vocab + 63) // 64
    mask = F.expr(
        f"transform(sequence(0, {n_lanes - 1}), j -> "
        "aggregate(filter(ws, w -> CAST(w DIV 64 AS INT) = j), CAST(0 AS BIGINT), "
        "(acc, w) -> acc | shiftleft(CAST(1 AS BIGINT), CAST(w % 64 AS INT))))"
    )
    masks = (
        iwords.groupBy("doc_id")
        .agg(F.collect_list("wid").alias("ws"))
        .select("doc_id", mask.alias("m"), F.size("ws").alias("n"))
    )
    # r6 (guide §4.1): intersect as PER-LANE scalar columns — bit_count
    # over lane ANDs is a codegen sum chain; the old zip_with+aggregate
    # fold over the mask arrays is an interpreted higher-order
    # expression paying per-pair allocation.  The lane extraction runs
    # once per DOC (masks side), never per candidate pair.  vocab ≤
    # bitset_max = 4096 bounds the chain at 64 terms.
    lanes = masks.select(
        "doc_id", "n", *[F.col("m")[j].alias(f"l{j}") for j in range(n_lanes)]
    )  # not pinned: both join sides recompute the tiny agg from iwords
    ma = lanes.select(
        F.col("doc_id").alias("da"),
        F.col("n").alias("na"),
        *[F.col(f"l{j}").alias(f"_a{j}") for j in range(n_lanes)],
    )
    mb = lanes.select(
        F.col("doc_id").alias("db"),
        F.col("n").alias("nb"),
        *[F.col(f"l{j}").alias(f"_b{j}") for j in range(n_lanes)],
    )
    inter_bits = None
    for j in range(n_lanes):
        term = F.bit_count(F.col(f"_a{j}").bitwiseAND(F.col(f"_b{j}")))
        inter_bits = term if inter_bits is None else inter_bits + term
    t = F.lit(threshold_pct)
    return (
        cands.join(ma, "da")
        .join(mb, "db")
        .withColumn("i", inter_bits.cast("int"))
        .filter(F.col("i") * 100 >= t * (F.col("na") + F.col("nb") - F.col("i")))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("i").alias("n_common"),
            (F.col("na") + F.col("nb") - F.col("i")).alias("n_union"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(t: str, k: int) -> np.ndarray:
    """Distinct rolling-polynomial hashes of the char k-shingles of *t*,
    fully numpy-vectorized (k shifted fused multiply-adds over the byte
    array — no per-shingle Python).  Deterministic everywhere."""
    data = np.frombuffer((t or "\x00").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=0)
    n = len(data) - k + 1
    p = np.uint64(1099511628211)  # FNV prime as the polynomial base
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * p + data[j : j + n]  # wrapping uint64 mul — deterministic
    return np.unique(acc & np.uint64((1 << 61) - 1))


def minhash_signature_udf(n_perm: int = 64, shingle_k: int = 3, seed: int = 42):
    """Vectorized MinHash over character k-shingles:
    sig_j = min over shingles of (a_j·h + b_j) mod Mersenne61.

    Batch-vectorized: all documents' shingle hashes concatenate into one
    flat array and each permutation reduces it with
    ``np.minimum.reduceat`` over the document boundaries — one pass of
    full-width numpy ops per permutation instead of a Python iteration
    per document (identical results to the per-doc form: min is
    order-independent and the hash arithmetic is elementwise)."""
    a, b = _minhash_params(n_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def signature(texts: pd.Series) -> pd.Series:
        m = np.uint64(_MERSENNE)
        hvs = [_shingle_hashes(t, shingle_k) for t in texts]
        if not hvs:
            return pd.Series([], dtype=object)
        flat = np.concatenate(hvs)
        starts = np.cumsum([0] + [len(h) for h in hvs[:-1]])
        sigs = np.empty((n_perm, len(hvs)), dtype=np.int64)
        for j in range(n_perm):
            vals = (a[j] * flat + b[j]) % m
            sigs[j] = np.minimum.reduceat(vals, starts).astype(np.int64)
        return pd.Series(sigs.T.tolist())

    return signature


def minhash_lsh_pairs(
    docs: DataFrame,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    broadcast_max_docs: int = 100_000,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified by signature similarity.

    sig → split into n_bands bands → hash each band → join docs sharing
    any (band_idx, band_hash) bucket → estimate Jaccard as the fraction
    of agreeing signature positions → filter ≥ threshold."""
    rows_per_band = n_perm // n_bands
    sig_udf = minhash_signature_udf(n_perm, shingle_k, seed)
    sigs = docs.select(F.col(id_col).alias("doc_id"), sig_udf(F.col(text_col)).alias("sig"))
    # signatures feed the band explode AND the verify join — pin once.
    # EAGER: the band-join stage and the verify-probe stage are
    # independent, so with a lazy pin both can race to materialize the
    # subtree and the pandas UDF runs twice (measured: lazy runs
    # 13-33 s at sf0.1, eager 11-15 s)
    sigs = sigs.localCheckpoint(eager=True)

    # r6: the pinned signature table inherits the corpus SCAN's
    # partitioning (1-2 parquet splits at bench scale), which would run
    # the band join's 11M-row output and the partial distinct on 1-2
    # cores — spread it to the session's parallelism first (a 5000-row
    # repartition; at scale the scan already has enough splits and this
    # is a no-op branch).  Measured: candidate stage 6.0 s → ~1.5 s.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if sigs.rdd.getNumPartitions() < par:
        sigs_stream = sigs.repartition(par)
    else:
        sigs_stream = sigs
    # the band join carries ONLY (doc_id, band, bucket) — signatures are
    # fixed-width but 64×8B each; shipping them through the candidate
    # shuffle multiplies it by n_bands for nothing
    bands = sigs_stream.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    raw_pairs = (
        bands.select(F.col("doc_id").alias("da"), "band", "bucket")
        .join(bands.select(F.col("doc_id").alias("db"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("da") < F.col("db"))
    )
    # verify (r6, guide §4.2/§2.3): the old per-pair Catalyst fold
    # (aggregate over sequence(1, n_perm) with element_at) is an
    # INTERPRETED higher-order expression — measured ~135 µs/pair, 26.5 s
    # over the 6.3M sf0.1 candidates, the whole query's long pole.  Two
    # exact replacements, chosen by corpus size:
    #
    # - small corpus (sig matrix fits an executor broadcast): collect the
    #   pinned signature table once (n_docs × n_perm × 8 B — the same
    #   relation the old plan broadcast for BOTH hash joins), broadcast
    #   the numpy matrix, and verify candidates in a mapInArrow pass —
    #   candidates stream as (da, db) longs only, agreement is one
    #   vectorized (mat[ia] == mat[ib]).sum(1) per batch.  Measured
    #   26.5 s → 1.5 s.
    # - large corpus: per-position scalar columns (element_at runs once
    #   per DOC on the build side, not once per pair) + a codegen sum of
    #   64 IF terms; joins degrade gracefully to sort-merge when the
    #   build side outgrows broadcast.  Measured 26.5 s → 8.4 s at sf0.1.
    n_docs = sigs.count()  # metadata-cheap: sigs is an eager checkpoint
    if n_docs <= broadcast_max_docs:
        import pyarrow as pa

        rows = sigs.collect()
        ids = np.fromiter((r["doc_id"] for r in rows), dtype=np.int64, count=len(rows))
        mat = np.array([r["sig"] for r in rows], dtype=np.int64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        bc = docs.sparkSession.sparkContext.broadcast((ids, mat))
        # ids in [0, 2^31): pack the pair into ONE long so the distinct
        # (the query's only exchange) shuffles an 8-byte key with a
        # single-column hash instead of a 16-byte two-column row
        pack = len(ids) > 0 and ids[0] >= 0 and ids[-1] < (1 << 31)
        if pack:
            cands = (
                raw_pairs.select(
                    (F.shiftleft(F.col("da"), 32) + F.col("db")).alias("pk")
                ).distinct()
            )
        else:
            cands = raw_pairs.select("da", "db").distinct()

        def verify(batches):
            bids, bmat = bc.value
            for batch in batches:
                pdf = batch.to_pandas()
                if pack:
                    pk = pdf["pk"].to_numpy()
                    da = pk >> 32
                    db = pk & 0xFFFFFFFF
                else:
                    da = pdf["da"].to_numpy()
                    db = pdf["db"].to_numpy()
                ia = np.searchsorted(bids, da)
                ib = np.searchsorted(bids, db)
                est = (bmat[ia] == bmat[ib]).sum(axis=1) / float(n_perm)
                keep = est >= threshold
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(
                        {
                            "doc_a": da[keep],
                            "doc_b": db[keep],
                            "est_jaccard": est[keep],
                        }
                    )
                )

        return cands.mapInArrow(verify, "doc_a long, doc_b long, est_jaccard double")

    cands = raw_pairs.select("da", "db").distinct()
    wide = sigs.select(
        "doc_id", *[F.element_at("sig", j + 1).alias(f"s{j}") for j in range(n_perm)]
    )
    wa = wide.select(
        F.col("doc_id").alias("da"), *[F.col(f"s{j}").alias(f"_a{j}") for j in range(n_perm)]
    )
    wb = wide.select(
        F.col("doc_id").alias("db"), *[F.col(f"s{j}").alias(f"_b{j}") for j in range(n_perm)]
    )
    agree = None
    for j in range(n_perm):
        term = F.when(F.col(f"_a{j}") == F.col(f"_b{j}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    return (
        cands.join(wa, "da")
        .join(wb, "db")
        .withColumn("est_jaccard", agree / F.lit(n_perm))
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"), "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def py_simhash(text: str, seed: int = 42) -> int:
    """Single-doc SimHash twin (signed int64) — the oracle-side spec of
    :func:`simhash_table`; bit-identical by the XXH64 JVM/Python parity."""
    from tegenaria_spark.functions.xxh64 import xxh64_unsigned

    words = {w for w in (text or "").lower().split(" ") if w}
    if not words:
        return 0
    hv = np.fromiter((xxh64_unsigned(w.encode("utf-8"), seed) for w in words), dtype=np.uint64)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    val = 0
    for j in range(64):
        if votes[j] > 0:
            val |= 1 << j
    return val - (1 << 64) if val >= (1 << 63) else val


def simhash_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct word unigrams — entirely JVM-side.

    The per-word hash is Spark's built-in ``xxhash64`` (seed 42, same
    bits as the Python twin), the 64 bit-votes are 64 conditional-sum
    aggregates inside whole-stage codegen, and the hash assembles from
    the vote signs — zero Python in the hot path (the old pandas UDF
    hashed every token in pure Python)."""
    from tegenaria_spark.operators.curation import spread_to_parallelism

    words = (
        spread_to_parallelism(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
        .withColumn("_h", F.xxhash64(F.col("w")))
    )
    bit = lambda j: F.shiftrightunsigned(F.col("_h"), j).bitwiseAND(F.lit(1))  # noqa: E731
    votes = words.groupBy("doc_id").agg(
        F.count("*").alias("_n"),
        *[F.sum(bit(j)).alias(f"_b{j}") for j in range(64)],
    )
    # vote_j = 2·ones_j − n > 0  ⇔  2·ones_j > n; set bit j of the hash
    sim = None
    for j in range(64):
        term = F.when(F.col(f"_b{j}") * 2 > F.col("_n"), F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim.bitwiseOR(term)
    hashed = votes.select("doc_id", sim.alias("simhash"))
    # docs with no words (empty text) have no vote rows — simhash 0
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hashed, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("simhash"), F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_chunk_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per block for a COMPLETE pigeonhole guarantee at
    the requested radius: max_hamming+1 blocks — a pair differing in at
    most max_hamming bits cannot touch every block, so it shares at
    least one block exactly.  64 bits split as evenly as possible."""
    k = max_hamming + 1
    if not 1 <= k <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    base, rem = divmod(64, k)
    layout, shift = [], 0
    for i in range(k):
        width = base + (1 if i < rem else 0)
        layout.append((shift, width))
        shift += width
    return layout


def hamming_near_pairs(
    hashed: DataFrame,
    max_hamming: int = 8,
    hash_col: str = "simhash",
    id_col: str = "doc_id",
    out_a: str = "doc_a",
    out_b: str = "doc_b",
) -> DataFrame:
    """Pairs within *max_hamming* of any 64-bit hash column, block-joined
    on max_hamming+1 bit-chunks — the pigeonhole count that makes the
    blocking COMPLETE at the requested radius.  More blocks ⇒ more join
    fan-out: the radius is the recall contract AND the cost knob.

    Generic over the hash's provenance: SimHash text sketches
    (:func:`simhash_near_pairs`) and image pHashes
    (operators/multimodal.py ``phash_near_pairs``) share this exact
    plan — chunk explode, per-chunk self-join, popcount verify."""
    layout = simhash_chunk_layout(max_hamming)
    chunks = hashed.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col(hash_col), shift)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i, (shift, width) in enumerate(layout)
                ]
            )
        ).alias("c"),
    ).select("_id", "_h", "c.chunk_idx", "c.chunk")
    a = chunks.select(F.col("_id").alias("da"), F.col("_h").alias("ha"), "chunk_idx", "chunk")
    b = chunks.select(F.col("_id").alias("db"), F.col("_h").alias("hb"), "chunk_idx", "chunk")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    # r6 (guide §2.3): the hamming verify is codegen bit_count — run it
    # BEFORE dropDuplicates so the pair exchange only carries pairs
    # within the radius (sf0.1: 13.2M joined rows → 0.63M survivors;
    # the old order shuffled all 7.7M distinct candidate pairs first —
    # 9.7 s → 2.3 s).  Filter and dedup commute: hamming is a pure
    # function of the pair, so the surviving pair SET is identical.
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("da") < F.col("db"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["da", "db"])
        .select(F.col("da").alias(out_a), F.col("db").alias(out_b), "hamming")
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8, **kw) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance (blocking guarantees
    in :func:`hamming_near_pairs`)."""
    return hamming_near_pairs(simhash_table(docs, **kw), max_hamming)


def _positions_of_duplicated_grams(grams: DataFrame, min_occ: int) -> DataFrame:
    """``(doc_id, pos)`` of every gram-stream row whose gram occurs
    ≥ *min_occ* times corpus-wide.

    Skew-proof two-level shape (r4 verdict #4): a map-side-combined
    ``groupBy(gram).count()`` (partial aggregation bounds any one gram's
    reducer input by the MAP-TASK count, not its occurrence count)
    followed by a semi join back to the gram stream.  The join hashes
    a hot gram's positions to one partition too, but sort-merge join
    partitions are AQE-skew-SPLITTABLE (OptimizeSkewedJoin), which a
    ``count().over(partitionBy(g))`` window is not — under the window,
    a boilerplate gram with 10^8 occurrences at the 100 TB design
    point was a single-task straggler by construction.

    r6 (guide §2.3 "narrower types"): *grams* arrives pre-hashed —
    ``(doc_id, pos, gh)`` from ``curation.word_ngram_hash_stream`` —
    so both exchanges key on an 8-byte integer instead of the ~50-byte
    gram string.  Gram equality becomes hash equality (the 2^-64
    collision the fingerprint ops in this repo already accept; the r5
    verdict prescribed exactly this swap for the petabyte design
    point)."""
    occ = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_occ)
        .select("gh")
    )
    return grams.join(occ, "gh", "left_semi").select("doc_id", "pos")


def duplicate_token_spans(
    docs: DataFrame,
    n: int = 8,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring dedup, span-emission stage (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    ExactSubstr dedup their suffix-array pipeline computes): per
    document, every MAXIMAL token span all of whose length-*n* token
    windows occur ≥ *min_occ* times corpus-wide (all positions count,
    self-repeats included — a doc that repeats its own boilerplate is
    deduplicated against itself, matching the paper's definition of a
    substring that "appears more than once" in the corpus).

    Output: ``(doc_id, start_tok, end_tok, span_len)`` with 0-based
    inclusive token indices; consecutive duplicated windows merge into
    one maximal span (gap-and-island).  Feed the spans to
    :func:`strip_duplicate_spans` to materialize cleaned text.

    Plan shape (100 TB): the suffix array of the paper is a
    single-machine construct; the distributed equivalent is bounded
    exchanges.  Stage 1 finds duplicated grams with a map-side-combined
    ``groupBy(gram-hash).count()`` + semi join back (skew-proof — see
    :func:`_positions_of_duplicated_grams`).  Stage 2 re-partitions
    surviving positions BY DOC for the island window — its volume is
    only the DUPLICATED windows, a small fraction of the corpus in the
    non-pathological case.  No driver state.

    r6: the gram stream comes from the vectorized mapInArrow tokenizer
    (``word_ngram_hash_stream`` — guide §4.2; the interpreted Catalyst
    window builder was ~10 µs/window and dominated the query), hashed
    to 8-byte keys, generated ONCE and pinned for the aggregate + probe
    sides (a lazy stream would re-run the tokenizer per consumer).
    """
    from tegenaria_spark.operators.curation import word_ngram_hash_stream

    grams = word_ngram_hash_stream(
        docs, n, text_col=text_col, id_col=id_col, positional=True
    ).withColumnRenamed(id_col, "doc_id")
    grams = grams.localCheckpoint(eager=True)
    dup = _positions_of_duplicated_grams(grams, min_occ)
    isl = dup.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("start_tok"),
        (F.max("pos") + (n - 1)).cast("long").alias("end_tok"),
        (F.max("pos") - F.min("pos") + n).cast("long").alias("span_len"),
    ).select("doc_id", "start_tok", "end_tok", "span_len")


def strip_duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring dedup, removal stage: drop every token covered
    by a duplicated span (see :func:`duplicate_token_spans`) and
    re-join the survivors.  Output ``(doc_id, n_tokens, n_removed,
    clean_text)`` for every document (docs with no duplicated span
    pass through with ``n_removed = 0``).

    Plan shape (100 TB): the corpus is NEVER exploded into token rows
    for the removal — only the gram stream is (for the duplicated-gram
    filter, as in the span stage).  Duplicated-window positions expand to
    covered token positions (``explode(sequence)`` + distinct, volume
    bounded by n × duplicated windows), collapse back to ONE sorted
    array per document, and join the corpus on doc_id — a
    dimension-per-doc join, not a token-stream shuffle.  Removal is
    then row-local Catalyst array work: an indexed ``filter`` lambda
    against the covered set (cost O(tokens × |covered|) per doc —
    quadratic only for a fully-duplicated doc, where the span stage
    already marks everything).
    """
    from tegenaria_spark.operators.curation import word_ngram_hash_stream

    # r6: hashed mapInArrow gram stream, generated once and pinned
    # (guide §4.2/§2.3 — see duplicate_token_spans)
    grams = word_ngram_hash_stream(
        docs, n, text_col=text_col, id_col=id_col, positional=True
    ).withColumnRenamed(id_col, "doc_id")
    grams = grams.localCheckpoint(eager=True)
    covered = (
        _positions_of_duplicated_grams(grams, min_occ)
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("cov"))
    )
    toks_arr = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != "",
    )
    empty_cov = F.expr("cast(array() as array<int>)")
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks_arr.alias("ws"))
        .join(covered, "doc_id", "left")
        .withColumn("cov", F.coalesce("cov", empty_cov))
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_tokens"),
            F.size("cov").cast("long").alias("n_removed"),
            F.array_join(
                F.filter("ws", lambda w, i: ~F.array_contains("cov", i)), " "
            ).alias("clean_text"),
        )
    )
