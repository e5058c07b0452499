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
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
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

    Tokens are the distinct lowercase char n-grams, generated JVM-side
    (``sequence`` + ``transform`` + ``substring`` inside codegen — no
    Python).  Texts shorter than *n* chars (or NULL) contribute no
    tokens and therefore never pair, on both engines."""
    lowered = f"lower({text_col})"
    grams = F.when(
        F.length(F.col(text_col)) >= n,
        # sequence(1, stop) with stop < 1 would generate DESCENDING —
        # the length guard keeps stop ≥ 1
        F.expr(
            f"transform(sequence(1, length({lowered}) - {n - 1}), "
            f"i -> substring({lowered}, i, {n}))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("w"))
        .distinct()
    )
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
    the (checkpointed) token table the plan needs anyway."""
    words = words.localCheckpoint(eager=False)  # reused by both paths
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
    prefix = ranked.filter(F.col("_rn") <= prefix_len).select("doc_id", "w", "n", "_rn")

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
    iwords = words.join(F.broadcast(wid), "w").select("doc_id", "wid")
    iwords = iwords.localCheckpoint(eager=False)  # candidates + masks reuse
    counts = iwords.groupBy("doc_id").agg(F.count("*").alias("n"))

    order = Window.partitionBy("doc_id").orderBy(F.col("wid").asc())
    ranked = iwords.withColumn("_rn", F.row_number().over(order)).join(counts, "doc_id")
    prefix_len = F.col("n") - F.ceil(F.col("n") * threshold_pct / 100) + 1
    prefix = ranked.filter(F.col("_rn") <= prefix_len).select("doc_id", "wid", "n", "_rn")
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
    inter_bits = F.expr(
        "aggregate(zip_with(ma, mb, (x, y) -> bit_count(x & y)), 0, (a, b) -> a + CAST(b AS INT))"
    )
    t = F.lit(threshold_pct)
    return (
        cands.join(
            masks.select(F.col("doc_id").alias("da"), F.col("m").alias("ma"), F.col("n").alias("na")),
            "da",
        )
        .join(
            masks.select(F.col("doc_id").alias("db"), F.col("m").alias("mb"), F.col("n").alias("nb")),
            "db",
        )
        .withColumn("i", inter_bits)
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

    # the band join carries ONLY (doc_id, band, bucket) — signatures are
    # fixed-width but 64×8B each; shipping them through the candidate
    # shuffle multiplies it by n_bands for nothing
    bands = sigs.select(
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

    cands = (
        bands.select(F.col("doc_id").alias("da"), "band", "bucket")
        .join(bands.select(F.col("doc_id").alias("db"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    # verify: join the (small, pinned) signature table back per side
    paired = cands.join(
        sigs.select(F.col("doc_id").alias("da"), F.col("sig").alias("sig_a")), "da"
    ).join(sigs.select(F.col("doc_id").alias("db"), F.col("sig").alias("sig_b")), "db")
    # positional agreement as a fold of scalar comparisons — measured 3×
    # faster than zip_with+filter+size (those materialize two
    # intermediate arrays per pair; at sf0.1 the verify step runs over
    # 6M candidate pairs, so per-pair allocations dominate)
    agree = F.expr(
        f"aggregate(sequence(1, {n_perm}), 0, "
        "(acc, j) -> acc + IF(element_at(sig_a, j) = element_at(sig_b, j), 1, 0))"
    )
    return (
        paired.withColumn("est_jaccard", agree / F.lit(n_perm))
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
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
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
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("da") < F.col("db"))
        .dropDuplicates(["da", "db"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
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
    ``groupBy(g).count()`` (partial aggregation bounds any one gram's
    reducer input by the MAP-TASK count, not its occurrence count)
    followed by a semi join back to the gram stream.  The join hashes
    a hot gram's positions to one partition too, but sort-merge join
    partitions are AQE-skew-SPLITTABLE (OptimizeSkewedJoin), which a
    ``count().over(partitionBy(g))`` window is not — under the window,
    a boilerplate gram with 10^8 occurrences at the 100 TB design
    point was a single-task straggler by construction."""
    occ = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_occ)
        .select("g")
    )
    return grams.join(occ, "g", "left_semi").select("doc_id", "pos")


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
    ``groupBy(gram).count()`` + semi join back (skew-proof — see
    :func:`_positions_of_duplicated_grams`; the gram string is the
    key, so the count is exact, not hash-approximate; at petabyte
    scale swap the key for ``xxhash64(g)`` and accept the 2^-64
    collision).  Stage 2 re-partitions surviving positions BY DOC for
    the island window — its volume is only the DUPLICATED windows, a
    small fraction of the corpus in the non-pathological case.  No
    driver state, no Python in the pipeline (pure Catalyst).
    """
    from tegenaria_spark.operators.curation import word_ngrams_col

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams_col(text_col, n)).alias("pos", "g"),
    )
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
    from tegenaria_spark.operators.curation import word_ngrams_col

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams_col(text_col, n)).alias("pos", "g"),
    )
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
