"""Connected components + canonical-member selection — the final stage
of a near-dup pipeline (pairs -> clusters -> keep one representative).

Every near-dup operator in this repo (word/ngram Jaccard, MinHash-LSH,
SimHash, embedding IVF, image pHash) emits PAIRS.  A real training-data
pipeline must then group transitively-connected documents into one
cluster and keep a single canonical copy — pairs alone over-delete
(A~B, B~C: deleting "the dup of each pair" can drop all three).  The
reference has no corpus-level analog (its dedup is URL-level,
dupefilters.go); this is the corpus-side completion.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", ACM SoCC'14).  Both steps are pure DataFrame ops
(groupBy-min + join); the edge set converges to a star forest whose
edges are exactly (node -> component-min).  Rounds are O(log n) in the
WORST case — independent of component diameter, unlike naive min-label
propagation which needs O(diameter) rounds and dies on long chains
(a 10^6-doc boilerplate chain at 100 TB would need 10^6 rounds; this
needs ~20).

Scale notes (100 TB):
- state is only the edge set itself — no driver-side structures; the
  per-round driver work is one signature aggregate (2 longs).
- each round is two shuffles on node ids (groupBy + join); hot nodes
  (a near-dup "hub") shrink after the first large-star because all its
  larger neighbors re-point to the component min.
- `localCheckpoint` truncates lineage every round, so the plan does
  not grow with iterations (the classic iterative-Spark trap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _canonical_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (hi, lo) with hi > lo, self-loops dropped.
    Works for any orderable node type (long doc_ids, string image_ids)."""
    return (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor v to
    min(N(u) ∪ {u}).  Emitted as canonical (v, m) pairs — v > u >= m."""
    both = canon.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
        canon.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = both.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        both.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """For each node u: connect u and all its smaller neighbors to the
    smallest of them.  Operates directly on the canonical (hi, lo)
    form — the lo's of a given hi ARE its smaller neighborhood."""
    g = canon.groupBy("hi").agg(F.min("lo").alias("m"))
    out = (
        canon.join(g, "hi")
        .select(F.col("lo").alias("a"), F.col("m").alias("b"))
        .unionAll(g.select(F.col("hi").alias("a"), F.col("m").alias("b")))
    )
    return (
        out.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
        .distinct()
    )


def _signature(canon: DataFrame):
    """Set convergence signature: (row count, xor of per-row xxhash64).
    XOR is commutative and overflow-free (sum would trip ANSI int64
    overflow); the edge set is distinct, so equal signatures across
    rounds => identical edge sets w.h.p. — one tiny aggregate/round."""
    return canon.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(hi, lo))").alias("h"),
    ).first()


def _cc_driver(canon: DataFrame) -> DataFrame:
    """Small-graph fast path: union-find over a DRIVER-collected edge
    set.  Exact same contract as the distributed loop — (node,
    component-min) for every node in the edge set.  Only entered when
    the deduplicated edge count is under ``driver_max_edges`` (the
    caller has already counted it), so the collect is bounded by
    construction; ordering note: python ``min`` on str compares by
    code point, identical to Spark's UTF-8 binary `least` (UTF-8 is
    code-point order-preserving)."""
    pdf = canon.toPandas()  # arrow path; ≤ driver_max_edges rows
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(pdf["hi"], pdf["lo"]):
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    node_t = canon.schema["hi"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node", node_t, False), StructField("component", node_t, False)]
    )
    rows = [(x, comp_min[find(x)]) for x in parent]
    return canon.sparkSession.createDataFrame(rows, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Component assignment for every node that appears in *pairs*:
    returns (node, component) where component is the smallest node id
    in the connected component.  Root nodes map to themselves;
    nodes absent from *pairs* are absent here (join + coalesce for a
    full assignment — see `canonical_assignments`).

    r6 adaptive split (guide §1.2): each large-star/small-star round is
    two shuffles + a checkpoint + a convergence probe — per-ROUND driver
    job constants that dwarf the work when the edge set is small (sf0.1:
    190k edges over 2.3k nodes ran the loop for 4.7 s; a driver
    union-find answers in well under a second).  Edge sets at or under
    *driver_max_edges* (a bounded, ≤ ~16 MB Arrow collect — same
    bounded-collect discipline as ``similarity.hash_sample_vectors``)
    take the union-find path; anything larger runs the O(log n)
    distributed loop, which remains the 100 TB design point.  The edge
    count that picks the path is the signature aggregate the loop needs
    anyway."""
    canon = _canonical_edges(pairs, src, dst).localCheckpoint()
    sig = _signature(canon)
    if 0 < sig.n <= driver_max_edges:
        return _cc_driver(canon)
    for _ in range(max_iter):
        if sig.n == 0:
            break
        nxt = _small_star(_large_star(canon)).localCheckpoint()
        nsig = _signature(nxt)
        canon = nxt
        if (nsig.n, nsig.h) == (sig.n, sig.h):
            break
        sig = nsig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # star forest: every edge is (member, root); roots map to themselves
    members = canon.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    roots = canon.select(F.col("lo").alias("node"), F.col("lo").alias("component")).distinct()
    return members.unionAll(roots).distinct()


def canonical_assignments(
    ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    src: str = "doc_a", dst: str = "doc_b", max_iter: int = 50,
) -> DataFrame:
    """Full-corpus canonical map: every id in *ids* gets its component
    min (itself when it has no near-dups).  Output: (id_col, component)."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    cc = cc.withColumnRenamed("node", id_col)
    return ids.select(id_col).distinct().join(cc, id_col, "left").select(
        id_col, F.coalesce("component", F.col(id_col)).alias("component")
    )
