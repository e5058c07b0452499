"""End-to-end training-data curation over a crawled corpus — the
recipe a user runs after the crawl fills the image+caption/document
store, composed entirely from this repo's oracle-checked operators:

    1. rule filters   — Gopher + C4 keep decisions (quality_rule_flags)
    2. exact dedup    — collapse byte-identical docs (exact_dedup)
    3. ExactSubstr    — strip cross-document duplicated spans
                        (strip_duplicate_spans, Lee et al. 2022)
    4. near-dedup     — MinHash-LSH pairs → connected components →
                        keep one canonical doc per cluster
    5. reweight       — sample each source stratum down to a token
                        budget (reweight_to_token_budget)
    6. pack           — concat-and-chunk into training sequences
                        (pack_sequences)

Every stage is a DataFrame → DataFrame transform: the whole pipeline
is ONE lazy plan per materialization point, Catalyst sees across
stages, and each stage's plan argument for 100 TB is in its docstring.

Run (defaults are demo-tiny, reads the driver's testdata):

    python examples/curation_pipeline.py --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.operators.cluster import canonical_assignments
from tegenaria_spark.operators.curation import (
    pack_sequences,
    reweight_to_token_budget,
)
from tegenaria_spark.operators.textdedup import (
    exact_dedup,
    minhash_lsh_pairs,
    strip_duplicate_spans,
)
from tegenaria_spark.operators.textstats import quality_rule_flags
from tegenaria_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--token-budget", type=int, default=20_000)
    ap.add_argument("--seq-len", type=int, default=512)
    args = ap.parse_args()

    spark = get_spark(
        "curation-pipeline", master="local[8]", config=EngineConfig(shuffle_partitions=8)
    )
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. rule filters: keep docs passing the Gopher lexical rules
    flags = quality_rule_flags(docs)
    docs = docs.join(flags.filter(F.col("gopher_keep")).select("doc_id"), "doc_id")
    n1 = docs.count()

    # 2. exact dedup: one survivor per byte-identical text group
    kept = exact_dedup(docs).select(F.col("kept_doc_id").alias("doc_id"))
    docs = docs.join(kept, "doc_id")
    n2 = docs.count()

    # 3. ExactSubstr: strip spans whose 8-token windows recur corpus-wide
    cleaned = strip_duplicate_spans(docs, n=8, min_occ=2)
    docs = (
        docs.drop("text")
        .join(cleaned.select("doc_id", "n_removed", F.col("clean_text").alias("text")), "doc_id")
    )
    removed_tokens = docs.agg(F.sum("n_removed")).collect()[0][0]

    # 4. near-dedup: MinHash-LSH pairs -> CC -> canonical per cluster
    pairs = minhash_lsh_pairs(docs, n_perm=64, n_bands=16, threshold=0.7)
    assign = canonical_assignments(
        docs.select("doc_id"), pairs.select("doc_a", "doc_b")
    )
    docs = docs.join(
        assign.filter(F.col("doc_id") == F.col("component")).select("doc_id"), "doc_id"
    )
    n4 = docs.count()

    # 5. reweight: equal target shares per source stratum, capped at a
    # total token budget (the DoReMi/CCNet mixing step)
    shares = {s: 166 for s in ("src0", "src1", "src2", "src3", "src4", "src5")}
    sampled = reweight_to_token_budget(docs, shares, args.token_budget)
    docs = docs.join(sampled.select("doc_id"), "doc_id")
    n5 = docs.count()

    # 6. pack into fixed-length training sequences
    packed = pack_sequences(docs, seq_len=args.seq_len)
    n_seqs = (
        packed.groupBy("shard").agg(F.max("seq_last").alias("mx"))
        .agg(F.sum(F.col("mx") + 1))
        .collect()[0][0]
    )

    print(
        json.dumps(
            {
                "input_docs": n0,
                "after_rule_filters": n1,
                "after_exact_dedup": n2,
                "substring_tokens_removed": int(removed_tokens or 0),
                "after_near_dedup": n4,
                "after_reweight": n5,
                "training_sequences": n_seqs,
                "seq_len": args.seq_len,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
