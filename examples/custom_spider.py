"""A complete custom spider, end to end — the reference's
example/quotes walkthrough (example/quotes/spider.go) re-expressed on
the Spark engine.

What a user coming from the reference writes to port a spider:

1. a PARSER — a registered function over the fetched-rows DataFrame
   that returns (items, outlinks), replacing ``Parser(ctx, req chan)``
   (spiders.go:29-46; theirs loops rows, ours declares columns);
2. optional MIDDLEWARE / PIPELINES — ordered DataFrame transforms
   replacing MiddlewaresInterface / PipelinesInterface;
3. a seed list + engine run.

Run (any size; defaults are demo-tiny):

    python examples/custom_spider.py --workdir /tmp/quotes-crawl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def build_quote_parser():
    """Register a parser that emits per-page 'quote' items (the page
    caption split into tag'd records) instead of image payloads."""
    from tegenaria_spark.operators.parse import PARSER_REGISTRY, register_parser

    if "quote_parser" in PARSER_REGISTRY:  # idempotent re-run
        return

    @register_parser("quote_parser")
    def quote_parser(ok):
        # items: one row per fetched 200-page, caption as the "quote",
        # domain as the "author" — the quotes example's item shape
        # {Text, Author, Tags} (example/quotes/spider.go:25-29)
        items = ok.filter(F.col("status") == 200).select(
            F.col("canon_url").alias("url"),
            F.coalesce(F.col("caption"), F.lit("")).alias("text"),
            F.col("domain").alias("author"),
            F.array(F.col("parser")).alias("tags"),
        )
        # outlinks: same request-candidate contract every parser returns;
        # parent_parser routes children back to THIS parser
        links = ok.select(
            F.col("enqueue_seq").alias("parent_seq"),
            F.col("priority").alias("parent_priority"),
            F.col("parser").alias("parent_parser"),
            F.posexplode(F.col("outlinks")).alias("pos", "url"),
        )
        return items, links


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--domains", type=int, default=4)
    ap.add_argument("--pages", type=int, default=12)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args(argv or sys.argv[1:])

    from tegenaria_spark.config import EngineConfig
    from tegenaria_spark.operators.plugins import PluginSet, TransformChain
    from tegenaria_spark.plans.engine import CrawlEngine
    from tegenaria_spark.session import get_spark
    from tegenaria_spark.sources.store import LocalSnapshotStore
    from tegenaria_spark.sources.synth import SiteConfig, seed_urls

    build_quote_parser()

    # middleware: stamp a header pre-fetch (ascending priority), and an
    # item pipeline that drops empty quotes before the store commit
    request_mw = TransformChain()
    request_mw.add(
        # idempotent header stamp: retried requests re-enter the chain
        # already stamped, and duplicate map keys are an error in Spark
        lambda df: df.withColumn(
            "headers",
            F.map_concat(
                F.map_filter("headers", lambda k, _v: k != F.lit("X-Spider")),
                F.create_map(F.lit("X-Spider"), F.lit("quotes")),
            ),
        ),
        priority=10,
    )
    pipelines = TransformChain()
    pipelines.add(lambda df: df.filter(F.col("text") != ""))

    cfg = EngineConfig(shuffle_partitions=8)
    spark = get_spark("quotes-example", master="local[8]", config=cfg)
    workdir = args.workdir or tempfile.mkdtemp(prefix="quotes-crawl-")
    site = SiteConfig(n_domains=args.domains, pages_per_domain=args.pages)
    store = LocalSnapshotStore(workdir, spark, fp_buckets=cfg.fp_buckets)
    engine = CrawlEngine(
        spark,
        store,
        site,
        cfg,
        plugins=PluginSet(request_middlewares=request_mw, item_pipelines=pipelines),
    )

    seeds = [dict(r, parser="quote_parser") for r in seed_urls(site, n_seeds=args.seeds)]
    summary = engine.run(seeds, max_rounds=args.rounds)

    items = store.read_log("items")
    print(
        json.dumps(
            {
                "rounds": len(summary.rounds),
                "fetched": summary.total_fetched,
                "quotes": items.count(),
                "authors": items.select("author").distinct().count(),
                "workdir": workdir,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
