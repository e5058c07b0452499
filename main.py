"""spark-submit entrypoint (north_rule ship mode).

    spark-submit --py-files dist/engine.zip main.py \\
        --spider image_parser --seeds 1000 --rounds 20 \\
        --domains 64 --pages 512 --workdir /tmp/crawl-store [--resume]

The CLI replaces the reference's cobra command
(/root/reference/command/command.go:42-62) and gRPC control plane
(service/service.go): start = run, pause = `engine.request_pause()` (or
kill the driver — the commit marker is the checkpoint either way),
resume = rerun with --resume (picks up from the last committed
snapshot), status = `--status` (commit-metadata read, no Spark jobs).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="tegenaria-spark crawl driver")
    p.add_argument("--spider", default="image_parser", help="parser registry key")
    p.add_argument("--seeds", type=int, default=1000)
    p.add_argument("--rounds", type=int, default=20)
    p.add_argument("--domains", type=int, default=64)
    p.add_argument("--pages", type=int, default=512)
    p.add_argument("--budget", type=int, default=16)
    p.add_argument("--workdir", required=True, help="snapshot store root")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--status",
        action="store_true",
        help="print crawl status from commit metadata (no crawl, no Spark jobs)",
    )
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv or sys.argv[1:])

    from tegenaria_spark.config import EngineConfig
    from tegenaria_spark.plans.engine import CrawlEngine
    from tegenaria_spark.session import get_spark
    from tegenaria_spark.sources.store import LocalSnapshotStore
    from tegenaria_spark.sources.synth import (
        SiteConfig,
        domain_budgets,
        robots_rules,
        seed_urls,
    )

    cfg = EngineConfig(default_budget_per_round=args.budget)
    site = SiteConfig(n_domains=args.domains, pages_per_domain=args.pages)
    spark = get_spark("tegenaria-crawl", master=args.master, config=cfg)
    store = LocalSnapshotStore(args.workdir, spark, fp_buckets=cfg.fp_buckets)
    if args.status:
        engine = CrawlEngine(spark, store, site, cfg)
        print(json.dumps(engine.status()))
        spark.stop()
        return 0
    engine = CrawlEngine(
        spark,
        store,
        site,
        cfg,
        robots_rows=robots_rules(site),
        budget_rows=domain_budgets(site, args.budget),
    )
    if args.resume:
        summary = engine.run(resume=True, max_rounds=args.rounds)
    else:
        seeds = seed_urls(site, n_seeds=args.seeds)
        for s in seeds:
            s["parser"] = args.spider
        summary = engine.run(seeds, max_rounds=args.rounds)

    print(
        json.dumps(
            {
                "rounds": len(summary.rounds),
                "fetched": summary.total_fetched,
                "items": summary.total_items,
                "wall_s": round(summary.wall_s, 2),
                "last_committed_round": store.last_committed_round(),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
