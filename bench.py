"""Benchmark: headline analytics queries at $SPARK_GRAFT_SF_DIR plus the
north_rule crawl-throughput scaling measurement.

Prints ONE JSON line:
  {"metric": "...", "value": <total query sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"local[8]": {...}, "local[32]": {...},
             "fetched_urls_per_sec_8": ..., "fetched_urls_per_sec_32": ...,
             "scaling_efficiency": ...}}

The crawl section runs the SAME synthetic frontier crawl at two
parallelism levels (the sandbox proxy for N vs 4N executors per the
driver instruction) and reports fetched-URLs/sec at both plus
eff = (thr_4N / thr_N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

HEADLINE = [
    "q2_politeness_budget",
    "q1_priority_window_topk",
    "f1_dedup_anti_join",
    "a8_outcome_rollup",
    "join_broadcast_rollup",
    "dedup_exact",
    "dedup_jaccard_words",
    "dedup_minhash_lsh",
    "text_quality",
    "text_token_counts",
    "ann_cosine_topk",
    "embedding_neardup",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def run_crawl(master: str, cpus: int) -> dict:
    """One fixed crawl workload; returns wall time + fetched count."""
    from tegenaria_spark.config import EngineConfig
    from tegenaria_spark.plans.engine import CrawlEngine
    from tegenaria_spark.session import get_spark
    from tegenaria_spark.sources.store import LocalSnapshotStore
    from tegenaria_spark.sources.synth import SiteConfig, domain_budgets, seed_urls

    cfg = EngineConfig(
        shuffle_partitions=max(8, cpus),
        domain_salt_width=2,
        default_budget_per_round=48,
        bloom_min_seen=1 << 62,  # bloom off for the bench: seen-set fits the anti-join
        max_retries=0,
    )
    site = SiteConfig(n_domains=96, pages_per_domain=400, max_outlinks=8, image_ratio=0.5)
    seeds = seed_urls(site, n_seeds=4000)
    budgets = domain_budgets(site, default_budget=48)

    spark = get_spark(f"tegenaria-bench-{cpus}", master=master, config=cfg)
    workdir = tempfile.mkdtemp(prefix=f"bench-crawl-{cpus}-")
    try:
        store = LocalSnapshotStore(workdir, spark)
        engine = CrawlEngine(spark, store, site, cfg, budget_rows=budgets)
        t0 = time.time()
        summary = engine.run(seeds, max_rounds=3)
        wall = time.time() - t0
        fetched = summary.total_fetched
        return {
            "wall_s": round(wall, 2),
            "fetched": fetched,
            "items": summary.total_items,
            "rounds": len(summary.rounds),
            "fetched_per_sec": round(fetched / wall, 2),
        }
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    from tegenaria_spark.session import get_spark

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark("tegenaria-bench", master=f"local[{CPUS}]")
    t0 = time.time()
    qtimes = run_queries(spark, SF_DIR)
    total = round(time.time() - t0, 3)
    spark.stop()

    result = {
        "metric": "headline query suite wall time (+ crawl frontier-round throughput)",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    if not SKIP_SCALING:
        lo_cpus = max(2, CPUS // 4)
        crawl_lo = run_crawl(f"local[{lo_cpus}]", lo_cpus)
        crawl_hi = run_crawl(f"local[{CPUS}]", CPUS)
        eff = (crawl_hi["fetched_per_sec"] / crawl_lo["fetched_per_sec"]) / (CPUS / lo_cpus)
        result["crawl"] = {
            f"local[{lo_cpus}]": crawl_lo,
            f"local[{CPUS}]": crawl_hi,
            "fetched_urls_per_sec_lo": crawl_lo["fetched_per_sec"],
            "fetched_urls_per_sec_hi": crawl_hi["fetched_per_sec"],
            "scaling_efficiency": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
