"""Ordering + URL-seen + store parity: single-threaded reference
simulator vs the distributed Spark engine, same seeds + budgets
(north_rule: 'matching the reference's crawl ordering and URL-seen set
under the same seed list and politeness budget')."""

from __future__ import annotations

import pyspark.sql.functions as F

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.plans.engine import CrawlEngine
from tegenaria_spark.plans.simulator import simulate_crawl
from tegenaria_spark.sources.store import LocalSnapshotStore
from tegenaria_spark.sources.synth import SiteConfig, domain_budgets, robots_rules, seed_urls

CFG = EngineConfig(shuffle_partitions=8, bloom_enabled=True, bloom_min_seen=50)


def test_spark_engine_matches_simulator(spark, tmp_store_dir):
    site = SiteConfig(n_domains=4, pages_per_domain=10)
    seeds = seed_urls(site, n_seeds=12)
    robots = robots_rules(site)
    budgets = domain_budgets(site, default_budget=6)

    sim = simulate_crawl(seeds, site, CFG, robots=robots, budgets=budgets, max_rounds=40)

    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG, robots_rows=robots, budget_rows=budgets)
    engine.run(seeds, max_rounds=40)

    log = store.read_log("fetch_log")

    # --- identical fetch order: every (round, seq, url) fetched, sorted
    spark_fetched = sorted(
        (r["round"], r["seq"], r["url"])
        for r in log.filter(F.col("outcome") == "fetched").collect()
    )
    sim_fetched = sorted((t[0], t[1], t[3]) for t in sim.fetch_log if t[6] == "fetched")
    assert spark_fetched == sim_fetched

    # --- identical URL-seen set
    spark_seen = {
        r["fp"] for r in store.read_url_seen(store.last_committed_round()).collect()
    }
    assert spark_seen == sim.url_seen

    # --- identical outcome multiset for every outcome class
    spark_outcomes = sorted(
        (r["round"], r["seq"], r["outcome"])
        for r in log.collect()
    )
    sim_outcomes = sorted((t[0], t[1], t[6]) for t in sim.fetch_log)
    assert spark_outcomes == sim_outcomes

    # --- image/caption store parity: bit-exact bytes, caption, phash
    items = {r["image_id"]: r for r in store.read_log("items").collect()}
    assert set(items) == set(sim.items)
    for image_id, oracle in sim.items.items():
        got = items[image_id]
        assert bytes(got["bytes"]) == oracle["bytes"], image_id
        assert got["caption"] == oracle["caption"]
        assert got["phash"] == oracle["phash"]
        assert (got["w"], got["h"], got["fmt"]) == (
            oracle["w"],
            oracle["h"],
            oracle["fmt"],
        )


def test_parity_with_per_request_options(spark, tmp_store_dir):
    """The downloader option matrix (params/cookies/proxy/timeout/
    redirect caps — reference downloader_test.go:29-282) runs through
    BOTH implementations: fetch order, URL-seen set (params-merged
    fingerprints, F7) and outcome multiset must stay identical."""
    site = SiteConfig(n_domains=4, pages_per_domain=12, redirect_ratio=0.2)
    seeds = seed_urls(site, n_seeds=40, option_ratio=0.6)
    assert any(s["params"] for s in seeds)
    assert any(s["timeout_ms"] for s in seeds)
    assert any(not s["allow_redirects"] for s in seeds)
    budgets = domain_budgets(site, default_budget=8)

    sim = simulate_crawl(seeds, site, CFG, budgets=budgets, max_rounds=30)

    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG, budget_rows=budgets)
    engine.run(seeds, max_rounds=30)

    log = store.read_log("fetch_log")
    spark_outcomes = sorted((r["round"], r["seq"], r["url"], r["outcome"]) for r in log.collect())
    sim_outcomes = sorted((t[0], t[1], t[3], t[6]) for t in sim.fetch_log)
    assert spark_outcomes == sim_outcomes

    spark_seen = {
        r["fp"] for r in store.read_url_seen(store.last_committed_round()).collect()
    }
    assert spark_seen == sim.url_seen

    # params-merge is live: a params seed fingerprints differently from
    # the same URL without params
    from tegenaria_spark.functions.canonical import py_fingerprint, py_merge_params

    s = next(s for s in seeds if s["params"])
    fp_plain = py_fingerprint("GET", s["url"], None, s["headers"])
    fp_merged = py_fingerprint(
        "GET", py_merge_params(s["url"], s["params"]), None, s["headers"]
    )
    assert fp_plain != fp_merged and fp_merged in sim.url_seen
