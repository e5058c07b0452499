"""Engine end-to-end: the reference's engine_test.go assertions on the
Spark engine, plus resume-from-snapshot."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.plans.engine import CrawlEngine
from tegenaria_spark.sources.store import LocalSnapshotStore
from tegenaria_spark.sources.synth import SiteConfig, domain_budgets, robots_rules, seed_urls

CFG = EngineConfig(shuffle_partitions=8, bloom_n=100_000)


def _single_seed(site: SiteConfig, d: int, p: int) -> list[dict]:
    return [
        {
            "ctx_id": "seed-0",
            "url": site.page_url(d, p),
            "method": "GET",
            "headers": {"User-Agent": "tegenaria-spark/0.1"},
            "body": None,
            "params": None,
            "meta": None,
            "parser": "image_parser",
            "do_not_filter": False,
            "allow_status": [],
            "priority": 0,
            "enqueue_seq": 0,
            "retries": 0,
            "round_added": 0,
        }
    ]


def _find_page(site, want_image: bool, want_links: bool = False):
    """Locate a deterministic 200-page with/without payload."""
    from tegenaria_spark.sources.synth import synth_page

    for d in range(site.n_domains):
        for p in range(site.pages_per_domain):
            page = synth_page(site.page_url(d, p), site)
            if page.status != 200:
                continue
            if want_image == (page.image_id is not None) and (
                not want_links or page.outlinks
            ):
                return d, p
    raise AssertionError("no such page in synthetic site")


def test_single_seed_round_stats(spark, tmp_store_dir):
    """engine_test.go:217-236: one seed ⇒ requests=1, items=1,
    status-200=1, errors=0."""
    site = SiteConfig(n_domains=4, pages_per_domain=16)
    d, p = _find_page(site, want_image=True)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG)
    summary = engine.run(_single_seed(site, d, p), max_rounds=1)

    assert len(summary.rounds) == 1
    metrics = {
        r["metric"]: r["value"]
        for r in store.read_log("metrics", 1).filter(F.col("round") == 0).collect()
    }
    assert metrics["requests"] == 1
    assert metrics["items"] == 1
    assert metrics["200"] == 1
    assert metrics["errors"] == 0

    items = store.read_log("items", 1)
    row = items.collect()[0]
    assert row["image_id"] is not None and row["phash"] is not None
    assert row["fmt"] in ("png", "jpeg") and len(row["bytes"]) > 0


def test_crawl_terminates_and_dedups(spark, tmp_store_dir):
    site = SiteConfig(n_domains=3, pages_per_domain=12)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(
        spark,
        store,
        site,
        CFG,
        robots_rows=robots_rules(site),
        budget_rows=domain_budgets(site, default_budget=8),
    )
    seeds = seed_urls(site, n_seeds=10)
    summary = engine.run(seeds, max_rounds=30)
    last = store.last_committed_round()
    # terminated: frontier drained before max_rounds
    assert store.read_frontier(last).isEmpty()

    log = store.read_log("fetch_log")
    # every fetched canonical URL exactly once (dedup at enqueue + budget):
    fetched = log.filter(F.col("outcome") == "fetched")
    urls = [r["url"] for r in fetched.collect()]
    from tegenaria_spark.functions.canonical import py_canonicalize

    canon = [py_canonicalize(u)[0] for u in urls]
    assert len(canon) == len(set(canon))
    assert summary.total_fetched == len(canon) > 0
    # some duplicates were dropped (seed list has ~20% dups + link cycles)
    assert log.filter(F.col("outcome") == "dup_dropped").count() > 0


def test_resume_from_snapshot(spark, tmp_store_dir):
    """Q7/north_rule: kill after round k, resume, final state identical
    to an uninterrupted run."""
    site = SiteConfig(n_domains=2, pages_per_domain=6)
    seeds = seed_urls(site, n_seeds=6)

    import os

    # derived dirs under the fixture dir so teardown removes them too
    store1 = LocalSnapshotStore(os.path.join(tmp_store_dir, "full"), spark)
    engine1 = CrawlEngine(spark, store1, site, CFG, budget_rows=domain_budgets(site, 8))
    engine1.run(seeds, max_rounds=4)

    store2 = LocalSnapshotStore(os.path.join(tmp_store_dir, "split"), spark)
    engine2 = CrawlEngine(spark, store2, site, CFG, budget_rows=domain_budgets(site, 8))
    engine2.run(seeds, max_rounds=2)  # "crash" after 2 rounds
    engine3 = CrawlEngine(spark, store2, site, CFG, budget_rows=domain_budgets(site, 8))
    engine3.run(resume=True, max_rounds=2)

    def fetched_set(store):
        return {
            (r["round"], r["seq"], r["url"])
            for r in store.read_log("fetch_log")
            .filter(F.col("outcome") == "fetched")
            .collect()
        }

    assert fetched_set(store1) == fetched_set(store2)

    def seen_set(store):
        return {
            r["fp"] for r in store.read_url_seen(store.last_committed_round()).collect()
        }

    assert seen_set(store1) == seen_set(store2)


def test_lineage_rows_written(spark, tmp_store_dir):
    site = SiteConfig(n_domains=2, pages_per_domain=8)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG)
    engine.run(seed_urls(site, n_seeds=4), max_rounds=3)
    lineage = store.read_log("lineage")
    rows = lineage.collect()
    assert len(rows) > 0
    tables = {r["table"] for r in rows}
    assert {"frontier", "url_seen", "fetch_log"} <= tables
    assert all(r["snapshot_id"].startswith("snap-") for r in rows)


def test_event_hooks_fire_in_order(spark, tmp_store_dir):
    """events.go:30-148 surface: START first, STOP last, per round
    ROUND_START → HEARTBEAT → ROUND_END; a raising handler is contained.

    The run loop pipelines round N+1's compute with round N's commit,
    so ROUND_END(N) legitimately fires AFTER ROUND_START(N+1) — the
    contract is per-round ordering plus monotone round sequences, not a
    strict global interleave."""
    from tegenaria_spark.plans import events as ev
    from tegenaria_spark.plans.engine import CrawlEngine
    from tegenaria_spark.sources.store import LocalSnapshotStore
    from tegenaria_spark.sources.synth import SiteConfig, seed_urls

    site = SiteConfig(n_domains=3, pages_per_domain=6)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG)

    seen: list[tuple[str, int]] = []
    for name in (ev.START, ev.ROUND_START, ev.HEARTBEAT, ev.ROUND_END, ev.STOP):
        engine.events.register(
            name, lambda _n=name, round_no=None, **kw: seen.append((_n, round_no))
        )
    engine.events.register(ev.ROUND_START, lambda **kw: 1 / 0)  # contained

    summary = engine.run(seed_urls(site, n_seeds=6), max_rounds=3)
    n = len(summary.rounds)
    assert n >= 1
    assert seen[0][0] == ev.START and seen[-1][0] == ev.STOP
    names = [t[0] for t in seen]
    assert names.count(ev.ROUND_START) == n
    assert names.count(ev.HEARTBEAT) == n
    assert names.count(ev.ROUND_END) == n

    def positions(name):
        return [(i, rq) for i, (nm, rq) in enumerate(seen) if nm == name]

    starts = positions(ev.ROUND_START)
    hbs = positions(ev.HEARTBEAT)
    ends = positions(ev.ROUND_END)
    # each event class walks rounds in order
    assert [rq for _, rq in starts] == list(range(n))
    assert [rq for _, rq in hbs] == list(range(n))
    assert [rq for _, rq in ends] == list(range(n))
    # per-round ordering: START(q) ≤ HEARTBEAT(q) < END(q)
    for q in range(n):
        assert starts[q][0] < hbs[q][0] < ends[q][0]


def test_plugin_chains_run_in_priority_order(spark, tmp_store_dir):
    """middlewares.go:27-42 / pipelines.go:28-33 surface: request
    middlewares ascend, response middlewares descend, item pipelines
    can drop items before the store commit."""
    import pyspark.sql.functions as F

    from tegenaria_spark.operators.plugins import PluginSet, TransformChain
    from tegenaria_spark.plans.engine import CrawlEngine
    from tegenaria_spark.sources.store import LocalSnapshotStore
    from tegenaria_spark.sources.synth import SiteConfig, seed_urls

    chain = TransformChain()
    chain.add(lambda df: df.withColumn("_trace", F.lit("a")), priority=10)
    chain.add(lambda df: df.withColumn("_trace", F.concat("_trace", F.lit("b"))), priority=20)
    resp = TransformChain(reverse=True)
    resp.add(lambda df: df.withColumn("_rt", F.lit("low")), priority=10)
    resp.add(lambda df: df.withColumn("_rt", F.lit("high")), priority=20)  # runs FIRST
    pipes = TransformChain()
    pipes.add(lambda df: df.filter(F.col("w") % 2 == 0))  # drop odd-width items

    # chain-order semantics, directly observable on a tiny frame
    probe = spark.range(1)
    assert chain.apply(probe).collect()[0]["_trace"] == "ab"  # ascending
    assert resp.apply(probe).collect()[0]["_rt"] == "low"  # descending: high first

    plugins = PluginSet(request_middlewares=chain, response_middlewares=resp, item_pipelines=pipes)
    site = SiteConfig(n_domains=3, pages_per_domain=8, image_ratio=1.0)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG, plugins=plugins)
    engine.run(seed_urls(site, n_seeds=8), max_rounds=4)

    items = store.read_log("items").collect()
    assert items, "pipeline dropped everything — expected some even-width items"
    assert all(r["w"] % 2 == 0 for r in items)
    # the ascending request chain composed a→ab; the descending response
    # chain ended on the low-priority value
    log = store.read_log("fetch_log")
    assert log.count() > 0


def test_pause_resume_and_status(spark, tmp_store_dir):
    """Control plane (service.go:64-147 analog): request_pause() stops
    at the next round boundary with a PAUSE event; resume continues to
    the same final state a straight-through run reaches; status() reads
    only commit metadata."""
    from tegenaria_spark.plans import events as ev
    from tegenaria_spark.plans.engine import CrawlEngine
    from tegenaria_spark.sources.store import LocalSnapshotStore
    from tegenaria_spark.sources.synth import SiteConfig, seed_urls

    site = SiteConfig(n_domains=3, pages_per_domain=8)
    seeds = seed_urls(site, n_seeds=10)

    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG)
    paused_at = []
    engine.events.register(
        ev.ROUND_END, lambda round_no, **kw: engine.request_pause() if round_no == 0 else None
    )
    engine.events.register(ev.PAUSE, lambda round_no, **kw: paused_at.append(round_no))

    first = engine.run(seeds, max_rounds=20)
    assert len(first.rounds) == 1  # paused after round 0
    assert paused_at == [1]
    st = engine.status()
    assert st["state"] == "paused"  # actually paused, not merely requested
    assert st["pause_requested"] is False
    assert st["last_committed_round"] == 1
    assert st["outcome_totals"].get("fetched", 0) == first.total_fetched
    assert st["url_seen_total"] > 0

    rest = engine.run(resume=True, max_rounds=3)
    assert engine.status()["state"] == "idle"  # drained, back to idle
    assert store.last_committed_round() == 1 + len(rest.rounds)
    total_fetched = first.total_fetched + rest.total_fetched

    # straight-through twin run reaches the identical totals
    import tempfile, shutil

    d2 = tempfile.mkdtemp(prefix="tegenaria-pausecmp-")
    try:
        engine2 = CrawlEngine(spark, LocalSnapshotStore(d2, spark), site, CFG)
        full = engine2.run(seeds, max_rounds=4)
        assert full.total_fetched == total_fetched
        assert full.total_items == first.total_items + rest.total_items
    finally:
        shutil.rmtree(d2, ignore_errors=True)
