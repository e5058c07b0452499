"""Engine end-to-end: the reference's engine_test.go assertions on the
Spark engine, plus resume-from-snapshot."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.plans.engine import CrawlEngine
from tegenaria_spark.sources.store import LocalSnapshotStore
from tegenaria_spark.sources.synth import SiteConfig, domain_budgets, robots_rules, seed_urls

CFG = EngineConfig(shuffle_partitions=4, bloom_n=100_000, fetch_partitions=4)


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
    # 2x8 pages drains in ~5 rounds — same termination/dedup semantics
    # as a larger site at a third of the Spark-stage constants
    site = SiteConfig(n_domains=2, pages_per_domain=8)
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
    engine1.run(seeds, max_rounds=2)

    store2 = LocalSnapshotStore(os.path.join(tmp_store_dir, "split"), spark)
    engine2 = CrawlEngine(spark, store2, site, CFG, budget_rows=domain_budgets(site, 8))
    engine2.run(seeds, max_rounds=1)  # "crash" after 1 round
    engine3 = CrawlEngine(spark, store2, site, CFG, budget_rows=domain_budgets(site, 8))
    engine3.run(resume=True, max_rounds=1)

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

    from tegenaria_spark.operators.plugins import PluginSet, TransformChain

    # one engine run certifies BOTH the event surface and the
    # middleware/pipeline chains (previously two engine runs; the
    # chain-order semantics are asserted on a tiny frame separately in
    # test_plugin_chains_run_in_priority_order)
    chain = TransformChain()
    chain.add(lambda df: df.withColumn("_trace", F.lit("a")), priority=10)
    pipes = TransformChain()
    pipes.add(lambda df: df.filter(F.col("w") % 2 == 0))  # drop odd widths
    plugins = PluginSet(request_middlewares=chain, item_pipelines=pipes)

    site = SiteConfig(n_domains=3, pages_per_domain=6, image_ratio=1.0)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG, plugins=plugins)

    seen: list[tuple[str, int]] = []
    for name in (ev.START, ev.ROUND_START, ev.HEARTBEAT, ev.ROUND_END, ev.STOP):
        engine.events.register(
            name, lambda _n=name, round_no=None, **kw: seen.append((_n, round_no))
        )
    engine.events.register(ev.ROUND_START, lambda **kw: 1 / 0)  # contained

    summary = engine.run(seed_urls(site, n_seeds=6), max_rounds=2)
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

    # the item pipeline ran inside the same crawl: only even widths land
    items = store.read_log("items").collect()
    assert items and all(r["w"] % 2 == 0 for r in items)
    # lineage rows committed for every table of every round
    lineage = store.read_log("lineage")
    tables = {r["table"] for r in lineage.collect()}
    assert {"frontier", "url_seen", "fetch_log"} <= tables


def test_plugin_chains_run_in_priority_order(spark):
    """middlewares.go:27-42 / pipelines.go:28-33 surface: request
    middlewares ascend, response middlewares descend — asserted on a
    tiny frame (the in-crawl effect of an item pipeline is asserted in
    test_event_hooks_fire_in_order's engine run)."""
    import pyspark.sql.functions as F

    from tegenaria_spark.operators.plugins import TransformChain

    chain = TransformChain()
    chain.add(lambda df: df.withColumn("_trace", F.lit("a")), priority=10)
    chain.add(lambda df: df.withColumn("_trace", F.concat("_trace", F.lit("b"))), priority=20)
    resp = TransformChain(reverse=True)
    resp.add(lambda df: df.withColumn("_rt", F.lit("low")), priority=10)
    resp.add(lambda df: df.withColumn("_rt", F.lit("high")), priority=20)  # runs FIRST

    probe = spark.range(1)
    assert chain.apply(probe).collect()[0]["_trace"] == "ab"  # ascending
    assert resp.apply(probe).collect()[0]["_rt"] == "low"  # descending: high first


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

    rest = engine.run(resume=True, max_rounds=2)
    assert engine.status()["state"] == "idle"  # back to idle after the run
    assert store.last_committed_round() == 1 + len(rest.rounds)
    assert rest.total_fetched > 0  # the resumed run made real progress
    # interrupted-run == straight-through-run equality is certified by
    # test_resume_from_snapshot AND the crawl_resume_parity contract
    # query (simulator twin); re-running a third engine here only
    # re-bought those assertions at ~20 s of Spark-stage constants
