"""CrawlEngine — the driver round loop.

One crawl *round* is one batch DAG (the Spark rendering of the
reference's producer/consumer goroutine mesh, /root/reference/
engine.go:217-335):

    frontier ──ready?──▶ robots gate ──▶ budget rank ──▶ salt ──▶ fetch
       ▲                   (blocked)       (deferred)              │
       │                                                 status gate│
       │                                              ┌────────────┤
       │                retries (M5) ◀── failed ◀─────┘      ok    │
       │                                                parse (M3/M4)
       │                                              items──▶ store
       └── union ◀── dedup gate (F1/A5/A6) ◀── seq ◀── outlinks

committed as one snapshot per round; the loop re-reads the committed
frontier until it is empty (Q6, engine.go:341-343) — which makes every
round restartable: kill the driver at any point and ``resume=True``
continues from the last committed snapshot (Q7).

The only wide exchanges per round: the per-domain budget window, the
salted fetch repartition, the new-link seq range-partition, and the
dedup anti-join (bloom-pruned).  Scheduling scans never touch the
binary image payload (column pruning keeps `bytes` out of every
frontier read).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tegenaria_spark.config import DEFAULT_CONFIG, EngineConfig
from tegenaria_spark.functions.canonical import with_canonical, with_fingerprint
from tegenaria_spark.operators.dedup import (
    Bloom,
    bloom_maybe_seen_udf,
    build_bloom,
    dedup_gate,
    url_seen_delta,
)
from tegenaria_spark.operators.fetch import check_status, fetch_stage
from tegenaria_spark.operators.metrics import round_metrics
from tegenaria_spark.operators.parse import (
    assign_enqueue_seq,
    links_to_candidates,
    retry_candidates,
    run_parsers,
)
from tegenaria_spark.operators.schedule import (
    budget_select,
    robots_gate,
    round_ts_expr,
    salt_for_fetch,
    split_ready,
)
from tegenaria_spark.schemas import (
    DOMAIN_BUDGET_SCHEMA,
    FETCH_LOG_SCHEMA,
    FRONTIER_SCHEMA,
    ROBOTS_SCHEMA,
)
from tegenaria_spark.sources.store import LocalSnapshotStore
from tegenaria_spark.sources.synth import SiteConfig

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]


def _log_rows(df: DataFrame, round_no: int, outcome: str) -> DataFrame:
    """Project any request-shaped DataFrame onto FETCH_LOG_SCHEMA."""
    return df.select(
        F.lit(round_no).cast("int").alias("round"),
        F.col("enqueue_seq").alias("seq"),
        F.col("ctx_id"),
        F.col("url"),
        (F.col("domain") if "domain" in df.columns else F.lit(None).cast("string")).alias("domain"),
        (F.col("status") if "status" in df.columns else F.lit(None).cast("int")).alias("status"),
        (F.col("delay") if "delay" in df.columns else F.lit(None).cast("double")).alias("delay"),
        (
            F.col("content_length") if "content_length" in df.columns else F.lit(None).cast("long")
        ).alias("content_length"),
        (F.col("error") if "error" in df.columns else F.lit(None).cast("string")).alias("error"),
        F.lit(outcome).alias("outcome"),
    )


@dataclass
class RoundResult:
    round_no: int
    n_selected: int
    n_fetched: int
    n_failed: int
    n_items: int
    n_new: int
    n_dup: int
    n_deferred: int
    n_blocked: int
    frontier_size: int
    wall_s: float
    snapshot_id: str = ""


@dataclass
class CrawlSummary:
    rounds: list[RoundResult] = field(default_factory=list)

    @property
    def total_fetched(self) -> int:
        return sum(r.n_fetched for r in self.rounds)

    @property
    def total_items(self) -> int:
        return sum(r.n_items for r in self.rounds)

    @property
    def wall_s(self) -> float:
        return sum(r.wall_s for r in self.rounds)


class CrawlEngine:
    """Engine lifecycle (engine.go:149-194 Execute/start/stop) as a
    driver class; components (queue/dupefilter/limiter/stats,
    components.go:62-79) are the operator modules wired below."""

    def __init__(
        self,
        spark: SparkSession,
        store: LocalSnapshotStore,
        site: SiteConfig,
        cfg: EngineConfig = DEFAULT_CONFIG,
        robots_rows: Optional[list[dict]] = None,
        budget_rows: Optional[list[dict]] = None,
    ):
        self.spark = spark
        self.store = store
        self.site = site
        self.cfg = cfg
        self.robots = (
            spark.createDataFrame(robots_rows, ROBOTS_SCHEMA)
            if robots_rows
            else spark.createDataFrame([], ROBOTS_SCHEMA)
        )
        self.budgets = (
            spark.createDataFrame(budget_rows, DOMAIN_BUDGET_SCHEMA)
            if budget_rows
            else spark.createDataFrame([], DOMAIN_BUDGET_SCHEMA)
        )

    # ------------------------------------------------------------------
    # bootstrap: seeds pass the same dedup gate as outlinks (S1 → S2)
    # ------------------------------------------------------------------

    def bootstrap(self, seed_rows: list[dict]) -> None:
        cfg = self.cfg
        ts0 = datetime.fromtimestamp(cfg.epoch_ms / 1000, tz=timezone.utc)
        seeds = self.spark.createDataFrame(
            [{**r, "next_fetch_time": ts0} for r in seed_rows], FRONTIER_SCHEMA
        )
        cand = with_fingerprint(with_canonical(seeds))
        invalid = cand.filter(~F.col("valid"))
        cand = cand.filter(F.col("valid"))
        empty_seen = self.store.read_url_seen(-1)
        fresh, dups = dedup_gate(cand, empty_seen)
        seen = url_seen_delta(fresh, 0)
        frontier = fresh.select(*FRONTIER_COLS, "canon_url", "domain", "fp")
        fetch_log = _log_rows(dups, 0, "dup_dropped").unionByName(
            _log_rows(invalid, 0, "invalid")
        )
        self.store.commit_round(
            0,
            frontier,
            seen,
            {"fetch_log": fetch_log},
            {"phase": "bootstrap", "n_seeds": len(seed_rows)},
        )

    # ------------------------------------------------------------------

    def _read_state(self, r: int) -> tuple[DataFrame, DataFrame]:
        frontier_raw = self.spark.read.parquet(self.store._state_path("frontier", r))
        url_seen = self.store.read_url_seen(r)
        return frontier_raw, url_seen

    def run_round(self, r: int, frontier: DataFrame, url_seen: DataFrame) -> RoundResult:
        cfg, site = self.cfg, self.site
        t0 = time.time()

        ready, sleeping = split_ready(frontier, r, cfg)
        allowed, blocked = robots_gate(ready, self.robots)
        selected, deferred = budget_select(allowed, self.budgets, r, cfg)

        fetched = check_status(fetch_stage(salt_for_fetch(selected, cfg), site, cfg))
        fetched = fetched.localCheckpoint(eager=True)  # cut lineage; fetch runs once
        ok = fetched.filter(F.col("error").isNull())
        failed = fetched.filter(F.col("error").isNotNull())

        items, links = run_parsers(ok)
        links_seq = assign_enqueue_seq(links, r + 1, cfg)
        next_ts = round_ts_expr(r + 1, cfg)
        candidates = with_fingerprint(
            with_canonical(links_to_candidates(links_seq, r, next_ts))
        )
        invalid = candidates.filter(~F.col("valid"))
        candidates = candidates.filter(F.col("valid"))

        bloom_udf = None
        if cfg.bloom_enabled and self.store.url_seen_total(r) >= cfg.bloom_min_seen:
            bloom = build_bloom(url_seen, cfg.bloom_n, cfg.bloom_p)
            bloom_udf = bloom_maybe_seen_udf(self.spark, bloom)
        fresh, dups = dedup_gate(candidates, url_seen, bloom_udf)
        seen_delta = url_seen_delta(fresh, r + 1)

        retries = retry_candidates(failed, r, cfg, next_ts)
        retries = with_fingerprint(with_canonical(retries))

        state_cols = FRONTIER_COLS + ["canon_url", "domain", "fp"]
        new_frontier = (
            sleeping.select(*state_cols)
            .unionByName(deferred.select(*state_cols))
            .unionByName(fresh.select(*state_cols))
            .unionByName(retries.select(*state_cols))
        )

        fetch_log = (
            _log_rows(ok, r, "fetched")
            .unionByName(_log_rows(failed, r, "failed"))
            .unionByName(_log_rows(blocked, r, "robots_blocked"))
            .unionByName(_log_rows(deferred, r, "deferred"))
            .unionByName(_log_rows(dups, r, "dup_dropped"))
            .unionByName(_log_rows(invalid, r, "invalid"))
            .select([f.name for f in FETCH_LOG_SCHEMA.fields])
        )
        fetch_log = fetch_log.localCheckpoint(eager=True)

        n_items = items.count()
        metrics = round_metrics(fetch_log, n_items, r)

        counts = {
            row["outcome"]: row["count"]
            for row in fetch_log.groupBy("outcome").count().collect()
        }
        snapshot_id, table_counts = self.store.commit_round(
            r + 1,
            new_frontier,
            seen_delta,
            {"items": items, "fetch_log": fetch_log, "metrics": metrics},
            {"phase": "round", "round": r, "outcomes": counts},
        )
        frontier_size = table_counts.get("frontier", 0)

        return RoundResult(
            round_no=r,
            n_selected=counts.get("fetched", 0) + counts.get("failed", 0),
            n_fetched=counts.get("fetched", 0),
            n_failed=counts.get("failed", 0),
            n_items=n_items,
            n_new=counts.get("fetched", 0),
            n_dup=counts.get("dup_dropped", 0),
            n_deferred=counts.get("deferred", 0),
            n_blocked=counts.get("robots_blocked", 0),
            frontier_size=frontier_size,
            wall_s=time.time() - t0,
            snapshot_id=snapshot_id,
        )

    def run(
        self,
        seed_rows: Optional[list[dict]] = None,
        max_rounds: int = 50,
        resume: bool = False,
    ) -> CrawlSummary:
        """Execute (engine.go:191-194): bootstrap (unless resuming),
        then loop rounds until the frontier drains or max_rounds."""
        if resume:
            start = self.store.last_committed_round()
            if start is None:
                raise RuntimeError("resume requested but no committed snapshot found")
        else:
            assert seed_rows is not None, "seed_rows required for a fresh crawl"
            self.bootstrap(seed_rows)
            start = 0

        summary = CrawlSummary()
        r = start
        while r < start + max_rounds:
            frontier, url_seen = self._read_state(r)
            if frontier.isEmpty():
                break
            result = self.run_round(r, frontier, url_seen)
            summary.rounds.append(result)
            r += 1
        return summary
