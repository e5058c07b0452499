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
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from tegenaria_spark.config import DEFAULT_CONFIG, EngineConfig
from tegenaria_spark.functions.canonical import with_canonical, with_fingerprint
from tegenaria_spark.operators.dedup import (
    bloom_bucket_params,
    bloom_delta_state,
    bloom_fp_verdicts,
    bloom_merge_state,
    dedup_gate,
    url_seen_delta,
)
from tegenaria_spark.plans import events as ev
from tegenaria_spark.operators.fetch import check_status, fetch_stage
from tegenaria_spark.operators.metrics import (
    counter_rows,
    parse_counter_rows,
    round_metrics_rows,
)
from tegenaria_spark.operators.parse import (
    assign_enqueue_seq,
    links_to_candidates,
    retry_candidates,
    run_parsers,
)
from tegenaria_spark.operators.schedule import (
    round_ts_expr,
    salt_for_fetch,
    schedule_round,
)
from tegenaria_spark.schemas import (
    DOMAIN_BUDGET_SCHEMA,
    FETCH_LOG_SCHEMA,
    FRONTIER_SCHEMA,
    METRICS_SCHEMA,
    ROBOTS_SCHEMA,
    URL_SEEN_SCHEMA,
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
    timings: dict = field(default_factory=dict)


@dataclass
class _RoundWork:
    """A computed-but-not-yet-committed round: the pinned DataFrames and
    deferred side-aggregate the commit thread consumes."""

    round_no: int
    t0: float
    timings: dict
    pins: list
    new_frontier: DataFrame
    seen_delta: DataFrame
    items: DataFrame
    fetch_log: DataFrame
    bloom_state: Optional[DataFrame]
    side_exec: ThreadPoolExecutor
    side_fut: Future
    parsed: dict = field(default_factory=dict)
    commit_fut: Optional[Future] = None
    commit_t0: float = 0.0


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
        plugins=None,
        robots_residual: Optional[dict] = None,
    ):
        from tegenaria_spark.operators.plugins import PluginSet

        self.spark = spark
        self.store = store
        self.site = site
        self.cfg = cfg
        # the changed-bucket set (run_round) and the store's frontier
        # layout hash fp with the SAME modulus, or write_frontier's
        # `_fb.isin(changed)` filter silently drops rows — fail loudly
        if store.fp_buckets != cfg.fp_buckets:
            raise ValueError(
                f"store.fp_buckets={store.fp_buckets} != cfg.fp_buckets="
                f"{cfg.fp_buckets}; pass cfg.fp_buckets to LocalSnapshotStore"
            )
        # None ⇒ schedule_round skips the robots join (no rules at all)
        self.robots = (
            spark.createDataFrame(robots_rows, ROBOTS_SCHEMA) if robots_rows else None
        )
        # wildcard-bearing domains' full rule lists (RFC 9309 `*`/`$`):
        # routed through the exact matcher in schedule_round; lower a
        # robots.txt corpus with functions.robots.robots_engine_inputs
        self.robots_residual = robots_residual or None
        self.budgets = (
            spark.createDataFrame(budget_rows, DOMAIN_BUDGET_SCHEMA)
            if budget_rows
            else spark.createDataFrame([], DOMAIN_BUDGET_SCHEMA)
        )
        self._seen_cache = None
        self._seen_cache_round = -1
        self._commit_pool: Optional[ThreadPoolExecutor] = None  # live during run()
        self._bloom_state = None  # per-bucket bitmap DF, pinned
        self._bloom_mk = bloom_bucket_params(cfg.bloom_n, cfg.bloom_p, cfg.bloom_buckets)
        # user extension points: lifecycle events (events.go:30-148) and
        # the middleware/pipeline chains (middlewares.go:27-42,
        # pipelines.go:28-33)
        self.events = ev.EventBus()
        self.plugins = plugins if plugins is not None else PluginSet()
        self._pause_requested = False
        # explicit lifecycle (service.go:64-147 SetStatus/GetStatus):
        # "running" while the loop executes, "paused" after a cooperative
        # pause break, "idle" otherwise — NOT derived from the pending
        # pause-request flag (which is true while still running and
        # cleared by the time the engine is actually paused)
        self._lifecycle = "idle"

    # ------------------------------------------------------------------
    # bootstrap: seeds pass the same dedup gate as outlinks (S1 → S2)
    # ------------------------------------------------------------------

    def bootstrap(self, seed_rows) -> None:
        """Seeds pass the same gate as outlinks.  Accepts a list of row
        dicts (tests/parity) or a pre-built DataFrame (the distributed
        generator, ``sources.synth.seed_frontier_df``)."""
        cfg = self.cfg
        if isinstance(seed_rows, DataFrame):
            seeds = seed_rows.withColumn("next_fetch_time", round_ts_expr(0, cfg)).select(
                *[f.name for f in FRONTIER_SCHEMA.fields]
            )
            n_seeds = -1
        else:
            ts0 = datetime.fromtimestamp(cfg.epoch_ms / 1000, tz=timezone.utc)
            seeds = self.spark.createDataFrame(
                [{**r, "next_fetch_time": ts0} for r in seed_rows], FRONTIER_SCHEMA
            )
            n_seeds = len(seed_rows)
        cand = with_fingerprint(with_canonical(seeds))
        # three commit writers consume these — pin before they race
        cand = cand.localCheckpoint(eager=True)
        invalid = cand.filter(~F.col("valid"))
        cand = cand.filter(F.col("valid"))
        empty_seen = self.store.read_url_seen(-1)
        fresh, dups = dedup_gate(cand, empty_seen)
        fresh = fresh.localCheckpoint(eager=True)
        pins = [cand, fresh]
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
            {"phase": "bootstrap", "n_seeds": n_seeds},
        )
        for df in pins:
            df.unpersist()

    # ------------------------------------------------------------------

    def _read_state(self, r: int) -> tuple[DataFrame, DataFrame]:
        """Frontier from the round's snapshot (manifest read: changed +
        carried buckets); url_seen from the hot in-memory cache
        (append-only set — re-reading every delta dir each round would
        be O(rounds²) file opens).  The cache is rebuilt from the store
        on first use, so resume still works."""
        frontier_raw = self.store.read_frontier(r)
        if self._seen_cache is None or self._seen_cache_round > r:
            self._seen_cache = self.store.read_url_seen(r).persist()
            self._seen_cache_round = r
        return frontier_raw, self._seen_cache

    def _advance_seen_cache(self, r: int) -> None:
        """Union the round's committed delta (read back from the store —
        file-backed lineage, safe after round checkpoints unpersist).

        The superseded cache is unpersisted (round-1 ADVICE: cached
        copies otherwise stack up O(rounds) in executor storage), and
        every ``seen_compact_every`` rounds the delta dirs compact into
        a base snapshot and the cache rebuilds from it — capping both
        union-plan depth and delta-dir fan-in."""
        old = self._seen_cache
        if r > 0 and r % self.cfg.seen_compact_every == 0:
            self.store.compact_url_seen(r)
            self._seen_cache = self.store.read_url_seen(r).persist()
        else:
            delta = self.spark.read.schema(URL_SEEN_SCHEMA).parquet(
                self.store._state_path("url_seen", r)
            )
            self._seen_cache = (
                old.unionByName(delta).persist() if old is not None else delta.persist()
            )
        if old is not None and old is not self._seen_cache:
            # safe immediately: the new cache's lineage reads parquet
            # files, never the old cache's blocks
            old.unpersist()
        self._seen_cache_round = r

    # ------------------------------------------------------------------
    # per-bucket bloom state (A5): maintained incrementally from each
    # round's url_seen delta; persisted with the commit for resume
    # ------------------------------------------------------------------

    def _bloom_enabled(self) -> bool:
        return self.cfg.bloom_enabled

    def _load_bloom_state(self, r: int) -> Optional[DataFrame]:
        """In-memory state, else the store's (resume), else a one-shot
        distributed rebuild from url_seen — never a driver collect."""
        if self._bloom_state is not None:
            return self._bloom_state
        m, k = self._bloom_mk
        state = self.store.read_state("bloom", r)
        if state is None:
            state = bloom_delta_state(
                self.store.read_url_seen(r), self.cfg.bloom_buckets, m, k
            )
        self._bloom_state = state.localCheckpoint(eager=True)
        return self._bloom_state

    def _advance_bloom_state(
        self, seen_delta: DataFrame, r: int
    ) -> Optional[DataFrame]:
        """Merge round *r*'s new fps into the bitmap shards; returns the
        new state (pinned) for inclusion in the commit.

        When no in-memory state exists yet (fresh engine whose rounds ran
        below bloom_min_seen, or a resume whose snapshot predates bloom),
        the base state MUST be materialized from the full url_seen as of
        round r first — merging the delta onto None would silently drop
        every earlier fp (seeds included) from the filter, and
        bloom_fp_verdicts would then route re-discovered URLs around the
        dedup anti-join as 'surely_new'."""
        if not self._bloom_enabled():
            return None
        m, k = self._bloom_mk
        delta = bloom_delta_state(seen_delta, self.cfg.bloom_buckets, m, k)
        if self._bloom_state is None:
            self._load_bloom_state(r)
        old = self._bloom_state
        merged = bloom_merge_state(old, delta).localCheckpoint(eager=True)
        if old is not None:
            old.unpersist()
        self._bloom_state = merged
        return merged

    def _compute_round(self, r: int, frontier: DataFrame, url_seen: DataFrame) -> "_RoundWork":
        """Phase A of a round: every Spark job EXCEPT the commit —
        schedule, fetch, parse, dedup, log assembly, and the submitted
        (not yet collected) side-aggregate.  Returns a ``_RoundWork``
        whose pinned DataFrames carry everything the commit needs, so
        the commit can run on a helper thread while the NEXT round's
        compute phase proceeds (the round cadence becomes
        ``max(compute, commit)`` instead of their sum — the commit was
        ~20% of round wall at every parallelism level, pure non-scaling
        I/O constant)."""
        cfg, site = self.cfg, self.site
        t0 = time.time()
        timings: dict[str, float] = {}
        pins: list[DataFrame] = []

        def pin(df: DataFrame, disk: bool = False) -> DataFrame:
            """Eager localCheckpoint registered for unpersist at round
            end — leaked checkpoint blocks otherwise accumulate across
            rounds until storage eviction + GC churn wreck throughput.

            ``disk=True`` stores the blocks DISK_ONLY: the fetch output
            carries the round's image payload (GBs), and holding it as
            deserialized JVM heap objects drove G1 young pauses of
            0.6-3.8 s and a live set that climbed past 14 GB (measured
            with -Xlog:gc at budget 256).  With spark.local.dir on
            tmpfs, DISK_ONLY is RAM-speed storage OUTSIDE the heap —
            the payload stops being the garbage collector's problem.
            On a real cluster this is exactly executor local-disk
            spill, so the choice survives the scale-up."""
            out = df.localCheckpoint(
                eager=True,
                storageLevel=StorageLevel.DISK_ONLY if disk else None,
            )
            pins.append(out)
            return out

        def mark(name: str) -> None:
            now = time.time()
            timings[name] = round(now - (t0 + sum(timings.values())), 3)

        decided = schedule_round(
            frontier, self.robots, self.budgets, r, cfg,
            robots_residual=self.robots_residual,
        )
        decided = pin(decided)  # budget window runs once
        selected = decided.filter(F.col("sched") == "selected").drop("sched")
        deferred = decided.filter(F.col("sched") == "deferred").drop("sched")
        blocked = decided.filter(F.col("sched") == "robots_blocked").drop("sched")
        sleeping = decided.filter(F.col("sched") == "sleeping").drop("sched")
        mark("schedule")

        # request middlewares (ascending priority) see the selected batch
        # just before it fetches; response middlewares (descending) see
        # the raw fetch output before the status gate — M1/M2 hook points
        to_fetch = self.plugins.request_middlewares.apply(
            salt_for_fetch(selected, cfg, self.budgets)
        )
        fetched = check_status(
            self.plugins.response_middlewares.apply(fetch_stage(to_fetch, site, cfg))
        )
        fetched = pin(fetched, disk=True)  # cut lineage; fetch runs once;
        # payload blocks live off-heap (see pin docstring)
        mark("fetch")
        # Narrow meta twin of the fetch output: the image payload column
        # is replaced by a NULL literal so the schema (and the parser
        # API) is unchanged while the pinned blocks stay KBs-per-row
        # small.  Checkpoint blocks are whole-row — column pruning can't
        # reach inside them — so every downstream scan of the payload
        # pin re-deserializes the round's GBs of image bytes.  With the
        # twin, the payload pin is scanned exactly twice per round (once
        # here, once by the items table write); links, fetch-log, retry
        # and frontier assembly all read the cheap meta pin.
        meta = pin(
            fetched.drop("image_bytes").withColumn(
                "image_bytes", F.lit(None).cast("binary")
            )
        )
        ok = fetched.filter(F.col("error").isNull())
        ok_meta = meta.filter(F.col("error").isNull())
        failed = meta.filter(F.col("error").isNotNull())

        items, links = run_parsers(ok, links_from=ok_meta)
        items = self.plugins.item_pipelines.apply(items)
        links_seq = assign_enqueue_seq(links, r + 1, cfg, pin=pin)
        mark("parse_seq")
        next_ts = round_ts_expr(r + 1, cfg)
        candidates = with_fingerprint(
            with_canonical(links_to_candidates(links_seq, r, next_ts))
        )
        # candidates feed invalid-log, dup-log, fresh, url_seen, frontier —
        # pin EAGERLY: the commit writes run concurrently, and two jobs
        # racing a lazy checkpoint both recompute the canonicalize UDF
        candidates = pin(candidates)
        invalid = candidates.filter(~F.col("valid"))
        candidates = candidates.filter(F.col("valid"))

        verdicts = None
        if self._bloom_enabled() and self.store.url_seen_total(r) >= cfg.bloom_min_seen:
            m, k = self._bloom_mk
            verdicts = bloom_fp_verdicts(
                candidates, self._load_bloom_state(r), cfg.bloom_buckets, m, k
            )
        fresh, dups = dedup_gate(candidates, url_seen, bloom_verdicts=verdicts)
        # fresh feeds three sinks (frontier, url_seen, logs) that run as
        # concurrent commit jobs — eager pin, or they race the compute
        fresh = pin(fresh)
        seen_delta = url_seen_delta(fresh, r + 1)

        retries = retry_candidates(failed, r, cfg, next_ts)

        state_cols = FRONTIER_COLS + ["canon_url", "domain", "fp"]
        new_frontier = (
            sleeping.select(*state_cols)
            .unionByName(deferred.select(*state_cols))
            .unionByName(fresh.select(*state_cols))
            .unionByName(retries.select(*state_cols))
        )

        log_parts = {
            "fetched": ok_meta,
            "failed": failed,
            "robots_blocked": blocked,
            "deferred": deferred,
            "dup_dropped": dups,
            "invalid": invalid,
        }
        branches = [
            _log_rows(df, r, outcome)
            for outcome, df in log_parts.items()
            if outcome in cfg.log_outcomes
        ]
        fetch_log = branches[0]
        for b in branches[1:]:
            fetch_log = fetch_log.unionByName(b)
        fetch_log = fetch_log.select([f.name for f in FETCH_LOG_SCHEMA.fields])
        fetch_log = pin(fetch_log)
        mark("dedup_log")

        # the round's driver-side side facts (outcome counters + changed-
        # bucket set) fold into ONE aggregation job — two stages with no
        # dependency, scheduled in parallel inside a single collect —
        # submitted on a helper thread so it overlaps the commit's table
        # writes; the item count is NOT a job at all (it falls out of the
        # items write's parquet footers inside the commit).  r2 ran three
        # separate sub-second collects here: pure per-round constant that
        # scaling can't amortize.
        # commit I/O ∝ churn: only fp-buckets touched this round rewrite
        # (ready rows left/changed; fresh/retry rows entered) — sleeping
        # buckets carry over by manifest reference
        ready_fps = decided.filter(F.col("sched") != "sleeping").select("fp")
        bucket_df = (
            ready_fps.unionByName(fresh.select("fp"))
            .select(
                # store.fp_buckets == cfg.fp_buckets (asserted in __init__);
                # the store's modulus is the layout's source of truth
                F.pmod(F.col("fp"), F.lit(self.store.fp_buckets))
                .cast("int")
                .alias("b")
            )
            .distinct()
        )
        side_df = counter_rows(fetch_log).select(
            F.lit("ctr").alias("kind"),
            F.col("outcome").alias("s"),
            F.col("status").cast("int").alias("i"),
            F.col("_disallowed").alias("flag"),
            F.col("count").alias("n"),
        ).unionByName(
            bucket_df.select(
                F.lit("bucket").alias("kind"),
                F.lit(None).cast("string").alias("s"),
                F.col("b").alias("i"),
                F.lit(None).cast("boolean").alias("flag"),
                F.lit(None).cast("long").alias("n"),
            )
        )

        bloom_state = self._advance_bloom_state(seen_delta, r)
        mark("counts")

        side_exec = ThreadPoolExecutor(max_workers=1)
        work = _RoundWork(
            round_no=r,
            t0=t0,
            timings=timings,
            pins=pins,
            new_frontier=new_frontier,
            seen_delta=seen_delta,
            items=items,
            fetch_log=fetch_log,
            bloom_state=bloom_state,
            side_exec=side_exec,
            side_fut=side_exec.submit(side_df.collect),
        )
        return work

    def _resolve_side(self, work: "_RoundWork") -> None:
        if "counts" in work.parsed:
            return
        rows = work.side_fut.result()
        work.parsed["counts"], work.parsed["status"] = parse_counter_rows(
            [
                {
                    "outcome": x["s"],
                    "status": x["i"],
                    "_disallowed": x["flag"],
                    "count": x["n"],
                }
                for x in rows
                if x["kind"] == "ctr"
            ]
        )
        work.parsed["buckets"] = [int(x["i"]) for x in rows if x["kind"] == "bucket"]

    def _launch_commit(self, work: "_RoundWork") -> None:
        """Phase B: hand the round's commit to the commit thread (or run
        it inline when no pool is active).  Closures resolve the side
        aggregate lazily, so only the commit thread ever blocks on it."""
        r = work.round_no

        def _changed_buckets() -> list[int]:
            self._resolve_side(work)
            return work.parsed["buckets"]

        def _metrics_fn(partial_counts: dict):
            self._resolve_side(work)
            # (rows, schema): the store writes this driver-built table
            # with pyarrow directly — no Spark job (r6, store.py
            # _write_local_parquet)
            return (
                round_metrics_rows(
                    work.parsed["counts"],
                    work.parsed["status"],
                    partial_counts.get("items", 0),
                    r,
                ),
                METRICS_SCHEMA,
            )

        def _stats() -> dict:
            self._resolve_side(work)
            return {"phase": "round", "round": r, "outcomes": work.parsed["counts"]}

        def _commit():
            return self.store.commit_round(
                r + 1,
                work.new_frontier,
                work.seen_delta,
                {"items": work.items, "fetch_log": work.fetch_log},
                _stats,
                frontier_changed_buckets=_changed_buckets,
                extra_state={"bloom": work.bloom_state}
                if work.bloom_state is not None
                else None,
                deferred_logs={"metrics": _metrics_fn},
            )

        work.commit_t0 = time.time()
        if self._commit_pool is not None:
            work.commit_fut = self._commit_pool.submit(_commit)
        else:
            fut: Future = Future()
            try:
                fut.set_result(_commit())
            except BaseException as e:  # noqa: BLE001 — surfaced at finalize
                fut.set_exception(e)
            work.commit_fut = fut

    def _finalize_round(self, work: "_RoundWork", wall_s: float) -> RoundResult:
        """Phase C: wait for the commit, advance the seen cache, build
        the RoundResult.  Pins are NOT unpersisted here — the caller
        frees them once the NEXT round's pins exist (the pipelined loop)
        or immediately (the synchronous wrapper)."""
        snapshot_id, table_counts = work.commit_fut.result()
        work.side_exec.shutdown(wait=False)
        work.timings["commit"] = round(time.time() - work.commit_t0, 3)
        counts = work.parsed["counts"]
        self._advance_seen_cache(work.round_no + 1)
        marker = self.store._marker(work.round_no + 1)
        if marker:
            work.timings["commit_tables"] = marker.get("write_times", {})
        return RoundResult(
            round_no=work.round_no,
            n_selected=counts.get("fetched", 0) + counts.get("failed", 0),
            n_fetched=counts.get("fetched", 0),
            n_failed=counts.get("failed", 0),
            n_items=table_counts.get("items", 0),
            n_new=counts.get("fetched", 0),
            n_dup=counts.get("dup_dropped", 0),
            n_deferred=counts.get("deferred", 0),
            n_blocked=counts.get("robots_blocked", 0),
            frontier_size=table_counts.get("frontier", 0),
            wall_s=wall_s,
            snapshot_id=snapshot_id,
            timings=work.timings,
        )

    def _discard_work(self, work: "_RoundWork") -> None:
        """Drop a speculatively computed round without committing it
        (pause raced ahead of the pipeline).  Deterministic recompute on
        resume makes the discard invisible to parity."""
        try:
            work.side_fut.result(timeout=60)
        except Exception:  # noqa: BLE001 — side job is advisory here
            pass
        work.side_exec.shutdown(wait=False)
        for df in work.pins:
            df.unpersist()

    def run_round(self, r: int, frontier: DataFrame, url_seen: DataFrame) -> RoundResult:
        """One fully synchronous round (streaming driver + direct
        callers); ``run()`` uses the pipelined phases directly."""
        t0 = time.time()
        work = self._compute_round(r, frontier, url_seen)
        self._launch_commit(work)
        result = self._finalize_round(work, wall_s=round(time.time() - t0, 3))
        for df in work.pins:
            df.unpersist()
        return result

    def run(
        self,
        seed_rows: Optional[list[dict]] = None,
        max_rounds: int = 50,
        resume: bool = False,
    ) -> CrawlSummary:
        """Execute (engine.go:191-194): bootstrap (unless resuming),
        then loop rounds until the frontier drains or max_rounds.

        The loop PIPELINES round N+1's compute phase with round N's
        commit: compute(N+1) runs against the in-memory new_frontier and
        (seen cache ∪ pinned delta) while the commit thread writes round
        N's tables.  Crash mid-commit is still safe — the marker is the
        visibility point and commits launch strictly in round order, so
        resume restarts from the last committed round and recomputes the
        (deterministic) lost round bit-identically."""
        if resume:
            start = self.store.last_committed_round()
            if start is None:
                raise RuntimeError("resume requested but no committed snapshot found")
        else:
            assert seed_rows is not None, "seed_rows required for a fresh crawl"
            self.bootstrap(seed_rows)
            start = 0

        self.events.emit(ev.START, round_no=start, resumed=resume)
        summary = CrawlSummary()
        r = start
        self._lifecycle = "running"
        pending: Optional[_RoundWork] = None
        self._commit_pool = ThreadPoolExecutor(max_workers=1)
        last_done = time.time()

        def _finalize_pending() -> None:
            """Wait for the in-flight commit, record its round.  wall_s
            is the round CADENCE (time since the previous round fully
            landed) — with pipelining that is max(compute, commit), the
            honest per-round throughput denominator."""
            nonlocal pending, last_done
            if pending is None:
                return
            result = self._finalize_round(pending, wall_s=0.0)
            done = time.time()
            result.wall_s = round(done - last_done, 3)
            last_done = done
            summary.rounds.append(result)
            # one tick == one round: the reference's heartbeat ticker
            self.events.emit(
                ev.HEARTBEAT, round_no=result.round_no, fetched=result.n_fetched
            )
            self.events.emit(ev.ROUND_END, round_no=result.round_no, result=result)
            # safe to free now: the commit is done and the NEXT round's
            # pins (if any) were materialized before this call
            for df in pending.pins:
                df.unpersist()
            pending = None

        try:
            while r < start + max_rounds:
                if pending is None and self._pause_requested:
                    # cooperative pause between rounds (service.go:64-147
                    # SetStatus(pause) semantics): the last commit marker
                    # is the checkpoint; run(resume=True) continues
                    self._pause_requested = False
                    self._lifecycle = "paused"
                    self.events.emit(ev.PAUSE, round_no=r)
                    break
                if pending is None:
                    frontier, url_seen = self._read_state(r)
                else:
                    # round r's inputs live in memory: the previous
                    # round's pinned new_frontier, and the seen cache
                    # (deltas ≤ r-1) unioned with its pinned delta (v_r)
                    frontier = pending.new_frontier
                    url_seen = self._seen_cache.unionByName(pending.seen_delta)
                if frontier.isEmpty():
                    break
                self.events.emit(ev.ROUND_START, round_no=r)
                work = self._compute_round(r, frontier, url_seen)
                # round r-1's commit ran concurrently with that compute
                _finalize_pending()
                if self._pause_requested:
                    # the pause landed while round r computed ahead of
                    # the pipeline — honor it WITHOUT committing round r
                    # (deterministic recompute on resume, parity-safe)
                    self._pause_requested = False
                    self._lifecycle = "paused"
                    self._discard_work(work)
                    self.events.emit(ev.PAUSE, round_no=r)
                    break
                self._launch_commit(work)
                pending = work
                r += 1
            _finalize_pending()
        except Exception as e:  # noqa: BLE001 — notify hooks, then re-raise
            self.events.emit(ev.ERROR, round_no=r, error=e)
            raise
        finally:
            if pending is not None and pending.commit_fut is not None:
                try:  # never abandon a half-launched commit thread
                    pending.commit_fut.result()
                except Exception:  # noqa: BLE001
                    pass
            self._commit_pool.shutdown(wait=True)
            self._commit_pool = None
            if self._lifecycle == "running":  # drained / max_rounds / error
                self._lifecycle = "idle"
        self.events.emit(ev.STOP, round_no=r, total_fetched=summary.total_fetched)
        return summary

    # ------------------------------------------------------------------
    # control plane (service/service.go:64-147 SetStatus/GetStatus as a
    # driver-side surface: pause cooperatively, read status cheaply)
    # ------------------------------------------------------------------

    def request_pause(self) -> None:
        """Pause at the next round boundary (callable from an event
        handler or another driver thread).  The committed snapshot is
        the checkpoint; ``run(resume=True)`` continues the crawl."""
        self._pause_requested = True

    def status(self) -> dict:
        """Live crawl status from commit metadata — zero Spark jobs
        (GetStatus analog; everything comes from the markers)."""
        last = self.store.last_committed_round()
        if last is None:
            return {
                "state": "unstarted",
                "pause_requested": self._pause_requested,
                "last_committed_round": None,
            }
        counts = self.store.committed_row_counts(last)
        marker = self.store._marker(last) or {}
        outcomes: dict[str, int] = {}
        for i in range(last + 1):
            m = self.store._marker(i) or {}
            for k, v in (m.get("stats", {}).get("outcomes") or {}).items():
                outcomes[k] = outcomes.get(k, 0) + v
        return {
            "state": self._lifecycle,
            "pause_requested": self._pause_requested,
            "last_committed_round": last,
            "snapshot_id": marker.get("snapshot_id"),
            "frontier_size": counts.get("frontier", 0),
            "url_seen_total": self.store.url_seen_total(last),
            "outcome_totals": outcomes,
        }
