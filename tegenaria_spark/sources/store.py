"""Snapshot store: per-round atomic commits, resume, lineage.

Replaces the reference's Redis queue + InfluxDB stats pair
(/root/reference/distributed/queue.go, distributed/stats.go) with one
table-versioned store, and gives the engine the north_rule checkpoint
semantics: every crawl round commits a snapshot; a restarted driver
resumes from the last *committed* round (Q7, engine.go:222-230
pause/resume made durable).

Layout (an Iceberg-shaped fallback on plain parquet — the interface is
what Iceberg's catalog would provide; swap ``LocalSnapshotStore`` for an
Iceberg writer and nothing above this module changes):

    root/
      state/frontier/v{r}/      full frontier state as of end of round r
      state/url_seen/v{r}/      append-only delta per round (read = union ≤ r)
      logs/{items,fetch_log,metrics,lineage}/round={r}/
      commits/round-{r}.json    written LAST — the atomic commit marker

A round is visible iff its marker exists; crash mid-round leaves
orphan data dirs that the next run ignores and overwrites.  With real
Iceberg, frontier maintenance becomes row-level MERGE instead of a
versioned rewrite and url_seen reads prune by the ``bucket(fp)``
partition spec — the fallback keeps the same read/write API.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tegenaria_spark.schemas import (
    FRONTIER_SCHEMA,
    LINEAGE_SCHEMA,
    URL_SEEN_SCHEMA,
)

APPEND_TABLES = ("items", "fetch_log", "metrics", "lineage")


class LocalSnapshotStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(os.path.join(root, "commits"), exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def last_committed_round(self) -> Optional[int]:
        cdir = os.path.join(self.root, "commits")
        rounds = [
            int(f[len("round-") : -len(".json")])
            for f in os.listdir(cdir)
            if f.startswith("round-") and f.endswith(".json")
        ]
        return max(rounds) if rounds else None

    def committed_row_counts(self, r: int) -> dict[str, int]:
        path = os.path.join(self.root, "commits", f"round-{r}.json")
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return json.load(fh).get("row_counts", {})

    def url_seen_total(self, upto_round: int) -> int:
        """Cumulative seen-set size from commit metadata — no Spark job."""
        return sum(
            self.committed_row_counts(i).get("url_seen", 0) for i in range(upto_round + 1)
        )

    def _state_path(self, table: str, r: int) -> str:
        return os.path.join(self.root, "state", table, f"v{r}")

    def _log_path(self, table: str, r: int) -> str:
        # rows carry their own `round` column; dir name is plain (not
        # partition-style) so parquet partition inference can't collide
        return os.path.join(self.root, "logs", table, f"r{r}")

    def commit_round(
        self,
        r: int,
        frontier: DataFrame,
        url_seen_delta: DataFrame,
        logs: dict[str, DataFrame],
        stats: dict,
    ) -> tuple[str, dict[str, int]]:
        """Write state + appends, then the marker.

        Returns ``(snapshot_id, row_counts_per_table)`` — counts fall out
        of the lineage pass, so callers never need a separate count job.
        """
        snapshot_id = f"snap-{r}-{uuid.uuid4().hex[:12]}"
        lineage_rows = []

        write_times: dict[str, float] = {}
        max_files = int(os.environ.get("TEGENARIA_COMMIT_MAX_FILES", "16"))

        def write(df: DataFrame, path: str, table: str) -> None:
            import time as _time

            _t0 = _time.time()
            if os.path.exists(path):
                shutil.rmtree(path)  # orphan from a crashed attempt
            # unions of checkpointed branches accumulate partitions
            # (hundreds of tiny files/tasks per write otherwise);
            # coalesce is shuffle-free over pinned blocks
            if df.rdd.getNumPartitions() > max_files:
                df = df.coalesce(max_files)
            df.write.mode("overwrite").parquet(path)
            write_times[table] = round(_time.time() - _t0, 2)
            # per-partition lineage from parquet footers — a pure
            # metadata read (the manifest scan Iceberg would give us),
            # zero Spark jobs
            import pyarrow.parquet as pq

            parts = sorted(
                f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
            )
            rows = []
            for pid, fname in enumerate(parts):
                n = pq.ParquetFile(os.path.join(path, fname)).metadata.num_rows
                rows.append((r, table, pid, snapshot_id, int(n)))
            with _lineage_lock:
                lineage_rows.extend(rows)

        # concurrent writes: Spark schedules jobs from multiple driver
        # threads, so commit wall time is the slowest table, not the sum
        import threading
        from concurrent.futures import ThreadPoolExecutor

        _lineage_lock = threading.Lock()
        jobs = [(frontier, self._state_path("frontier", r), "frontier"),
                (url_seen_delta, self._state_path("url_seen", r), "url_seen")]
        jobs += [(df, self._log_path(name, r), name) for name, df in logs.items()]
        max_workers = int(os.environ.get("TEGENARIA_COMMIT_THREADS", str(len(jobs))))
        if max_workers <= 1:
            for j in jobs:
                write(*j)
        else:
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                futures = [pool.submit(write, *j) for j in jobs]
                for f in futures:
                    f.result()
        lineage_rows.sort(key=lambda t: (t[1], t[2]))

        lineage = self.spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA)
        lineage.write.mode("overwrite").parquet(self._log_path("lineage", r))

        marker = {
            "round": r,
            "snapshot_id": snapshot_id,
            "stats": stats,
            "tables": {t: self._log_path(t, r) for t in logs} | {
                "frontier": self._state_path("frontier", r),
                "url_seen_delta": self._state_path("url_seen", r),
            },
        }
        table_counts: dict[str, int] = {}
        for _, table, _, _, n in lineage_rows:
            table_counts[table] = table_counts.get(table, 0) + n
        marker["row_counts"] = table_counts
        marker["write_times"] = write_times

        tmp = os.path.join(self.root, "commits", f".round-{r}.json.tmp")
        final = os.path.join(self.root, "commits", f"round-{r}.json")
        with open(tmp, "w") as fh:
            json.dump(marker, fh, indent=2)
        os.replace(tmp, final)  # the atomic commit point
        return snapshot_id, table_counts

    # -- reads ---------------------------------------------------------------

    def read_frontier(self, r: int) -> DataFrame:
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(self._state_path("frontier", r))

    def read_url_seen(self, upto_round: int) -> DataFrame:
        paths = [
            self._state_path("url_seen", i)
            for i in range(upto_round + 1)
            if os.path.exists(self._state_path("url_seen", i))
        ]
        if not paths:
            return self.spark.createDataFrame([], URL_SEEN_SCHEMA)
        return self.spark.read.schema(URL_SEEN_SCHEMA).parquet(*paths)

    def read_log(self, table: str, upto_round: Optional[int] = None) -> DataFrame:
        base = os.path.join(self.root, "logs", table)
        if not os.path.exists(base):
            raise FileNotFoundError(base)
        last = self.last_committed_round()
        upto = last if upto_round is None else upto_round
        paths = [
            self._log_path(table, i)
            for i in range(upto + 1)
            if os.path.exists(self._log_path(table, i))
        ]
        return self.spark.read.parquet(*paths)
