"""Single-threaded reference simulator — the ordering/URL-seen oracle.

Implements the reference engine's *testable contract* (engine.go
semantics linearized, see SURVEY.md §7 "crawl-order reproduction") in
plain Python dicts and lists, sharing the exact same primitive
functions as the Spark engine (`py_canonicalize`, `py_fingerprint`,
`synth_page`/`simulate_fetch_one`, `image_record`).  The parity test
runs the same seed list + politeness budget through this simulator and
through :class:`tegenaria_spark.plans.engine.CrawlEngine` and asserts
identical (round, seq, url) fetch order, identical URL-seen sets, and
identical image stores (bit-exact bytes, caption, phash).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.functions.canonical import (
    py_canonicalize,
    py_fingerprint,
    py_merge_params,
)
from tegenaria_spark.operators.fetch import simulate_fetch_one
from tegenaria_spark.sources.synth import SiteConfig, image_record


@dataclass
class SimRequest:
    ctx_id: str
    url: str
    method: str
    headers: Optional[dict]
    body: Optional[bytes]
    parser: str
    do_not_filter: bool
    allow_status: list[int]
    priority: int
    enqueue_seq: int
    next_round: int
    retries: int
    params: Optional[dict] = None
    cookies: Optional[dict] = None
    proxy_url: Optional[str] = None
    timeout_ms: Optional[int] = None
    max_redirects: Optional[int] = None
    allow_redirects: bool = True
    canon_url: str = ""
    domain: str = ""
    fp: int = 0


@dataclass
class SimResult:
    fetch_log: list[tuple] = field(default_factory=list)  # (round, seq, ctx_id, url, domain, status, outcome)
    url_seen: set[int] = field(default_factory=set)
    items: dict[str, dict] = field(default_factory=dict)  # image_id -> store row
    rounds: int = 0


def _robots_allowed(canon_url: str, domain: str, robots: list[dict]) -> bool:
    path = canon_url.split(domain, 1)[1].split("?", 1)[0] if domain in canon_url else "/"
    path = path or "/"
    best: Optional[dict] = None
    for rule in robots:
        if rule["domain"] == domain and path.startswith(rule["path_prefix"]):
            if (
                best is None
                or len(rule["path_prefix"]) > len(best["path_prefix"])
                or (
                    len(rule["path_prefix"]) == len(best["path_prefix"])
                    and rule["allow"]
                    and not best["allow"]
                )
            ):
                best = rule
    return True if best is None else bool(best["allow"])


def simulate_crawl(
    seed_rows: list[dict],
    site: SiteConfig,
    cfg: EngineConfig,
    robots: Optional[list[dict]] = None,
    budgets: Optional[list[dict]] = None,
    max_rounds: int = 50,
) -> SimResult:
    robots = robots or []
    budget_map = {b["domain"]: b["budget_per_round"] for b in (budgets or [])}
    res = SimResult()
    frontier: list[SimRequest] = []

    def enqueue(reqs: list[SimRequest], round_no: int) -> None:
        """The dedup gate at enqueue time (writeCache, engine.go:346-377):
        sequential TestOrAdd order = ascending enqueue_seq."""
        for q in sorted(reqs, key=lambda x: x.enqueue_seq):
            # F7: params fold into the URL before canonicalize/fingerprint
            merged = py_merge_params(q.url, q.params) if q.params else q.url
            canon, domain, valid = py_canonicalize(merged)
            if not valid:
                res.fetch_log.append((round_no, q.enqueue_seq, q.ctx_id, q.url, domain, None, "invalid"))
                continue
            q.canon_url, q.domain = canon, domain
            q.fp = py_fingerprint(q.method, merged, q.body, q.headers)
            if q.do_not_filter:
                frontier.append(q)
                continue
            if q.fp in res.url_seen:
                res.fetch_log.append((round_no, q.enqueue_seq, q.ctx_id, q.url, domain, None, "dup_dropped"))
                continue
            res.url_seen.add(q.fp)
            frontier.append(q)

    # bootstrap: seeds are round-0 candidates
    seeds = [
        SimRequest(
            ctx_id=r["ctx_id"],
            url=r["url"],
            method=r["method"],
            headers=r.get("headers"),
            body=r.get("body"),
            parser=r["parser"],
            do_not_filter=r["do_not_filter"],
            allow_status=list(r.get("allow_status") or []),
            priority=r["priority"],
            enqueue_seq=r["enqueue_seq"],
            next_round=0,
            retries=0,
            params=r.get("params"),
            cookies=r.get("cookies"),
            proxy_url=r.get("proxy_url"),
            timeout_ms=r.get("timeout_ms"),
            max_redirects=r.get("max_redirects"),
            allow_redirects=(
                True if r.get("allow_redirects") is None else bool(r["allow_redirects"])
            ),
        )
        for r in seed_rows
    ]
    enqueue(seeds, 0)

    for r in range(max_rounds):
        if not frontier:
            break
        res.rounds = r + 1
        ready = [q for q in frontier if q.next_round <= r]
        sleeping = [q for q in frontier if q.next_round > r]
        if not ready:
            # everything is deferred to a future round; hop forward
            frontier = sleeping
            continue

        allowed: list[SimRequest] = []
        for q in ready:
            if _robots_allowed(q.canon_url, q.domain, robots):
                allowed.append(q)
            else:
                res.fetch_log.append((r, q.enqueue_seq, q.ctx_id, q.url, q.domain, None, "robots_blocked"))

        # per-domain budget window: (priority, next_round, enqueue_seq)
        by_domain: dict[str, list[SimRequest]] = {}
        for q in allowed:
            by_domain.setdefault(q.domain, []).append(q)
        selected: list[SimRequest] = []
        deferred: list[SimRequest] = []
        for domain, qs in by_domain.items():
            qs.sort(key=lambda x: (x.priority, x.next_round, x.enqueue_seq))
            budget = budget_map.get(domain, cfg.default_budget_per_round)
            selected.extend(qs[:budget])
            for q in qs[budget:]:
                res.fetch_log.append((r, q.enqueue_seq, q.ctx_id, q.url, q.domain, None, "deferred"))
                q.next_round = r + 1
                deferred.append(q)

        # fetch + status gate
        links: list[tuple] = []  # (parent_seq, parent_priority, pos, url)
        retries: list[SimRequest] = []
        for q in selected:
            f = simulate_fetch_one(
                q.url,
                site,
                cfg.max_redirects if q.max_redirects is None else q.max_redirects,
                params=q.params,
                cookies=q.cookies,
                proxy_url=q.proxy_url,
                timeout_ms=q.timeout_ms,
                allow_redirects=q.allow_redirects,
                method=q.method,
                body=q.body,
            )
            error = f["error"]
            if error is None and f["status"] >= 400 and f["status"] not in q.allow_status:
                error = f"disallowed status {f['status']}"
            if error is None:
                res.fetch_log.append((r, q.enqueue_seq, q.ctx_id, q.url, q.domain, f["status"], "fetched"))
                if f["image_id"] is not None:
                    res.items[f["image_id"]] = image_record(
                        f["image_id"], f["caption"], f["img_fmt"], site
                    )
                for pos, link in enumerate(f["outlinks"]):
                    links.append((q.enqueue_seq, q.priority, pos, link))
            else:
                res.fetch_log.append((r, q.enqueue_seq, q.ctx_id, q.url, q.domain, f["status"], "failed"))
                if q.retries < cfg.max_retries:
                    q.retries += 1
                    q.do_not_filter = True
                    q.next_round = r + 1
                    retries.append(q)

        # deterministic FIFO sequencing of new requests
        links.sort(key=lambda t: (t[0], t[2]))
        children = [
            SimRequest(
                ctx_id=f"ctx-{(r + 1) * cfg.seq_stride + i}",
                url=link,
                method="GET",
                headers={"User-Agent": "tegenaria-spark/0.1"},
                body=None,
                parser="image_parser",
                do_not_filter=False,
                allow_status=[],
                priority=parent_priority,
                enqueue_seq=(r + 1) * cfg.seq_stride + i,
                next_round=r + 1,
                retries=0,
            )
            for i, (parent_seq, parent_priority, pos, link) in enumerate(links)
        ]

        frontier = sleeping + deferred + retries
        enqueue(children, r)

    return res
