"""Harness-level invariants for bench.py's printed artifact.

The grading driver records only the last ~2,000 chars of bench stdout;
round 4's final line was ~4.1 KB and lost its head to that buffer
(recorded as parsed:null).  These tests pin the r5 fix: every line
bench prints must fit the tail whole, at any realistic pair count.
No SparkSession needed — pure JSON-shaping logic.
"""

import importlib.util
import json
import os

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_result(n_queries: int, n_pairs: int, name_len: int = 24) -> dict:
    level = {
        "bootstrap_s": 18.131,
        "busy_cores": 16.288,
        "ballast_cpus": 12,
        "ballast_alive": True,
        "steal_cores": 0.013,
        "triad_gbps": [8.773, 0.477],
        "loadavg_max": 18.337,
        "warmup_round_s": 336.471,
        "warmup_fetched": 192450,
        "rounds_wall_s": 239.984,
        "fetched": 366630,
        "items": 366630,
        "rounds": 3,
        "budget": 256,
        "fetched_per_sec": 1459.287,
        "fetched_per_sec_rounds": [829.82, 1425.55, 16749.36],
        "fetched_per_sec_steady": [829.82, 1425.55],
        "fetched_per_sec_best": 1425.55,
    }
    run_row = {
        "eff": 1.456,
        "eff_best_round": 0.791,
        "clean": True,
        "banked": True,
        "busy_cores": [16.288, 15.901],
        "steal_cores": [0.013, 0.002],
        "triad_gbps": [[8.773, 0.477], [8.496, 1.785]],
        "loadavg_max": [18.337, 17.196],
    }
    return {
        "metric": "headline query suite wall time (+ crawl frontier-round throughput)",
        "value": 160.874,
        "unit": "sec",
        # worst-case realistic names: the longest actual contract key is
        # ~24 chars; use 30 to leave margin for future keys
        # realistic timing magnitudes: most contract queries are 0.1-20 s
        # realistic timing magnitudes: the heavy dedups are 10-20 s but
        # most of the 54 contract queries print as "0.52"-sized strings
        "queries": {f"q{i:02d}_{'x' * (name_len - 4)}": 3.456 for i in range(n_queries)},
        "sf": 0.1,
        "crawl": {
            "local[4]": level,
            "local[16]": dict(level, fetched_per_sec=5724.551),
            "fetched_urls_per_sec_lo": 1459.287,
            "fetched_urls_per_sec_hi": 5724.551,
            "pairs_done": n_pairs,
            "gates": {"local[4]": [8.5, 10.0], "local[16]": [26.5, 28.0]},
            "runs": [dict(run_row) for _ in range(n_pairs)],
            "n_clean_pairs": n_pairs,
            "banked_pairs": n_pairs,
            "eff_capability": 0.791,
            "scaling_efficiency": 0.977,
            "scaling_efficiency_all_pairs": 0.977,
            "scaling_efficiency_best_round": 0.791,
        },
    }


def test_lean_line_fits_driver_tail_at_any_pair_count():
    bench = _load_bench()
    for n_pairs in (0, 1, 3, 7):
        result = _fake_result(n_queries=54, n_pairs=n_pairs)
        if n_pairs == 0:
            result.pop("crawl")
        line = bench._lean_line(result)
        assert len(line) <= bench._TAIL_BUDGET, (n_pairs, len(line))
        parsed = json.loads(line)  # stays valid JSON after trimming
        assert parsed["sf"] == 0.1
        assert parsed["queries"]  # never trimmed to nothing
        if n_pairs:
            c = parsed["crawl"]
            # the graded fields survive every trim level
            assert c["scaling_efficiency"] == 0.977
            assert c["n_clean_pairs"] == n_pairs
            assert c["banked_pairs"] == n_pairs
            assert c["pairs_done"] == n_pairs


def test_lean_line_keeps_per_pair_effs_when_they_fit():
    # the REAL contract inventory: 54 keys averaging ~18 chars — the
    # per-pair effs/clean arrays must survive at that size
    bench = _load_bench()
    line = bench._lean_line(_fake_result(n_queries=54, n_pairs=3, name_len=18))
    c = json.loads(line)["crawl"]
    assert c["effs"] == [1.456, 1.456, 1.456]
    assert c["clean"] == [True, True, True]
