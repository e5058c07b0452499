"""HTTP control plane: GetStatus/SetStatus semantics of the reference's
service (service.go:64-191) over the driver-local engine."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.plans.engine import CrawlEngine
from tegenaria_spark.plans.service import ControlPlane
from tegenaria_spark.sources.store import LocalSnapshotStore
from tegenaria_spark.sources.synth import SiteConfig, seed_urls

CFG = EngineConfig(shuffle_partitions=4, fetch_partitions=4)


def _get(addr, path):
    try:
        with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}{path}", timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(addr, path, payload):
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait(pred, timeout=180, interval=0.2):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(interval)
    return False


def test_control_plane_status_pause_resume(spark, tmp_store_dir):
    # smallest site that still paces rounds slower than the HTTP polls:
    # the surface under test is the control plane, not the crawl
    site = SiteConfig(n_domains=2, pages_per_domain=6)
    store = LocalSnapshotStore(tmp_store_dir, spark)
    engine = CrawlEngine(spark, store, site, CFG)
    engine.bootstrap(seed_urls(site, n_seeds=5))

    plane = ControlPlane(engine, max_rounds=50).start()
    addr = plane.address
    try:
        # GET /status before any run: bootstrapped snapshot visible
        code, s = _get(addr, "/status")
        assert code == 200
        assert s["state"] == "idle" and s["last_committed_round"] == 0
        assert s["service"] == "serving"

        # SetStatus(ON) resumes the crawl on a background thread
        code, r = _post(addr, "/status", {"status": "ON"})
        assert code == 200 and r["action"] == "resumed"
        assert _wait(lambda: _get(addr, "/status")[1]["state"] == "running")

        # SetStatus(PAUSE) stops at the next round boundary
        code, r = _post(addr, "/status", {"status": "PAUSE"})
        assert code == 200 and r["action"] == "pause_requested"
        assert _wait(
            lambda: _get(addr, "/status")[1]["state"] in ("paused", "idle")
        )
        plane.join(timeout=120)
        code, s = _get(addr, "/status")
        paused_round = s["last_committed_round"]
        assert paused_round is not None

        # ON again: resume from the committed snapshot and drain
        code, r = _post(addr, "/status", {"status": "ON"})
        assert code == 200 and r["action"] in ("resumed", "already_running")
        assert _wait(lambda: _get(addr, "/status")[1]["state"] == "idle")
        plane.join(timeout=300)
        code, s = _get(addr, "/status")
        assert s["state"] == "idle"
        assert s["last_committed_round"] >= paused_round

        # bad inputs
        assert _post(addr, "/status", {"status": "SIDEWAYS"})[0] == 400
        assert _get(addr, "/nope")[0] == 404

        # OFF is terminal: later ON is refused with 409
        code, r = _post(addr, "/status", {"status": "OFF"})
        assert code == 200
        code, r = _post(addr, "/status", {"status": "ON"})
        assert code == 409
        assert _get(addr, "/status")[1]["service"] == "stopped"
    finally:
        plane.close()
