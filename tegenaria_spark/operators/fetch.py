"""Fetch stage: vectorized ``mapInPandas`` over the salted selection.

Mirrors the reference downloader (/root/reference/downloader.go:247-329):
per-request headers/cookies/proxy/timeout, redirect chain capped at
``MaxRedirects`` (downloader.go:136-146), and the status allow-check
(downloader.go:236-244) applied afterwards as a plain column filter.

In production the body of ``_fetch_batch`` is an HTTP client with a
module-level connection pool (per-executor reuse across Arrow batches —
the Spark analogue of the reference's MaxIdleConns=1024 transport,
downloader.go:196-213).  In this sandbox it is the deterministic
synthetic web from :mod:`tegenaria_spark.sources.synth`: same UDF
signature, same schema, same batching; only the I/O call is simulated.
Image bytes are produced here (the "download"); phash is computed by a
separate vectorized stage (functions/images.py) like every other
derived column.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.functions.canonical import py_canonicalize, py_merge_params
from tegenaria_spark.sources.synth import SiteConfig, image_record, synth_page

FETCH_RESULT_COLS = (
    "status INT, final_url STRING, delay DOUBLE, content_length BIGINT, error STRING, "
    "outlinks ARRAY<STRING>, image_id STRING, caption STRING, img_fmt STRING, "
    "image_bytes BINARY, img_w INT, img_h INT, img_phash BIGINT"
)


def simulate_fetch_one(
    url: str,
    site: SiteConfig,
    max_redirects: int,
    params: dict | None = None,
    cookies: dict | None = None,
    proxy_url: str | None = None,
    timeout_ms: int | None = None,
    allow_redirects: bool = True,
    method: str = "GET",
    body: bytes | None = None,
) -> dict:
    """Fetch one URL through the synthetic web, honoring the
    per-request options the reference's downloader supports
    (downloader.go:110-146,274-329): params fold into the query before
    the request goes out, a proxy hop adds its (deterministic) latency,
    the redirect chain is capped per request and can be disabled
    entirely (ErrUseLastResponse semantics: the 301 comes back as the
    response), and the accumulated wait is checked against the
    request's timeout.  Cookies ride with the request; the synthetic
    web is stateless so they never alter content — both engine and
    simulator carry them identically.

    Shared verbatim by the Spark UDF below and the single-threaded
    reference simulator — fetch results are identical by construction.
    """
    current = py_merge_params(url, params) if params else url
    delay = 0.0005 if proxy_url else 0.0  # deterministic proxy hop
    _ = cookies  # carried, not content-affecting in the synthetic web
    hops = max_redirects if allow_redirects else 0
    for _i in range(hops + 1):
        # the method+body ride the whole redirect chain (the synthetic
        # web keeps the method across 301s — deterministic, mirrored
        # exactly by the simulator since this function IS the simulator)
        page = synth_page(current, site, method=method, body=body)
        delay += page.delay
        if timeout_ms is not None and delay * 1000.0 > timeout_ms:
            return {
                "status": 0,
                "final_url": py_canonicalize(current)[0],
                "delay": delay,
                "content_length": 0,
                "error": f"timeout after {timeout_ms} ms",
                "outlinks": [],
                "image_id": None,
                "caption": None,
                "img_fmt": None,
                "image_bytes": None,
                "img_w": None,
                "img_h": None,
                "img_phash": None,
            }
        if page.status == 301 and page.redirect_to and allow_redirects:
            current = page.redirect_to
            continue
        result = {
            "status": int(page.status),
            "final_url": py_canonicalize(current)[0],
            "delay": delay,
            "content_length": int(page.content_length),
            "error": None,
            "outlinks": list(page.outlinks),
            "image_id": page.image_id,
            "caption": page.caption,
            "img_fmt": page.fmt,
            "image_bytes": None,
            "img_w": None,
            "img_h": None,
            "img_phash": None,
        }
        if page.status == 0:
            result["error"] = "invalid url"
        if page.image_id is not None:
            rec = image_record(page.image_id, page.caption, page.fmt, site)
            result["image_bytes"] = rec["bytes"]
            result["img_w"] = rec["w"]
            result["img_h"] = rec["h"]
            result["img_phash"] = rec["phash"]
        return result
    # redirect cap exceeded — MaxRedirectError (exceptions.go:61-63)
    return {
        "status": 301,
        "final_url": py_canonicalize(current)[0],
        "delay": delay,
        "content_length": 0,
        "error": "max redirects exceeded",
        "outlinks": [],
        "image_id": None,
        "caption": None,
        "img_fmt": None,
        "image_bytes": None,
        "img_w": None,
        "img_h": None,
        "img_phash": None,
    }


def fetch_stage(selected: DataFrame, site: SiteConfig, cfg: EngineConfig) -> DataFrame:
    """Run the fetch UDF; returns input columns + FETCH_RESULT_COLS
    (+ ``body_html`` when ``cfg.render_html`` — the markup a goquery-
    style parser consumes, see functions/html.py)."""
    in_schema = selected.schema
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)
    full_schema = out_schema + ", " + FETCH_RESULT_COLS
    render_html = cfg.render_html
    if render_html:
        full_schema += ", body_html STRING"
    max_redirects = cfg.max_redirects

    def _as_dict(m):
        if m is None:
            return None
        return (m if isinstance(m, dict) else dict(m)) or None

    def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _opt(pdf, name, default=None):
            return pdf[name] if name in pdf.columns else [default] * len(pdf)

        for pdf in batches:
            results = [
                simulate_fetch_one(
                    u,
                    site,
                    max_redirects if mr is None or pd.isna(mr) else int(mr),
                    params=_as_dict(pr),
                    cookies=_as_dict(ck),
                    proxy_url=px if isinstance(px, str) and px else None,
                    timeout_ms=None if tm is None or pd.isna(tm) else int(tm),
                    allow_redirects=True if ar is None or pd.isna(ar) else bool(ar),
                    method=me if isinstance(me, str) and me else "GET",
                    body=bytes(bo) if bo is not None and not (isinstance(bo, float) and pd.isna(bo)) else None,
                )
                for u, pr, ck, px, tm, mr, ar, me, bo in zip(
                    pdf["url"],
                    _opt(pdf, "params"),
                    _opt(pdf, "cookies"),
                    _opt(pdf, "proxy_url"),
                    _opt(pdf, "timeout_ms"),
                    _opt(pdf, "max_redirects"),
                    _opt(pdf, "allow_redirects"),
                    _opt(pdf, "method", "GET"),
                    _opt(pdf, "body"),
                )
            ]
            res = pd.DataFrame(results)
            # a batch mixing None with int64 coerces to float64, and a
            # 64-bit hash silently loses its low 11 bits to the float
            # mantissa — keep the hash column nullable-Int64
            res["img_phash"] = pd.array(
                [r["img_phash"] for r in results], dtype="Int64"
            )
            if render_html:
                from tegenaria_spark.sources.synth import page_html

                # markup for clean fetches only (parsers consume ok
                # rows); rendered off the FINAL url so redirect chains
                # parse the page they landed on
                res["body_html"] = [
                    page_html(
                        r["final_url"],
                        site,
                        method=me if isinstance(me, str) and me else "GET",
                        body=bytes(bo)
                        if bo is not None and not (isinstance(bo, float) and pd.isna(bo))
                        else None,
                    )
                    if r["error"] is None
                    else None
                    for r, me, bo in zip(
                        results, _opt(pdf, "method", "GET"), _opt(pdf, "body")
                    )
                ]
            for col in res.columns:
                pdf[col] = res[col].values
            yield pdf

    return selected.mapInPandas(_fetch_batch, schema=full_schema)


def check_status(fetched: DataFrame) -> DataFrame:
    """F5 (downloader.go:236-244): status < 400 passes; ≥400 passes only
    if listed in the request's allow_status; otherwise mark failed."""
    bad = (
        F.col("error").isNull()
        & (F.col("status") >= 400)
        & ~F.coalesce(
            F.array_contains(F.col("allow_status"), F.col("status")), F.lit(False)
        )
    )
    return fetched.withColumn(
        "error",
        F.when(bad, F.concat(F.lit("disallowed status "), F.col("status").cast("string"))).otherwise(
            F.col("error")
        ),
    )
