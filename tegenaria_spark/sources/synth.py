"""Deterministic synthetic web + seed frontier.

Replaces the reference's in-process gin httptest server
(/root/reference/example.go:143-246 — routes for GET/POST/403/redirect/
timeout/JSON) with a *pure function of the URL*: ``synth_page(url)``
derives status, redirect chains, outlinks and image payloads entirely
from XXH64 of the canonical URL plus a site seed.  No table lookup, no
network, no wall clock — so the Spark fetch UDF (executor-side), the
single-threaded reference simulator (driver-side) and any oracle see
byte-identical pages by construction at any scale.

The URL space is finite (``pages_per_domain`` per domain) so a crawl
terminates exactly when the reachable set is exhausted — the dedup
gate, not the generator, ends the crawl (mirrors the quotes example's
pagination, /root/reference/example/quotes/spider.go:74-88).

Domain popularity is Zipf-skewed: domain 0 is deliberately hot so the
salting/skew path is exercised (north_rule: explicit skew handling).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np

from tegenaria_spark.functions.canonical import py_canonicalize
from tegenaria_spark.functions.images import encode_image, phash64
from tegenaria_spark.functions.xxh64 import xxh64_unsigned


@dataclass(frozen=True)
class SiteConfig:
    n_domains: int = 20
    pages_per_domain: int = 64
    max_outlinks: int = 6
    seed: int = 42
    image_ratio: float = 0.7      # fraction of 200-pages carrying an image
    redirect_ratio: float = 0.05
    error_ratio: float = 0.06     # 403/404/500 mix
    zipf_a: float = 1.3           # domain popularity skew
    img_scale: int = 1            # multiplies image dimensions (bench knob)

    def domain(self, k: int) -> str:
        return f"d{k:03d}.example.test"

    def page_url(self, domain_idx: int, page_idx: int, shuffle: int = 0) -> str:
        """Canonical page URL; shuffle>0 emits a semantically-equal variant
        (reordered query params / added fragment) to exercise F3."""
        d = self.domain(domain_idx)
        if shuffle == 0:
            return f"http://{d}/p/{page_idx}?id={page_idx}&v=1"
        if shuffle == 1:
            return f"http://{d}/p/{page_idx}?v=1&id={page_idx}"
        return f"http://{d}/p/{page_idx}?v=1&id={page_idx}#sec{shuffle}"


class Page(NamedTuple):
    status: int
    redirect_to: Optional[str]
    outlinks: list[str]
    image_id: Optional[str]
    caption: Optional[str]
    fmt: Optional[str]
    content_length: int
    delay: float


def _page_hash(
    canon_url: str, cfg: SiteConfig, method: str = "GET", body: Optional[bytes] = None
) -> int:
    """Page identity hash.  Method + body mix in ONLY for non-plain-GET
    requests (reference example.go:143-246 routes /testPOST, /testForm,
    /testJson to distinct handlers: a POST must produce distinct
    content, not just a distinct fingerprint).  Plain GET keeps the
    historical hash string so committed fixtures stay valid."""
    m = (method or "GET").upper()
    if m != "GET" or body:
        bh = xxh64_unsigned(bytes(body) if body else b"")
        return xxh64_unsigned(f"site:{cfg.seed}:{m}:{bh}:{canon_url}".encode("utf-8"))
    return xxh64_unsigned(f"site:{cfg.seed}:{canon_url}".encode("utf-8"))


def _parse_page(canon_url: str, cfg: SiteConfig) -> Optional[tuple[int, int]]:
    """Extract (domain_idx, page_idx) from a synthetic URL, else None (404)."""
    try:
        host = canon_url.split("://", 1)[1].split("/", 1)[0]
        if not (host.startswith("d") and host.endswith(".example.test")):
            return None
        d = int(host[1:4])
        path = canon_url.split(host, 1)[1]
        if not path.startswith("/p/"):
            return None
        p = int(path[3:].split("?", 1)[0])
        if 0 <= d < cfg.n_domains and 0 <= p < cfg.pages_per_domain:
            return (d, p)
        return None
    except (ValueError, IndexError):
        return None


def synth_page(
    url: str, cfg: SiteConfig, method: str = "GET", body: Optional[bytes] = None
) -> Page:
    """The synthetic web: deterministic page for any (URL, method, body)."""
    canon, _, valid = py_canonicalize(url)
    if not valid:
        return Page(0, None, [], None, None, None, 0, 0.0)
    loc = _parse_page(canon, cfg)
    if loc is None:
        return Page(404, None, [], None, None, None, 64, 0.001)
    d, p = loc
    h = _page_hash(canon, cfg, method=method, body=body)
    roll = (h % 10_000) / 10_000.0

    if roll < cfg.redirect_ratio and p + 1 < cfg.pages_per_domain:
        # redirect to the next page on the same domain (chains arise naturally)
        return Page(301, cfg.page_url(d, p + 1), [], None, None, None, 0, 0.001)
    if roll < cfg.redirect_ratio + cfg.error_ratio:
        status = [403, 404, 500][h % 3]
        return Page(status, None, [], None, None, None, 128, 0.002)

    # 200 page: outlinks mostly same-domain, ~1 in 4 pages links cross-domain
    n_links = h % (cfg.max_outlinks + 1)
    links: list[str] = []
    for i in range(n_links):
        hh = xxh64_unsigned(f"link:{cfg.seed}:{canon}:{i}".encode())
        if hh % 4 == 0 and cfg.n_domains > 1:
            td = hh % cfg.n_domains
            tp = (hh >> 8) % cfg.pages_per_domain
        else:
            td = d
            tp = (hh >> 8) % cfg.pages_per_domain
        links.append(cfg.page_url(td, tp, shuffle=int(hh % 3)))

    image_id = None
    caption = None
    fmt = None
    # POST/form/JSON endpoints answer with data, not images (reference
    # example.go /testPOST et al.) — and a method-variant page must not
    # reuse the GET page's image_id with different caption content
    serves_image = (method or "GET").upper() == "GET" and not body
    if serves_image and (h >> 16) % 1000 < int(cfg.image_ratio * 1000):
        image_id = f"img-{d:03d}-{p:04d}"
        fmt = "png" if (h >> 24) % 2 == 0 else "jpeg"
        caption = f"synthetic {fmt} image {image_id} from {cfg.domain(d)} token{h % 997}"
    return Page(200, None, links, image_id, caption, fmt, 1024 + h % 4096, 0.001 + (h % 50) / 10_000.0)


def image_pixels(image_id: str, cfg: SiteConfig) -> np.ndarray:
    """Deterministic pixel array for an image_id: seeded gradient + noise."""
    h = xxh64_unsigned(f"img:{cfg.seed}:{image_id}".encode())
    rng = np.random.RandomState(h % (2**31))
    hgt = (24 + h % 41) * cfg.img_scale
    wid = (24 + (h >> 8) % 41) * cfg.img_scale
    # int16 ramps instead of float64 mgrid: ~8× less memory traffic per
    # image, which is what keeps 32 parallel fetch workers off the
    # memory-bandwidth wall
    xr = ((np.arange(wid, dtype=np.int32) * 255) // max(wid - 1, 1)).astype(np.int16)
    yr = ((np.arange(hgt, dtype=np.int32) * 255) // max(hgt - 1, 1)).astype(np.int16)
    dr = (
        (np.add.outer(np.arange(hgt, dtype=np.int32), np.arange(wid, dtype=np.int32)) * 127)
        // max(wid + hgt - 2, 1)
    ).astype(np.int16)
    base = np.empty((hgt, wid, 3), dtype=np.int16)
    base[:, :, 0] = xr[None, :]
    base[:, :, 1] = yr[:, None]
    base[:, :, 2] = dr
    noise = rng.randint(-20, 21, size=(hgt, wid, 3)).astype(np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_record(image_id: str, caption: str, fmt: str, cfg: SiteConfig) -> dict:
    """Full store row for an image page — used by the fetch simulator
    (engine) AND the oracle store generator; identical bytes both sides."""
    px = image_pixels(image_id, cfg)
    blob = encode_image(px, fmt)
    from tegenaria_spark.functions.images import decode_image

    return {
        "image_id": image_id,
        "bytes": blob,
        "w": int(px.shape[1]),
        "h": int(px.shape[0]),
        "fmt": fmt,
        "caption": caption,
        # phash describes the *stored* bytes (what a consumer decodes),
        # so lossy formats hash the reconstruction, not the original
        "phash": phash64(decode_image(blob)),
    }


def page_quotes(canon_url: str, cfg: SiteConfig) -> list[tuple[str, str, str]]:
    """Generative model for a 200-page's quote items: (text, author,
    tag) triples, 1-3 per page, pure hash functions of the canonical
    URL.  This IS the ground truth the markup renders — an oracle can
    call this directly and never parse HTML, so markup extraction is
    verified against an independent derivation (the quotes example's
    item shape, example/quotes/spider.go:25-29)."""
    out = []
    h = _page_hash(canon_url, cfg)
    for i in range(1 + h % 3):
        qh = xxh64_unsigned(f"quote:{cfg.seed}:{canon_url}:{i}".encode())
        out.append(
            (
                f"quote {qh % 9973} from {canon_url.split('://', 1)[1].split('/', 1)[0]}",
                f"author-{(qh >> 16) % 50:02d}",
                f"t{(qh >> 32) % 8}",
            )
        )
    return out


def page_html(url: str, cfg: SiteConfig, method: str = "GET", body: Optional[bytes] = None) -> str:
    """Render the synthetic page as REAL markup — the quotes-site shape
    (example/quotes templates: ``div.quote`` with ``span.text`` /
    ``small.author`` / ``a.tag``, pagination as ``ul.pager li.next a``).
    Deterministic function of (URL, method, body) like
    :func:`synth_page`; the pager carries EXACTLY the structured
    ``outlinks`` — same-domain links relative (so extraction must
    urljoin like the Go spider does, spider.go:74-88), cross-domain
    absolute."""
    canon, _, valid = py_canonicalize(url)
    page = synth_page(url, cfg, method=method, body=body)
    if not valid or page.status in (0, 404) or (page.status in (403, 500)):
        return f'<html><body><h1 class="err">{page.status}</h1></body></html>'
    if page.status == 301:
        return (
            "<html><body>"
            f'<a class="redirect" href="{page.redirect_to}">moved</a>'
            "</body></html>"
        )
    host = canon.split("://", 1)[1].split("/", 1)[0]
    parts = [f"<html><head><title>{host}</title></head><body>"]
    for text, author, tag in page_quotes(canon, cfg):
        parts.append(
            '<div class="quote">'
            f'<span class="text">{text}</span>'
            f'<small class="author">{author}</small>'
            f'<div class="tags"><a class="tag" href="/tag/{tag}">{tag}</a></div>'
            "</div>"
        )
    if page.image_id is not None:
        parts.append(
            f'<img class="payload" src="/img/{page.image_id}.{page.fmt}" '
            f'alt="{page.caption}"/>'
        )
    parts.append('<ul class="pager">')
    for link in page.outlinks:
        lhost = link.split("://", 1)[1].split("/", 1)[0]
        href = link[len("http://") + len(lhost):] if lhost == host else link
        parts.append(f'<li class="next"><a href="{href}">more</a></li>')
    parts.append("</ul></body></html>")
    return "".join(parts)


def html_testset_urls(cfg: SiteConfig, page_step: int = 3) -> list[str]:
    """Deterministic URL set for the markup-extraction contract
    queries: every domain, every *page_step*-th page, with the shuffle
    variant rotating 0/1/2 so canonicalization (param order, fragment
    drop) is exercised on the way into the renderer.  Mixed statuses by
    construction (redirect/error pages yield no extracted rows)."""
    urls = []
    i = 0
    for d in range(cfg.n_domains):
        for p in range(0, cfg.pages_per_domain, page_step):
            urls.append(cfg.page_url(d, p, shuffle=i % 3))
            i += 1
    return urls


# ---------------------------------------------------------------------------
# Seed frontier
# ---------------------------------------------------------------------------


def seed_urls(
    cfg: SiteConfig,
    n_seeds: int,
    dup_ratio: float = 0.2,
    seed: int = 7,
    option_ratio: float = 0.0,
) -> list[dict]:
    """Deterministic seed list with Zipf-skewed domains, ~dup_ratio
    semantically-duplicate URLs (shuffled query order / fragments) and a
    few do_not_filter rows (mirrors dupefilters_test.go:30-42).

    ``option_ratio`` > 0 sprinkles per-request fetch options over the
    seeds (params / cookies / proxy / timeout / redirect caps — the
    reference downloader's test matrix, downloader_test.go:29-282) so
    parity tests exercise every option path end-to-end."""
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, cfg.n_domains + 1, dtype=np.float64)
    probs = ranks ** (-cfg.zipf_a)
    probs /= probs.sum()
    rows = []
    for i in range(n_seeds):
        d = int(rng.choice(cfg.n_domains, p=probs))
        p = int(rng.randint(0, cfg.pages_per_domain))
        shuffle = int(rng.randint(0, 3)) if rng.rand() < dup_ratio else 0
        opts: dict = {
            "params": None,
            "cookies": None,
            "proxy_url": None,
            "timeout_ms": None,
            "max_redirects": None,
            "allow_redirects": True,
        }
        # short-circuit keeps the rng stream identical to option-less
        # callers (committed fixtures depend on the draw sequence)
        method, body = "GET", None
        if option_ratio > 0 and rng.rand() < option_ratio:
            kind = i % 6
            if kind == 0:
                opts["params"] = {"extra": str(i % 7), "trk": "abc"}
            elif kind == 1:
                opts["cookies"] = {"session": f"s{i:04d}"}
            elif kind == 2:
                opts["proxy_url"] = "http://proxy-01.example.test:8080"
            elif kind == 3:
                opts["timeout_ms"] = 3  # some pages exceed this → timeout+retry
            elif kind == 4:
                opts["max_redirects"] = 0 if i % 2 else None
                opts["allow_redirects"] = bool(i % 2)
            else:
                # POST/form seeds (downloader_test.go /testPOST,
                # /testForm): distinct body ⇒ distinct fingerprint AND
                # distinct fetched content (method+body mix into the
                # synthetic page hash)
                method = "POST"
                body = f"q={i % 9}&form=1".encode("utf-8")
        rows.append(
            {
                "ctx_id": f"seed-{i:06d}",
                "url": cfg.page_url(d, p, shuffle=shuffle),
                "method": method,
                "headers": {"User-Agent": "tegenaria-spark/0.1"},
                "body": body,
                "meta": None,
                "parser": "image_parser",
                "do_not_filter": bool(rng.rand() < 0.02),
                "allow_status": [],
                "priority": int(rng.randint(0, 3)),
                "enqueue_seq": i,
                "retries": 0,
                "round_added": 0,
                **opts,
            }
        )
    return rows


def seed_frontier_df(spark, cfg: SiteConfig, n_seeds: int, default_budget: int = 16):
    """Distributed seed generator: ``spark.range`` + hash expressions —
    no driver-side row loop, no createDataFrame serialization.  Used by
    the bench (the parity tests keep the Python ``seed_urls`` twin).

    Domain skew: u² inverse-CDF over the hash-uniform draw concentrates
    seeds on low domain indexes (the hot-domain shape Zipf gives)."""
    import pyspark.sql.functions as F

    d = cfg.n_domains
    p = cfg.pages_per_domain
    u = (F.abs(F.xxhash64(F.col("id"))) % 1_000_000) / 1_000_000.0
    domain_idx = F.floor(u * u * d).cast("int")
    page_idx = (F.abs(F.xxhash64(F.col("id"), F.lit("p"))) % p).cast("int")
    url = F.concat(
        F.lit("http://d"),
        F.lpad(domain_idx.cast("string"), 3, "0"),
        F.lit(".example.test/p/"),
        page_idx.cast("string"),
        F.lit("?id="),
        page_idx.cast("string"),
        F.lit("&v=1"),
    )
    return spark.range(n_seeds).select(
        F.concat(F.lit("seed-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("ctx_id"),
        url.alias("url"),
        F.lit("GET").alias("method"),
        F.create_map(F.lit("User-Agent"), F.lit("tegenaria-spark/0.1")).alias("headers"),
        F.lit(None).cast("binary").alias("body"),
        F.lit(None).cast("map<string,string>").alias("params"),
        F.lit(None).cast("map<string,string>").alias("meta"),
        F.lit("image_parser").alias("parser"),
        F.lit(False).alias("do_not_filter"),
        F.lit([]).cast("array<int>").alias("allow_status"),
        (F.abs(F.xxhash64(F.col("id"), F.lit("prio"))) % 3).cast("int").alias("priority"),
        F.col("id").alias("enqueue_seq"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(0).cast("int").alias("round_added"),
        F.lit(None).cast("map<string,string>").alias("cookies"),
        F.lit(None).cast("string").alias("proxy_url"),
        F.lit(None).cast("int").alias("timeout_ms"),
        F.lit(None).cast("int").alias("max_redirects"),
        F.lit(None).cast("boolean").alias("allow_redirects"),
    )


def robots_rules(cfg: SiteConfig) -> list[dict]:
    """Synthesized permissive rules + a few disallowed prefixes
    (north_rule; the reference has no robots handling)."""
    rows = []
    for k in range(cfg.n_domains):
        d = cfg.domain(k)
        rows.append({"domain": d, "path_prefix": "/", "allow": True})
        if k % 5 == 0:
            # disallow a slice of the page space on every 5th domain
            rows.append({"domain": d, "path_prefix": "/p/1", "allow": False})
    return rows


def domain_budgets(cfg: SiteConfig, default_budget: int = 16) -> list[dict]:
    rows = []
    for k in range(cfg.n_domains):
        budget = default_budget if k else max(4, default_budget // 2)  # hot domain throttled
        rows.append({"domain": cfg.domain(k), "budget_per_round": budget, "max_conns": 128})
    return rows


def phash_testset(
    n_base: int = 24, n_dup: int = 12, cfg: Optional[SiteConfig] = None
) -> list[tuple[str, bytes]]:
    """Deterministic (image_id, png_bytes) rows for image near-dup
    tests: *n_base* distinct synthetic images plus, for the first
    *n_dup* of them, a single-pixel-perturbed copy (suffix ``-dup``).
    Lossless PNG both sides, so the perturbed copy decodes to pixels a
    hair from its base — a pHash near-duplicate — while distinct bases
    stay tens of bits apart.  Shared INPUT for the Spark query and its
    python twin (the computation, not the input, is what the oracle
    re-derives independently)."""
    from tegenaria_spark.functions.images import encode_image

    cfg = cfg or SiteConfig()
    rows: list[tuple[str, bytes]] = []
    for i in range(n_base):
        image_id = f"img-{i:03d}-{i:04d}"
        px = image_pixels(image_id, cfg)
        rows.append((image_id, encode_image(px, "png")))
        if i < n_dup:
            perturbed = px.copy()
            perturbed[0, 0, :] = (perturbed[0, 0, :].astype(np.int16) + 3).clip(0, 255).astype(px.dtype)
            rows.append((f"{image_id}-dup", encode_image(perturbed, "png")))
    return rows


def caption_for(image_id: str) -> str:
    """Deterministic caption for a testset image — dup copies carry a
    LONGER caption than their base, so keep-best-caption selection is
    exercised non-trivially (the dup, not the base, must win)."""
    if image_id.endswith("-dup"):
        return f"photo {image_id} with a longer descriptive caption"
    return f"photo {image_id}"


def captioned_phash_testset(
    n_base: int = 24, n_dup: int = 12, cfg: Optional[SiteConfig] = None
) -> list[tuple[str, bytes, str]]:
    """`phash_testset` rows + deterministic captions — the input_hint
    image+caption shape.  Shared INPUT for the caption-dedup query and
    its python twin."""
    return [(i, b, caption_for(i)) for i, b in phash_testset(n_base, n_dup, cfg)]


ROBOTS_GATE_PATHS = [
    "/", "/index.html", "/fish", "/fish.html", "/fish/", "/fish/salmon.html",
    "/fishheads/yummy.html", "/Fish.asp", "/catfish", "/peix",
    "/admin/", "/admin/help", "/admin/secret/key", "/private", "/private/public/x",
    "/public/doc.html", "/page", "/x/page.htm", "/filename.php",
    "/filename.php/", "/a/b/c", "/img/banner.png", "/teg/only", "/all/zone",
    "/search", "/search/results", "/static/app.js", "/downloads/file.zip",
    "/b/ok.html", "/b/other",
]


def robots_txt_corpus(n_domains: int = 20) -> dict[str, str]:
    """Deterministic per-domain robots.txt TEXT corpus cycling the
    idioms a real crawl meets: overlapping prefix Allow/Disallow,
    wildcard + $-anchored patterns, multi-agent groups with
    crawl-delay, disallow-all with a carve-out, the empty-Disallow
    allow-all idiom, and comment noise.  Shared INPUT for the
    robots_txt_gate query and its independent twin."""
    out: dict[str, str] = {}
    for d in range(n_domains):
        kind = d % 6
        if kind == 0:
            txt = (
                "# standard prefix rules\n"
                "User-agent: *\n"
                "Disallow: /admin/\n"
                "Allow: /admin/help\n"
                "Disallow: /private\n"
                "Allow: /private/public\n"
            )
        elif kind == 1:
            txt = (
                "User-agent: *\n"
                "Disallow: /fish*\n"
                "Allow: /fish/salmon.html\n"
                f"Disallow: /*.php$\n"
            )
        elif kind == 2:
            txt = (
                "User-agent: *\nDisallow: /all/\n\n"
                "User-agent: tegenaria\nDisallow: /teg/\nCrawl-delay: 1.5\n\n"
                "User-agent: tegenaria-image\nDisallow: /img/\n"
            )
        elif kind == 3:
            txt = (
                "User-agent: *\n"
                "Disallow: /\n"
                "Allow: /public/\n"
                f"Allow: /static/\n"
            )
        elif kind == 4:
            txt = "# nothing blocked here\nUser-agent: *\nDisallow:\n"
        else:
            # split same-agent groups: RFC 9309 §2.2.1 merges rules
            # across every group the winning token matches — a parser
            # that keeps only the first `*` group under-blocks /b/
            txt = (
                "User-agent: *\nDisallow: /a/\n\n"
                "User-agent: other-bot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /b/\nAllow: /b/ok\n"
            )
        out[f"d{d:02d}.example"] = txt
    return out
