"""Markup extraction: selector engine units, render↔extract parity
against the generative model, and the fetch→html-parser Spark path
(the ported quotes spider, example/quotes/spider.go:48-90)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tegenaria_spark.functions.canonical import py_canonicalize
from tegenaria_spark.functions.html import (
    parse_html,
    py_extract_links,
    py_select_strings,
    select,
)
from tegenaria_spark.sources.synth import (
    SiteConfig,
    html_testset_urls,
    page_html,
    page_quotes,
    synth_page,
)

SNIPPET = """
<html><body>
<div class="quote special" id="q1">
  <span class="text">to be</span><small class="author">wm</small>
  <div class="tags"><a class="tag" href="/tag/t1">t1</a><a class="tag" href="/tag/t2">t2</a></div>
</div>
<div class="quote"><span class="text">or not</span><small class="author">anon</small></div>
<ul class="pager"><li class="next"><a href="/page/2">more</a></li></ul>
<a href="http://other.test/x">offsite</a>
</body></html>
"""


def test_selector_basics():
    root = parse_html(SNIPPET)
    assert len(select(root, "div.quote")) == 2
    assert len(select(root, ".quote")) == 2
    assert len(select(root, "div.quote.special")) == 1
    assert select(root, "#q1")[0].attrs["id"] == "q1"
    assert py_select_strings(SNIPPET, "div.quote span.text") == ["to be", "or not"]
    assert py_select_strings(SNIPPET, "div.quote a.tag", "href") == ["/tag/t1", "/tag/t2"]
    # descendant chain only matches inside the chain's scope
    assert py_select_strings(SNIPPET, "ul.pager a", "href") == ["/page/2"]
    # empty / None markup extract to [] (crawls meet empty bodies)
    assert py_select_strings(None, ".quote") == []
    assert py_select_strings("", ".quote") == []


def test_link_resolution_urljoin():
    base = "http://d001.example.test/p/3?id=3&v=1"
    assert py_extract_links(base, SNIPPET, "ul.pager li.next a") == [
        "http://d001.example.test/page/2"
    ]
    assert py_extract_links(base, SNIPPET, "a", "href")[-1] == "http://other.test/x"


def test_markup_matches_generative_model():
    """The rendered pager recovers the structured outlinks bit-for-bit
    (relative hrefs urljoin back to the canonical absolute URLs), and
    extracted quotes equal the generative page_quotes rows."""
    cfg = SiteConfig(n_domains=6, pages_per_domain=24)
    checked_links = checked_quotes = 0
    for url in html_testset_urls(cfg)[:60]:
        canon, _, _valid = py_canonicalize(url)
        page = synth_page(url, cfg)
        html = page_html(url, cfg)
        if page.status != 200:
            assert py_select_strings(html, "div.quote") == []
            continue
        got_links = py_extract_links(canon, html, "ul.pager li.next a")
        assert got_links == list(page.outlinks)
        checked_links += len(got_links)
        texts = py_select_strings(html, "div.quote span.text")
        authors = py_select_strings(html, "div.quote small.author")
        expected = page_quotes(canon, cfg)
        assert list(zip(texts, authors)) == [(t, a) for t, a, _tag in expected]
        checked_quotes += len(texts)
        if page.image_id is not None:
            alts = py_select_strings(html, "img.payload", "alt")
            assert alts == [page.caption]
    assert checked_links > 10 and checked_quotes > 10


def test_fetch_html_parser_spark(spark):
    """fetch_stage(render_html=True) + the registered markup parser:
    items and outlinks come from body_html alone and the links equal
    the structured outlinks column."""
    from tegenaria_spark.config import EngineConfig
    from tegenaria_spark.functions.canonical import with_canonical, with_fingerprint
    from tegenaria_spark.operators.fetch import check_status, fetch_stage
    from tegenaria_spark.operators.parse import PARSER_REGISTRY, build_quote_html_parser
    from tegenaria_spark.schemas import FRONTIER_SCHEMA
    from tegenaria_spark.sources.synth import seed_urls
    from datetime import datetime, timezone

    cfg = EngineConfig(shuffle_partitions=4, render_html=True)
    site = SiteConfig(n_domains=4, pages_per_domain=16)
    ts0 = datetime.fromtimestamp(cfg.epoch_ms / 1000, tz=timezone.utc)
    name = build_quote_html_parser()
    rows = [
        {**r, "next_fetch_time": ts0, "parser": name}
        for r in seed_urls(site, n_seeds=40)
    ]
    df = with_fingerprint(with_canonical(spark.createDataFrame(rows, FRONTIER_SCHEMA)))
    fetched = check_status(fetch_stage(df.filter(F.col("valid")), site, cfg))
    ok = fetched.filter(F.col("error").isNull()).localCheckpoint(eager=True)

    items, links = PARSER_REGISTRY[name](ok)
    got_items = items.collect()
    assert len(got_items) > 0
    # markup-extracted quotes equal the generative model per fetched page
    for r in got_items[:20]:
        expected = page_quotes(r["url"], site)
        assert (r["text"], r["author"]) == expected[r["pos"]][:2]

    got_links = sorted(
        (r["parent_seq"], r["pos"], r["url"]) for r in links.collect()
    )
    expected_links = sorted(
        (r["enqueue_seq"], pos, u)
        for r in ok.filter(F.col("status") == 200).collect()
        for pos, u in enumerate(r["outlinks"])
    )
    assert got_links == expected_links
    ok.unpersist()
