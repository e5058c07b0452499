"""Property-based tests (pure Python — no Spark session needed)."""

from __future__ import annotations

from urllib.parse import quote

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tegenaria_spark.functions.canonical import (
    py_canonicalize,
    py_encode_headers,
    py_fingerprint,
)
from tegenaria_spark.functions.images import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from tegenaria_spark.functions.xxh64 import xxh64

_key = st.text(st.characters(categories=("Ll", "Nd")), min_size=1, max_size=8)
_val = st.text(st.characters(categories=("Ll", "Lu", "Nd")), max_size=8)


@given(
    host=st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    path=st.lists(_key, max_size=3),
    query=st.dictionaries(_key, _val, max_size=5),
    frag=_val,
)
@settings(max_examples=200, deadline=None)
def test_canonicalization_is_order_invariant_and_idempotent(host, path, query, frag):
    base = f"http://{host}/" + "/".join(quote(p) for p in path)
    items = list(query.items())
    q1 = "&".join(f"{quote(k)}={quote(v)}" for k, v in items)
    q2 = "&".join(f"{quote(k)}={quote(v)}" for k, v in reversed(items))
    u1 = f"{base}?{q1}"
    u2 = f"{base}?{q2}#{quote(frag)}"
    c1, d1, ok1 = py_canonicalize(u1)
    c2, d2, ok2 = py_canonicalize(u2)
    assert ok1 and ok2
    assert c1 == c2 and d1 == d2 == host  # order + fragment invariant
    # idempotent: canonicalizing a canonical URL is a fixed point
    assert py_canonicalize(c1)[0] == c1
    # '?' always forced (dupefilters.go:71-72)
    assert "?" in c1


_ascii_key = st.from_regex(r"[a-z][a-z0-9-]{0,10}", fullmatch=True)
_ascii_val = st.from_regex(r"[A-Za-z0-9 /;=.-]{0,12}", fullmatch=True)


@given(h=st.dictionaries(_ascii_key, _ascii_val, max_size=6))
@settings(max_examples=100, deadline=None)
def test_header_encoding_case_invariant(h):
    """Case-insensitivity holds on the HTTP-header (ASCII) domain —
    matching the reference, which sorts original keys then uppercases
    (dupefilters.go:85-93); non-ASCII uppercasing can reorder keys and
    is out of contract."""
    upper = {k.upper(): v.upper() for k, v in h.items()}
    if len(upper) != len(h):
        return  # case-colliding keys merge — out of contract
    assert py_encode_headers(h) == py_encode_headers(upper)


@given(data=st.binary(max_size=512), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_xxh64_in_int64_range_and_deterministic(data, seed):
    a = xxh64(data, seed)
    assert -(2**63) <= a < 2**63
    assert a == xxh64(bytes(data), seed)


@given(
    method=st.sampled_from(["GET", "POST", "HEAD"]),
    body=st.one_of(st.none(), st.binary(max_size=64)),
    headers=st.one_of(st.none(), st.dictionaries(_key, _val, max_size=3)),
)
@settings(max_examples=100, deadline=None)
def test_fingerprint_total_function(method, body, headers):
    fp = py_fingerprint(method, "http://example.com/x?a=1", body, headers)
    assert isinstance(fp, int)
    # body sensitivity
    if body:
        assert fp != py_fingerprint(method, "http://example.com/x?a=1", None, headers)


@given(
    h=st.integers(8, 48),
    w=st.integers(8, 48),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px)), px)
    lossy = decode_image(encode_image(px, "jpeg"))
    assert psnr(px, lossy) >= 40.0
    # phash is a pure function of pixels
    assert phash64(px) == phash64(px.copy())
