"""Image codec / phash / PSNR invariants (input_hint per-row contract)."""

from __future__ import annotations

import numpy as np
import pytest

from tegenaria_spark.functions.images import (
    decode_image,
    encode_image,
    encode_lossy,
    hamming64,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from tegenaria_spark.sources.synth import SiteConfig, image_pixels, image_record


def _px(seed=0, h=40, w=56):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    px = _px(1)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_lossy_roundtrip_psnr_over_40db():
    px = _px(2)
    out = decode_image(encode_lossy(px))
    assert out.shape == px.shape
    p = psnr(px, out)
    assert p >= 40.0, p


def test_decode_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not actually decodable jpeg")


def test_phash_deterministic_and_robust():
    px = _px(3)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # lossy re-encode must stay perceptually close
    h2 = phash64(decode_image(encode_lossy(px)))
    assert hamming64(h1, h2) <= 10
    # a very different image should be far
    h3 = phash64(np.flipud(_px(99)))
    assert hamming64(h1, h3) > 10


def test_image_record_deterministic():
    cfg = SiteConfig()
    a = image_record("img-000-0001", "cap", "jpeg", cfg)
    b = image_record("img-000-0001", "cap", "jpeg", cfg)
    assert a["bytes"] == b["bytes"] and a["phash"] == b["phash"]
    px = image_pixels("img-000-0001", cfg)
    assert (a["w"], a["h"]) == (px.shape[1], px.shape[0])
    assert psnr(px, decode_image(a["bytes"])) >= 40.0


def test_phash_matches_pixels_for_png():
    cfg = SiteConfig()
    rec = image_record("img-002-0007", "cap", "png", cfg)
    px = image_pixels("img-002-0007", cfg)
    assert phash64(decode_image(rec["bytes"])) == phash64(px) == rec["phash"]


def test_phash_near_pairs_matches_bruteforce(spark):
    """The blocked image near-dup join returns exactly the brute-force
    all-pairs result (pigeonhole blocking is complete at the radius),
    and every planted perturbed copy pairs with its base."""
    from tegenaria_spark.operators.multimodal import extract_features, phash_near_pairs
    from tegenaria_spark.oracle_twins import expected_phash_neardup
    from tegenaria_spark.sources.synth import phash_testset

    df = spark.createDataFrame(phash_testset(12, 6), "image_id string, bytes binary")
    got = {
        (r["image_a"], r["image_b"], r["hamming"])
        for r in phash_near_pairs(extract_features(df), max_hamming=8).collect()
    }
    want = {
        tuple(r) for r in expected_phash_neardup(12, 6, 8).itertuples(index=False)
    }
    assert got == want
    # the planted near-dups are actually found
    planted = {p for p in got if p[0] + "-dup" == p[1]}
    assert len(planted) >= 4
