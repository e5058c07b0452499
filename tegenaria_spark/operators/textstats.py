"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All four are expressed with built-in ``pyspark.sql.functions`` (regex /
string expressions inside whole-stage codegen) — no Python in the hot
path — except the rolling-hash fingerprint, which shares the XXH64 twin
used everywhere else.  Integer outputs throughout so the DuckDB oracles
compare exactly (no float-boundary flakiness).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# stopword marker sets per language — tiny and deliberately simple so
# the rule is implementable identically in ANSI SQL for the oracle
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " with "],
    "fr": [" le ", " la ", " les "],
    "de": [" der ", " und ", " das "],
    "es": [" el ", " los ", " una "],
}


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-match n-gram/stopword heuristic; 'other' when nothing hits."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    expr = F.lit("other")
    for lang in reversed(list(_LANG_MARKERS)):
        hit = None
        for m in _LANG_MARKERS[lang]:
            c = t.contains(m)
            hit = c if hit is None else (hit | c)
        expr = F.when(hit, F.lit(lang)).otherwise(expr)
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("lang_guess"))


def quality_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/stopword quality signals (all integers)."""
    t = F.col(text_col)
    words = F.filter(F.split(t, " "), lambda w: w != "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars"),
        F.size(words).alias("n_words"),
        F.length(F.regexp_replace(t, "[^.!?,;:]", "")).alias("n_punct"),
        F.size(F.filter(words, lambda w: F.lower(w).isin("the", "a", "and", "of", "to"))).alias(
            "n_stopwords"
        ),
        F.size(F.array_distinct(F.transform(words, F.lower))).alias("n_distinct_words"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish segment count (letter runs, digit
    runs, and single punctuation marks — the pre-tokenizer shape most
    BPE vocabularies assume)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(t, "\\s+"), lambda w: w != "")).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).alias("n_bpe_segments"),
    )


def doc_fingerprint_udf(window: int = 8):
    """Winnowing-style fingerprint: min rolling-hash over char windows.

    Deterministic (XXH64 twin), vectorized per Arrow batch; the result
    is a 64-bit content fingerprint robust to small local edits."""
    from tegenaria_spark.functions.xxh64 import xxh64_str

    @pandas_udf(LongType())
    def fingerprint(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = t or ""
            if len(t) <= window:
                out.append(xxh64_str(t))
                continue
            out.append(
                min(xxh64_str(t[i : i + window]) for i in range(0, len(t) - window + 1, 4))
            )
        return pd.Series(out, dtype="int64")

    return fingerprint


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(F.col(text_col)).alias("content_hash"),
        doc_fingerprint_udf()(F.col(text_col)).alias("winnow_fp"),
    )
