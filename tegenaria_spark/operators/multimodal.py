"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata
beside them; every transform is a Pandas-UDF/``mapInPandas`` stage with
a real schema, real partitioning, and bounded Arrow batches.  The
*codecs* are the only stubbed part in this container (no PIL/libjpeg/
ffmpeg): PNG + the deterministic lossy stand-in are real
(functions/images.py); anything else raises ``NotImplementedError`` at
the decode call, not at plan time — so the Spark-side plumbing is fully
exercised by tests while the codec swap stays a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tegenaria_spark.functions.images import decode_image, encode_image, phash64

RESIZE_SCHEMA_SUFFIX = "resized BINARY, rw INT, rh INT"


def resize_images(df: DataFrame, target: int = 32, bytes_col: str = "bytes") -> DataFrame:
    """Decode → nearest-neighbor resize to target×target → re-encode.

    ``mapInPandas`` so a partition of images streams through in Arrow
    batches (batch size capped by spark.sql.execution.arrow.
    maxRecordsPerBatch — the knob that keeps 100 TB of payload from
    blowing executor memory)."""
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = in_schema + ", " + RESIZE_SCHEMA_SUFFIX

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized, rws, rhs = [], [], []
            for blob in pdf[bytes_col]:
                px = decode_image(bytes(blob))
                h, w = px.shape[:2]
                yi = (np.arange(target) * h // target).clip(0, h - 1)
                xi = (np.arange(target) * w // target).clip(0, w - 1)
                small = px[np.ix_(yi, xi)]
                resized.append(encode_image(small, "png"))
                rws.append(target)
                rhs.append(target)
            pdf["resized"] = resized
            pdf["rw"] = rws
            pdf["rh"] = rhs
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def extract_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Cheap visual features per image: mean/std per channel + phash.

    Stand-in for an embedding model (not in this container); the
    signature — binary in, fixed-width vector out, Arrow-batched — is
    exactly what a real encoder UDF uses."""
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = in_schema + ", features ARRAY<DOUBLE>, phash BIGINT"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes = [], []
            for blob in pdf[bytes_col]:
                px = decode_image(bytes(blob)).astype(np.float64)
                feats.append(
                    [float(x) for x in np.concatenate([px.mean(axis=(0, 1)), px.std(axis=(0, 1))])]
                )
                hashes.append(phash64(px.astype(np.uint8)))
            pdf["features"] = feats
            pdf["phash"] = hashes
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def phash_near_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    phash_col: str = "phash",
    id_col: str = "image_id",
) -> DataFrame:
    """Near-duplicate IMAGES by perceptual-hash hamming distance — the
    payload-side dedup the image+caption store needs (re-encodes,
    resizes, and small edits keep pHash within a few bits; exact
    byte-hash dedup misses all of them).

    Pure composition: the text SimHash blocking
    (textdedup.hamming_near_pairs — pigeonhole-complete at the
    requested radius) over the phash column the store already carries,
    so the candidate join never compares all image pairs."""
    from tegenaria_spark.operators.textdedup import hamming_near_pairs

    return hamming_near_pairs(
        df.select(id_col, phash_col),
        max_hamming,
        hash_col=phash_col,
        id_col=id_col,
        out_a="image_a",
        out_b="image_b",
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10, bytes_col: str = "bytes") -> DataFrame:
    """Video frame sampling — pure stub: the container has no video
    codec, so this raises at execution (NotImplementedError) while the
    plan (schema, partitioning) is real and testable."""
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = in_schema + ", frame_idx INT, frame BINARY"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in it:
            raise NotImplementedError(
                "video decode requires ffmpeg/pyav — not present in this container"
            )
        yield  # pragma: no cover

    return df.mapInPandas(batches, schema=out_schema)
