"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly-marked NotImplementedError / deterministic fake), but the
Spark-side plumbing is real and tested: binary columns, Arrow-batched
``mapInPandas`` with explicit output schema, partition-sized batches.

At 100 TB the pattern is: binary payloads stay in parquet (or are
pointers to object storage), metadata travels in typed columns, and every
per-item transformation runs as an Arrow-batched Pandas UDF over
``mapInPandas`` — never a row-at-a-time Python UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
    ]
)

FAKE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("histogram", T.ArrayType(T.IntegerType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: no codec libraries in this container.
    The production implementation would go through PIL/libvips here."""
    raise NotImplementedError(
        "image decode requires codec libraries not present in this container; "
        "use fake_decode_features for pipeline testing"
    )


def binary_features(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Byte-level features of a binary column via Arrow-batched
    mapInPandas: (id, n_bytes, md5 digest). This is the real multimodal
    plumbing — schema, batching, partition-parallelism — minus codecs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(extract, FEATURE_SCHEMA)


def fake_decode_features(
    df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id", bins: int = 16
) -> DataFrame:
    """Deterministic fake 'decode': byte-value histogram with ``bins``
    buckets — stands in for decode→resize→feature-extract so the batch
    shape, schema, and partitioning of a real decoder are exercised."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            for b in pdf[binary_col]:
                h = [0] * bins
                for byte in bytes(b):
                    h[byte % bins] += 1
                hists.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[binary_col].map(len).astype("int32"),
                    "histogram": hists,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(extract, FAKE_DECODE_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata helper: materialize a binary column from text (the driver
    tables carry no real media payloads)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
