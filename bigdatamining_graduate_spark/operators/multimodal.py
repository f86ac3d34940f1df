"""Multimodal (binary-payload) column plumbing.

Design for image/audio/video at 100 TB: payloads are opaque ``binary``
columns with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through pickled
Python rows. The actual codec step is STUBBED (this container ships no
image/audio libraries — ``decode_image`` raises ``NotImplementedError``);
everything Spark-side — schema, batching, partitioning, UDF signatures —
is real and tested via the deterministic byte-level feature path.

The reference has no binary processing; this is the training-pipeline
extension layer (flagged extension, not parity).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema produced by :func:`binary_features`
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — real deployments plug a codec (PIL/ffmpeg) in here; the
    container has none, and the Spark-side plumbing does not depend on it."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "binary_features() exercises the mapInPandas plumbing instead"
    )


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of the text — a
    deterministic stand-in for an image/audio payload) plus metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def binary_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched per-payload feature extraction via ``mapInPandas``:
    byte length + additive checksum (the deterministic stand-in for a
    decode→embed step). Batches stream through Arrow — no per-row pickling
    (the §2.9 rule: pandas-vectorized, never row-at-a-time)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "byte_checksum": payloads.map(lambda b: sum(b) % 1_000_003).astype("int64"),
                }
            )

    return with_payload.mapInPandas(extract, schema=FEATURE_SCHEMA)
