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


# -- frame sampling (video-style payload path) ------------------------------

FRAME_CHARS = 64     # "frame" = fixed-size chunk of the decoded payload
FRAME_STRIDE = 4     # keep every 4th frame

#: schema produced by :func:`sample_frames` — one row PER SAMPLED FRAME
#: (the op changes cardinality: 1 input row -> ceil(n/FRAME_CHARS)/FRAME_STRIDE)
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_chars", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(with_payload: DataFrame) -> DataFrame:
    """Decode → frame-sample → per-frame fingerprint, the video-shaped
    payload path: each binary payload is decoded (STUB: UTF-8 — real
    deployments plug ffmpeg frame extraction here), split into fixed-size
    frames, every ``FRAME_STRIDE``-th frame kept, and fingerprinted.

    This is the ROW-EXPANDING ``mapInPandas`` shape (one input row yields
    many output rows — the Arrow batch out is not 1:1 with the batch in),
    which is what a real frame sampler needs; partitioning is inherited
    from the payload scan, so frame extraction is embarrassingly parallel
    and never shuffles."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                content = bytes(payload).decode("utf-8")  # stubbed decode
                n_frames = (len(content) + FRAME_CHARS - 1) // FRAME_CHARS
                for i in range(0, n_frames, FRAME_STRIDE):
                    chunk = content[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_chars": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return with_payload.mapInPandas(frames, schema=FRAME_SCHEMA)


RESIZE_STRIDE = 4    # "nearest-neighbour resize": keep every 4th sample

#: schema produced by :func:`resize_payloads`
THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_chars", T.LongType()),
        T.StructField("thumb_chars", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_payloads(with_payload: DataFrame) -> DataFrame:
    """Decode → resize → re-encode, the image-thumbnail payload path:
    each binary payload is decoded (STUB: UTF-8 — real deployments plug
    PIL ``Image.resize`` here) and downsampled by keeping every
    ``RESIZE_STRIDE``-th sample (the nearest-neighbour analogue on the
    1-D stand-in), then fingerprinted. 1:1 row mapping, Arrow-batched,
    zero shuffle — the thumbnail job is a pure map over the payload scan,
    so at 100 TB it scales with input splits and nothing else."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids: list[int] = []
            orig: list[int] = []
            tlen: list[int] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                content = bytes(payload).decode("utf-8")  # stubbed decode
                thumb = content[::RESIZE_STRIDE]
                ids.append(doc_id)
                orig.append(len(content))
                tlen.append(len(thumb))
                md5s.append(hashlib.md5(thumb.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "orig_chars": pd.Series(orig, dtype="int64"),
                    "thumb_chars": pd.Series(tlen, dtype="int64"),
                    "thumb_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return with_payload.mapInPandas(resize, schema=THUMB_SCHEMA)


def resize_payloads_sql(table: str = "documents") -> str:
    """DuckDB twin of payload→:func:`resize_payloads` (the stubbed decode
    is UTF-8 chars, so 1-D stride resize is char picking at positions
    1, 1+s, 1+2s, ...)."""
    s = RESIZE_STRIDE
    return f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM {table} WHERE text IS NOT NULL
    ),
    t AS (
      SELECT doc_id, n,
             array_to_string(list_transform(
               generate_series(1, greatest(n, 1), {s}), i -> substr(text, i, 1)), '') AS thumb
      FROM d
    )
    SELECT doc_id, n AS orig_chars,
           cast(length(thumb) as bigint) AS thumb_chars,
           md5(thumb) AS thumb_md5
    FROM t
    """


def sample_frames_sql(table: str = "documents") -> str:
    """DuckDB twin of payload→:func:`sample_frames` (frames are chunks of
    the decoded characters, so the oracle is plain substr arithmetic)."""
    fc, st = FRAME_CHARS, FRAME_STRIDE
    return f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM {table}
      WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id, u.i AS frame_idx,
           length(substr(text, cast(1 + u.i*{fc} as bigint), {fc})) AS frame_chars,
           md5(substr(text, cast(1 + u.i*{fc} as bigint), {fc})) AS frame_md5
    FROM d, unnest(generate_series(0, cast((n-1)//{fc} as bigint))) AS u(i)
    WHERE u.i % {st} = 0
    """
