"""Multimodal (binary-payload) column plumbing.

Design for image/audio/video at 100 TB: payloads are opaque ``binary``
columns with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through pickled
Python rows. The codec step is an OPTIONAL EXTRA: ``decode_image`` uses
pillow when importable (real decode branch, tested where the lib exists)
and raises a clear ``NotImplementedError`` otherwise (this container
ships no image/audio libraries). Everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested either way
via the deterministic byte-level feature path.

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


try:  # optional extra: pillow, if the deployment installs it
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this sandbox ships no image libs — documented env gate
    _PILImage = None


def decode_image(payload: bytes) -> "object":
    """Decode an image payload with pillow WHEN the optional dependency
    is installed (returns the loaded ``PIL.Image``); otherwise raise the
    documented env-gate error. The Spark-side plumbing
    (:func:`binary_features`, :func:`image_meta_features`) never depends
    on the codec being present — ``image_meta_features`` routes each
    Arrow batch through this function only if pillow imported."""
    if _PILImage is None:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "binary_features() exercises the mapInPandas plumbing instead "
            "(install pillow to enable decode_image/image_meta_features)"
        )
    import io

    img = _PILImage.open(io.BytesIO(payload))
    img.load()
    return img


#: schema produced by :func:`image_meta_features`
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mode", T.StringType()),
    ]
)


def image_meta_features(with_payload: DataFrame) -> DataFrame:
    """Decode→metadata over image payloads via Arrow-batched
    ``mapInPandas`` — the real decode branch of the multimodal layer,
    exercised by tests only when pillow is importable (skipped in this
    sandbox). Same batch shape / partitioning / signature contract as
    :func:`binary_features`; errors surface per-task, not per-row."""
    if _PILImage is None:  # fail fast on the driver, not inside tasks
        raise NotImplementedError(
            "image_meta_features requires the optional pillow extra"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([m.width for m in metas], dtype="int64"),
                    "height": pd.Series([m.height for m in metas], dtype="int64"),
                    "mode": [m.mode for m in metas],
                }
            )

    return with_payload.mapInPandas(extract, schema=IMAGE_META_SCHEMA)


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


# -- binary chunk-level dedup (blob-storage CDC shape) ----------------------

CHUNK_BYTES = 64       # fixed-size chunk width
CHUNK_MAX_DF = 50      # boilerplate chunks emit O(df^2) pairs, no signal


def payload_chunk_pairs(
    with_payload: DataFrame, chunk_bytes: int = CHUNK_BYTES, min_shared: int = 2
) -> DataFrame:
    """Binary-payload pairs sharing content CHUNKS — dedup for the BINARY
    modality: payloads are cut into fixed-size chunks, each chunk md5'd,
    and payloads sharing ≥ ``min_shared`` distinct chunk fingerprints
    become candidate duplicate pairs scored by containment
    (shared / smaller side's chunk count). This is the fixed-width
    approximation of content-defined chunking every blob dedup store
    uses; swapping in a rolling-hash boundary chooser changes only the
    chunking expression, not the join shape.

    All chunking/hashing is built-in expressions on the ``binary``
    column (JVM-side, no decode); pair generation is the same capped
    inverted index as the text dedup family — one aggregation per chunk
    fingerprint, postings bounded by ``CHUNK_MAX_DF``, never a
    payload⋈payload self-join."""
    n_chunks = F.floor((F.length("payload") + chunk_bytes - 1) / chunk_bytes).cast(
        "int"
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = (
        with_payload.filter(F.length("payload") > 0)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        idx,
                        lambda i: F.md5(
                            F.substring(
                                F.col("payload"), i * chunk_bytes + 1, chunk_bytes
                            )
                        ),
                    )
                )
            ).alias("ch"),
        )
    )
    postings = (
        chunks.groupBy("ch")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= CHUNK_MAX_DF))
    )
    sizes = chunks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pe = postings.select(F.posexplode("docs").alias("i", "doc_a"), F.col("docs"))
    common = (
        pe.select(
            "doc_a",
            F.explode(F.slice("docs", F.col("i") + 2, F.size("docs"))).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least(F.col("sz_a"), F.col("sz_b")), 6
            ).alias("containment"),
        )
    )


def payload_chunk_pairs_sql(
    chunk_bytes: int = CHUNK_BYTES, min_shared: int = 2
) -> str:
    """DuckDB twin of :func:`payload_chunk_pairs`. The payload is the
    UTF-8 encoding of ``text`` (see :func:`with_binary_payload`) and the
    fixture text is pure ASCII, so chunking the VARCHAR by character is
    byte-identical to chunking the BLOB — the same equivalence q39's
    oracle uses."""
    cb = chunk_bytes
    return f"""
    WITH chunks AS (
      SELECT DISTINCT doc_id,
             md5(substring(text, (i - 1) * {cb} + 1, {cb})) AS ch
      FROM documents,
           unnest(generate_series(1,
             cast((length(text) + {cb} - 1) // {cb} as int))) t(i)
      WHERE length(text) > 0
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM chunks GROUP BY doc_id),
    capped AS (
      SELECT doc_id, ch FROM (
        SELECT doc_id, ch, count(*) OVER (PARTITION BY ch) AS df FROM chunks)
      WHERE df BETWEEN 2 AND {CHUNK_MAX_DF}
    ),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM capped a JOIN capped b ON a.ch = b.ch AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {min_shared}
    )
    SELECT doc_a, doc_b, n_shared,
           round(n_shared * 1.0 / least(sa.sz, sb.sz), 6) AS containment
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    """


# -- perceptual-hash near-dup (image-style payload path) --------------------

PHASH_BUCKETS = 64   # aHash grid: 64 resampled cells -> 64-bit fingerprint
PHASH_CHUNKS = 4     # 4 x 16-bit chunks: hamming <= 3 pigeonholes into >= 1 equal chunk
PHASH_HAM_MAX = 3

#: schema produced by the phash extraction stage
PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("c0", T.LongType()),
        T.StructField("c1", T.LongType()),
        T.StructField("c2", T.LongType()),
        T.StructField("c3", T.LongType()),
    ]
)


def payload_phash(with_payload: DataFrame) -> DataFrame:
    """Perceptual hash (aHash family) of each binary payload: decode
    (STUB: raw bytes as the 1-D signal — real deployments decode pixels
    here), resample to ``PHASH_BUCKETS`` cells, threshold each cell
    against the global mean, pack the bits. All threshold comparisons
    are CROSS-MULTIPLIED INTEGER arithmetic (``cell_sum * len >
    total_sum * cell_count``) — no floating-point means anywhere, so any
    engine computes the identical fingerprint (the q23/q27 determinism
    rule applied to the multimodal layer).

    Arrow-batched ``mapInPandas`` + numpy ``add.reduceat`` per payload;
    1:1 rows, zero shuffle."""
    import numpy as np

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            chunks: list[list[int]] = [[] for _ in range(PHASH_CHUNKS)]
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                sig = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(sig)
                # byte j lands in cell j*B//n (per-byte assignment — the
                # exact convention the SQL twin uses; cells may be empty
                # when n < B, contributing bit 0 like an all-zero cell)
                cell = (np.arange(n) * PHASH_BUCKETS) // n
                sums = np.bincount(cell, weights=sig, minlength=PHASH_BUCKETS).astype(
                    np.int64
                )
                cnts = np.bincount(cell, minlength=PHASH_BUCKETS).astype(np.int64)
                total = int(sig.sum())
                bits = [
                    1 if int(sums[b]) * n > total * int(cnts[b]) else 0
                    for b in range(PHASH_BUCKETS)
                ]
                ids.append(doc_id)
                per = PHASH_BUCKETS // PHASH_CHUNKS
                for c in range(PHASH_CHUNKS):
                    val = 0
                    for k in range(per):
                        val |= bits[c * per + k] << k
                    chunks[c].append(val)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    **{
                        f"c{c}": pd.Series(chunks[c], dtype="int64")
                        for c in range(PHASH_CHUNKS)
                    },
                }
            )

    return with_payload.mapInPandas(phash, schema=PHASH_SCHEMA)


def _chunk_exploded(ph: DataFrame, side: str) -> DataFrame:
    """One join side of the chunk equi-join: each signature row exploded
    to its ``PHASH_CHUNKS`` (ci, cv) bucket keys, chunk columns carried
    for the exact hamming rerank."""
    return (
        ph.select(
            F.col("doc_id").alias(f"doc_{side}"),
            *[F.col(f"c{c}").alias(f"c{c}{side}") for c in range(PHASH_CHUNKS)],
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("ci"), F.col(f"c{c}").alias("cv")
                        )
                        for c in range(PHASH_CHUNKS)
                    ]
                )
            ).alias("ch"),
        )
        .select("*", "ch.ci", "ch.cv")
        .drop("ch")
    )


def _phash_hamming() -> "F.Column":
    return sum(
        F.bit_count(F.col(f"c{c}a").bitwiseXOR(F.col(f"c{c}b")))
        for c in range(PHASH_CHUNKS)
    )


def _pairs_from_phash(ph: DataFrame) -> DataFrame:
    """Chunk equi-join over a signature set: candidates share at least
    one 16-bit chunk (pigeonhole-complete for hamming <=
    ``PHASH_HAM_MAX``), scored by exact hamming distance over the four
    chunks (``bit_count(a ^ b)`` — JVM built-ins, no Python)."""
    a, b = _chunk_exploded(ph, "a"), _chunk_exploded(ph, "b")
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", _phash_hamming().alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .distinct()
    )


def phash_pairs(with_payload: DataFrame) -> DataFrame:
    """Near-duplicate payload pairs by perceptual hash (fingerprint +
    :func:`_pairs_from_phash` chunk join).

    Scale: the chunk equi-join is the q27 SimHash geometry on the
    multimodal column; chunk values are 16-bit so bucket skew is bounded
    by payload diversity, and the distinct on (doc_a, doc_b) shuffles
    scalar ids only."""
    return _pairs_from_phash(payload_phash(with_payload))


def incremental_phash_pairs(
    with_payload: DataFrame,
    phash_store: DataFrame | None = None,
    pair_store: DataFrame | None = None,
) -> DataFrame:
    """Incremental maintenance for the perceptual-hash near-dup store
    (q252 — the q227 insert shape on the LAST dedup surface without an
    incremental cell, VERDICT r9 next-round #6): the 20% arrival batch
    (salt "ilsh" — the same crawl event that refreshes the LSH,
    component, and inverted-index stores) lands against a persisted
    signature store (doc_id, c0..c3) and pair store.  ONLY the batch's
    payloads run the Arrow-batched fingerprint kernel; base signatures
    and the t0 pair set are read from the stores verbatim.  Fresh
    candidates are the batch signatures chunk-equi-joined against store
    ∪ batch (canonicalized least/greatest), scored by the exact chunk
    hamming — the only new pairs possible are those touching ≥ 1 batch
    doc, so carried ∪ fresh provably equals the full q143 recompute.

    The DuckDB oracle IS that full recompute with per-pair provenance
    (fresh ⇔ either endpoint is a batch doc) — the driver hash-match
    proves the maintained store every round.  Store roundtrip is pinned
    in ``tests/test_incremental_lsh.py``.

    Scale: fingerprinting is O(|batch| payload bytes); the fresh join
    is batch-sided (|batch|·chunks rows against the store's bucket
    keys); the t0 pair set never recomputes.  Reference anchor:
    extension of q143 (``hw3/hw3.py:125-172`` for the refresh
    discipline; the reference has no multimodal store)."""
    from ..checkpoints import local_checkpoint
    from .dedup import _incr_delta_flag

    delta = _incr_delta_flag()
    base = with_payload.filter(~delta)
    batch = with_payload.filter(delta)
    ph_base = (
        phash_store
        if phash_store is not None
        else local_checkpoint(payload_phash(base), eager=False)
    )
    ph_batch = local_checkpoint(payload_phash(batch), eager=False)
    if pair_store is not None:
        carried = pair_store.select("doc_a", "doc_b", "hamming")
    else:
        carried = _pairs_from_phash(ph_base)
    d = _chunk_exploded(ph_batch, "a")
    x = _chunk_exploded(ph_base.unionByName(ph_batch), "b")
    fresh = (
        d.join(x, ["ci", "cv"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("pa"),
            F.greatest("doc_a", "doc_b").alias("pb"),
            _phash_hamming().alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select(
            F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"), "hamming"
        )
        .distinct()
    )
    return carried.withColumn("src", F.lit("carried")).unionByName(
        fresh.withColumn("src", F.lit("fresh"))
    )


def incremental_phash_pairs_sql(table: str = "documents", max_len: int = 4096) -> str:
    """DuckDB twin: the full q143 recompute over the whole corpus with
    per-pair provenance (fresh ⇔ either endpoint in the arrival
    batch) — the identity carried ∪ fresh must reproduce."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_LSH_BUCKETS, INCR_LSH_HIST

    def delta(col: str) -> str:
        return (
            f"(({portable_hash64_sql(f'cast({col} as varchar)', 'ilsh')}"
            f" % {INCR_LSH_BUCKETS}) >= {INCR_LSH_HIST})"
        )

    return phash_pairs_sql(
        table,
        max_len,
        src_case=(
            f"CASE WHEN {delta('doc_a')} OR {delta('doc_b')}"
            f" THEN 'fresh' ELSE 'carried' END"
        ),
    )


def phash_pairs_sql(
    table: str = "documents",
    max_len: int = 4096,
    src_case: str | None = None,
) -> str:
    """DuckDB twin of :func:`phash_pairs` (ASCII fixture text = payload
    bytes, the q39 equivalence; shares every integer-threshold and
    chunk-packing convention with the Spark path).

    DuckDB's ``range`` can't be lateral on ``length(text)``, so the
    char unroll needs a static cap — but the Spark path fingerprints
    the FULL payload, so a doc longer than ``max_len`` must FAIL the
    oracle loudly (scalar ``error()`` guard below), never silently
    truncate into a divergent hash.

    ``src_case``: optional SQL expression appended as a ``src``
    provenance column on the final SELECT — the maintenance twins
    (q252 fresh/carried, q254 refreshed/carried) pass theirs here
    instead of string-patching the generated SQL, so edits to the
    final SELECT can never silently strip their provenance."""
    per = PHASH_BUCKETS // PHASH_CHUNKS
    src = f",\n           {src_case} AS src" if src_case else ""
    return f"""
    WITH chars AS (
      SELECT doc_id, length(text) AS n, i,
             unicode(substr(text, i, 1)) AS code,
             ((i - 1) * {PHASH_BUCKETS}) // length(text) AS b
      FROM {table}, range(1, {max_len} + 1) r(i)
      WHERE length(text) > 0 AND i <= length(text)
        AND {max_len} >= (SELECT CASE WHEN max(length(text)) > {max_len}
                                 THEN CAST(error('phash oracle: doc exceeds '
                                                 || '{max_len}-char unroll cap')
                                           AS BIGINT)
                                 ELSE 0 END FROM {table})
    ),
    cells AS (
      SELECT doc_id, n, b, sum(code) AS s, count(*) AS cnt
      FROM chars GROUP BY 1, 2, 3
    ),
    bits AS (
      SELECT doc_id, b,
             CASE WHEN s * n > (sum(s) OVER (PARTITION BY doc_id)) * cnt
                  THEN 1 ELSE 0 END AS bit
      FROM cells
    ),
    chunks AS (
      SELECT doc_id, b // {per} AS ci,
             cast(sum(bit * (1 << (b % {per}))) as bigint) AS cv
      FROM bits GROUP BY 1, 2
    ),
    ph AS (
      SELECT doc_id,
             max(CASE WHEN ci = 0 THEN cv END) AS c0,
             max(CASE WHEN ci = 1 THEN cv END) AS c1,
             max(CASE WHEN ci = 2 THEN cv END) AS c2,
             max(CASE WHEN ci = 3 THEN cv END) AS c3
      FROM chunks GROUP BY 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv
                     AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT doc_a, doc_b,
             (bit_count(xor(pa.c0, pb.c0)) + bit_count(xor(pa.c1, pb.c1))
              + bit_count(xor(pa.c2, pb.c2)) + bit_count(xor(pa.c3, pb.c3)))
               AS hamming
      FROM cand
      JOIN ph pa ON pa.doc_id = doc_a
      JOIN ph pb ON pb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, hamming{src}
    FROM scored WHERE hamming <= {PHASH_HAM_MAX}
    """


def delete_aware_phash_pairs(
    with_payload: DataFrame,
    pair_store: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
) -> DataFrame:
    """Deletion-side maintenance for the phash near-dup store (q253 —
    the q229 tombstone shape on the multimodal surface): the 10%
    deletion slice (salt "idel" — the same takedown event that prunes
    the LSH/component/graph stores) erases documents, and the
    maintained pair store is the t0 store with every pair touching a
    deleted doc dropped.  NOTHING re-fingerprints: chunk collisions and
    hamming distance are pairwise properties, so deletions never ADD
    pairs and never change a surviving pair's score — maintenance is
    two anti-filters on the persisted store, the cheapest cell in the
    matrix (q229's "deletions never re-band" argument, exact here too).

    The DuckDB oracle is the FULL phash recompute over the remaining
    corpus, so the driver hash-match proves filter == recompute every
    round.  ``pair_store`` injects the persisted t0 pairs (roundtrip
    test); ``deleted_ids`` injects a crafted tombstone set (unit test);
    defaults derive in-plan from the hash slice.

    Scale: O(|store|) anti-join on scalar ids — no fingerprint kernel,
    no chunk join.  Reference anchor: extension of q143
    (``hw3/hw3.py:125-172`` refresh discipline)."""
    from .dedup import _incr_deleted_flag

    if pair_store is None:
        pair_store = _pairs_from_phash(payload_phash(with_payload))
    if deleted_ids is None:
        return pair_store.filter(
            ~_incr_deleted_flag("doc_a") & ~_incr_deleted_flag("doc_b")
        ).select("doc_a", "doc_b", "hamming")
    return (
        pair_store.join(
            deleted_ids.select(F.col(deleted_ids.columns[0]).alias("doc_a")),
            "doc_a",
            "left_anti",
        )
        .join(
            deleted_ids.select(F.col(deleted_ids.columns[0]).alias("doc_b")),
            "doc_b",
            "left_anti",
        )
        .select("doc_a", "doc_b", "hamming")
    )


def delete_aware_phash_pairs_sql(table: str = "documents", max_len: int = 4096) -> str:
    """DuckDB twin: the full phash recompute over the REMAINING corpus
    — the identity the two anti-filters must reproduce."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_DEL_BUCKETS

    deleted = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'idel')}"
        f" % {INCR_DEL_BUCKETS}) = 0"
    )
    remaining = (
        f"(SELECT doc_id, text FROM {table} WHERE NOT {deleted}) remaining"
    )
    return phash_pairs_sql(remaining, max_len)


def upsert_aware_phash_pairs(
    docs: DataFrame,
    phash_store: DataFrame | None = None,
    pair_store: DataFrame | None = None,
) -> DataFrame:
    """UPSERT-side maintenance for the phash near-dup store (q254 —
    the q231 crawl-refresh shape on the multimodal surface): the 10%
    revision slice (salt "iupd", the suffix sentence of q231 — payload
    bytes genuinely move, and with them every resampled cell boundary,
    so revised fingerprints recompute end to end) changes content
    between snapshots.  The maintenance step:

    * pairs among UNCHANGED payloads carry verbatim from the t0 pair
      store WITH their stored hamming — chunk collisions and distances
      are pairwise, so the unchanged × unchanged subset is identical in
      both snapshots;
    * every t0 pair touching a changed doc drops (stale — computed from
      bytes that no longer exist);
    * ONLY the changed payloads re-run the Arrow-batched fingerprint
      kernel; their fresh pairs come from chunks(changed-v2) ⋈
      chunks(t1 corpus), scored by exact chunk hamming.

    carried ∪ fresh provably equals the full q143 recompute over the
    t1 corpus, and the DuckDB oracle IS that recompute with the same
    carried/refreshed provenance — the driver hash-match is the proof.
    ``phash_store`` / ``pair_store`` inject the persisted t0 state
    (roundtrip test); defaults derive in-plan.

    Scale: re-fingerprinting is O(|changed| payload bytes); the stale
    drop is two hash-slice anti-filters; the fresh join is
    |changed|-sided against 16-bit bucket keys.  Reference anchor:
    extension of q143 (``hw3/hw3.py:125-172`` refresh discipline)."""
    from ..checkpoints import local_checkpoint
    from .dedup import INCR_UPD_SUFFIX, _incr_updated_flag

    changed = _incr_updated_flag()
    t1 = docs.withColumn(
        "text",
        F.when(changed, F.concat(F.col("text"), F.lit(INCR_UPD_SUFFIX)))
        .otherwise(F.col("text")),
    )
    if pair_store is None:
        pair_store = _pairs_from_phash(
            payload_phash(with_binary_payload(docs))
        )
    carried = pair_store.filter(
        ~_incr_updated_flag("doc_a") & ~_incr_updated_flag("doc_b")
    ).select("doc_a", "doc_b", "hamming")
    ph_unchanged = (
        phash_store.filter(~changed)
        if phash_store is not None
        else payload_phash(with_binary_payload(docs.filter(~changed)))
    )
    ph_changed = local_checkpoint(
        payload_phash(with_binary_payload(t1.filter(changed))), eager=False
    )
    ph_t1 = local_checkpoint(
        ph_unchanged.unionByName(ph_changed), eager=False
    )
    d = _chunk_exploded(ph_changed, "a")
    x = _chunk_exploded(ph_t1, "b")
    fresh = (
        d.join(x, ["ci", "cv"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("pa"),
            F.greatest("doc_a", "doc_b").alias("pb"),
            _phash_hamming().alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select(
            F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"), "hamming"
        )
        .distinct()
    )
    return carried.withColumn("src", F.lit("carried")).unionByName(
        fresh.withColumn("src", F.lit("refreshed"))
    )


def upsert_aware_phash_pairs_sql(table: str = "documents", max_len: int = 4096) -> str:
    """DuckDB twin: the full phash recompute over the t1 corpus
    (unchanged originals + revised texts) with the same
    carried/refreshed provenance — the identity carried ∪ fresh must
    reproduce."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_UPD_BUCKETS, INCR_UPD_SUFFIX

    def flag(col: str) -> str:
        return (
            f"(({portable_hash64_sql(f'cast({col} as varchar)', 'iupd')}"
            f" % {INCR_UPD_BUCKETS}) = 0)"
        )

    t1 = (
        f"(SELECT doc_id, CASE WHEN {flag('doc_id')} THEN text ||"
        f" '{INCR_UPD_SUFFIX}' ELSE text END AS text FROM {table}) t1"
    )
    return phash_pairs_sql(
        t1,
        max_len,
        src_case=(
            f"CASE WHEN {flag('doc_a')} OR {flag('doc_b')}"
            f" THEN 'refreshed' ELSE 'carried' END"
        ),
    )


def vacuumed_phash_refresh(
    spark, docs: DataFrame, stage_dir: str | None = None
) -> DataFrame:
    """The full phash store lifecycle in one query (q256 — the q235
    mechanism on the multimodal surface, completing its arrival-shape
    matrix): build the t0 signature + pair stores as MANY small files
    (the accretion a per-batch refresh loop produces), apply a deletion
    cycle (the q229 tombstone slice), VACUUM both stores
    (:func:`~bigdatamining_graduate_spark.operators.dedup.vacuum_parquet_store`:
    tombstoned rows anti-joined out, files compacted, rename-swapped),
    then run the NEXT insert refresh (q252's incremental path) reading
    the VACUUMED stores back from parquet.

    Store algebra making the identity exact: the t0 corpus is the
    non-delta slice (q252's convention); chunk collisions and hamming
    are pairwise, so the vacuumed pair store IS the base×base pair set
    of the remaining corpus and the vacuumed signature store its
    signature set — hence vacuumed refresh == the q252 incremental
    recompute over the remaining corpus, which IS the DuckDB oracle.
    One driver hash-match proves tombstone GC, compaction, swap, and
    post-vacuum refresh together; file/row shrinkage is pinned in
    ``tests/test_store_vacuum.py``.

    Scale: vacuum is O(|store|) anti-join + one write per store on the
    compaction cadence; the refresh stays O(|batch| payload bytes);
    the corpus never re-fingerprints.  Reference anchor: extension of
    q143."""
    import os

    from ..checkpoints import local_checkpoint
    from ..staging import staging_dir
    from .dedup import (
        _incr_deleted_flag,
        _incr_delta_flag,
        vacuum_parquet_store,
    )

    stage = stage_dir or staging_dir(prefix="bdm_phash_vacuum_")
    sig_dir = os.path.join(stage, "phash_store")
    pair_dir = os.path.join(stage, "pair_store")
    remaining = docs.filter(~_incr_deleted_flag())
    t0 = docs.filter(~_incr_delta_flag())
    ph_t0 = local_checkpoint(
        payload_phash(with_binary_payload(t0)), eager=False
    )
    # simulate refresh-loop accretion: many small files per store
    ph_t0.repartition(8).write.mode("overwrite").parquet(sig_dir)
    _pairs_from_phash(ph_t0).repartition(8).write.mode("overwrite").parquet(
        pair_dir
    )
    tombstones = docs.filter(_incr_deleted_flag()).select("doc_id")
    vacuum_parquet_store(spark, sig_dir, tombstones, ("doc_id",))
    vacuum_parquet_store(spark, pair_dir, tombstones, ("doc_a", "doc_b"))
    return incremental_phash_pairs(
        with_binary_payload(remaining),
        phash_store=spark.read.parquet(sig_dir),
        pair_store=spark.read.parquet(pair_dir),
    )


def vacuumed_phash_refresh_sql(table: str = "documents", max_len: int = 4096) -> str:
    """DuckDB twin: the q252 incremental recompute over the REMAINING
    corpus — the identity the vacuumed-store refresh must reproduce."""
    from ..functions.hashing import portable_hash64_sql

    from .dedup import INCR_DEL_BUCKETS

    deleted = (
        f"({portable_hash64_sql('cast(doc_id as varchar)', 'idel')}"
        f" % {INCR_DEL_BUCKETS}) = 0"
    )
    remaining = (
        f"(SELECT doc_id, text FROM {table} WHERE NOT {deleted}) remaining"
    )
    return incremental_phash_pairs_sql(remaining, max_len)
