"""Property tests for the semantic traps cataloged in SURVEY.md §7.4 —
the places where two plausible implementations silently diverge."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatamining_graduate_spark.functions import text as TX

from .conftest import SF_SMOKE


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=20))
@settings(max_examples=10, deadline=None)
def test_stddev_pop_vs_sample(spark, xs):
    """Trap 1: RDD stdev() is POPULATION; SQL stddev is SAMPLE. The engine
    must use stddev_pop for hw0 parity."""
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    row = df.agg(
        F.stddev_pop("x").alias("pop"), F.stddev_samp("x").alias("samp")
    ).collect()[0]
    n = len(xs)
    mean = sum(xs) / n
    var_pop = sum((x - mean) ** 2 for x in xs) / n
    assert math.isclose(row["pop"], math.sqrt(var_pop), rel_tol=1e-6, abs_tol=1e-6)
    if var_pop > 1e-9:
        assert row["samp"] > row["pop"]  # sample stddev strictly larger


def test_rank_includes_ties_row_number_does_not(spark):
    """Trap 3: reference top-k uses rank() (ties included, W2); top-1 uses
    row_number() (W1). They differ exactly on ties."""
    rows = [("g", "a", 10), ("g", "b", 10), ("g", "c", 5)]
    df = spark.createDataFrame(rows, ["grp", "item", "score"])
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("item"))
    out = df.select(
        "item",
        F.rank().over(Window.partitionBy("grp").orderBy(F.desc("score"))).alias("rk"),
        F.row_number().over(w).alias("rn"),
    ).collect()
    by_item = {r["item"]: r for r in out}
    assert by_item["a"]["rk"] == by_item["b"]["rk"] == 1  # tie shares rank
    assert {by_item["a"]["rn"], by_item["b"]["rn"]} == {1, 2}  # rn splits it
    assert by_item["c"]["rk"] == 3  # rank skips after ties


def test_normalize_null_becomes_empty(spark):
    """Trap 2: reference UDFs coerce null text to '' (D12,
    FinalProject/BDM_Final.py:94-95); a naive built-in chain would
    propagate NULL. Engine normalize_text must match the reference."""
    df = spark.createDataFrame([(None,), ("A b!",)], "text: string")
    out = df.select(TX.normalize_text("text").alias("t")).collect()
    assert sorted(r["t"] for r in out) == ["", "a b"]


def test_tokenize_empty_and_punct_only(spark):
    df = spark.createDataFrame([("",), ("!!!",), ("one two",)], "text: string")
    out = df.select(F.size(TX.tokenize("text")).alias("n")).collect()
    assert sorted(r["n"] for r in out) == [0, 0, 2]


def test_union_by_name_vs_positional(spark):
    """Trap U1/U2: positional union silently scrambles reordered columns."""
    a = spark.createDataFrame([("1", "x")], ["id", "v"])
    b = spark.createDataFrame([("y", "2")], ["v", "id"])
    by_name = a.unionByName(b).collect()
    assert {(r["id"], r["v"]) for r in by_name} == {("1", "x"), ("2", "y")}
    positional = a.union(b).collect()  # documented hazard when types permit
    assert ("y", "2") in {(r["id"], r["v"]) for r in positional}


@given(st.lists(st.text(alphabet="ab !", max_size=12), min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_word_ngrams_short_docs_safe(spark, texts):
    """word_ngrams must yield empty arrays (not errors/nulls) for docs
    shorter than n — the ANSI-mode trap of negative sequence bounds."""
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    tk = df.select(TX.tokenize("text").alias("tk"))
    out = tk.select(F.size(TX.word_ngrams(F.col("tk"), 3)).alias("n"), F.size("tk").alias("s")).collect()
    for r in out:
        assert r["n"] == max(0, r["s"] - 2)


def test_exact_decimal_sum_order_independent(spark):
    """Trap 7: double sums are order-dependent; decimal sums are not."""
    vals = [(0.1,)] * 100 + [(1e15,), (-1e15,)]
    df = spark.createDataFrame(vals, "x: double").repartition(8)
    dec = df.agg(F.sum(F.col("x").cast("decimal(30,2)")).cast("double")).collect()[0][0]
    assert dec == pytest.approx(10.0, abs=1e-9)


@given(st.lists(st.text(alphabet="abc xyz0", min_size=0, max_size=20), min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_portable_hash_parity_with_duckdb(spark, texts):
    """The md5-derived 60-bit hash must be bit-identical in both engines —
    every sketch oracle rests on this."""
    import duckdb

    from bigdatamining_graduate_spark.functions.hashing import (
        portable_hash64,
        portable_hash64_sql,
    )

    df = spark.createDataFrame([(t,) for t in texts], "s: string")
    got = sorted(
        r["h"] for r in df.select(portable_hash64(F.col("s")).alias("h")).collect()
    )
    con = duckdb.connect()
    exp = sorted(
        con.execute(
            f"SELECT {portable_hash64_sql('s')} AS h FROM (SELECT unnest(?) AS s)",
            [texts],
        ).df()["h"]
    )
    assert got == [int(x) for x in exp]


@given(st.lists(st.text(alphabet="ab c!é", min_size=0, max_size=30), min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_char_trigrams_match_python(spark, texts):
    """langid's char-trigram extraction must equal the plain-Python
    definition (distinct overlapping 3-slices of the normalized text) —
    including the sub-3-char guard against descending `sequence` bounds."""
    import re

    from bigdatamining_graduate_spark.operators.langid import char_trigrams

    df = spark.createDataFrame(
        [(i, "xx", t) for i, t in enumerate(texts)], "doc_id: long, lang: string, text: string"
    )
    got = {
        (r["doc_id"], r["gram"]) for r in char_trigrams(df).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        nt = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()
        want |= {(i, nt[j : j + 3]) for j in range(max(0, len(nt) - 2))}
    assert got == want


def test_sample_frames_cardinality_and_fingerprints(spark):
    """Row-expanding mapInPandas: every FRAME_STRIDE-th FRAME_CHARS-chunk
    of the decoded payload appears exactly once, fingerprinted like
    hashlib; empty/null payloads yield no rows."""
    import hashlib

    from bigdatamining_graduate_spark.operators import multimodal as MM

    texts = ["a" * 300, "b" * 64, "", None, "c" * 65]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    rows = MM.sample_frames(MM.with_binary_payload(df)).collect()
    got = {(r["doc_id"], r["frame_idx"], r["frame_chars"], r["frame_md5"]) for r in rows}
    want = set()
    for i, t in enumerate(texts):
        if not t:
            continue
        n_frames = (len(t) + MM.FRAME_CHARS - 1) // MM.FRAME_CHARS
        for j in range(0, n_frames, MM.FRAME_STRIDE):
            chunk = t[j * MM.FRAME_CHARS : (j + 1) * MM.FRAME_CHARS]
            want.add((i, j, len(chunk), hashlib.md5(chunk.encode()).hexdigest()))
    assert got == want


def test_neardup_components_chain_multi_round(spark):
    """A 10-node path graph forces ~diameter rounds of min-label
    propagation (the sf fixtures converge in one round, so this is the
    only coverage of the deep-iteration path), plus two singletons and a
    separate triangle; csize and labels must match the closure."""
    from bigdatamining_graduate_spark.operators.dedup import neardup_components

    docs = spark.createDataFrame([(i,) for i in range(1, 16)], ["doc_id"])
    chain = [(i, i + 1) for i in range(1, 10)]          # 1-2-...-10
    tri = [(12, 13), (13, 14), (12, 14)]                # triangle 12-13-14
    pairs = spark.createDataFrame(chain + tri, ["doc_a", "doc_b"])
    got = {
        r.doc_id: (r.component, r.csize)
        for r in neardup_components(docs, pairs).collect()
    }
    assert len(got) == 15
    for i in range(1, 11):
        assert got[i] == (1, 10), i
    for i in (11, 15):
        assert got[i] == (i, 1), i
    for i in (12, 13, 14):
        assert got[i] == (12, 3), i


def test_context_chunks_cover_all_tokens(spark):
    """Chunking invariants on the fixture: every chunk ≤ 128 tokens;
    chunk 0 exists for every non-empty doc; consecutive starts differ by
    the 96-token stride; the union of chunks covers every token (the
    last chunk reaches the end of the doc)."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    chunks = QUERIES["q79_context_chunks"](spark, SF_SMOKE).collect()
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", F.size(TX.tokenize("text")).alias("n"))
        .collect()
    )
    n_by_doc = {r.doc_id: r.n for r in docs}
    by_doc = {}
    for r in chunks:
        assert 1 <= r.chunk_tokens <= 128
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_tokens))
    for doc_id, n in n_by_doc.items():
        if n == 0:
            assert doc_id not in by_doc
            continue
        got = sorted(by_doc[doc_id])
        idxs = [i for i, _ in got]
        assert idxs == list(range(len(got))), doc_id
        last_idx, last_len = got[-1]
        assert last_idx * 96 + last_len == n, doc_id  # coverage to the end


def test_shard_packing_budget_and_contiguity(spark):
    """Packing invariants: shard ids start at 0 with no gaps, every
    shard's token sum stays within budget + one max-doc overhang, and
    re-running yields identical assignment (determinism)."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    rows = QUERIES["q78_shard_packing"](spark, SF_SMOKE).collect()
    shards = {}
    for r in rows:
        shards.setdefault(r.shard, []).append(r.n_tokens)
    ids = sorted(shards)
    assert ids == list(range(len(ids)))
    budget, max_doc = 2000, max(r.n_tokens for r in rows)
    for sid in ids[:-1]:
        assert sum(shards[sid]) + max_doc >= budget, sid  # full up to overhang
        assert sum(shards[sid]) < budget + max_doc, sid
    again = {(r.doc_id, r.shard) for r in QUERIES["q78_shard_packing"](spark, SF_SMOKE).collect()}
    assert again == {(r.doc_id, r.shard) for r in rows}


def test_hll_estimate_within_tolerance(spark):
    """q54's HLL++ estimates (rsd=0.02) must land within 5x the declared
    relative error of the exact per-type distinct counts — validating the
    sketch the engine substitutes for exact distinct at scale."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.sources.catalog import load_table

    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["q54_approx_distinct_users"](spark, SF_SMOKE).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, ex in exact.items():
        assert abs(approx[t] - ex) <= max(1, 0.10 * ex), (t, approx[t], ex)


def test_minhash_lsh_recall_of_exact_pairs(spark):
    """Cross-operator consistency: the MinHash+LSH candidate set (q26,
    estimated J ≥ 0.5) must recover nearly all exact-Jaccard ≥ 0.8 pairs
    (q25) — the sketch's reason to exist. Deterministic md5-based hashes
    make this a stable bound, not a flaky probabilistic one (measured
    1.00 on both fixture SFs; asserted ≥ 0.85 for slack)."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    exact = {(r.doc_a, r.doc_b) for r in QUERIES["q25_ngram_jaccard_pairs"](spark, SF_SMOKE).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in QUERIES["q26_minhash_lsh_pairs"](spark, SF_SMOKE).collect()}
    assert exact, "fixture should contain near-dup pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.85, recall


def test_boilerplate_reassembly_identity(spark):
    """q86: for documents where NO line was removed, the reassembled
    clean_md5 must equal md5 of the normalized full text — pins that
    fixed-width segmentation + ordered rejoin is lossless."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.sources.catalog import load_table

    out = QUERIES["q86_boilerplate_lines"](spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.md5(TX.normalize_text("text")).alias("full_md5")
    )
    joined = out.filter(F.col("n_boilerplate") == 0).join(docs, "doc_id")
    n = joined.count()
    assert n > 0  # fixture must contain untouched docs
    assert joined.filter(F.col("clean_md5") != F.col("full_md5")).count() == 0


def test_boilerplate_token_conservation(spark):
    """q86: kept_tokens never exceeds the doc's token count, and equals it
    exactly when nothing was flagged."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.sources.catalog import load_table

    out = QUERIES["q86_boilerplate_lines"](spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", TX.token_count("text").alias("n_tokens")
    )
    j = out.join(docs, "doc_id")
    assert j.filter(F.col("kept_tokens") > F.col("n_tokens")).count() == 0
    assert (
        j.filter(
            (F.col("n_boilerplate") == 0) & (F.col("kept_tokens") != F.col("n_tokens"))
        ).count()
        == 0
    )


def test_zorder_beats_insertion_order_locality(spark):
    """q87: the WHOLE POINT of the z-order layout is tighter per-file
    bounding boxes than the naive insertion-order layout. Compare mean
    bbox area of z-ordered files vs files cut from event_id order."""
    from bigdatamining_graduate_spark.plans import queries as Q
    from bigdatamining_graduate_spark.sources.catalog import load_table

    z_bbox = (
        Q.QUERIES["q87_zorder_layout"](spark, SF_SMOKE)
        .agg(F.avg("bbox").alias("b"))
        .collect()[0]["b"]
    )
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        (F.col("user_id") % (1 << Q._Z_BITS)).alias("ux"),
        F.hour("ts").alias("hy"),
    )
    w = Window.orderBy("event_id")
    naive = (
        ev.select(
            "ux", "hy",
            F.floor((F.row_number().over(w) - 1) / Q._Z_FILE_ROWS).alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            ((F.max("ux") - F.min("ux") + 1) * (F.max("hy") - F.min("hy") + 1)).alias("bbox")
        )
        .agg(F.avg("bbox").alias("b"))
        .collect()[0]["b"]
    )
    assert z_bbox < naive, (z_bbox, naive)


def test_ivf_nprobe_recall_dial(spark):
    """IVF ANN (the MLlib-KMeans variant; q55 itself now runs the
    portable frozen quantizer with a value oracle): multi-cell probing
    is the recall/cost dial — pin the measured floors (sf0.001:
    0.52 / 0.84 / 1.0 at nprobe 1/3/5) and strict monotonicity, so a
    quantizer or probe-selection regression can't silently gut the
    index."""
    from bigdatamining_graduate_spark.operators.similarity import (
        ivf_knn,
        knn_bruteforce,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    truth = knn_bruteforce(emb, pred, 5).select("query_id", "neighbor_id")
    recalls = {}
    for nprobe in (1, 3, 5):
        approx = ivf_knn(emb, pred, k=5, nprobe=nprobe).select(
            "query_id", "neighbor_id"
        )
        hit = approx.withColumn("hit", F.lit(1))
        r = truth.join(hit, ["query_id", "neighbor_id"], "left").agg(
            F.count("*").alias("t"), F.count("hit").alias("h")
        ).collect()[0]
        recalls[nprobe] = r["h"] / r["t"]
    assert recalls[1] < recalls[3] < recalls[5], recalls
    assert recalls[3] >= 0.8 and recalls[5] >= 0.95, recalls


def test_ivf_many_cells_probe_stays_broadcast(spark):
    """IVF at production cell counts: n_cells grows to ~sqrt(corpus), so
    the centroids must be a BROADCAST TABLE, not a plan literal (plan /
    codegen size blows up otherwise). At n_cells=64 the probe join must
    plan as a broadcast nested-loop against the centroid table — never a
    shuffled CartesianProduct — and the output contract must hold."""
    from bigdatamining_graduate_spark.operators.similarity import ivf_knn
    from bigdatamining_graduate_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    pred = F.col("vec_id") % 100 == 0
    df = ivf_knn(emb, pred, k=5, n_cells=64, nprobe=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    per_q = df.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rnk").alias("mx")
    )
    bad = per_q.filter((F.col("n") > 5) | (F.col("mx") > 5)).count()
    assert bad == 0


def test_rolling_distinct_counts_user_once_per_window(spark):
    """q96 semantics: a user active on several days inside one trailing
    window is counted ONCE for that window day, and days with no events
    never appear as output rows (the fan-out join keeps only real days)."""
    import datetime as dt

    rows = [
        # user 1 active on day 1 and day 3; user 2 only day 1; day 2 empty
        (dt.datetime(2024, 1, 1, 10), 1),
        (dt.datetime(2024, 1, 3, 10), 1),
        (dt.datetime(2024, 1, 1, 11), 2),
        (dt.datetime(2024, 1, 20, 10), 3),  # outside every 7-day window above
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    expanded = (
        du.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user_id"
        )
        .select(F.date_add("day", F.col("off")).alias("w_day"), "user_id")
        .distinct()
    )
    got = {
        r["day"]: r["n"]
        for r in expanded.join(days, expanded.w_day == days.day)
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # Jan 1: users {1,2}; Jan 3: users {1 (twice in window -> once), 2};
    # Jan 2 emits NO row; Jan 20: user 3 only (window from Jan 13)
    assert got == {"2024-01-01": 2, "2024-01-03": 2, "2024-01-20": 1}


def test_unpivot_conserves_rows_and_values(spark):
    """q92 semantics: melt emits exactly rows x measures output rows and
    per-measure sums equal the wide-column sums (nulls preserved)."""
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0)], "a double, b double"
    )
    long = df.unpivot(
        ids=[], values=["a", "b"], variableColumnName="m", valueColumnName="v"
    )
    assert long.count() == 6  # 3 rows x 2 measures, null kept as a row
    sums = {r["m"]: r["s"] for r in long.groupBy("m").agg(F.sum("v").alias("s")).collect()}
    assert sums == {"a": 6.0, "b": 40.0}


def test_pii_redaction_on_planted_positives(spark):
    """q100's fixture corpus contains no PII (counts are honest zeros),
    so the redaction semantics are pinned here on planted positives:
    every email/phone/IP is replaced by its typed placeholder, counts
    match, and clean text passes through byte-identical."""
    from bigdatamining_graduate_spark.plans import queries as Q

    rows = [
        (1, "contact Jane.Doe+spam@example.co.uk or call 555-123-4567 now"),
        (2, "server at 10.0.255.3 responded; mail root@host.org"),
        (3, "no pii here, just 1234 and a.b notation."),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.coalesce(F.col("text"), F.lit(""))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, Q._PII_EMAIL, "<EMAIL>"), Q._PII_PHONE, "<PHONE>"
        ),
        Q._PII_IP,
        "<IP>",
    )
    out = {r["doc_id"]: r["red"] for r in df.select("doc_id", red.alias("red")).collect()}
    assert out[1] == "contact <EMAIL> or call <PHONE> now"
    assert out[2] == "server at <IP> responded; mail <EMAIL>"
    assert out[3] == "no pii here, just 1234 and a.b notation."
    assert out[4] == ""


def test_gopher_rules_fire_on_crafted_docs(spark):
    """q99 rule semantics on crafted documents: a clean prose doc passes,
    and each violation (too short, bullet-dominated, ellipsis-heavy,
    symbol-heavy) flips keep to 0 for its own reason."""
    from bigdatamining_graduate_spark.plans import queries as Q

    prose = (
        "the quick brown fox jumps over that lazy dog and it runs off "
        "with the bone to a den of foxes that have all kinds of loot "
    ) * 3  # ~66 words, stopword-rich, no symbols
    bullets = "\n".join(f"- item {i} of the list that we have" for i in range(10))
    ellipsis = "\n".join(f"the line {i} of that text trails off..." for i in range(10))
    symbols = "the " + "# " * 60 + "of that and have with be to"
    rows = [
        (1, prose),
        (2, "too short to keep"),
        (3, bullets),
        (4, ellipsis),
        (5, symbols),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "unit", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: r
            for r in Q.QUERIES["q99_gopher_quality_rules"](spark, d).collect()
        }
    assert got[1]["keep"] == 1, got[1]
    assert got[2]["keep"] == 0 and got[2]["n_words"] < 50
    assert got[3]["keep"] == 0 and got[3]["bullet_frac"] >= 0.9
    assert got[4]["keep"] == 0 and got[4]["ellipsis_frac"] >= 0.3
    assert got[5]["keep"] == 0 and got[5]["symbol_ratio"] >= 0.1


def test_shared_passages_catch_what_jaccard_misses(spark):
    """q101 semantics: two long documents sharing ONE verbatim 10-token
    quote are far below any Jaccard threshold (token sets mostly
    disjoint) yet must be flagged as a shared-passage pair; unrelated
    docs must not pair; and a passage pasted into MORE than
    PASSAGE_MAX_DF docs is boilerplate and emits no pairs."""
    from bigdatamining_graduate_spark.operators import dedup as DD

    quote = "to be or not to be that is the question"  # 10 tokens
    filler_a = " ".join(f"alpha{i}" for i in range(60))
    filler_b = " ".join(f"beta{i}" for i in range(60))
    rows = [
        (1, f"{filler_a} {quote}"),
        (2, f"{quote} {filler_b}"),
        (3, " ".join(f"gamma{i}" for i in range(40))),
    ]
    # boilerplate passage pasted into many docs: over the df cap, no pairs
    boiler = "all rights reserved contact the site admin for details now"
    rows += [(100 + i, f"{boiler} delta{i}") for i in range(DD.PASSAGE_MAX_DF + 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DD.shared_passage_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    assert not any(a >= 100 and b >= 100 for a, b in pairs)

    # the same two docs are invisible to set similarity at dedup thresholds
    jac = DD.ngram_jaccard_pairs(docs.filter(F.col("doc_id") < 100), 0.5)
    assert jac.count() == 0


def test_canonical_selection_keeps_longest_then_min_id(spark):
    """q102 keep policy: exactly one keep per component; the longest
    member wins; a tie falls to the smaller doc_id; singletons keep
    themselves."""
    import tempfile

    from bigdatamining_graduate_spark.plans import queries as Q

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base),                       # cluster {1,2,3}: 3 is longest
        (2, base + " kilo"),
        (3, base + " kilo lima mike"),
        (10, "unrelated words entirely distinct vocabulary here okay"),
        (20, "zulu yankee xray whiskey victor uniform tango sierra"),  # singleton
        (21, "zulu yankee xray whiskey victor uniform tango sierra"),  # tie: same text
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "unit", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {r["doc_id"]: r for r in Q.QUERIES["q102_canonical_docs"](spark, d).collect()}

    by_comp = {}
    for r in got.values():
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        assert sum(m["keep"] for m in members) == 1, (comp, members)
    cluster = [got[i] for i in (1, 2, 3)]
    assert len({m["component"] for m in cluster}) == 1
    assert got[3]["keep"] == 1 and got[1]["keep"] == 0 and got[2]["keep"] == 0
    assert got[10]["keep"] == 1 and got[10]["csize"] == 1
    # exact duplicates tie on n_tokens -> min doc_id wins
    assert got[20]["keep"] == 1 and got[21]["keep"] == 0


def test_unigram_logprob_hand_computed(spark):
    """q103 on a 2-doc corpus small enough to compute by hand: doc 1 =
    'a a b', doc 2 = 'b c'. LM: p(a)=2/5, p(b)=2/5, p(c)=1/5."""
    import math
    import tempfile

    from bigdatamining_graduate_spark.plans import queries as Q

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "a a b", "en", "unit", 5), (2, "b c", "en", "unit", 3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {r["doc_id"]: r for r in Q.QUERIES["q103_unigram_logprob"](spark, d).collect()}

    lp_a = math.log(2 / 5)
    lp_b = math.log(2 / 5)
    lp_c = math.log(1 / 5)
    assert got[1]["n_tokens"] == 3
    assert abs(got[1]["avg_logprob"] - round((2 * lp_a + lp_b) / 3, 6)) < 2e-6
    assert abs(got[1]["min_logprob"] - round(lp_a, 6)) < 2e-6
    assert got[2]["n_tokens"] == 2
    assert abs(got[2]["avg_logprob"] - round((lp_b + lp_c) / 2, 6)) < 2e-6
    assert abs(got[2]["min_logprob"] - round(lp_c, 6)) < 2e-6


def test_payload_chunk_dedup_on_crafted_payloads(spark):
    """q105 semantics: payloads sharing two aligned 64-byte chunks pair
    with the right containment; payloads sharing only a misaligned copy
    of the same bytes do NOT (fixed-width chunking is alignment-
    sensitive — the documented CDC trade-off); unrelated payloads never
    pair."""
    from bigdatamining_graduate_spark.operators import multimodal as MM

    # 128 bytes = exactly 2 DISTINCT chunks (a periodic string would make
    # both 64-byte chunks hash identically and halve the distinct count)
    shared = "a" * 64 + "b" * 64
    rows = [
        (1, shared + "X" * 40),
        (2, shared + "Y" * 80),
        (3, "Z" + shared),              # same bytes, shifted by 1
        (4, "q" * 200),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in MM.payload_chunk_pairs(
            MM.with_binary_payload(docs), min_shared=2
        ).collect()
    }
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # doc 1 has 3 distinct chunks (2 shared + tail), doc 2 has 4
    assert r["n_shared"] == 2
    assert abs(r["containment"] - round(2 / 3, 6)) < 1e-9
    assert all(3 not in p and 4 not in p for p in pairs)


def test_bm25_hand_computed(spark):
    """q106 on a corpus small enough to score by hand: three docs, query
    terms ('spark', 'table', 'query'); verify the exact BM25 value of
    the top doc and the ranking order."""
    import math
    import tempfile

    from bigdatamining_graduate_spark.plans import queries as Q

    rows = [
        (1, "spark spark table alpha beta"),        # dl=5
        (2, "table gamma delta epsilon"),           # dl=4
        (3, "zeta eta theta iota kappa lambda"),    # dl=6
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "unit", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = Q.QUERIES["q106_bm25_search"](spark, d).collect()

    k1, b = Q._BM25_K1, Q._BM25_B
    n, avgdl = 3, 5.0
    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def part(tf, dl, df):
        return idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    # doc1: spark(tf=2, df=1) + table(tf=1, df=2); doc2: table(tf=1, df=2)
    exp1 = part(2, 5, 1) + part(1, 5, 2)
    exp2 = part(1, 4, 2)
    assert [r["doc_id"] for r in got] == [1, 2]  # doc 3 matches nothing
    assert abs(got[0]["bm25"] - round(exp1, 6)) < 2e-6
    assert abs(got[1]["bm25"] - round(exp2, 6)) < 2e-6


def test_pagerank_star_and_triangle_structure(spark):
    """q107 semantics on crafted graphs: a star's hub outranks its
    spokes and equal-degree symmetric nodes (triangle, spokes) tie
    EXACTLY (integer arithmetic — no float jitter); total mass stays
    within (floor-loss, TOTAL_MASS]."""
    from bigdatamining_graduate_spark.operators import graph as GR

    # baskets: three orders {hub, s_i} -> star; one order {a, b, c} -> triangle
    rows = [
        (1, 100), (1, 201),
        (2, 100), (2, 202),
        (3, 100), (3, 203),
        (4, 301), (4, 302), (4, 303),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {r["node"]: r["rank_mass"] for r in GR.integer_pagerank(li).collect()}

    assert len(got) == 7
    spokes = [got[201], got[202], got[203]]
    assert len(set(spokes)) == 1, "symmetric spokes must tie exactly"
    assert got[100] > spokes[0], "hub must outrank spokes"
    tri = [got[301], got[302], got[303]]
    assert len(set(tri)) == 1, "triangle nodes must tie exactly"
    total = sum(got.values())
    assert total <= GR.TOTAL_MASS
    assert total > GR.TOTAL_MASS * 0.9, "floor loss must stay small"


def _stage_events(spark, tmp_path, rows):
    """Write a crafted events table in the fixture layout so registered
    queries run against it black-box (load_table reads
    <dir>/events.parquet, file or directory)."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us), uid, et, v, "{}")
            for eid, us, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_peak_concurrency_half_open_intervals(spark, tmp_path):
    """q132 semantics: holds are [ts, ts+15min) — an event starting at
    the EXACT instant another's hold expires does not overlap it, while
    a strictly-inside start does. Also crosses a day boundary so the
    split-prefix-sum carry path is exercised, not just the within-day
    window."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    h15 = 15 * 60 * 1_000_000
    day = 24 * 3600 * 1_000_000
    rows = [
        # type 'a': e1 [0, 15m), e2 [15m, 30m) -> touching, never concurrent
        (1, 0, 1, "a", 1.0),
        (2, h15, 1, "a", 1.0),
        # type 'b': three nested starts inside one hold window -> peak 3,
        # placed just before midnight so holds straddle the day boundary
        (3, day - h15 // 2, 1, "b", 1.0),
        (4, day - h15 // 3, 1, "b", 1.0),
        (5, day + 1, 1, "b", 1.0),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r["peak_concurrency"]
        for r in QUERIES["q132_peak_concurrency"](spark, sf).collect()
    }
    assert got == {"a": 1, "b": 3}


def test_last_touch_attribution_boundaries(spark, tmp_path):
    """q134 semantics: the 7-day lookback is CLOSED at the boundary
    (t - click == 7d attributes), clicks strictly after a purchase never
    attribute it, and a click at the SAME timestamp as the purchase
    attributes only via the (ts, event_id) tiebreak order (lower id =
    earlier in the row frame) — the pinned total order."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    d7 = 7 * 24 * 3600 * 1_000_000
    rows = [
        # user 1: click then purchase exactly 7d later -> attributed;
        # second purchase 1us past the window -> not attributed
        (10, 0, 1, "click", 1.0),
        (11, d7, 1, "purchase", 1.0),
        (12, d7 + 1, 1, "purchase", 1.0),
        # user 2: purchase BEFORE its only click -> not attributed
        (20, 0, 2, "purchase", 1.0),
        (21, 1_000_000, 2, "click", 1.0),
        # user 3: click and purchase share a timestamp; click id < purchase
        # id, so it lands in the strictly-preceding row frame -> attributed
        (30, 0, 3, "click", 1.0),
        (31, 0, 3, "purchase", 1.0),
    ]
    sf = _stage_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["n_purchases"], r["n_attributed"])
        for r in QUERIES["q134_last_touch_attribution"](spark, sf).collect()
    }
    assert got == {1: (2, 1), 2: (1, 0), 3: (1, 1)}


def test_payload_phash_finds_planted_near_dups(spark, tmp_path):
    """q143 semantics ON NON-EMPTY DATA: the shipped corpus contains no
    byte-positional near-dups (measured min all-pairs hamming = 10, so
    the fixture-scale result is legitimately empty and its oracle
    agreement would be vacuous). This stages the sf0.001 fixture with
    PLANTED variants — same-length substitutions at 3 byte positions —
    and (a) cross-engine verifies the whole pipeline against the DuckDB
    oracle on data where it must fire, (b) asserts every planted pair is
    recovered at hamming <= 3."""
    import os

    from bigdatamining_graduate_spark.plans.queries import ORACLE, QUERIES
    from bigdatamining_graduate_spark.sources.catalog import TABLES, table_path

    from .oracle import assert_matches

    for t in TABLES:
        if t != "documents":
            os.symlink(table_path(SF_SMOKE, t), str(tmp_path / f"{t}.parquet"))
    docs = spark.read.parquet(table_path(SF_SMOKE, "documents"))
    planted = docs.limit(20).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        # same-length edits: flip one char at three positions, preserving
        # byte offsets so the positional resample stays aligned
        F.concat(
            F.lit("Q"), F.substring("text", 2, 100), F.lit("Z"),
            F.expr("substring(text, 103)"),
        ).alias("text"),
        "lang", "source", "n_chars",
    ).filter(F.length("text") > 120)
    staged = docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        planted
    )
    staged.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    out = QUERIES["q143_payload_phash_pairs"](spark, sf)
    rows = out.collect()
    assert_matches(out, ORACLE["q143_payload_phash_pairs"], sf)
    found = {(r["doc_a"], r["doc_b"]) for r in rows}
    expected = {
        (r["doc_id"] - 10_000_000, r["doc_id"])
        for r in planted.select("doc_id").collect()
    }
    assert expected and expected <= found, (len(expected), len(found))


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), min_size=5, max_size=14),
        min_size=4,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_ppjoin_prefix_filter_is_lossless(spark, sets):
    """q146's recall guarantee, property-tested: on random small
    token-set universes the prefix-filtered join must return EXACTLY the
    brute-force Jaccard >= 4/5 pairs (the prefix bound n - ceil(tau*n) + 1
    is lossless by theory — this pins the integer arithmetic that
    implements it)."""
    from bigdatamining_graduate_spark.operators.dedup import ppjoin_pairs

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"tok{t}" for t in sorted(set(s))))
            for i, s in enumerate(sets)
            if len(set(s)) >= 3
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ppjoin_pairs(docs).collect()
    }
    # brute force over the SAME gram universe the operator uses
    from bigdatamining_graduate_spark.operators.dedup import doc_grams

    grams = {}
    for r in doc_grams(docs).collect():
        grams.setdefault(r["doc_id"], set()).add(r["gram"])
    expect = set()
    ids = sorted(grams)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(grams[a] & grams[b])
            union = len(grams[a] | grams[b])
            if union and 5 * inter >= 4 * union:
                expect.add((a, b))
    assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 31), st.integers(0, 31)),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=20, deadline=None)
def test_z_interleave_matches_python_morton(spark, pairs):
    """The arithmetic Morton fragment (shared verbatim by the q87 audit,
    q165's production write path, and the DuckDB oracles) must equal an
    independent bit-twiddling reference: bit i of dim j lands at
    position i*N + (N-1-j). Hypothesis drives the (x, y) grid corners
    and interiors; any drift in the floor/div/mod arithmetic (an
    off-by-one in the shift, a sign slip) breaks this before it can
    silently skew every file's bounding box."""
    import pyspark.sql.functions as F

    from bigdatamining_graduate_spark.functions.layout import z_interleave_sql

    def morton_ref(x: int, y: int, bits: int = 5) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i + 1)  # first col: high slot
            z |= ((y >> i) & 1) << (2 * i)
        return z

    df = spark.createDataFrame(pairs, "x int, y int")
    got = [
        r["z"]
        for r in df.select(F.expr(z_interleave_sql(["x", "y"], 5)).alias("z"))
        .collect()
    ]
    assert got == [morton_ref(x, y) for x, y in pairs]


def test_bfs_hops_path_graph_and_early_exit(spark):
    """q175 semantics on a crafted graph: a 5-node path seeded at its
    min-id end yields hop == position; a disconnected component never
    appears; capping max_hops truncates the neighborhood; and a graph
    explored to exhaustion early-exits cleanly before max_hops."""
    from bigdatamining_graduate_spark.operators import graph as GR

    # path 1-2-3-4-5 plus disconnected pair {10, 11}
    rows = [
        (1, 1), (1, 2),
        (2, 2), (2, 3),
        (3, 3), (3, 4),
        (4, 4), (4, 5),
        (5, 10), (5, 11),
    ]
    li = spark.createDataFrame(
        [(o, p) for o, p in rows], "l_orderkey long, l_partkey long"
    )
    got = {
        r["node"]: r["hop"]
        for r in GR.bfs_hops(li, max_hops=4, min_support=1).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    capped = {
        r["node"]: r["hop"]
        for r in GR.bfs_hops(li, max_hops=2, min_support=1).collect()
    }
    assert capped == {1: 0, 2: 1, 3: 2}

    # exhaustion inside the hop budget: path fully explored at hop 4 < 10
    deep = {
        r["node"]: r["hop"]
        for r in GR.bfs_hops(li, max_hops=10, min_support=1).collect()
    }
    assert deep == got


def test_derived_partsupp_invariants(spark):
    """plans/partsupp derivation: exactly PS_PER_PART rows per part,
    suppkeys inside the supplier domain, availqty in [1, 9999], and
    supplycost a 2-decimal value in [100.00, 999.99] (the decimal(20,2)
    lossless-cast precondition the exact-sum discipline relies on)."""
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.plans import partsupp as PS
    from bigdatamining_graduate_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    part = load_table(spark, sf, "part")
    supp = load_table(spark, sf, "supplier")
    ps = PS.derived_partsupp(part, supp).cache()
    n_part, n_supp = part.count(), supp.count()

    assert ps.count() == n_part * PS.PS_PER_PART
    per_part = ps.groupBy("ps_partkey").count()
    assert per_part.filter(F.col("count") != PS.PS_PER_PART).count() == 0

    bad = ps.filter(
        (F.col("ps_suppkey") < 0)
        | (F.col("ps_suppkey") >= n_supp)
        | (F.col("ps_availqty") < 1)
        | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost") < 100.0)
        | (F.col("ps_supplycost") > 999.99)
        # 2-decimal check: cost*100 must be integral (exact: the double
        # is integer/100, so round-trip through bigint is identity)
        | (
            F.abs(
                F.col("ps_supplycost") * 100
                - F.round(F.col("ps_supplycost") * 100)
            )
            > 1e-6
        )
    )
    assert bad.count() == 0
    ps.unpersist()


def test_derived_shipping_invariants(spark):
    """plans/shipmode derivation: mode always one of the 7 TPC-H modes
    (all 7 present), receiptdate strictly after the ship DATE (offset in
    [1,30]), commitdate within +/-30 days of it, and the Q12 predicate
    ``shipdate < commitdate`` equivalent to a positive commit offset."""
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.plans import shipmode as SM
    from bigdatamining_graduate_spark.sources.catalog import load_table

    li = SM.with_shipping(
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
    ).cache()

    modes = {r[0] for r in li.select("l_shipmode").distinct().collect()}
    assert modes == set(SM.MODES)

    ship = F.to_date("l_shipdate")
    bad = li.filter(
        F.col("l_shipmode").isNull()
        | (F.datediff("l_receiptdate", ship) < 1)
        | (F.datediff("l_receiptdate", ship) > 30)
        | (F.abs(F.datediff("l_commitdate", ship)) > 30)
        # Q12's ship<commit must equal "commit is a LATER day": shipdate
        # (timestamp) is always >= its own date's midnight and < the next
        | (
            (F.col("l_shipdate") < F.col("l_commitdate").cast("timestamp"))
            != (F.datediff("l_commitdate", ship) >= 1)
        )
    )
    assert bad.count() == 0
    li.unpersist()


def test_context_packing_capacity_invariant(spark):
    """q177: every pack's token sum is <= capacity (the provable bound
    cap_docs * bucket_ceiling <= capacity), packs are non-empty, and
    within each (bucket, shard) only the LAST pack may be underfilled
    below cap_docs docs (the documented tail cost of sharding)."""
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.plans import queries as Q

    df = Q.QUERIES["q177_context_packing"](
        spark, "/root/testdata/sf0.001"
    ).cache()
    assert df.filter(F.col("sum_tokens") > Q._Q177_CAP).count() == 0
    assert df.filter(F.col("n_docs") < 1).count() == 0

    w_last = (
        df.groupBy("bucket", "shard").agg(F.max("pack_seq").alias("last_seq"))
    )
    short = (
        df.join(w_last, ["bucket", "shard"])
        .filter(F.col("pack_seq") != F.col("last_seq"))
        .withColumn(
            "cap_docs",
            F.greatest(
                F.lit(1),
                F.expr(f"{Q._Q177_CAP} div ((bucket + 1) * {Q._Q177_W})"),
            ),
        )
        .filter(F.col("n_docs") != F.col("cap_docs"))
    )
    assert short.count() == 0
    df.unpersist()


def test_scd2_contract_invariants(spark):
    """q179: exactly one current row per user; half-open intervals tile
    the timeline (valid_to == next version's valid_from, no overlap);
    adjacent versions always differ in tier (a version opens ONLY on
    change); version ids are contiguous from 1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.plans import queries as Q

    df = Q.QUERIES["q179_scd2_user_tiers"](
        spark, "/root/testdata/sf0.001"
    ).cache()

    cur = df.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert cur.filter(F.col("n_cur") != 1).count() == 0

    w = Window.partitionBy("user_id").orderBy("version")
    nxt = df.select(
        "user_id",
        "version",
        "tier",
        "valid_from_us",
        "valid_to_us",
        F.lead("valid_from_us").over(w).alias("nxt_from"),
        F.lead("tier").over(w).alias("nxt_tier"),
        F.lag("version").over(w).alias("prev_version"),
    )
    bad = nxt.filter(
        # tiling: a closed interval must end exactly where the next opens
        (F.col("nxt_from").isNotNull() & (F.col("valid_to_us") != F.col("nxt_from")))
        # change-only versioning: adjacent versions must differ
        | (F.col("nxt_tier").isNotNull() & (F.col("nxt_tier") == F.col("tier")))
        # contiguity: versions step by 1, starting at 1
        | (F.col("prev_version").isNull() & (F.col("version") != 1))
        | (
            F.col("prev_version").isNotNull()
            & (F.col("version") != F.col("prev_version") + 1)
        )
    )
    assert bad.count() == 0
    df.unpersist()


@given(
    st.lists(
        st.tuples(st.integers(0, 10**7), st.integers(1, 7)),
        min_size=1,
        max_size=16,
    ),
    st.sampled_from([10, 100, 1000]),
)
@settings(max_examples=15, deadline=None)
def test_derived_partsupp_matches_python_formula(spark, keys, n_supp):
    """plans/partsupp's Spark builder must equal an independent pure-
    Python evaluation of the published formulas for arbitrary part keys
    and supplier counts — any drift in the mod/affine arithmetic (sign
    handling, operator precedence, int vs float division) breaks this
    before it can silently split the engines. (The SQL twin is pinned
    engine-vs-engine by the q171-q174 oracle hash-matches.)"""
    from bigdatamining_graduate_spark.plans import partsupp as PS

    part = spark.createDataFrame(
        [(k,) for k, _ in keys], "p_partkey long"
    ).distinct()
    supplier = spark.createDataFrame(
        [(i,) for i in range(n_supp)], "s_suppkey long"
    )
    got = {
        (r["ps_partkey"], r["ps_suppkey"]): (
            r["ps_availqty"],
            r["ps_supplycost"],
        )
        for r in PS.derived_partsupp(part, supplier).collect()
    }

    expect = {}
    for k in {k for k, _ in keys}:
        for i in range(PS.PS_PER_PART):
            sk = (k * 7 + i * 13) % n_supp
            expect[(k, sk)] = (
                1 + (k * 37 + sk * 11) % 9999,
                ((k * 31 + sk * 17) % 90000 + 10000) / 100.0,
            )
    assert got == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 10**7), st.integers(1, 7)),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=15, deadline=None)
def test_derived_shipping_matches_python_formula(spark, keys):
    """plans/shipmode's Spark builder vs pure Python: mode index and
    both day offsets re-derived independently from the same constants;
    date arithmetic checked as (date - shipdate) day deltas so the
    assertion is calendar-free."""
    import datetime

    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.plans import shipmode as SM

    base = datetime.datetime(1997, 6, 15, 12, 30)
    li = spark.createDataFrame(
        [(o, ln, base) for o, ln in keys],
        "l_orderkey long, l_linenumber long, l_shipdate timestamp",
    )
    rows = SM.with_shipping(li).collect()
    for r in rows:
        o, ln = r["l_orderkey"], r["l_linenumber"]
        assert r["l_shipmode"] == SM.MODES[(o * 3 + ln * 5) % 7]
        c_off = (o * 11 + ln * 7) % 61 - 30
        r_off = (o * 13 + ln * 17) % 30 + 1
        assert (r["l_commitdate"] - base.date()).days == c_off
        assert (r["l_receiptdate"] - base.date()).days == r_off


# -- round-6 capability queries (q182-q187) ---------------------------------


def test_q182_crosstab_shape_and_mass(spark):
    """Literal stat.crosstab pinned: 5 segment rows, the 25 nation
    columns in sorted order, and total mass == |customer| (every
    customer lands in exactly one cell)."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q182_NATIONS,
        q182_segment_nation_crosstab,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    df = q182_segment_nation_crosstab(spark, SF_SMOKE)
    assert df.columns == ["segment"] + [n.lower() for n in _Q182_NATIONS]
    rows = df.collect()
    assert len(rows) == 5
    mass = sum(r[c] for r in rows for c in df.columns[1:])
    assert mass == load_table(spark, SF_SMOKE, "customer").count()


def test_q183_attribution_mass_conservation(spark):
    """Position-based credit is a probability split: summed credit over
    all event types == number of users with >=1 pre-purchase touch
    (each journey distributes exactly 1.0)."""
    from bigdatamining_graduate_spark.plans.queries import (
        q183_position_attribution,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q183_position_attribution(spark, SF_SMOKE).collect()
    total_credit = sum(r["credit"] for r in rows)

    ev = load_table(spark, SF_SMOKE, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    n_users = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .filter(F.struct("ts", "event_id") < F.col("fp"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert math.isclose(total_credit, n_users, abs_tol=1e-3)


def test_q184_gate_verdict_consistency(spark):
    """keep is exactly the documented threshold on the ROUNDED share,
    and doc counts partition the corpus."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q184_MAX_SHORT,
        q184_source_quality_gate,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q184_source_quality_gate(spark, SF_SMOKE).collect()
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, SF_SMOKE, "documents"
    ).count()
    for r in rows:
        assert r["keep"] == (r["short_share"] < _Q184_MAX_SHORT)
        assert 0.0 <= r["short_share"] <= 1.0


def test_q185_bigram_scores_are_log_probs(spark):
    """Smoothed bigram log-probs are strictly negative, and the row set
    is exactly the docs with >= 2 tokens (one bigram needs two)."""
    from bigdatamining_graduate_spark.plans.queries import (
        q185_bigram_lm_quality,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q185_bigram_lm_quality(spark, SF_SMOKE).collect()
    assert rows and all(r["avg_logprob"] < 0 for r in rows)
    docs = load_table(spark, SF_SMOKE, "documents")
    n_ge2 = docs.filter(F.size(TX.tokenize("text")) >= 2).count()
    assert len(rows) == n_ge2
    for r in rows:
        assert r["n_bigrams"] >= 1


def test_q186_psi_nonnegative_and_counts_partition(spark):
    """Every PSI term (p-q)ln(p/q) is >= 0, so the sum must be; period
    counts per type must partition that type's events."""
    from bigdatamining_graduate_spark.plans.queries import (
        q186_event_type_psi,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q186_event_type_psi(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    ev = load_table(spark, SF_SMOKE, "events")
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["psi"] >= 0
        assert r["n_a"] + r["n_b"] == totals[r["event_type"]]


def test_q187_entropy_bounds(spark):
    """0 <= H <= ln(n_distinct) (uniform upper bound), H == 0 iff the
    doc repeats one token; rows == docs with >= 1 token."""
    from bigdatamining_graduate_spark.plans.queries import q187_token_entropy
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q187_token_entropy(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    assert len(rows) == docs.filter(F.size(TX.tokenize("text")) > 0).count()
    for r in rows:
        assert -1e-9 <= r["entropy"] <= math.log(r["n_distinct"]) + 1e-6
        if r["n_distinct"] == 1:
            assert abs(r["entropy"]) < 1e-9


def test_q188_containment_planted_subset(spark):
    """A planted excerpt (first 12 tokens of a 40-token doc) must show
    containment 1.0 toward its superset; the reverse direction must
    score len-ratio; bounds hold for every emitted pair."""
    from bigdatamining_graduate_spark.operators import dedup as DD

    base = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, base), (2, excerpt), (3, other)], "doc_id: long, text: string"
    )
    rows = {
        (r["src"], r["dst"]): r["containment"]
        for r in DD.ngram_containment_pairs(docs, 0.2).collect()
    }
    # excerpt: 10 3-grams, all inside base (38 3-grams)
    assert abs(rows[(2, 1)] - 1.0) < 1e-9
    assert abs(rows[(1, 2)] - 10 / 38) < 1e-9
    assert all(0.0 < v <= 1.0 + 1e-9 for v in rows.values())
    assert all(s != d for (s, d) in rows)


def test_q188_fixture_bounds(spark):
    from bigdatamining_graduate_spark.plans.queries import q188_containment_pairs

    rows = q188_containment_pairs(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0.8 <= r["containment"] <= 1.0 + 1e-9
        assert r["src"] != r["dst"]


def test_q189_diff_classification_consistency(spark):
    """Null structure must match the class: added => no before-state,
    removed => no after-state, changed => states differ, unchanged =>
    states equal; user set == all users in events."""
    from bigdatamining_graduate_spark.plans.queries import q189_snapshot_diff
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q189_snapshot_diff(spark, SF_SMOKE).collect()
    ev_users = {
        r["user_id"]
        for r in load_table(spark, SF_SMOKE, "events").select("user_id").distinct().collect()
    }
    assert {r["user_id"] for r in rows} == ev_users
    for r in rows:
        ct = r["change_type"]
        if ct == "added":
            assert r["n_before"] is None and r["n_after"] is not None
        elif ct == "removed":
            assert r["n_after"] is None and r["n_before"] is not None
        elif ct == "changed":
            assert (r["n_before"], r["last_before"]) != (r["n_after"], r["last_after"])
        else:
            assert ct == "unchanged"
            assert r["n_before"] == r["n_after"]
            assert r["last_before"] == r["last_after"]


def test_q190_native_sessions_match_derived_q18(spark):
    """Literal F.session_window must agree with the gaps-and-islands
    derivation: per-user session counts equal q18's, sessions tile
    without overlap, and every session spans >= 1 event with
    end = last_event + gap."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q190_GAP_S,
        q18_user_sessions,
        q190_session_window_batch,
    )

    rows = q190_session_window_batch(spark, SF_SMOKE).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["session_start_us"], r["session_end_us"], r["n_events"])
        )
    q18 = {
        r["user_id"]: r["session_count"]
        for r in q18_user_sessions(spark, SF_SMOKE).collect()
    }
    assert {u: len(s) for u, s in per_user.items()} == q18
    gap_us = _Q190_GAP_S * 1_000_000
    for sessions in per_user.values():
        sessions.sort()
        for (s1, e1, n1), (s2, _, _) in zip(sessions, sessions[1:]):
            assert s2 >= e1  # non-overlapping, gap respected
        for s, e, n in sessions:
            assert n >= 1 and e - s >= gap_us  # end = last event + gap


def test_q191_hll_accuracy_and_register_bounds(spark):
    """Fixture sketch: estimate within 3σ (σ = 1.04/√512 ≈ 4.6%) of the
    exact distinct count; register bookkeeping sane (0 <= empty
    registers <= m)."""
    from bigdatamining_graduate_spark.plans.queries import (
        _HLL_M,
        q191_portable_hll_users,
    )

    rows = q191_portable_hll_users(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    sigma = 1.04 / (_HLL_M ** 0.5)
    for r in rows:
        assert 0 <= r["n_zero"] <= _HLL_M
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel <= 3 * sigma, f"{r['event_type']}: rel err {rel:.3f}"


def test_q191_hll_planted_cardinality(spark):
    """Planted 80k-distinct set (far above the linear-counting branch):
    the raw-estimate branch must hold 3σ accuracy too — covers the
    branch the small fixtures never reach."""
    from pyspark.sql import functions as F

    from bigdatamining_graduate_spark.functions import hashing as HH
    from bigdatamining_graduate_spark.plans.queries import (
        _HLL_M,
        _HLL_MAX_RHO,
        _HLL_REM_BITS,
        _HLL_REM_MASK,
        _HLL_SCALE,
    )

    n = 80_000
    ids = spark.range(n).select(F.col("id").cast("string").alias("uid"))
    h = HH.portable_hash64(F.col("uid"))
    t = ids.select(
        F.shiftright(h, _HLL_REM_BITS).alias("bucket"),
        h.bitwiseAND(F.lit(_HLL_REM_MASK)).alias("rem"),
    )
    rho = F.when(
        F.col("rem") > 0, F.lit(_HLL_MAX_RHO) - F.length(F.bin("rem"))
    ).otherwise(F.lit(_HLL_MAX_RHO))
    regs = t.select("bucket", rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("m")
    )
    collected = {r["bucket"]: r["m"] for r in regs.collect()}
    s_scaled = sum(
        1 << (_HLL_MAX_RHO - collected.get(b, 0)) for b in range(_HLL_M)
    )
    est = _HLL_SCALE / s_scaled
    assert est > 2.5 * _HLL_M  # raw branch, not linear counting
    assert abs(est - n) / n <= 3 * (1.04 / (_HLL_M ** 0.5))


# -- round-6 property tests: new-query math vs pure-Python references -------


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # user
            st.integers(0, 10**6),    # ts offset (seconds)
            st.sampled_from(["view", "click", "error", "signup", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_q183_credit_formula_matches_python(spark, events):
    """The Spark attribution credit must equal an independently-coded
    pure-Python 40/20/40 walk over the same synthetic journeys, and
    total credit == number of users with a non-empty journey."""
    import datetime

    from bigdatamining_graduate_spark.plans import queries as Q

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, base + datetime.timedelta(seconds=off), et, 0.0, "{}")
        for i, (u, off, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        # route through a parquet dir so load_table sees a plain table
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["event_type"]): (r["n_touches"], r["credit"])
            for r in Q.q183_position_attribution(spark, d).collect()
        }

    # pure-Python reference
    per_user: dict[int, list[tuple]] = {}
    for i, (u, off, et) in enumerate(events):
        per_user.setdefault(u, []).append((off, i, et))
    want_counts: dict[str, int] = {}
    want_credit: dict[str, float] = {}
    n_journeys = 0
    for u, evs in per_user.items():
        evs.sort()
        purchases = [(o, i) for (o, i, et) in evs if et == "purchase"]
        if not purchases:
            continue
        fp = min(purchases)
        touches = [et for (o, i, et) in evs if et != "purchase" and (o, i) < fp]
        if not touches:
            continue
        n_journeys += 1
        n = len(touches)
        for pos, et in enumerate(touches, 1):
            if n == 1:
                w = 1.0
            elif pos in (1, n):
                w = 0.5 if n == 2 else 0.4
            else:
                w = 0.2 / (n - 2)
            want_counts[et] = want_counts.get(et, 0) + 1
            want_credit[et] = want_credit.get(et, 0.0) + w
    assert set(got) == set(want_counts)
    total = 0.0
    for et in got:
        assert got[et][0] == want_counts[et]
        assert math.isclose(got[et][1], want_credit[et], abs_tol=2e-6)
        total += got[et][1]
    assert math.isclose(total, n_journeys, abs_tol=1e-3)


@given(st.integers(1, (1 << 51) - 1))
@settings(max_examples=50, deadline=None)
def test_q191_rank_matches_python_bit_length(spark, rem):
    """The string-based rank (52 - length(bin(rem))) must equal the
    pure-Python leading-zero count over the 51-bit remainder."""
    from bigdatamining_graduate_spark.plans.queries import _HLL_MAX_RHO

    want = _HLL_MAX_RHO - rem.bit_length()
    df = spark.createDataFrame([(rem,)], "rem long")
    got = df.select(
        (F.lit(_HLL_MAX_RHO) - F.length(F.bin("rem"))).alias("rho")
    ).collect()[0]["rho"]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),       # event type index
            st.integers(0, 29),      # day
            st.integers(0, 23),      # hour
        ),
        min_size=4,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_q186_psi_matches_python(spark, events):
    """Spark PSI must equal an independently-coded pure-Python add-one
    PSI over the same synthetic (type, day, hour) events."""
    import datetime
    import os
    import tempfile

    from bigdatamining_graduate_spark.plans import queries as Q

    types = ["view", "click", "error"]
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(days=d, hours=h),
            i,
            types[t],
            0.0,
            "{}",
        )
        for i, (t, d, h) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d_:
        df.write.mode("overwrite").parquet(os.path.join(d_, "events.parquet"))
        got = {
            r["event_type"]: (r["n_a"], r["n_b"], r["psi"])
            for r in Q.q186_event_type_psi(spark, d_).collect()
        }

    split_day = 15  # _Q186_SPLIT = 2024-01-16: days 0..14 are period A
    for ti, tname in enumerate(types):
        evs = [(d, h) for (t, d, h) in events if t == ti]
        if not evs:
            assert tname not in got
            continue
        ca = [0] * 24
        cb = [0] * 24
        for d, h in evs:
            (ca if d < split_day else cb)[h] += 1
        na, nb = sum(ca), sum(cb)
        psi = 0.0
        for h in range(24):
            pa = (ca[h] + 1) / (na + 24)
            pb = (cb[h] + 1) / (nb + 24)
            psi += (pa - pb) * math.log(pa / pb)
        g = got[tname]
        assert g[0] == na and g[1] == nb
        assert math.isclose(g[2], psi, abs_tol=2e-6)


def test_q192_kmv_accuracy_and_structure(spark):
    """Bottom-k theta overlap: full 10-pair matrix; every intersection
    estimate within 3σ (σ = 1/sqrt(K-2)) of the exact pairwise distinct
    count; exact-mode segments (< K distinct) estimate EXACTLY."""
    from bigdatamining_graduate_spark.plans.queries import (
        _KMV_K,
        q192_kmv_theta_overlap,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q192_kmv_theta_overlap(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    ev = load_table(spark, SF_SMOKE, "events")
    n_distinct = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    sigma = 1.0 / (_KMV_K - 2) ** 0.5
    for r in rows:
        for side, t in (("est_a", r["type_a"]), ("est_b", r["type_b"])):
            if n_distinct[t] < _KMV_K:  # exact mode
                assert r[side] == n_distinct[t]
            else:
                assert abs(r[side] - n_distinct[t]) / n_distinct[t] <= 3 * sigma
        if r["exact_inter"] > 0:
            rel = abs(r["est_inter"] - r["exact_inter"]) / r["exact_inter"]
            assert rel <= 3 * sigma, f"{r['type_a']}x{r['type_b']}: {rel:.3f}"


def test_q193_merge_equals_single_pass(spark):
    """Sketch mergeability: register-wise MAX over weekly shards must
    reproduce the whole-corpus q191 estimate EXACTLY (max of per-week
    maxima == global max per register), and the naive sum of weekly
    estimates must over-count whenever users span weeks."""
    from bigdatamining_graduate_spark.plans.queries import (
        q191_portable_hll_users,
        q193_hll_merge_rollup,
    )

    single = {
        r["event_type"]: r["hll_estimate"]
        for r in q191_portable_hll_users(spark, SF_SMOKE).collect()
    }
    merged = q193_hll_merge_rollup(spark, SF_SMOKE).collect()
    assert len(merged) == len(single)
    for r in merged:
        assert r["est_merged"] == single[r["event_type"]]
        if r["n_weeks"] > 1:
            assert r["sum_weekly_est"] >= r["est_merged"]


def test_q194_ndcg_bounds_and_population(spark):
    """nDCG is a [0, 1] metric by construction (DCG <= ideal DCG); the
    evaluated population is exactly the customers with BOTH train and
    test activity."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q194_CUT,
        q194_ndcg_ranking_eval,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    rows = q194_ndcg_ranking_eval(spark, SF_SMOKE).collect()
    assert rows, "no evaluated segments"
    for r in rows:
        assert 0.0 < r["avg_ndcg"] <= 1.0, r

    orders = load_table(spark, SF_SMOKE, "orders")
    cut = F.lit(_Q194_CUT).cast("timestamp")
    train_c = orders.filter(F.col("o_orderdate") < cut).select("o_custkey")
    test_c = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    both = train_c.intersect(test_c).count()
    assert sum(r["n_customers"] for r in rows) == both


def test_q195_rrf_matches_python(spark):
    """RRF scores recomputed in pure Python from the emitted integer
    ranks must match the engine's fused scores, and fused_rank must be
    a dense 1..k prefix per language."""
    from bigdatamining_graduate_spark.plans.queries import (
        _RRF_C,
        _RRF_K,
        q195_rrf_rank_fusion,
    )

    rows = q195_rrf_rank_fusion(spark, SF_SMOKE).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        expected = 1.0 / (_RRF_C + r["rank_a"]) + 1.0 / (_RRF_C + r["rank_b"])
        assert abs(r["rrf_score"] - round(expected, 6)) < 1e-12
        by_lang.setdefault(r["lang"], []).append(r["fused_rank"])
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, min(_RRF_K, len(ranks)) + 1)), lang


def test_q196_histogram_quantiles_within_bin_width(spark):
    """Histogram-sketch quantile estimates must land within one bin
    width of the DISCRETE empirical quantile (the value at rank
    ceil(q*n)) — the sketch's guaranteed bound: that order statistic
    provably falls inside the hit bin, and the estimate interpolates
    inside the same bin. (Interpolated percentile() is NOT the right
    yardstick: across sparse tail gaps it can straddle bins.)"""
    import math

    from bigdatamining_graduate_spark.plans.queries import (
        _HIST_BINS,
        _HIST_QS,
        q196_histogram_quantiles,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    bounds = {t: (v[-1] - v[0]) / _HIST_BINS for t, v in vals.items()}
    rows = q196_histogram_quantiles(spark, SF_SMOKE).collect()
    assert len(rows) == len(bounds) * len(_HIST_QS)
    for r in rows:
        v = vals[r["event_type"]]
        k = max(1, math.ceil(r["quantile"] * len(v)))
        exact_discrete = v[k - 1]
        width = bounds[r["event_type"]]
        err = abs(r["est"] - exact_discrete)
        assert err <= width + 1e-9, (r, err, width)


def test_q199_twap_matches_python(spark):
    """TWAP recomputed in pure Python from the raw event stream must
    match the engine for every user, and must differ from plain_avg
    somewhere (the sampling bias the operator exists to remove)."""
    from bigdatamining_graduate_spark.plans.queries import (
        q199_time_weighted_avg,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    per_user: dict[int, list] = {}
    for r in ev.select("user_id", "ts", "event_id", "value").collect():
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    expected = {}
    for u, rows in per_user.items():
        rows.sort()
        if len(rows) < 2:
            continue
        num = den = 0.0
        for (t0, _, v), (t1, _, _) in zip(rows, rows[1:]):
            dt = (t1 - t0).total_seconds() * 1e6
            num += v * dt
            den += dt
        expected[u] = num / den
    got = q199_time_weighted_avg(spark, SF_SMOKE).collect()
    assert {r["user_id"] for r in got} == set(expected)
    diffs = 0
    for r in got:
        assert abs(r["twap"] - expected[r["user_id"]]) < 1e-4, r
        if abs(r["twap"] - r["plain_avg"]) > 1e-6:
            diffs += 1
    assert diffs > 0


def test_q200_gini_matches_python(spark):
    """The run-collapsed count-of-counts Gini must equal the textbook
    sorted-ranks formula computed in pure Python on the raw counts."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q200_KEYS,
        _Q200_TOPK,
        q200_join_key_skew_report,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    got = {r["key_name"]: r for r in q200_join_key_skew_report(spark, SF_SMOKE).collect()}
    assert set(got) == {k[0] for k in _Q200_KEYS}
    for name, table, col in _Q200_KEYS:
        counts = sorted(
            r["cnt"]
            for r in load_table(spark, SF_SMOKE, table)
            .groupBy(col)
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        n, total = len(counts), sum(counts)
        s_rank = sum(i * x for i, x in enumerate(counts, start=1))
        gini = (2 * s_rank - (n + 1) * total) / (n * total)
        r = got[name]
        assert r["n_keys"] == n and r["n_rows"] == total
        assert abs(r["gini"] - round(gini, 6)) < 1e-9, (name, r["gini"], gini)
        topk = sum(sorted(counts, reverse=True)[:_Q200_TOPK])
        assert abs(r["topk_share"] - round(topk / total, 6)) < 1e-9


def test_q201_rolling_estimates_within_3sigma(spark):
    """Every rolling 7-day HLL estimate must be within 3σ of the exact
    rolling distinct count recomputed in pure Python from raw events."""
    from collections import defaultdict

    from bigdatamining_graduate_spark.plans.queries import (
        _HLL_M,
        _Q201_WIN_DAYS,
        q201_hll_sliding_distinct,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    byday: dict = defaultdict(set)
    for r in ev.select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        "user_id",
    ).collect():
        byday[(r["event_type"], r["d"])].add(r["user_id"])
    sigma = 1.04 / (_HLL_M ** 0.5)
    rows = q201_hll_sliding_distinct(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        exact = len(
            set().union(
                *[
                    byday.get((r["event_type"], d), set())
                    for d in range(
                        r["day_no"] - (_Q201_WIN_DAYS - 1), r["day_no"] + 1
                    )
                ]
            )
        )
        if exact == 0:
            continue
        rel = abs(r["rolling7_estimate"] - exact) / exact
        assert rel <= 3 * sigma, (r, exact, rel)


def test_q202_weighted_median_matches_python(spark):
    """Weighted and unweighted medians recomputed in pure Python from
    the raw rows must match the engine's distinct-price formulation."""
    from bigdatamining_graduate_spark.plans.queries import q202_weighted_median
    from bigdatamining_graduate_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    raw: dict = {}
    for r in li.select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect():
        raw.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], int(r["l_quantity"]))
        )

    def wmedian(pairs, weighted):
        pairs = sorted(pairs)
        total = sum((w if weighted else 1) for _, w in pairs)
        cum = 0
        for p, w in pairs:
            cum += w if weighted else 1
            if 2 * cum >= total:
                return p

    rows = q202_weighted_median(spark, SF_SMOKE).collect()
    assert {r["flag"] for r in rows} == set(raw)
    for r in rows:
        assert r["weighted_median_price"] == wmedian(raw[r["flag"]], True)
        assert r["unweighted_median_price"] == wmedian(raw[r["flag"]], False)
        assert r["total_weight"] == sum(w for _, w in raw[r["flag"]])


def test_q203_merged_equals_full(spark):
    """The partial-agg merge must equal the full recompute exactly in
    BOTH columns pairs — the algebraic-maintenance property itself."""
    from bigdatamining_graduate_spark.plans.queries import (
        q203_incremental_agg_maintenance,
    )

    rows = q203_incremental_agg_maintenance(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["merged_orders"] == r["full_orders"], r
        assert r["merged_rev"] == r["full_rev"], r


def test_q204_estimator_ordering_and_exact_pairs(spark):
    """Cauchy-Schwarz guarantees est_uniform <= est_skew_aware <=
    exact_pairs (uniformity underestimates Σcnt² on any split); the
    exact pair count must match a pure-Python recompute."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q204_KEYS,
        q204_join_size_estimate,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    got = {r["key_name"]: r for r in q204_join_size_estimate(spark, SF_SMOKE).collect()}
    for name, table, col in _Q204_KEYS:
        counts = [
            r["cnt"]
            for r in load_table(spark, SF_SMOKE, table)
            .groupBy(col)
            .agg(F.count("*").alias("cnt"))
            .collect()
        ]
        r = got[name]
        assert r["exact_pairs"] == sum(c * c for c in counts), name
        assert r["est_uniform"] <= r["est_skew_aware"] + 1e-6, r
        assert r["est_skew_aware"] <= r["exact_pairs"] + 1e-6, r


def test_q205_fk_estimator_exact_on_fk_pair(spark):
    """On a true FK join the rows_a*rows_b/ndv_b estimator must be
    EXACT; exact_size must match a pure-Python Σ cntA·cntB."""
    from collections import Counter

    from bigdatamining_graduate_spark.plans.queries import (
        q205_two_table_join_size,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    got = {r["pair_name"]: r for r in q205_two_table_join_size(spark, SF_SMOKE).collect()}
    fk = got["lineitem.l_orderkey x orders.o_orderkey"]
    assert fk["est_fk"] == fk["exact_size"]
    ca = Counter(
        r["user_id"]
        for r in load_table(spark, SF_SMOKE, "events").select("user_id").collect()
    )
    cb = Counter(
        r["o_custkey"]
        for r in load_table(spark, SF_SMOKE, "orders").select("o_custkey").collect()
    )
    expected = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert got["events.user_id x orders.o_custkey"]["exact_size"] == expected


def test_q206_sampled_estimates_within_3sigma(spark):
    """5% hash-Bernoulli estimates within 3σ (σ≈sqrt((1-p)/(p·n))) of
    the exact per-flag totals."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q206_SPACE,
        _Q206_TAKE,
        q206_hash_sampled_estimates,
    )

    p = _Q206_TAKE / _Q206_SPACE
    for r in q206_hash_sampled_estimates(spark, SF_SMOKE).collect():
        sigma = ((1 - p) / (p * r["n_exact"])) ** 0.5
        assert abs(r["n_est"] - r["n_exact"]) / r["n_exact"] <= 3 * sigma, r
        assert abs(r["rev_est"] - r["rev_exact"]) / r["rev_exact"] <= 4 * sigma, r


def test_q207_sample_is_bottomk_hashes(spark):
    """The emitted rows must be EXACTLY the k smallest portable hashes
    per group — recomputed in pure Python md5."""
    import hashlib

    from bigdatamining_graduate_spark.plans.queries import (
        _Q207_K,
        q207_bottomk_row_sample,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    def phash(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    ev = load_table(spark, SF_SMOKE, "events")
    per_type: dict = {}
    for r in ev.select("event_type", "event_id").collect():
        per_type.setdefault(r["event_type"], []).append(
            (phash(str(r["event_id"])), r["event_id"])
        )
    got = q207_bottomk_row_sample(spark, SF_SMOKE).collect()
    by_type: dict = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append((r["rn"], r["event_id"]))
    for t, pairs in per_type.items():
        expected = [eid for _, eid in sorted(pairs)[:_Q207_K]]
        actual = [eid for _, eid in sorted(by_type[t])]
        assert actual == expected, t


def test_q208_two_phase_equals_direct(spark):
    """Row-by-row equality of the two top-k paths."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q208_K,
        q208_two_phase_topk,
    )

    rows = q208_two_phase_topk(spark, SF_SMOKE).collect()
    assert len(rows) == _Q208_K
    for r in rows:
        assert r["tp_orderkey"] == r["d_orderkey"], r
        assert r["tp_price"] == r["d_price"], r


def test_q209_stream_registers_equal_batch(spark):
    """Stream-maintained HLL registers must yield EXACTLY the q191
    batch estimates — the incremental-maintenance property of monotone
    register max under streaming ingestion."""
    from bigdatamining_graduate_spark.plans.queries import (
        q191_portable_hll_users,
        q209_stream_hll_registers,
    )

    batch = {
        r["event_type"]: (r["n_zero"], r["hll_estimate"])
        for r in q191_portable_hll_users(spark, SF_SMOKE).collect()
    }
    stream = {
        r["event_type"]: (r["n_zero"], r["hll_estimate"])
        for r in q209_stream_hll_registers(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_q211_rendezvous_theory_and_python_recompute(spark):
    """HRW movement share must sit near the theoretical (B-A)/B while
    mod-hash movement is several times larger; spot-recompute the HRW
    argmax in pure Python md5 for a sample of keys."""
    import hashlib

    from bigdatamining_graduate_spark.plans.queries import (
        _Q211_A,
        _Q211_B,
        q211_shard_rebalance_cost,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    r = q211_shard_rebalance_cost(spark, SF_SMOKE).collect()[0]
    theory = (_Q211_B - _Q211_A) / _Q211_B
    assert abs(r["moved_hrw_share"] - theory) < 0.05
    assert r["moved_mod_share"] > 2 * r["moved_hrw_share"]

    from bigdatamining_graduate_spark.functions.hashing import (
        MERSENNE31,
        _affine_params,
    )

    def phash(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    params = _affine_params(_Q211_B)

    def hrw(k, n):
        h = phash(str(k)) % MERSENNE31
        ws = [(a * h + b) % MERSENNE31 for a, b in params]
        return max(range(n), key=lambda s: (ws[s], s))

    keys = [
        row["o_orderkey"]
        for row in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey")
        .limit(200)
        .collect()
    ]
    moved = sum(1 for k in keys if hrw(k, _Q211_A) != hrw(k, _Q211_B))
    # the python recompute uses the SAME affine weight family the
    # engine embeds, so the sample share tracks the full population
    assert abs(moved / len(keys) - r["moved_hrw_share"]) < 0.12


def test_q212_audit_is_exact_decimal(spark):
    """The audit's consistent counts must match a pure-Python Decimal
    recomputation — no float epsilon anywhere."""
    from decimal import Decimal

    from bigdatamining_graduate_spark.plans.queries import (
        _Q212_TOL,
        q212_rollup_consistency_audit,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    od = load_table(
        spark, SF_SMOKE, "orders"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
    q2 = Decimal("0.01")
    derived: dict = {}
    for r in li:
        p = Decimal(str(r["l_extendedprice"])).quantize(q2)
        d = Decimal(str(r["l_discount"])).quantize(q2)
        t = Decimal(str(r["l_tax"])).quantize(q2)
        charge = (p * (1 - d)).quantize(Decimal("0.0001")) * (1 + t)
        derived[r["l_orderkey"]] = derived.get(r["l_orderkey"], Decimal(0)) + charge
    tol = Decimal(_Q212_TOL)
    expected: dict = {}
    for r in od:
        if r["o_orderkey"] not in derived:
            continue
        st = r["o_orderstatus"]
        diff = abs(Decimal(str(r["o_totalprice"])).quantize(q2) - derived[r["o_orderkey"]])
        n, c = expected.get(st, (0, 0))
        expected[st] = (n + 1, c + (1 if diff <= tol else 0))
    got = {r["status"]: (r["n_orders"], r["n_consistent"])
           for r in q212_rollup_consistency_audit(spark, SF_SMOKE).collect()}
    assert got == expected


def test_q213_rolling_median_matches_python(spark):
    """Rolling lower-median recomputed in pure Python over the daily
    series must match the engine's sorted-collect construction."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q213_WIN,
        q213_rolling_median_revenue,
    )

    rows = q213_rolling_median_revenue(spark, SF_SMOKE).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["status"], []).append((r["day_no"], r["rev"], r))
    for status, pts in series.items():
        pts.sort()
        for i, (_, _, r) in enumerate(pts):
            frame = sorted(rev for _, rev, _ in pts[max(0, i - _Q213_WIN + 1): i + 1])
            lower_median = frame[(len(frame) + 1) // 2 - 1]
            assert r["rolling_median_rev"] == lower_median, (status, i)


def test_q214_latency_funnel_order(spark):
    """Latencies must be strictly positive and the converted population
    must match a pure-Python first-view/first-purchase recompute."""
    from bigdatamining_graduate_spark.plans.queries import q214_conversion_latency
    from bigdatamining_graduate_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    firsts: dict = {}
    for r in ev:
        if r["event_type"] in ("view", "purchase"):
            key = (r["user_id"], r["event_type"])
            if key not in firsts or r["ts"] < firsts[key]:
                firsts[key] = r["ts"]
    converted = sum(
        1
        for (u, t) in firsts
        if t == "view"
        and (u, "purchase") in firsts
        and firsts[(u, "purchase")] > firsts[(u, "view")]
    )
    rows = q214_conversion_latency(spark, SF_SMOKE).collect()
    assert sum(r["n_converted"] for r in rows) == converted
    for r in rows:
        assert 0 < r["p50_us"] <= r["p90_us"] <= r["max_us"], r


def test_q217_pit_join_is_at_most_one_and_leakage_free(spark):
    """SCD2 interval tiling must make the PIT join 1:at-most-1 (purchase
    counts conserved), and a pure-Python as-of recompute from the raw
    click stream must agree tier-by-tier — including that no purchase
    ever sees a LATER version (temporal leakage)."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q179_LOW,
        _Q179_MID,
        q217_scd2_point_in_time_join,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    ).collect()
    clicks: dict = {}
    purchases = []
    for r in ev:
        if r["event_type"] == "click":
            tier = (
                "low" if r["value"] < _Q179_LOW
                else "mid" if r["value"] < _Q179_MID
                else "high"
            )
            clicks.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], tier)
            )
        elif r["event_type"] == "purchase":
            purchases.append((r["user_id"], r["ts"], r["value"]))
    for v in clicks.values():
        v.sort()
    from collections import Counter
    expected = Counter()
    for u, pts, _ in purchases:
        tier = "none"
        for ts, _, t in clicks.get(u, []):
            if ts <= pts:
                tier = t
            else:
                break
        expected[tier] += 1
    rows = q217_scd2_point_in_time_join(spark, SF_SMOKE).collect()
    assert sum(r["n_purchases"] for r in rows) == len(purchases)
    got = {r["tier_at_purchase"]: r["n_purchases"] for r in rows}
    assert got == dict(expected)


def test_q218_coverage_matches_python(spark):
    """brands_needed recomputed in pure Python from exact Decimal brand
    revenues must match, for every target share."""
    from decimal import Decimal

    from bigdatamining_graduate_spark.plans.queries import (
        _Q218_TARGETS,
        q218_pareto_coverage,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF_SMOKE, "part").collect()
    }
    q2 = Decimal("0.01")
    rev: dict = {}
    for r in li:
        b = part[r["l_partkey"]]
        p = Decimal(str(r["l_extendedprice"])).quantize(q2)
        d = Decimal(str(r["l_discount"])).quantize(q2)
        rev[b] = rev.get(b, Decimal(0)) + p * (1 - d)
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    got = {r["target_share"]: r["brands_needed"]
           for r in q218_pareto_coverage(spark, SF_SMOKE).collect()}
    for t in _Q218_TARGETS:
        cum, needed = Decimal(0), 0
        for _, v in ordered:
            cum += v
            needed += 1
            if float(cum) >= t * float(total):
                break
        assert got[t] == needed, (t, got[t], needed)


def test_q219_splits_are_balanced(spark):
    """Each planned range must hold ~n/P rows: the split points, applied
    back to the data, must leave every partition within one
    max-multiplicity of the ideal depth."""
    from bigdatamining_graduate_spark.plans.queries import (
        _Q219_PARTS,
        q219_range_split_points,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    vals = sorted(
        r["o_totalprice"]
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    splits = sorted(
        r["split_value"]
        for r in q219_range_split_points(spark, SF_SMOKE).collect()
    )
    assert len(splits) == _Q219_PARTS - 1
    import bisect
    edges = [0] + [bisect.bisect_right(vals, s) for s in splits] + [n]
    sizes = [b - a for a, b in zip(edges, edges[1:])]
    ideal = n / _Q219_PARTS
    for sz in sizes:
        assert abs(sz - ideal) <= ideal * 0.25 + 2, (sizes, ideal)


def test_q220_stream_sketch_properties(spark):
    """CM never underestimates (est >= exact per user); the emitted set
    is exactly the users whose estimate crosses the threshold of the
    sketch-recovered total; estimates from the STREAM-maintained cells
    equal a batch-derived sketch recomputed in pure Python."""
    import hashlib

    from bigdatamining_graduate_spark.functions.hashing import (
        MERSENNE31,
    )
    from bigdatamining_graduate_spark.plans.queries import (
        _CMS_PARAMS,
        _CMS_W,
        _Q220_HH_PERMYRIAD,
        q220_stream_cmsketch_heavy_users,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    def h32(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16) % MERSENNE31

    ev = load_table(spark, SF_SMOKE, "events").select("user_id").collect()
    from collections import Counter
    exact = Counter(str(r["user_id"]) for r in ev)
    n = sum(exact.values())
    cells: Counter = Counter()
    for uid, cnt in exact.items():
        for i, (a, b) in enumerate(_CMS_PARAMS):
            cells[(i, ((a * h32(uid) + b) % MERSENNE31) % _CMS_W)] += cnt
    expected = {}
    for uid, cnt in exact.items():
        est = min(
            cells[(i, ((a * h32(uid) + b) % MERSENNE31) % _CMS_W)]
            for i, (a, b) in enumerate(_CMS_PARAMS)
        )
        if est * 10000 >= n * _Q220_HH_PERMYRIAD:
            expected[int(uid)] = (cnt, est)
    got = {
        r["user_id"]: (r["exact_count"], r["est_count"])
        for r in q220_stream_cmsketch_heavy_users(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for _, (cnt, est) in got.items():
        assert est >= cnt


def test_q221_disorder_zero_on_fixture_and_planted_disorder(spark):
    """The fixture generator emits per-user in-order events — the audit
    must measure exactly zero disorder; a planted out-of-order arrival
    sequence through the same running-max formula must match a pure-
    Python recompute (covers the branch the fixture never exercises)."""
    from bigdatamining_graduate_spark.plans.queries import (
        q221_event_disorder_audit,
    )

    for r in q221_event_disorder_audit(spark, SF_SMOKE).collect():
        assert r["n_out_of_order"] == 0 and r["max_lateness_us"] == 0, r

    # planted: arrival order (event_id) disagrees with event time
    rows = [
        (1, 1, 1_000_000), (1, 2, 3_000_000), (1, 3, 2_000_000),
        (1, 4, 5_000_000), (1, 5, 2_500_000), (2, 6, 9_000_000),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts_us"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["event_id"]: r["late"]
        for r in df.select(
            "event_id",
            (F.max("ts_us").over(w) - F.col("ts_us")).alias("late"),
        ).collect()
    }
    run_max, expected = {}, {}
    for u, eid, ts in rows:
        run_max[u] = max(run_max.get(u, ts), ts)
        expected[eid] = run_max[u] - ts
    assert got == expected
    assert got[3] == 1_000_000 and got[5] == 2_500_000


def test_q223_bag_semantics_differ_from_distinct(spark):
    """q223: the multiset ops must reflect MULTIPLICITY arithmetic —
    min(cntA, cntB) copies in intersectAll, cntA−cntB in exceptAll —
    verified against a pure-Python bag recompute; and the result must
    genuinely differ from the distinct variants (else the query proves
    nothing about bag semantics)."""
    from collections import Counter

    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.sources.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).collect()
    a = Counter((r["o_custkey"], r["o_orderpriority"]) for r in o if r["o_orderkey"] % 2 == 0)
    b = Counter((r["o_custkey"], r["o_orderpriority"]) for r in o if r["o_orderkey"] % 3 == 0)
    want_inter = Counter({k: min(c, b[k]) for k, c in a.items() if k in b})
    want_except = a - b
    got = Counter()
    for r in QUERIES["q223_multiset_setops"](spark, SF_SMOKE).collect():
        got[(r["op"], r["o_custkey"], r["o_orderpriority"])] += 1
    for k, c in want_inter.items():
        assert got[("intersect_all", *k)] == c, k
    for k, c in want_except.items():
        assert got[("except_all", *k)] == c, k
    assert sum(want_inter.values()) > len(want_inter), (
        "fixture produced no duplicate tuples — bag semantics untested"
    )


def test_q224_rerank_topk_is_exact_over_candidates(spark):
    """q224: for every query, the returned top-k must equal the exact
    cosine top-k over that query's LSH candidate set (re-rank does not
    drop or reorder), with ranks 1..k and non-increasing similarity."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES

    rows = QUERIES["q224_lsh_rerank_topk"](spark, SF_SMOKE).collect()
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r)
    assert per, "no queries sampled"
    for qid, rs in per.items():
        rs = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1)), qid
        sims = [r["cos_sim"] for r in rs]
        assert all(x >= y - 1e-12 for x, y in zip(sims, sims[1:])), qid


def test_q225_bloom_no_false_negatives_and_python_recompute(spark):
    """q225 invariants: (1) STRUCTURAL no-false-negatives — every probed
    user who is truly a member must be bloom-positive; (2) the filter's
    verdicts match a pure-Python bloom built from the same md5/affine
    literals; (3) the filter is not degenerate (some negative exists)."""
    import hashlib

    from bigdatamining_graduate_spark.functions import hashing as HSH
    from bigdatamining_graduate_spark.plans.queries import (
        _BLOOM_K,
        _BLOOM_M,
        _BLOOM_PARAMS,
        QUERIES,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type").collect()
    members = {r["user_id"] for r in ev if r["event_type"] == "error"}
    probes = {r["user_id"] for r in ev if r["event_type"] == "purchase"}

    def h32(u):
        return int(hashlib.md5(f"bloom{u}".encode()).hexdigest()[:15], 16) % HSH.MERSENNE31

    bits = set()
    for u in members:
        for a, b in _BLOOM_PARAMS:
            bits.add((a * h32(u) + b) % HSH.MERSENNE31 % _BLOOM_M)

    def positive(u):
        return all(
            (a * h32(u) + b) % HSH.MERSENNE31 % _BLOOM_M in bits
            for a, b in _BLOOM_PARAMS
        )

    rows = QUERIES["q225_bloom_prefilter"](spark, SF_SMOKE).collect()
    assert {r["user_id"] for r in rows} == probes
    for r in rows:
        assert r["is_member"] == (r["user_id"] in members), r
        if r["is_member"]:
            assert r["bloom_positive"], f"false negative: {r}"  # structural
        assert r["bloom_positive"] == positive(r["user_id"]), r
    assert len(bits) <= _BLOOM_K * len(members)


def test_q226_prefixspan_matches_python_recompute(spark):
    """q226: MLlib PrefixSpan length-≤2 frequencies equal a pure-Python
    recompute of the precedence definition (a-before-b = any i<j), with
    MLlib's ceil(minSupport·n) threshold; and at least one pattern must
    be non-adjacent-only somewhere (precedence ≠ q114's bigrams)."""
    import math
    from collections import Counter, defaultdict

    from bigdatamining_graduate_spark.plans.queries import (
        _PSPAN_DAY_US,
        _PSPAN_MIN_SUPPORT,
        QUERIES,
    )
    from bigdatamining_graduate_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_PSPAN_DAY_US}").alias("day"),
            "ts",
            "event_id",
            "event_type",
        )
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[(r["user_id"], r["day"])].append((r["ts"], r["event_id"], r["event_type"]))
    n = len(seqs)
    want = Counter()
    for events in seqs.values():
        types = [t for _, _, t in sorted(events)]
        present = set(types)
        for t in present:
            want[t] += 1
        firsts, lasts = {}, {}
        for i, t in enumerate(types):
            firsts.setdefault(t, i)
            lasts[t] = i
        for ta in present:
            for tb in present:
                if firsts[ta] < lasts[tb]:
                    want[f"{ta}>{tb}"] += 1
    minc = math.ceil(_PSPAN_MIN_SUPPORT * n)
    want = {p: c for p, c in want.items() if c >= minc}
    got = {
        r["pattern"]: r["freq"]
        for r in QUERIES["q226_prefixspan_patterns"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_q240_filtered_ann_prefilter_semantics(spark):
    """q240 invariants: (1) every returned neighbor shares its query's
    label (the filter is structural, not best-effort); (2) ranks are
    1..k with non-increasing similarity; (3) the pre-filter finds
    same-label neighbors that POST-filtering the unfiltered q224 top-k
    would lose — the recall argument for making label part of the
    bucket key."""
    import bigdatamining_graduate_spark.operators.similarity as SIM
    from bigdatamining_graduate_spark.plans.queries import QUERIES
    from bigdatamining_graduate_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q240_filtered_ann_topk"](spark, SF_SMOKE).collect()
    assert rows, "no filtered neighbors returned"
    emb = load_table(spark, SF_SMOKE, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    per = {}
    for r in rows:
        assert labels[r["neighbor_id"]] == r["label"] == labels[r["query_id"]], r
        per.setdefault(r["query_id"], []).append(r)
    for qid, rs in per.items():
        rs = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1)), qid
        sims = [r["cos_sim"] for r in rs]
        assert all(x >= y - 1e-12 for x, y in zip(sims, sims[1:])), qid
    # post-filtering the UNFILTERED top-k keeps strictly fewer same-label
    # results than the pre-filtered search returns (recall collapse)
    unfiltered = SIM.lsh_rerank_topk(
        emb, F.col("vec_id") % 50 == 0, k=5
    ).collect()
    post = sum(
        1 for r in unfiltered if labels[r["neighbor_id"]] == labels[r["query_id"]]
    )
    assert len(rows) > post, (len(rows), post)


def test_q241_rrf_python_recompute(spark):
    """q241: the fused ranking must equal a pure-Python RRF recompute
    from the two arm rankings the engine itself reports (lex_rnk /
    vec_rnk are the arms' positions) — and both arms must actually
    contribute docs the other misses (the fusion is real)."""
    from bigdatamining_graduate_spark.plans.queries import QUERIES, _HYB_C as _RRF_K

    rows = QUERIES["q241_rrf_hybrid_search"](spark, SF_SMOKE).collect()
    assert rows
    only_lex = [r for r in rows if r["vec_rnk"] is None]
    only_vec = [r for r in rows if r["lex_rnk"] is None]
    both = [r for r in rows if r["lex_rnk"] is not None and r["vec_rnk"] is not None]
    assert only_lex and only_vec, "one arm subsumed the other at this fixture"
    # pure-Python RRF over the reported arm positions
    def rrf(r):
        s = 0.0
        if r["lex_rnk"] is not None:
            s += 1.0 / (_RRF_K + r["lex_rnk"])
        if r["vec_rnk"] is not None:
            s += 1.0 / (_RRF_K + r["vec_rnk"])
        return s
    expect = sorted(rows, key=lambda r: (-rrf(r), r["doc_id"]))
    got = sorted(rows, key=lambda r: r["fused_rnk"])
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expect]
    for r in rows:
        assert abs(r["rrf"] - round(rrf(r), 6)) < 1e-12, r
    # a doc in both lists outranks a doc seen once at the same positions
    if both:
        best_single = min(rrf(r) for r in only_lex + only_vec)
        assert max(rrf(r) for r in both) > best_single


def test_q262_merge_equals_full_history_and_planted_edges(spark, tmp_path):
    """q262's merge-from-current-row == full q179 recompute, on a
    PLANTED event set that exercises every merge edge: same-tier
    continuation (current row extends — version survives, valid_to
    stays open), tier change (current row closes at the first batch
    event's timestamp), multiple changes within one batch, and a
    brand-new user with no t0 history (versions start at 1).  Also the
    persisted-store roundtrip: merge off a parquet read-back of the t0
    history is byte-equal to the in-plan derivation."""
    import datetime

    from bigdatamining_graduate_spark.plans.queries import (
        _scd2_history,
        scd2_merge,
    )

    def ts(day, h=0):
        return datetime.datetime(2024, 1, day, h)

    # tiers: low < 100 <= mid < 500 <= high — events carry tier directly
    rows = [
        # u1: t0 low->mid; batch continues mid (extend), then -> high
        (1, 1, ts(1), "low"), (1, 2, ts(2), "mid"),
        (1, 10, ts(20), "mid"), (1, 11, ts(21), "high"),
        # u2: t0 only (untouched — carries verbatim)
        (2, 3, ts(1), "high"), (2, 4, ts(3), "low"),
        # u3: batch only (brand-new user, two changes)
        (3, 12, ts(20), "low"), (3, 13, ts(22), "high"),
        # u4: t0 one version; batch same tier only (pure extension)
        (4, 5, ts(2), "mid"), (4, 14, ts(25), "mid"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, tier string"
    )
    cut = ts(10)
    t0 = ev.filter(F.col("ts") <= F.lit(cut))
    batch = ev.filter(F.col("ts") > F.lit(cut))

    cols = ("user_id", "version", "tier", "valid_from_us",
            "valid_to_us", "is_current")

    def key(df):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    full = key(_scd2_history(ev))
    merged = scd2_merge(_scd2_history(t0), batch)
    assert key(merged) == full

    # per-row provenance: untouched user 2 all carried; u3 all merged;
    # u1's closed t0 row carried, active + new rows merged
    src = {(r.user_id, r.version): r.src for r in merged.collect()}
    assert src[(2, 1)] == "carried" and src[(2, 2)] == "carried"
    assert src[(3, 1)] == "merged" and src[(3, 2)] == "merged"
    assert src[(1, 1)] == "carried"          # closed before the frontier
    assert src[(1, 2)] == "merged"           # active row re-emitted
    assert src[(1, 3)] == "merged"           # opened by the batch
    assert src[(4, 1)] == "merged"           # extended in place

    # the extension edge: u4 still has ONE version, still current
    u4 = [r for r in merged.collect() if r.user_id == 4]
    assert len(u4) == 1 and u4[0].is_current and u4[0].version == 1
    # the close edge: u1 v2 closes exactly at its first batch change ts
    u1v2 = [r for r in merged.collect() if r.user_id == 1 and r.version == 2][0]
    assert u1v2.valid_to_us == int(ts(21).timestamp() * 1_000_000)
    assert not u1v2.is_current

    # persisted-store roundtrip
    _scd2_history(t0).write.parquet(str(tmp_path / "scd2"))
    rt = scd2_merge(spark.read.parquet(str(tmp_path / "scd2")), batch)
    assert key(rt) == full


def test_q265_late_event_renumbers_versions(spark):
    """The q265 claim in miniature: a LATE event landing between two
    existing versions renumbers everything after it (v2 'high' becomes
    v3), which is exactly why q262's seed-from-current-row merge cannot
    absorb it — and why the bounded per-user re-derivation must equal
    the full recompute."""
    import datetime

    from bigdatamining_graduate_spark.plans.queries import _scd2_history

    def ts(day):
        return datetime.datetime(2024, 1, day)

    ev = spark.createDataFrame(
        [(1, 1, ts(1), "low"), (1, 2, ts(5), "high"),
         (1, 3, ts(3), "mid"),          # the late arrival
         (2, 4, ts(1), "mid")],
        "user_id long, event_id long, ts timestamp, tier string",
    )
    on_time = ev.filter(F.col("event_id") != 3)
    store = _scd2_history(on_time)
    s1 = {r.version: r.tier for r in store.filter("user_id = 1").collect()}
    assert s1 == {1: "low", 2: "high"}

    # carried (untouched users) + per-user re-derivation == full recompute
    lusers = ev.filter(F.col("event_id") == 3).select("user_id").distinct()
    carried = store.join(lusers, "user_id", "left_anti")
    redone = _scd2_history(ev.join(lusers, "user_id", "left_semi"))
    cols = ("user_id", "version", "tier", "valid_from_us",
            "valid_to_us", "is_current")
    key = lambda df: sorted(tuple(r[c] for c in cols) for r in df.collect())  # noqa: E731
    assert key(carried.unionByName(redone)) == key(_scd2_history(ev))

    r1 = {r.version: r.tier for r in redone.filter("user_id = 1").collect()}
    assert r1 == {1: "low", 2: "mid", 3: "high"}  # renumbered + split
