"""Portable deterministic hashing for dedup/sketch operators.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` are different
functions, so sketches built on them could never be oracle-checked. We
instead derive a 60-bit integer from an md5 prefix — md5 is bit-identical
in every engine — giving fully deterministic, engine-independent MinHash /
SimHash / LSH-bucket values.

Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: bigint
DuckDB: cast('0x' || substr(md5(x), 1, 15) as bigint)

60 bits keeps the value inside a signed int64 in both engines.

Used by ``operators.dedup`` (MinHash+LSH, SimHash — the hw3 pipeline
``hw3/hw3.py:84-172`` re-expressed without driver-side vocabulary) and
``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_CHARS = 15  # 60 bits < 2^63


def portable_hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit hash of a string column (optionally salted)."""
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, HASH_HEX_CHARS), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`portable_hash64`."""
    salted = f"concat('{salt}', {expr})" if salt else expr
    return f"cast('0x' || substr(md5({salted}), 1, {HASH_HEX_CHARS}) as bigint)"


#: Mersenne prime 2^31-1: affine MinHash mixing stays inside 62 bits, so
#: products never overflow a signed int64 in EITHER engine (DuckDB errors
#: on bigint overflow; Spark would silently wrap — both avoided).
MERSENNE31 = 2_147_483_647

def _affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i = (a*h + b) mod p, a != 0."""
    import numpy as np

    rng = np.random.RandomState(7)
    return [
        (int(rng.randint(1, MERSENNE31)), int(rng.randint(0, MERSENNE31)))
        for _ in range(num_hashes)
    ]


def affine_minhash_exprs(base_hash: Column, num_hashes: int) -> list[Column]:
    """ONE md5 per value (``base_hash``), then cheap integer mixing per
    seed — 16x fewer md5 evaluations than salted hashing."""
    h32 = base_hash % MERSENNE31
    return [
        ((F.lit(a) * h32 + F.lit(b)) % MERSENNE31).alias(f"h{i}")
        for i, (a, b) in enumerate(_affine_params(num_hashes))
    ]


def affine_minhash_exprs_sql(base_hash_sql: str, num_hashes: int) -> list[str]:
    h32 = f"(({base_hash_sql}) % {MERSENNE31})"
    return [
        f"(({a} * {h32} + {b}) % {MERSENNE31})"
        for (a, b) in _affine_params(num_hashes)
    ]


def minhash(grams_col: Column, num_hashes: int) -> Column:
    """MinHash signature: array of ``num_hashes`` mins over salted hashes
    of the gram array. Empty gram set → nulls (caller filters).

    Spark-first replacement for the reference's collected-vocabulary
    characteristic matrix + MinHashLSH (``hw3/hw3.py:84-134``): the
    signature is computed per-row with array expressions — no driver-side
    vocab, no vocab-width dense vectors, fully distributed.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    grams_col,
                    lambda g, i=i: F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"mh{i}|"), g)), 1, HASH_HEX_CHARS),
                        16,
                        10,
                    ).cast("bigint"),
                )
            )
            for i in range(num_hashes)
        ]
    )


def minhash_sql(grams_sql: str, num_hashes: int) -> str:
    """DuckDB twin of :func:`minhash` (list literal of per-seed mins)."""
    parts = [
        f"list_min(list_transform({grams_sql}, g -> "
        + portable_hash64_sql("g", salt=f"mh{i}|")
        + "))"
        for i in range(num_hashes)
    ]
    return "[" + ", ".join(parts) + "]"


def simhash64(tokens_col: Column, bits: int = 60) -> Column:
    """SimHash: for each bit b, sum(+1/-1 over token-hash bit b) > 0 → bit set.

    Expressed with aggregate over the token array — single pass, JVM-side.
    """
    hashes = F.transform(tokens_col, lambda t: F.conv(
        F.substring(F.md5(t), 1, HASH_HEX_CHARS), 16, 10
    ).cast("bigint"))
    bit_exprs = []
    for b in range(bits):
        # sum of (bit set ? 1 : -1) across tokens
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h, b=b: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        bit_exprs.append(F.when(vote > 0, F.lit(2 ** b).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def simhash64_sql(tokens_sql: str, bits: int = 60) -> str:
    """DuckDB twin of :func:`simhash64`."""
    h = portable_hash64_sql("t")
    hashes = f"list_transform({tokens_sql}, t -> {h})"
    parts = []
    for b in range(bits):
        vote = (
            f"list_sum(list_transform({hashes}, h -> "
            f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        parts.append(f"CASE WHEN {vote} > 0 THEN cast({2 ** b} as bigint) ELSE 0 END")
    return "(" + " + ".join(parts) + ")"
