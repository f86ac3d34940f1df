"""Multi-dimensional data-layout expressions (Z-order / Morton curves).

The interleave is emitted as pure integer arithmetic (floor/div/mod/mul)
so the SAME fragment runs under Spark SQL and DuckDB — no engine-specific
bitwise operators, which is what keeps q87's layout audit cross-engine
hash-checkable. Used by ``plans.queries.q87_zorder_layout`` (audit) and
``sources.sinks.zorder_write`` (production write path).
"""

from __future__ import annotations


def z_interleave_sql(cols: list[str], bits: int) -> str:
    """Morton/Z-order bit interleave of N non-negative integer columns,
    each bounded to ``[0, 2**bits)``. Bit ``i`` of dimension ``j`` lands
    at position ``i*N + (N-1-j)``, i.e. dimensions round-robin from the
    least-significant bit with the FIRST column taking the most
    significant slot of each group (for two dims this is the classic
    x-bit-above-y-bit interleave)."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least two dimensions")
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            shift = 1 << (i * n + (n - 1 - j))
            terms.append(f"cast(floor(({c}) / {1 << i}) as bigint) % 2 * {shift}")
    return " + ".join(terms)
