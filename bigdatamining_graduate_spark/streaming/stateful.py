"""Custom stateful streaming via ``applyInPandasWithState`` — the escape
hatch for per-key state machines that windowed aggregates can't express
(the engine's built-ins cover the common cases: tumbling/sliding windows
in ``jobs.py``, session windows in q47).

Demonstrated operator: running per-user totals with explicit GroupState —
count, exact cent-sum, and max single value. Arrow-batched per group;
state is a single tuple per user (bounded memory; watermark/timeout would
evict idle keys in a continuous deployment).

Drained with availableNow over the fixture the update stream emits exactly
one row per user whose totals equal the batch aggregate — giving this
custom stateful operator a full DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .jobs import _run_to_memory, read_events_stream

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

#: per-user state: (count, cent_sum, max_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: the state function is a CLOSURE, not a module-level function —
    # cloudpickle then ships it by value, so Python workers don't need
    # this package importable (the driver may run from any cwd without
    # PYTHONPATH; a by-reference pickle would raise ModuleNotFoundError
    # executor-side).
    def update_user_totals(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents, mx = state.get() if state.exists else (0, 0, float("-inf"))
        for pdf in batches:
            vals = pdf["value"].dropna()
            n += len(pdf)
            # exact integer cents — decimal-sum discipline inside Python too
            cents += int((vals * 100).round().astype("int64").sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, cents, mx))
        # users with no non-null values yet: emit NULLs (SQL aggregate
        # semantics), never the -inf/0 sentinels from the state encoding
        seen_any = mx != float("-inf")
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": pd.array([cents if seen_any else None], dtype="Int64"),
                "max_value": [mx if seen_any else None],
            }
        )

    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, mode="update")


RUNNING_USER_TOTALS_SQL = """
SELECT user_id,
       count(*) AS n_events,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS value_cents,
       max(value) AS max_value
FROM events
GROUP BY user_id
"""
