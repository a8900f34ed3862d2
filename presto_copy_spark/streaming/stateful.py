"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful streaming (SURVEY §1.3); this is the
"beyond the reference" path for operators that watermarked window aggs
can't express: arbitrary per-key state machines.  The example operator
is a per-user running profile (event count, value sum, last event type)
maintained across micro-batches — the canonical sessionless
user-state-tracking shape of a training-data ingestion pipeline.

Scale posture: state is keyed by user_id, lives in the executor-side
state store (RocksDB-backed in production), and is sharded by the same
hash shuffle as a batch groupBy — hot keys salt the same way.  The
Python function receives Arrow-batched pandas frames per key group.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "user_profile_state",
    "user_profile_batch",
    "user_profile_stream_agg",
    "OUTPUT_SCHEMA",
    "STATE_SCHEMA",
]

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value_cents", LongType(), False),
        StructField("last_event_type", StringType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("cents", LongType(), False),
        StructField("last_ts", LongType(), False),  # micros; max seen
        StructField("last_id", LongType(), False),
        StructField("last_type", StringType(), True),
    ]
)


def _reduce(pdf, n, cents, last_ts, last_id, last_type):
    """One chunk of the per-user profile reduction (shared by the
    streaming state update and its batch-parity twin).  Chunks arrive in
    arbitrary order: track the max (ts, event_id) explicitly rather than
    trusting the final chunk's tail.

    Cents round HALF_UP away from zero via sign-aware floor(|x|+0.5) —
    the SAME arithmetic as qutil.scaled_long and the DuckDB oracle's
    round(), NOT pandas/numpy round() (banker's half-to-even, which
    diverges on exact-.5 cents, e.g. 0.125 -> 12.5; ADVICE r13)."""
    import numpy as np

    n += len(pdf)
    s = pdf["value"].astype(float).to_numpy() * 100.0
    cents += int(np.where(s >= 0, np.floor(s + 0.5), -np.floor(-s + 0.5)).sum())
    if len(pdf):
        c = pdf.assign(_us=pdf["ts"].astype("int64"))
        top = c.sort_values(["_us", "event_id"]).iloc[-1]
        if (int(top._us), int(top.event_id)) > (last_ts, last_id):
            last_ts, last_id = int(top._us), int(top.event_id)
            last_type = str(top.event_type)
    return n, cents, last_ts, last_id, last_type


def _update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):  # noqa: F821
    import pandas as pd

    (user_id,) = key
    acc = state.get if state.exists else (0, 0, -1, -1, None)
    for pdf in pdfs:
        acc = _reduce(pdf, *acc)
    state.update(acc)
    n, cents, _last_ts, _last_id, last_type = acc
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_cents": [cents],
            "last_event_type": [last_type],
        }
    )


_PROFILE_COLS = ["user_id", "ts", "event_id", "event_type", "value"]
"""The 5 columns the profile reduction reads.  Project BEFORE handing
rows to Python: Catalyst cannot prune through mapInPandas /
applyInPandasWithState (the UDF is a black box), so without the
explicit select the whole row — including the fat ``props`` JSON string
— crosses the Arrow boundary and, in the streaming case, the state-key
shuffle (measured: ~40% of the batch-twin's runtime at sf0.1; at 100 TB
it's the difference between shuffling 5 narrow columns and the full
event payload)."""


def user_profile_state(events: DataFrame) -> DataFrame:
    """Streaming per-user profile with arbitrary state (update mode)."""
    return events.select(*_PROFILE_COLS).groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """Batch-parity twin of :func:`user_profile_state`: the state
    store's per-user reduction (count, cents sum, latest event type by
    (ts, event_id)) expressed as ONE JVM partial+final aggregation —
    sum/sum/max_by with map-side combine, all codegen, nothing crosses
    the Arrow boundary.

    History of this plan (each step measured on the 10M-row decade
    layout): a per-group ``applyInPandas`` cost 2.8 s at sf0.1 alone
    (per-group Python call overhead); a vectorized ``mapInPandas``
    partials pass + JVM merge fixed sf0.1 (~0.4 s) but the r13 decade
    sweep showed it NOT converging — 4.94 s at sf10x, 4.1x DuckDB,
    because the whole input still pays one Arrow encode/decode round
    trip that scales with rows.  The pure-JVM form is 1.24 s on the
    same layout (1.03x DuckDB): max_by(type, struct(ts, event_id)) IS
    the state update's "keep latest" merge, and Spark's partial
    aggregation is exactly the per-batch partial-state the old pandas
    stage hand-rolled.  cents via qutil.scaled_long — the same
    arithmetic HALF_UP the rest of the engine (and the oracles) use."""
    from pyspark.sql import functions as F  # noqa: N812

    from ..queries.qutil import scaled_long

    return (
        events.select(*_PROFILE_COLS)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(scaled_long(F.col("value"), 100)).alias("sum_value_cents"),
            F.max_by("event_type", F.struct("ts", "event_id")).alias(
                "last_event_type"
            ),
        )
    )


def user_profile_stream_agg(events: DataFrame) -> DataFrame:
    """The SCALE path for the per-user profile: the same reduction as
    :func:`user_profile_state`, expressed as a built-in streaming
    aggregation (update mode) — count / cents-sum / max_by(type,
    (ts, event_id)) all merge in the JVM state store with NO per-key
    Python dispatch.

    Why both forms exist: ``user_profile_state`` demonstrates the
    arbitrary-state API (applyInPandasWithState — the "custom stateful
    operator" surface Presto has no counterpart for), but its runtime
    is bounded below by one pandas call per updated KEY per
    micro-batch.  Measured on the key-shifted decade layouts
    (BASELINE.md §r13 streaming premium): the custom-state form's
    overhead GROWS with the user count — 2.6 s / 9.5 s / 30.0 s above
    the batch twin at sf0.1/sf1x/sf3x (1.5k/15k/45k users) — while
    this form stays at fixed machinery cost (~1-2 s at every decade,
    same as the dedup stream).  Use the custom-state API when the
    update logic genuinely can't be expressed as declarative
    aggregates; use this whenever it can."""
    from pyspark.sql import functions as F  # noqa: N812

    from ..queries.qutil import scaled_long

    return (
        events.select(*_PROFILE_COLS)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(scaled_long(F.col("value"), 100)).alias("sum_value_cents"),
            F.max_by("event_type", F.struct("ts", "event_id")).alias(
                "last_event_type"
            ),
        )
    )
