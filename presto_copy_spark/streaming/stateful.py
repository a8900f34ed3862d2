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

__all__ = ["user_profile_state", "OUTPUT_SCHEMA", "STATE_SCHEMA"]

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


def _update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):  # noqa: F821
    import pandas as pd

    (user_id,) = key
    n, cents, last_ts, last_id, last_type = (
        state.get if state.exists else (0, 0, -1, -1, None)
    )
    for pdf in pdfs:
        # chunks arrive in arbitrary order: track the max (ts, event_id)
        # explicitly rather than trusting the final chunk's tail
        n += len(pdf)
        cents += int(round(pdf["value"].astype(float).mul(100)).sum())
        if len(pdf):
            c = pdf.assign(_us=pdf["ts"].astype("int64"))
            top = c.sort_values(["_us", "event_id"]).iloc[-1]
            if (int(top._us), int(top.event_id)) > (last_ts, last_id):
                last_ts, last_id = int(top._us), int(top.event_id)
                last_type = str(top.event_type)
    state.update((n, cents, last_ts, last_id, last_type))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_cents": [cents],
            "last_event_type": [last_type],
        }
    )


def user_profile_state(events: DataFrame) -> DataFrame:
    """Streaming per-user profile with arbitrary state (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
