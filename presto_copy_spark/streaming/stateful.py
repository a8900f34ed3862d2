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

__all__ = ["user_profile_state", "user_profile_batch", "OUTPUT_SCHEMA", "STATE_SCHEMA"]

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
    trusting the final chunk's tail."""
    n += len(pdf)
    cents += int(round(pdf["value"].astype(float).mul(100)).sum())
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
    """Batch-parity twin of :func:`user_profile_state`: the same
    reduction as the streaming state update, run as PARTIAL
    aggregation — one vectorized ``mapInPandas`` pass emits per-batch
    per-user partial states (a pandas groupby over the whole Arrow
    batch, not a Python call per user), and a JVM ``groupBy`` merges
    partials with sum/sum/max_by.  This is exactly what the state store
    does across micro-batches, expressed as map-side combine: no
    pre-shuffle of raw events, only tiny partials cross the wire.

    (A per-group ``applyInPandas`` form was measured 2.8s at sf0.1 —
    1,500 user groups x ~1.5ms pandas call overhead; this form is one
    vectorized pass, ~0.4s.)"""
    from pyspark.sql import functions as F  # noqa: N812

    def partials(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in pdfs:
            if not len(pdf):
                continue
            c = pdf.assign(
                _us=pdf["ts"].astype("int64"),
                # elementwise round matches _reduce's per-chunk rounding
                _cents=pdf["value"].astype(float).mul(100).round().astype("int64"),
            )
            g = c.groupby("user_id", sort=False)
            agg = g.agg(n=("_us", "size"), cents=("_cents", "sum")).reset_index()
            last = (
                c.sort_values(["_us", "event_id"])
                .groupby("user_id", sort=False)
                .tail(1)[["user_id", "_us", "event_id", "event_type"]]
            )
            m = agg.merge(last, on="user_id")
            yield pd.DataFrame(
                {
                    "user_id": m["user_id"],
                    "n": m["n"].astype("int64"),
                    "cents": m["cents"],
                    "last_ts": m["_us"],
                    "last_id": m["event_id"].astype("int64"),
                    "last_type": m["event_type"].astype(str),
                }
            )

    part_schema = (
        "user_id long, n long, cents long, last_ts long, last_id long, last_type string"
    )
    return (
        events.select(*_PROFILE_COLS)
        .mapInPandas(partials, schema=part_schema)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("cents").alias("sum_value_cents"),
            F.max_by("last_type", F.struct("last_ts", "last_id")).alias(
                "last_event_type"
            ),
        )
    )
