"""Structured Streaming jobs over the events fixture (SURVEY §2.11).

The reference has no streaming operators (Presto treats Kafka topics as
batch-scannable tables), so this module is the *upgrade path*: the exact
logical plans of queries/events.py — tumbling window, session window —
re-bound to a file-source readStream with an event-time watermark.
Because the transformations are identical DataFrame expressions, batch
and streaming share one code path; the driver's correctness oracle for
the batch query applies verbatim to the streaming result when run with
Trigger.AvailableNow over the complete input (streaming-batch parity —
exactly how Structured Streaming is meant to be validated).

Scale posture: file source -> Kafka source is a one-line swap; the
watermark bounds state (10 min + window), state lives in the HDFS-backed
state store keyed by (window, group keys) — the same shuffle keys as the
batch agg, so skew behavior is identical.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "stream_events",
    "run_stream_to_batch",
    "tumbling_agg",
    "session_agg",
    "dedup_stream",
    "BATCH_PARITY",
]


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the nanos->micros fix of
    catalog.load_table (streaming needs an explicit schema)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # multi-file layout (the key-shifted scale fixtures, or any real
        # deployment): the directory IS the stream source
        df = spark.readStream.schema(schema).format("parquet").load(path)
    else:
        # single-FILE fixture: the file source streams a *directory*,
        # so stream the parent globbed down to the one file
        df = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (LTZ); fixtures may store NTZ.
        # The fixture values are wall-clock UTC, so the cast is lossless
        # under the session's UTC timezone (session.py).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _cents_sum():
    from ..queries.qutil import scaled_long

    return F.sum(scaled_long(F.col("value"), 100))


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Same plan as queries/events.py events_tumbling, plus a watermark
    (no-op under AvailableNow on complete input; bounds state live)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            _cents_sum().alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users_approx",
            "sum_value_cents",
        )
    )


def session_agg(events: DataFrame) -> DataFrame:
    """Gap-based sessionization — session_window works identically in
    batch and streaming (update mode state merge)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _cents_sum().alias("sum_value_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value_cents",
        )
    )


def _with_redelivery(events: DataFrame) -> DataFrame:
    """Simulate at-least-once delivery: every 5th event arrives twice
    (identical payload, as a broker redelivery would be)."""
    return events.unionByName(events.filter(F.col("event_id") % 5 == 0))


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming ingest dedup: the standard at-least-once -> effectively-
    exactly-once repair stage at the front of every streaming pipeline.

    ``dropDuplicatesWithinWatermark`` keys state on event_id only and
    evicts entries once the watermark passes their event time + delay —
    bounded state at any stream length (plain dropDuplicates with an
    event-time key column would keep exact-timestamp state; the
    WithinWatermark form is the Spark 3.5+ operator built for exactly
    this).  State shuffles on event_id — uniformly distributed, no skew.
    """
    return events.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# Output dirs from earlier runs in this process, swept on the next call
# (the returned DataFrame reads the dir lazily, so the current run's dir
# must outlive this function).
_PREVIOUS_OUT_DIRS: list[str] = []

# State-store parallelism for these short AvailableNow validation runs:
# each shuffle partition is a state-store instance with its own
# checkpoint delta files per batch, so 32 partitions on a 60k-row
# fixture is pure commit overhead.  On a real cluster with a long-lived
# stream you size this to the key cardinality instead.
_STREAM_SHUFFLE_PARTITIONS = "8"


def _tmpdir(prefix: str) -> str:
    """tmpfs-backed scratch dir when available (checkpoint commits are
    many tiny files — RAM-backed beats disk by a wide margin)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def run_stream_to_batch(
    streaming_df: DataFrame,
    name: str | None = None,
    mode: str = "complete",
    keys: list[str] | None = None,
) -> DataFrame:
    """Execute a streaming plan with Trigger.AvailableNow into a file
    sink and return the completed result as a batch DataFrame.

    This is the reference pattern for validating a streaming pipeline
    against its batch oracle: process ALL currently-available input,
    emit the final state, stop.

    The sink is foreachBatch -> parquet, NOT the memory sink: the memory
    sink materializes the whole result on the driver and registers it in
    the catalog forever (a driver-heap leak across runs, and a
    non-starter at scale where results exceed driver memory).

    Sink semantics per output mode:
    - complete: each batch overwrites; the final batch carries the full
      result, so last-writer-wins is exact for any number of batches.
    - update: each batch emits only changed keys, so batches are
      APPENDED with their batch id and the read side keeps the last
      emission per ``keys`` (merge-on-read).  ``keys`` is required —
      overwriting would silently drop keys not re-emitted in the final
      batch whenever AvailableNow splits the input into >1 batch.
    - append: plain append.
    """
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: N812

    if mode == "update" and not keys:
        raise ValueError("update mode needs `keys` for merge-on-read")
    spark = streaming_df.sparkSession
    while _PREVIOUS_OUT_DIRS:
        shutil.rmtree(_PREVIOUS_OUT_DIRS.pop(), ignore_errors=True)
    out_dir = _tmpdir(f"spark_graft_out_{name or uuid.uuid4().hex[:8]}_")
    ckpt = _tmpdir("spark_graft_ckpt_")
    write_mode = "overwrite" if mode == "complete" else "append"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "update":
            batch_df = batch_df.withColumn("__batch_id", F.lit(batch_id))
        batch_df.write.mode(write_mode).parquet(out_dir)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            streaming_df.writeStream.foreachBatch(_sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)
    _PREVIOUS_OUT_DIRS.append(out_dir)
    out = spark.read.parquet(out_dir)
    if mode == "update":
        w = Window.partitionBy(*keys).orderBy(F.col("__batch_id").desc())
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__batch_id")
        )
    return out


# ---------------------------------------------------------------------------
# Batch-parity twins (bench protocol, BASELINE.md §streaming)
#
# The streaming queries' DuckDB oracles are batch SQL, so the
# apples-to-apples price of the OPERATOR is the identical DataFrame plan
# bound to the batch source.  The streaming machinery premium (state
# store commits, checkpoint WAL, microbatch planning, query start/stop)
# is measured separately by bench.py and reported under
# "streaming_machinery_sec".  Correctness (queries()) always runs the
# real streaming path.
#
# Premium scaling, measured at the key-shifted decades (round 13,
# BASELINE.md §r13 streaming premium): for every JVM-state operator
# (dedup, tumbling, session, and stateful.user_profile_stream_agg) the
# premium is a FIXED ~1-2 s at any SF — amortized to noise on a
# long-lived stream.  The applyInPandasWithState form
# (user_profile_state) is the exception: its premium is one pandas
# call per updated KEY per micro-batch and GROWS with the key count
# (2.6 / 9.5 / 30.0 s at 1.5k/15k/45k users) — it stays as the
# arbitrary-state CAPABILITY surface, with user_profile_stream_agg as
# the scale path whenever the update is expressible declaratively.
# ---------------------------------------------------------------------------


def _batch_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.events import _events

    return tumbling_agg(_events(spark, sf_dir)).select(
        "window_start", "window_end", "event_type", "n_events", "sum_value_cents"
    )


def _batch_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.events import _events

    e = _events(spark, sf_dir)
    wm = F.broadcast(e.agg((F.max("ts") - F.expr("INTERVAL 30 MINUTES")).alias("__wm")))
    return (
        session_agg(e)
        .crossJoin(wm)
        .filter(F.col("session_end") < F.col("__wm"))
        .drop("__wm")
    )


def _batch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.events import _events
    from .stateful import user_profile_batch

    return user_profile_batch(_events(spark, sf_dir)).select(
        "user_id", "n_events", "sum_value_cents", "last_event_type"
    )


def _batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.events import _events, _summarize_deduped

    # prune BEFORE the dedup shuffle: the summary reads 4 columns, and
    # Catalyst does not push column pruning through Deduplicate — the
    # fat props JSON would otherwise ride the event_id shuffle.
    # distinct() over dropDuplicates(["event_id"]) (round 11): a broker
    # redelivery is an IDENTICAL payload (see _with_redelivery) and
    # event_id is the stream's unique key, so whole-row distinct is
    # row-for-row equal — and it plans as a pure grouping HashAggregate,
    # where dropDuplicates plans first()-aggregates over string columns
    # that force SortAggregate (sort + non-codegen agg on both sides of
    # the exchange; measured 0.34 -> 0.22 s at sf0.1).  The real
    # streaming path keeps keying on event_id (dropDuplicates-
    # WithinWatermark) — there the key choice is about STATE SIZE, not
    # plan shape, and the parity test proves the two agree row-for-row.
    # ONE data-sized shuffle (round 13): the natural plan pays two —
    # distinct() exchanges on all 4 columns, then the summary's
    # countDistinct(user_id) re-exchanges the deduped rows.  Keying the
    # first shuffle on user_id alone makes BOTH downstream aggregations
    # exchange-free: duplicates co-locate (copies of an event share its
    # user), so hashpartitioning(user_id) satisfies the distinct's
    # ClusteredDistribution over all 4 columns, and the (event_type,
    # user_id) partial of the distinct-count is clustered the same way —
    # only the tiny per-(type,user) partials cross the wire again.
    # sf10x decade: 2.52 -> 1.32 s (DuckDB 0.62; was 2 full exchanges,
    # now 1 + a partials-sized one).  Skewed users are AQE's problem,
    # same as any keyed shuffle.
    deduped = (
        _with_redelivery(_events(spark, sf_dir))
        .select("event_id", "event_type", "user_id", "value")
        .repartition("user_id")
        .distinct()
    )
    return _summarize_deduped(deduped)


BATCH_PARITY = {
    "events_streaming_tumbling": _batch_tumbling,
    "events_streaming_session": _batch_session,
    "events_stateful_profile": _batch_profile,
    "events_streaming_dedup": _batch_dedup,
}
