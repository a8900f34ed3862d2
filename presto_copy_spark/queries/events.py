"""Event-time windowing over the ``events`` fixture (SURVEY §2.11).

The reference has NO streaming operators (Presto is batch MPP; its
kafka/redis connectors expose topics as batch tables — SURVEY §1.3), so
parity for time-series workloads is batch event-time windowing:
``F.window`` (tumbling/sliding) and ``F.session_window`` (gap-based
sessionization), both usable identically under Structured Streaming —
presto_copy_spark/streaming wires the same plans to readStream.

Oracles: DuckDB ``time_bucket`` for tumbling; offset-bucket UNION for
sliding; the classic gaps-and-islands (lag + cumulative flag sum) for
sessions — the textbook SQL equivalents of each operator.

Scale note (100 TB): all three group on (window, key) — the shuffle key
includes the bucket, so load spreads over time × key space; a skewed
hot key would be salted.  Sliding windows multiply rows by
size/slide (2× here) at the Expand stage before the shuffle — partial
aggregation still applies after expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import qutil
from .qutil import scaled_long, spread_scan
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread here (see text.py._docs): the loader-level floor cost
    # every cheap events query ~0.2 s in full-bench conditions;
    # events_json_props (the one CPU-bound map) applies spread_scan
    # itself.
    return load_table(spark, sf_dir, "events")


def _cents_sum(col: str = "value"):
    return F.sum(scaled_long(F.col(col), 100))


SQL_CENTS_SUM = "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"


# ---------------------------------------------------------------------------
@query(
    "events_tumbling",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       {SQL_CENTS_SUM} AS sum_value_cents
FROM events
GROUP BY 1, 2, 3
""",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation — F.window().

    Batch counterpart of a streaming tumbling-window agg; identical plan
    works under readStream + watermark (streaming/jobs.py).
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _cents_sum().alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value_cents",
        )
    )


@query(
    "events_sliding",
    oracle=f"""
WITH cand AS (
  SELECT e.*,
         time_bucket(INTERVAL '30 minutes', ts) - o * (30 * INTERVAL '1 minute')
           AS window_start
  FROM events e CROSS JOIN (VALUES (0), (1)) offs(o)
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       count(*) AS n_events,
       {SQL_CENTS_SUM} AS sum_value_cents
FROM cand
WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
GROUP BY 1, 2
""",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h size / 30m slide) — F.window(size, slide).

    Spark implements this as an Expand (each row into size/slide = 2
    buckets) + hash agg, exactly what the UNION-offset oracle spells out.
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _cents_sum().alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value_cents",
        )
    )


# Gaps-and-islands sessionization SQL, shared by the batch oracle and the
# streaming append oracle (which filters it by the final watermark).
_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '10 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sessed AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '10 minutes' AS session_end,
       count(*) AS n_events,
       {SQL_CENTS_SUM} AS sum_value_cents
FROM sessed
GROUP BY user_id, sess_id
"""


@query("events_session", oracle=_SESSION_ORACLE)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (10-minute gap) — F.session_window.

    Spark's SessionWindow merges adjacent rows whose gap < 10m; session
    end = last event + gap.  The oracle is the gaps-and-islands rewrite.
    Streaming-capable as-is (session_window + watermark).
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
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


@query(
    "events_hourly_top_type",
    oracle=f"""
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         event_type,
         count(*) AS n_events,
         {SQL_CENTS_SUM} AS sum_value_cents
  FROM events
  GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, sum_value_cents
FROM (
  SELECT h.*, row_number() OVER (PARTITION BY window_start
                                 ORDER BY sum_value_cents DESC, event_type) AS rn
  FROM hourly h
) t
WHERE rn = 1
""",
)
def events_hourly_top_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed agg composed with per-window top-1 (agg → window → filter):
    the hourly 'leading event type by value' pattern."""
    e = _events(spark, sf_dir)
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _cents_sum().alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value_cents")
    )
    w = Window.partitionBy("window_start").orderBy(F.col("sum_value_cents").desc(), "event_type")
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "events_streaming_tumbling",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       {SQL_CENTS_SUM} AS sum_value_cents
FROM events
GROUP BY 1, 2, 3
""",
)
def events_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window agg executed as a Structured Streaming job
    (file source -> watermark -> window agg -> AvailableNow -> memory
    sink) and validated against the SAME batch oracle — streaming-batch
    parity.  See streaming/jobs.py."""
    from ..streaming.jobs import run_stream_to_batch, stream_events, tumbling_agg

    out = run_stream_to_batch(tumbling_agg(stream_events(spark, sf_dir)))
    return out.select("window_start", "window_end", "event_type", "n_events", "sum_value_cents")


@query(
    "events_stateful_profile",
    oracle=f"""
WITH agg AS (
  SELECT user_id, count(*) AS n_events,
         {SQL_CENTS_SUM} AS sum_value_cents
  FROM events GROUP BY user_id
), last AS (
  SELECT user_id, event_type AS last_event_type
  FROM (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
  WHERE rn = 1
)
SELECT a.user_id, a.n_events, a.sum_value_cents, l.last_event_type
FROM agg a JOIN last l USING (user_id)
""",
)
def events_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-user running profile (count, cents sum, last event type) kept in
    the streaming state store.  Under AvailableNow on complete input the
    final state equals the batch aggregation — checked against that
    oracle.  See streaming/stateful.py."""
    from ..streaming.jobs import run_stream_to_batch, stream_events
    from ..streaming.stateful import user_profile_state

    out = run_stream_to_batch(
        user_profile_state(stream_events(spark, sf_dir)),
        mode="update",
        keys=["user_id"],
    )
    return out.select("user_id", "n_events", "sum_value_cents", "last_event_type")


@query(
    "events_streaming_session",
    oracle="""
WITH sessions AS (""" + _SESSION_ORACLE + """),
wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events)
SELECT s.* FROM sessions s, wm WHERE s.session_end < wm.w
""",
)
def events_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (session_window + watermark,
    append-mode finalization) run via AvailableNow.  Append mode emits
    exactly the sessions closed before the final watermark
    (max event ts - 30min), which IS SQL-expressible: the oracle is the
    batch gaps-and-islands sessionization filtered to
    session_end < watermark.  (Boundary-equal sessions would depend on
    Spark's eviction comparison, but ends are event-ts + 10min while
    the watermark is max-ts - 30min — exact collision is measure-zero
    on microsecond timestamps.)"""
    from ..streaming.jobs import run_stream_to_batch, session_agg, stream_events

    return run_stream_to_batch(session_agg(stream_events(spark, sf_dir)), mode="append")


def _summarize_deduped(deduped: DataFrame) -> DataFrame:
    """Post-dedup summary shared by the streaming query and its bench
    batch-parity twin: scalar-typed, order-insensitive columns."""
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _cents_sum().alias("sum_value_cents"),
    )


@query(
    "events_streaming_dedup",
    # The oracle pays the IDENTICAL pipeline (round 9 — the old form
    # aggregated the original table directly, skipping the redelivery
    # injection + dedup shuffle the engine pays, which made this row's
    # denominator a near-no-op): inject the same every-5th redelivery,
    # dedup (redeliveries are exact copies, so DISTINCT * is the same
    # row set as the engine's event_id-keyed dropDuplicates), then
    # aggregate.  Result is unchanged — dedup must restore the original
    # stream bit-for-bit.
    oracle=f"""
WITH redelivered AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 5 = 0
),
deduped AS (SELECT DISTINCT * FROM redelivered)
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       {SQL_CENTS_SUM} AS sum_value_cents
FROM deduped
GROUP BY event_type
""",
)
def events_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup (at-least-once -> exactly-once): the event
    stream with simulated broker redeliveries (every 5th event arrives
    twice) runs through ``dropDuplicatesWithinWatermark(event_id)`` under
    AvailableNow; the deduped sink output is then summarized per type.

    The oracle is the plain batch aggregate over the ORIGINAL events —
    redeliveries are exact copies, so a correct dedup stage must restore
    the original stream bit-for-bit.  State is bounded by the 30-minute
    watermark (streaming/jobs.dedup_stream docstring has the scale
    analysis)."""
    from ..streaming.jobs import (
        _with_redelivery,
        dedup_stream,
        run_stream_to_batch,
        stream_events,
    )

    # prune before the state shuffle (same reason as the batch twin in
    # streaming/jobs.py: pruning doesn't cross the dedup operator, and
    # the summary needs 4 columns + the watermark's ts)
    deduped = run_stream_to_batch(
        dedup_stream(
            _with_redelivery(stream_events(spark, sf_dir)).select(
                "event_id", "ts", "event_type", "user_id", "value"
            )
        ),
        mode="append",
    )
    return _summarize_deduped(deduped)


@query(
    "events_json_props",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the props column — JsonFunctions.java
    json_extract_scalar ≈ get_json_object.

    Round 13: the r12 decade sweep showed this row NOT converging
    (0.35 -> 3.54 s across sf0.1 -> sf10x, 21x DuckDB) because every
    JVM JSON path is a full Jackson parse (~6 us/row/core).  The
    extraction now goes through qutil.json_topkey_int — a guarded
    string-level fast path (Presto JsonExtract.java:60 plays the same
    trick with a streaming scanner) with get_json_object fallback for
    any document the guard can't prove flat.  Same decade: 3.54 ->
    ~0.7 s."""
    e = spread_scan(spark, _events(spark, sf_dir))
    ek = qutil.json_topkey_int(e.select("event_type", "props"), "props", "k", "k")
    return (
        ek.select("event_type", F.col("k").cast("long").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "events_asof_join",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id,
       CAST(round(p.value * 100) AS BIGINT) AS purchase_cents,
       epoch_us(c.click_ts) AS click_ts_us,
       CAST(round(c.click_value * 100) AS BIGINT) AS click_cents
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (DuckDB ASOF JOIN / kdb aj — no Presto counterpart,
    the §"beyond the reference" time-series surface): each purchase gets
    the latest click at-or-before it per user.

    Implemented as operators/join.py asof_join — union + ONE shuffle on
    user_id + last_value(ignoreNulls) carry-forward, O(|L|+|R|) rows at
    any scale; the oracle uses DuckDB's native ASOF JOIN, so two
    completely independent formulations must agree bit-for-bit."""
    from ..operators.join import asof_join

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, on="ts", by=["user_id"], right_cols=["ts", "value"])
    return out.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("purchase_cents"),
        F.unix_micros(F.col("ts_asof").cast("timestamp")).alias("click_ts_us"),
        F.round(F.col("value_asof") * 100).cast("long").alias("click_cents"),
    )
