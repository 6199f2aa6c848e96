"""Gap-based sessionization: batch (gaps-and-islands) + stateful stream.

Beyond-reference operator (the reference has no streaming/stateful ops,
SURVEY §2.5): assign events to per-user sessions separated by silence
gaps > `gap` — the canonical custom stateful streaming operator the
brief calls for (`applyInPandasWithState`), with a batch twin whose
semantics ARE ANSI-SQL-expressible (lag → new-session flag → running
sum), so the batch side carries a DuckDB oracle and pins the semantics
the stream must reproduce.

Scale:
- Batch: one shuffle on user_id (the window partition key); the running
  sum is computed within partitions — no second shuffle for the groupBy
  because (user_id, session_idx) is a refinement of the window key and
  AQE/partial aggregation handles it map-side.
- Stream: state is one open session per active user, pruned by
  event-time timeout at `watermark + gap`; memory is O(active users in
  the watermark horizon), independent of stream length.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
_STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def _gap_seconds(gap: str) -> float:
    n, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit]
    return float(n) * mult


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch gaps-and-islands: (user_id, session_start, session_end,
    n_events, sum_value), one row per session."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # Timestamp subtraction yields a DayTimeInterval — exact and
    # independent of the session time zone for both TIMESTAMP and
    # TIMESTAMP_NTZ inputs (an epoch-cast would shift across DST
    # transitions under a non-UTC session).
    prev = F.lag(F.col(ts_col)).over(w)
    gap_interval = F.expr(f"INTERVAL {gap}")
    new_session = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_interval),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = events.withColumn("_ns", new_session).withColumn(
        "session_idx", F.sum("_ns").over(run)
    )
    return sessions.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    ).drop("session_idx")


def duckdb_sessionize(
    gap: str = "30 minutes",
    *,
    table: str = "events",
) -> str:
    """Oracle twin of sessionize_events over the driver's events view."""
    gap_s = _gap_seconds(gap)
    return f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_s}
                        THEN 1 ELSE 0 END AS ns
            FROM {table}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts, value,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, sum(value) AS sum_value
        FROM numbered GROUP BY user_id, session_idx
    """


def _sessionize_with_state(gap_s: float):
    """applyInPandasWithState kernel. State = the open session per user
    as (start_us, last_us, n, total); closed sessions are emitted as
    soon as a gap is observed in-batch, the trailing open session when
    event time passes last_ts + gap (EventTimeTimeout)."""
    import pandas as pd

    us = 1_000_000

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return

        # within-batch events are sorted; cross-batch disorder is bounded
        # by the watermark (standard streaming-sessionization caveat)
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1_000).to_numpy()
        vals = rows["value"].to_numpy()

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = 0, 0, 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if n == 0:
                start_us = t
            elif t - last_us > gap_s * us:
                closed.append((start_us, last_us, n, total))
                start_us, n, total = t, 0, 0.0
            last_us, n, total = t, n + 1, total + float(v)

        state.update((start_us, last_us, n, total))
        state.setTimeoutTimestamp(last_us // 1_000 + int(gap_s * 1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(c[0], unit="us") for c in closed
                    ],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return fn


def stream_sessionize_events(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    schema: str = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ),
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
):
    """File-source stream → per-user stateful sessionization → parquet."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_s = _gap_seconds(gap)
    events = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .withWatermark("ts", watermark)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _sessionize_with_state(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
