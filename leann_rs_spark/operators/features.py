"""Event feature engineering: per-entity ordered window features.

The training-data counterpart of a feature store's "point-in-time
feature backfill": for every event, derive features from that entity's
OWN history only (previous event, time gap, short rolling aggregate,
cumulative count). This is the feature-extraction pass that runs over
the full event log before model training — at 100 TB it must be one
shuffle, which is exactly what a single `Window.partitionBy(entity)
.orderBy(ts)` compiles to: one Exchange on the entity key + an
in-partition sort shared by every window expression over the same
(partition, order) spec.

Scale notes:
- All five features share ONE window spec → Catalyst plans ONE
  Exchange + ONE Sort; adding more features over the same spec is
  free of additional shuffles.
- The frame for the rolling mean is ROWS-based (last `n_last` events),
  not RANGE-based — ROWS frames stream in O(1) memory per partition;
  RANGE frames over duplicate-heavy order keys buffer peers.
- Order key is (ts, event_id): ties on ts are real in event logs and
  an undefined tie order makes lag()/rolling results nondeterministic.
- Skew: one hot entity (a bot user) concentrates a partition. The
  window semantics are inherently per-key-sequential; mitigation at
  scale is the same salting strategy as `joins.asof_join_salted` —
  split the hot key's history into time ranges, compute, then fix up
  the first row of each range with the previous range's tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_event_features(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    n_last: int = 5,
) -> DataFrame:
    """Per-event history features for `entity_col`, ordered by
    (`ts_col`, `id_col`):

    - ``prev_value``  — value of the previous event (lag 1), NULL first
    - ``gap_us``      — exact microseconds since the previous event,
                        NULL first (integer microsecond arithmetic —
                        no truncation-vs-boundary ambiguity)
    - ``roll_mean``   — mean(value) over the last `n_last` events
                        INCLUDING the current one (ROWS frame)
    - ``cum_events``  — events so far for the entity (running count)

    One Exchange on the entity key; all features share the window spec.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    w_roll = w.rowsBetween(-(n_last - 1), 0)
    # NTZ-safe: cast before unix_micros (sources/tables.py convention).
    # gap_us is a DIFFERENCE, so any fixed session-tz offset cancels.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return events.select(
        id_col,
        entity_col,
        ts_col,
        value_col,
        F.lag(value_col, 1).over(w).alias("prev_value"),
        (ts_us - F.lag(ts_us, 1).over(w)).alias("gap_us"),
        F.avg(value_col).over(w_roll).alias("roll_mean"),
        F.count(F.lit(1)).over(w).alias("cum_events"),
    )


def duckdb_rolling_event_features(
    events: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    n_last: int = 5,
) -> str:
    """DuckDB twin of `rolling_event_features` (same frames, same tie
    order; the caller rounds the float columns)."""
    over = f"PARTITION BY {entity_col} ORDER BY {ts_col}, {id_col}"
    return f"""
        SELECT {id_col}, {entity_col}, {ts_col}, {value_col},
               lag({value_col}, 1) OVER ({over}) AS prev_value,
               epoch_us({ts_col})
                   - lag(epoch_us({ts_col}), 1) OVER ({over}) AS gap_us,
               avg({value_col}) OVER (
                   {over} ROWS BETWEEN {n_last - 1} PRECEDING AND CURRENT ROW
               ) AS roll_mean,
               count(*) OVER (
                   {over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_events
        FROM {events}
    """
