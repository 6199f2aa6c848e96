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


def rolling_anomaly(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    n_hist: int = 8,
    min_hist: int = 4,
    z: float = 3.0,
) -> DataFrame:
    """Online anomaly flag per event: compare the value against the
    entity's OWN recent history (the `n_hist` events STRICTLY BEFORE
    this one — the causal window a monitoring pipeline uses; including
    the current value would let the outlier mask itself).

    → id, entity, value, n_hist_rows, hist_mean, hist_var (sample),
    is_anomaly = (value − mean)² > z²·var — the sqrt-free form of
    |value − mean| > z·σ (fewer float ops, same predicate). Rows with
    fewer than `min_hist` history events get NULL stats and a FALSE
    flag (non-nullable: "not enough history" IS "not flagged").

    Cross-engine exactness: mean and M2 are SEQUENTIAL FOLDS over the
    collected history array (collect_list over the same ROWS frame both
    engines evaluate in window order) — identical accumulation order,
    bit-identical doubles, no reliance on the engines' stddev
    implementations agreeing. Var == 0 (constant history): any
    deviation flags, equality does not — deterministic.

    One Exchange (shares the (entity, ts, id) window family of
    rolling_event_features); history arrays are n_hist-bounded, so the
    ROWS frame streams in O(n_hist) memory."""
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-n_hist, -1)
    )
    vals = F.collect_list(F.col(value_col)).over(w)
    staged = events.select(
        id_col,
        entity_col,
        value_col,
        vals.alias("__h"),
    )
    n = F.size("__h")
    mean = F.aggregate(
        "__h", F.lit(0.0), lambda a, x: a + x
    ) / n
    out = staged.select(
        id_col,
        entity_col,
        value_col,
        n.alias("n_hist_rows"),
        F.when(n >= min_hist, mean).alias("hist_mean"),
        F.col("__h").alias("__h"),
    ).withColumn(
        "hist_var",
        F.when(
            F.col("n_hist_rows") >= min_hist,
            F.aggregate(
                F.col("__h"),
                F.lit(0.0),
                lambda a, x: a
                + (x - F.col("hist_mean")) * (x - F.col("hist_mean")),
            )
            / (F.col("n_hist_rows") - 1),
        ),
    )
    dev = F.col(value_col) - F.col("hist_mean")
    # flag is non-nullable (FALSE below min_hist): NULL booleans
    # stringify engine-dependently, and "not enough history" IS
    # "not flagged" for an alerting consumer
    return out.withColumn(
        "is_anomaly",
        F.when(
            F.col("n_hist_rows") >= min_hist,
            dev * dev > F.lit(z * z) * F.col("hist_var"),
        ).otherwise(F.lit(False)),
    ).drop("__h")


def duckdb_rolling_anomaly(
    events: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    n_hist: int = 8,
    min_hist: int = 4,
    z: float = 3.0,
) -> str:
    """DuckDB twin — identical preceding-only frame, identical
    sequential folds."""
    over = (
        f"PARTITION BY {entity_col} ORDER BY {ts_col}, {id_col} "
        f"ROWS BETWEEN {n_hist} PRECEDING AND 1 PRECEDING"
    )
    fold_sum = (
        "list_reduce(list_prepend(0.0, h), (a, x) -> a + x)"
    )
    return f"""
        WITH hist AS (
            SELECT {id_col}, {entity_col}, {value_col},
                   coalesce(list({value_col}) OVER ({over}), []) AS h
            FROM {events}
        ),
        m AS (
            SELECT *, len(h) AS n_hist_rows,
                   CASE WHEN len(h) >= {min_hist}
                        THEN {fold_sum} / len(h) END AS hist_mean
            FROM hist
        ),
        v AS (
            SELECT {id_col}, {entity_col}, {value_col}, n_hist_rows,
                   hist_mean,
                   CASE WHEN n_hist_rows >= {min_hist}
                        THEN list_reduce(list_prepend(0.0,
                                 list_transform(h,
                                     x -> (x - hist_mean) * (x - hist_mean))),
                                 (a, x) -> a + x) / (n_hist_rows - 1)
                   END AS hist_var
            FROM m
        )
        SELECT {id_col}, {entity_col}, {value_col}, n_hist_rows, hist_mean,
               hist_var,
               CASE WHEN n_hist_rows >= {min_hist}
                    THEN ({value_col} - hist_mean) * ({value_col} - hist_mean)
                         > {z * z} * hist_var
                    ELSE FALSE
               END AS is_anomaly
        FROM v
    """
