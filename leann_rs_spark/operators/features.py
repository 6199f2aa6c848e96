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


def resample_ffill(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 21600,
) -> DataFrame:
    """Time-series resample + forward-fill (pandas `resample().ffill()`
    distributed): regularize each entity's irregular event stream onto a
    fixed grid, carrying the last observation through empty buckets —
    the gauge-metric normalization every monitoring / feature-backfill
    pipeline runs before windowed models.

    → (entity, bucket_ts, value, n_obs, filled): one row per
    `bucket_seconds` bucket from the entity's first observed bucket to
    its last; `value` = the LAST observation in the bucket (by
    (ts, id) — pure value selection, no float arithmetic, so
    cross-engine parity is exact), forward-filled where the bucket is
    empty; `filled` marks carried rows (non-nullable — see CLAUDE.md
    boolean-gate rule); `n_obs` = raw events in the bucket (0 when
    filled).

    Scale shape: the ONLY pass over the raw event log is the first
    (entity, bucket) hash aggregation — everything after operates on
    bucket-level data (entities × horizon rows, orders of magnitude
    smaller at 100 TB). The spine is generated per entity with
    `sequence()` (no driver loop, no cross join against a global
    calendar — an entity active for a week never materializes the full
    corpus horizon). Spine→obs join and the ffill window both key on
    the entity, and the window's `last(ignorenulls)` over a running
    ROWS frame streams in O(1) memory per partition. Dense-grid guard:
    horizon/bucket_seconds buckets per entity appear even for an
    entity with 2 events at the range ends — pick bucket_seconds so
    entities×horizon stays shuffle-sized, or pre-filter the horizon."""
    step = int(bucket_seconds)
    b = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast(
        "bigint"
    )
    obs = (
        events.withColumn("__b", b)
        .groupBy(entity_col, "__b")
        .agg(
            F.max_by(
                value_col, F.struct(F.col(ts_col), F.col(id_col))
            ).alias("__v_obs"),
            F.count("*").alias("n_obs"),
        )
    )
    rng = obs.groupBy(entity_col).agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
    )
    spine = rng.select(
        entity_col,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.lit(step))
        ).alias("__b"),
    )
    joined = spine.join(obs, [entity_col, "__b"], "left")
    w = (
        Window.partitionBy(entity_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        entity_col,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        F.last("__v_obs", ignorenulls=True).over(w).alias(value_col),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        F.col("__v_obs").isNull().alias("filled"),
    )


def resample_interpolate(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 21600,
) -> DataFrame:
    """Fixed-grid resample with LINEAR interpolation (pandas
    `resample().interpolate()`): empty buckets between two
    observations get the straight-line value
    prev + (next − prev) · (b − prev_b)/(next_b − prev_b); buckets
    after the last observation carry it forward. Same single
    raw-log aggregation + per-entity sequence() spine as
    `resample_ffill`; the gap bridging adds one backward-looking
    window pair over the SAME (entity, bucket) spec — Catalyst plans
    the forward and backward frames over one Exchange + one Sort.

    Cross-engine exactness: the interpolation formula is evaluated
    with the IDENTICAL expression shape in the DuckDB twin — equal
    operands, equal parenthesization, bit-identical doubles; observed
    buckets return the raw value unchanged (selection, no
    arithmetic). → (entity, bucket_ts, value, n_obs, filled)."""
    step = int(bucket_seconds)
    b = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast(
        "bigint"
    )
    obs = (
        events.withColumn("__b", b)
        .groupBy(entity_col, "__b")
        .agg(
            F.max_by(
                value_col, F.struct(F.col(ts_col), F.col(id_col))
            ).alias("__v_obs"),
            F.count("*").alias("n_obs"),
        )
    )
    rng = obs.groupBy(entity_col).agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
    )
    spine = rng.select(
        entity_col,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.lit(step))
        ).alias("__b"),
    )
    joined = spine.join(obs, [entity_col, "__b"], "left")
    back = (
        Window.partitionBy(entity_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(entity_col)
        .orderBy("__b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ob = F.when(F.col("__v_obs").isNotNull(), F.col("__b"))
    staged = joined.select(
        entity_col,
        "__b",
        "__v_obs",
        "n_obs",
        F.last("__v_obs", ignorenulls=True).over(back).alias("__pv"),
        F.last(ob, ignorenulls=True).over(back).alias("__pb"),
        F.first("__v_obs", ignorenulls=True).over(fwd).alias("__nv"),
        F.first(ob, ignorenulls=True).over(fwd).alias("__nb"),
    )
    interp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
        (F.col("__b") - F.col("__pb"))
        / (F.col("__nb") - F.col("__pb"))
    )
    return staged.select(
        entity_col,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        F.when(F.col("__v_obs").isNotNull(), F.col("__v_obs"))
        .when(F.col("__nv").isNull(), F.col("__pv"))
        .otherwise(interp)
        .alias(value_col),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        F.col("__v_obs").isNull().alias("filled"),
    )


def duckdb_resample_interpolate(
    events: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 21600,
) -> str:
    """DuckDB twin — identical spine, identical forward/backward
    windows, the IDENTICAL interpolation expression shape."""
    step = int(bucket_seconds)
    over_b = (
        f"PARTITION BY s.{entity_col} ORDER BY s.b "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    over_f = (
        f"PARTITION BY s.{entity_col} ORDER BY s.b "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    )
    return f"""
        WITH obs AS (
            SELECT {entity_col},
                   CAST(floor(epoch({ts_col}) / {step}) * {step} AS BIGINT) AS b,
                   last({value_col} ORDER BY {ts_col}, {id_col}) AS v_obs,
                   count(*) AS n_obs
            FROM {events}
            GROUP BY 1, 2
        ),
        rng AS (
            SELECT {entity_col}, min(b) AS b0, max(b) AS b1
            FROM obs GROUP BY 1
        ),
        spine AS (
            SELECT {entity_col},
                   unnest(generate_series(b0, b1, {step})) AS b
            FROM rng
        ),
        staged AS (
            SELECT s.{entity_col}, s.b, o.v_obs, o.n_obs,
                   last_value(o.v_obs IGNORE NULLS) OVER ({over_b}) AS pv,
                   last_value(CASE WHEN o.v_obs IS NOT NULL THEN s.b END
                              IGNORE NULLS) OVER ({over_b}) AS pb,
                   first_value(o.v_obs IGNORE NULLS) OVER ({over_f}) AS nv,
                   first_value(CASE WHEN o.v_obs IS NOT NULL THEN s.b END
                               IGNORE NULLS) OVER ({over_f}) AS nb
            FROM spine s
            LEFT JOIN obs o ON s.{entity_col} = o.{entity_col} AND s.b = o.b
        )
        SELECT {entity_col},
               CAST(to_timestamp(b) AS TIMESTAMP) AS bucket_ts,
               CASE WHEN v_obs IS NOT NULL THEN v_obs
                    WHEN nv IS NULL THEN pv
                    ELSE pv + (nv - pv) * ((b - pb) / (nb - pb))
               END AS {value_col},
               coalesce(n_obs, 0) AS n_obs,
               (v_obs IS NULL) AS filled
        FROM staged
    """


def duckdb_resample_ffill(
    events: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 21600,
) -> str:
    """DuckDB twin — same epoch-floor bucketing, same last-by-(ts,id)
    selection (ordered aggregate), same running last_value IGNORE NULLS."""
    step = int(bucket_seconds)
    return f"""
        WITH obs AS (
            SELECT {entity_col},
                   CAST(floor(epoch({ts_col}) / {step}) * {step} AS BIGINT) AS b,
                   last({value_col} ORDER BY {ts_col}, {id_col}) AS v_obs,
                   count(*) AS n_obs
            FROM {events}
            GROUP BY 1, 2
        ),
        rng AS (
            SELECT {entity_col}, min(b) AS b0, max(b) AS b1
            FROM obs GROUP BY 1
        ),
        spine AS (
            SELECT {entity_col},
                   unnest(generate_series(b0, b1, {step})) AS b
            FROM rng
        )
        SELECT s.{entity_col},
               CAST(to_timestamp(s.b) AS TIMESTAMP) AS bucket_ts,
               last_value(o.v_obs IGNORE NULLS) OVER (
                   PARTITION BY s.{entity_col} ORDER BY s.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS {value_col},
               coalesce(o.n_obs, 0) AS n_obs,
               (o.v_obs IS NULL) AS filled
        FROM spine s
        LEFT JOIN obs o ON s.{entity_col} = o.{entity_col} AND s.b = o.b
    """


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
