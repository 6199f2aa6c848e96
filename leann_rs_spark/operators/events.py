"""Event analytics: funnel, retention cohorts, transition matrix.

The classic product-analytics trio (the Amplitude/ClickHouse surface)
over the events table — included because a 100 TB event log feeds BOTH
training pipelines and the analytics that monitor them, and all three
are pure DataFrame compositions Catalyst plans well.

Scale shapes:
- `funnel_steps`: per-step ordered-first-match. Step k's timestamp is
  the MIN event time of step k's type AFTER the user's step-(k−1)
  time. Each step is one per-user aggregation joined back on the user
  key — k steps ⇒ k co-partitioned hash aggregations (AQE reuses the
  exchange), never a per-user collect. Conversion requires strict
  event-time ORDER, not mere presence.
- `retention_cohorts`: cohort = the user's first-activity period;
  one min-aggregation + one (cohort, period) distinct-count — the
  standard triangle matrix.
- `event_transitions`: lag(event_type) over the per-user time order →
  one count aggregation over (prev, next) — the Markov transition
  counts session-path mining starts from. ONE window Exchange + one
  tiny groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (user_col, step_1_ts, …, step_k_ts, steps_completed): for each
    user, the earliest strictly-ordered completion of the step
    sequence (step k counts only after step k−1's matched time).
    NULL from the first uncompleted step on."""
    if not steps:
        raise ValueError("steps must be non-empty")
    out = events.select(user_col).distinct()
    prev_col = None
    for i, step in enumerate(steps, 1):
        ev_s = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__t")
        )
        if prev_col is not None:
            ev_s = ev_s.join(
                out.select(user_col, prev_col), user_col
            ).filter(
                F.col(prev_col).isNotNull() & (F.col("__t") > F.col(prev_col))
            )
        agg = ev_s.groupBy(user_col).agg(
            F.min("__t").alias(f"step_{i}_ts")
        )
        out = out.join(agg, user_col, "left")
        prev_col = f"step_{i}_ts"
    completed = None
    for i in range(len(steps), 0, -1):
        cond = F.col(f"step_{i}_ts").isNotNull()
        completed = (
            F.when(cond, F.lit(i))
            if completed is None
            else completed.when(cond, F.lit(i))
        )
    return out.withColumn(
        "steps_completed",
        completed.otherwise(F.lit(0)).cast("int"),
    )


def duckdb_funnel_steps(
    steps: list[str],
    events: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """Oracle twin: the same chained min-after-previous construction."""
    ctes = [
        f"u AS (SELECT DISTINCT {user_col} FROM {events})",
    ]
    prev = None
    for i, step in enumerate(steps, 1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT {user_col}, min({ts_col}) AS t{i} "
                f"FROM {events} WHERE {type_col} = '{step}' "
                f"GROUP BY {user_col})"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{user_col}, min(e.{ts_col}) AS t{i} "
                f"FROM {events} e JOIN s{i - 1} p USING ({user_col}) "
                f"WHERE e.{type_col} = '{step}' AND e.{ts_col} > p.t{i - 1} "
                f"GROUP BY e.{user_col})"
            )
        prev = i
    n = len(steps)
    sel = ", ".join(f"s{i}.t{i} AS step_{i}_ts" for i in range(1, n + 1))
    joins = " ".join(
        f"LEFT JOIN s{i} USING ({user_col})" for i in range(1, n + 1)
    )
    case = " ".join(
        f"WHEN s{i}.t{i} IS NOT NULL THEN {i}"
        for i in range(n, 0, -1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT u.{user_col}, {sel},
               (CASE {case} ELSE 0 END)::int AS steps_completed
        FROM u {joins}
    """
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """→ (cohort_period, activity_period, n_users): users grouped by
    their first-activity period, counted in every period they were
    active — the retention triangle. `period` is any date_trunc unit."""
    p = F.date_trunc(period, F.col(ts_col))
    active = events.select(
        user_col, p.alias("activity_period")
    ).distinct()
    cohort = active.groupBy(user_col).agg(
        F.min("activity_period").alias("cohort_period")
    )
    return (
        active.join(cohort, user_col)
        .groupBy("cohort_period", "activity_period")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def duckdb_retention_cohorts(
    events: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> str:
    return f"""
        WITH active AS (
            SELECT DISTINCT {user_col},
                   date_trunc('{period}', {ts_col}) AS activity_period
            FROM {events}
        ),
        cohort AS (
            SELECT {user_col}, min(activity_period) AS cohort_period
            FROM active GROUP BY {user_col}
        )
        SELECT c.cohort_period, a.activity_period,
               count(DISTINCT a.{user_col}) AS n_users
        FROM active a JOIN cohort c USING ({user_col})
        GROUP BY 1, 2
    """


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (prev_type, next_type, n): Markov transition counts over each
    user's time-ordered event stream ('<start>' for the first event).
    ONE window Exchange + one tiny (types²) groupBy."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        events.select(
            F.coalesce(
                F.lag(type_col, 1).over(w), F.lit("<start>")
            ).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


def duckdb_event_transitions(
    events: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    return f"""
        SELECT prev_type, next_type, count(*) AS n
        FROM (
            SELECT coalesce(lag({type_col}, 1) OVER (
                       PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}
                   ), '<start>') AS prev_type,
                   {type_col} AS next_type
            FROM {events}
        )
        GROUP BY 1, 2
    """
