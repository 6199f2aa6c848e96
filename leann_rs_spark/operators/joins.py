"""Temporal joins: as-of and interval/range — operators Spark's join
set lacks, composed from DataFrame primitives.

The reference has no join surface at all (SURVEY §2.5); these are the
training-/event-pipeline operators the brief calls out (align events
to the latest prior state snapshot, stamp rows with the containing
session/window).

Scale shapes:
- `asof_join`: the union-sort method — tag both sides, union, ONE
  shuffle partitioned by key and sorted by (ts, side), then a
  running `last(ignorenulls)` window carries each right row forward
  to the left rows it is the latest-prior match for. No per-row probe,
  no range cross-product; cost is one exchange + one in-partition
  sort, the same physical plan a point-in-time join service compiles
  to. Skewed keys concentrate a window partition — salt the key
  upstream if one key dominates.
- `interval_join`: equi-join on overlapping fixed-width ts buckets,
  then the exact containment predicate — the bucket key turns an
  inequality join (which Catalyst can only nested-loop) into a hash
  join whose fan-out is bounded by interval_width/bucket + 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    salt_buckets: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the LARGEST
    right_ts <= left_ts for the same `on` key (backward as-of,
    inclusive — DuckDB ASOF JOIN semantics). Unmatched left rows keep
    NULL right columns (left join). `tolerance` (an INTERVAL string,
    e.g. "10 minutes") drops matches older than left_ts - tolerance.

    Right payload columns are renamed `<col><suffix>`; the matched
    right timestamp is `<right_ts><suffix>`.

    `salt_buckets`: skew mitigation for a dominating key (a bot user,
    a default session id) that would concentrate one window partition.
    Left rows spread across `salt_buckets` sub-partitions by a
    deterministic row hash; right rows REPLICATE into every bucket, so
    each left row still sees the full right history for its key —
    results are exactly the original semantics (test-pinned). Cost:
    the right side shuffles salt_buckets×; use when left ≫ right per
    hot key (events vs. snapshots, the as-of shape). The partition key
    becomes (on, salt), so max partition size drops by ~salt_buckets.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = [right_ts, *right_cols]

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in payload],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    part_cols = [on]
    if salt_buckets is not None and salt_buckets > 1:
        # left: deterministic row-hash bucket over the HASHABLE left
        # columns (xxhash64 rejects MapType; ties on identical hashed
        # tuples share a bucket — harmless); right: one copy per
        # bucket via a generator, map-side
        hashable = [
            c for c, t in left.dtypes if not t.startswith("map")
        ] or [on]
        l_tagged = l_tagged.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in hashable]),
                F.lit(salt_buckets),
            ).cast("int"),
        )
        r_tagged = r_tagged.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        ).withColumn("__salt", F.col("__salt").cast("int"))
        part_cols = [on, "__salt"]
    u = l_tagged.unionByName(r_tagged)
    # side 0 sorts before side 1 at equal ts → right rows at exactly
    # left_ts are visible to the left row (inclusive >=)
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        on,
        "__ts",
        "__side",
        *[F.col(c) for c in left.columns if c != on],
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side", "__ts")
    if tolerance is not None:
        matched_ts = F.col(f"{right_ts}{suffix}")
        keep = matched_ts.isNotNull() & (
            matched_ts >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
        )
        out = out.select(
            on,
            *[F.col(c) for c in left.columns if c != on],
            *[
                F.when(keep, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in payload
            ],
        )
    return out


def duckdb_asof_join(
    left_sql: str,
    right_sql: str,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> str:
    """Oracle twin over DuckDB's native ASOF JOIN (no tolerance form)."""
    right_cols = right_cols or []
    sel_r = ", ".join(
        [f"r.{right_ts} AS {right_ts}{suffix}"]
        + [f"r.{c} AS {c}{suffix}" for c in right_cols]
    )
    return f"""
        SELECT l.*, {sel_r}
        FROM ({left_sql}) l
        ASOF LEFT JOIN ({right_sql}) r
          ON l.{on} = r.{on} AND l.{left_ts} >= r.{right_ts}
    """


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Attach every interval row containing the point (start <= ts <
    end, same key) — inner join, one output row per containment.

    Physical shape: both sides map to fixed-width ts buckets (points
    to one bucket, intervals to every bucket they overlap), so the
    containment becomes an equi-join on (key, bucket) + the exact
    predicate. Long intervals fan out proportionally to their length;
    pick `bucket_seconds` near the typical interval width.
    """
    w = F.lit(bucket_seconds).cast("long")
    p = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / w),
                F.floor(F.unix_timestamp(F.col(end_ts)) / w),
            )
        ),
    )
    joined = p.join(iv, [on, "__bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__bucket")
