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
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach one right row for the same `on` key
    by `direction` (the polars join_asof / pandas merge_asof surface):

    - "backward" (default): the LARGEST right_ts <= left_ts
      (inclusive — DuckDB ASOF JOIN semantics);
    - "forward": the SMALLEST right_ts >= left_ts;
    - "nearest": whichever of the two is closer by |Δts|, ties to the
      backward match (the earlier right row).

    Unmatched left rows keep NULL right columns (left join).
    `tolerance` (an INTERVAL string, e.g. "10 minutes") drops matches
    farther than the tolerance in the match direction (both
    directions for "nearest" — the nearer VALID side wins).

    Forward reuses the same union-sort single-Exchange shape with the
    window ordered descending; nearest evaluates both windows over
    the one exchange (same partitioning → Catalyst reuses it; the
    second sort is in-partition) and chooses per row.

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

    # the right payload is carried as ONE STRUCT, not per-column: a
    # right row with a NULL payload value must still match AS A ROW
    # (per-column last(ignorenulls) would stitch fields from different
    # right rows — DuckDB's ASOF, like any join, is row-atomic)
    rtypes = dict(right.dtypes)
    pay_type = "struct<" + ", ".join(
        f"`{c}{suffix}`: {rtypes[c]}" for c in payload
    ) + ">"
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c != on],
        F.lit(None).cast(pay_type).alias("__pay"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c != on],
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in payload]
        ).alias("__pay"),
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
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    u = l_tagged.unionByName(r_tagged)
    # side 0 sorts before side 1 at equal ts (in BOTH orderings) →
    # right rows at exactly left_ts are visible to the left row
    # (inclusive <= / >=)
    w_b = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _carry(w, alias):
        return F.last(F.col("__pay"), ignorenulls=True).over(w).alias(alias)

    if direction == "nearest":
        carry_cols = [_carry(w_b, "__b"), _carry(w_f, "__f")]
    else:
        carry_cols = [_carry(w_b if direction == "backward" else w_f, "__m")]
    carried = u.select(
        on,
        "__ts",
        "__side",
        *[F.col(c) for c in left.columns if c != on],
        *carry_cols,
    )
    out = carried.filter(F.col("__side") == 1).drop("__side", "__ts")
    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None
    lts = F.col(left_ts)
    if direction == "nearest":
        bts = F.col("__b")[f"{right_ts}{suffix}"]
        fts = F.col("__f")[f"{right_ts}{suffix}"]
        valid_b = bts.isNotNull() & (
            F.lit(True) if tol is None else (bts >= lts - tol)
        )
        valid_f = fts.isNotNull() & (
            F.lit(True) if tol is None else (fts <= lts + tol)
        )
        # ties (equal distance) go backward — the earlier right row.
        # distances compare as INTERVAL subtractions: wall-clock linear
        # for NTZ (no epoch cast, no DST nonlinearity — the
        # sessionize.py trap) and instant-linear for LTZ; the oracle's
        # naive-timestamp subtraction is the same arithmetic
        pick_b = valid_b & (~valid_f | ((lts - bts) <= (fts - lts)))
        chosen = (
            F.when(pick_b, F.col("__b"))
            .when(valid_f, F.col("__f"))
            .alias("__m")
        )
        out = out.select(
            on, *[F.col(c) for c in left.columns if c != on], chosen
        )
    elif tolerance is not None:
        matched_ts = F.col("__m")[f"{right_ts}{suffix}"]
        in_tol = (
            matched_ts >= lts - tol
            if direction == "backward"
            else matched_ts <= lts + tol
        )
        out = out.select(
            on,
            *[F.col(c) for c in left.columns if c != on],
            F.when(matched_ts.isNotNull() & in_tol, F.col("__m")).alias("__m"),
        )
    return out.select(
        on,
        *[F.col(c) for c in left.columns if c != on],
        *[F.col("__m")[f"{c}{suffix}"].alias(f"{c}{suffix}") for c in payload],
    )


def duckdb_asof_join(
    left_sql: str,
    right_sql: str,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    left_id: str | None = None,
) -> str:
    """Oracle twin over DuckDB's native ASOF JOIN (no tolerance form).
    direction maps to the ASOF inequality (>= backward, <= forward);
    "nearest" composes both ASOF joins and picks per row — it needs
    `left_id`, a unique left key to stitch the two matches together."""
    right_cols = right_cols or []
    payload = [right_ts, *right_cols]
    if direction in ("backward", "forward"):
        op = ">=" if direction == "backward" else "<="
        sel_r = ", ".join(
            [f"r.{right_ts} AS {right_ts}{suffix}"]
            + [f"r.{c} AS {c}{suffix}" for c in right_cols]
        )
        return f"""
            SELECT l.*, {sel_r}
            FROM ({left_sql}) l
            ASOF LEFT JOIN ({right_sql}) r
              ON l.{on} = r.{on} AND l.{left_ts} {op} r.{right_ts}
        """
    if direction != "nearest":
        raise ValueError(f"unknown direction {direction!r}")
    if left_id is None:
        raise ValueError("nearest twin needs left_id")
    b_sel = ", ".join(f"r.{c} AS __b_{c}" for c in payload)
    f_sel = ", ".join(f"r.{c} AS __f_{c}" for c in payload)
    pick = ", ".join(
        f"CASE WHEN __pick_b THEN __b_{c} "
        f"WHEN __f_{right_ts} IS NOT NULL THEN __f_{c} END AS {c}{suffix}"
        for c in payload
    )
    return f"""
        WITH B AS (
            SELECT l.*, {b_sel}
            FROM ({left_sql}) l
            ASOF LEFT JOIN ({right_sql}) r
              ON l.{on} = r.{on} AND l.{left_ts} >= r.{right_ts}
        ),
        FW AS (
            SELECT l.{left_id} AS __lid, {f_sel}
            FROM ({left_sql}) l
            ASOF LEFT JOIN ({right_sql}) r
              ON l.{on} = r.{on} AND l.{left_ts} <= r.{right_ts}
        ),
        J AS (
            SELECT B.*, {", ".join(f"FW.__f_{c}" for c in payload)},
                   (__b_{right_ts} IS NOT NULL AND (
                        __f_{right_ts} IS NULL
                        OR ({left_ts} - __b_{right_ts})
                           <= (__f_{right_ts} - {left_ts})
                   )) AS __pick_b
            FROM B JOIN FW ON B.{left_id} = FW.__lid
        )
        SELECT * EXCLUDE ({", ".join(
            ["__pick_b"]
            + [f"__b_{c}" for c in payload]
            + [f"__f_{c}" for c in payload]
        )}), {pick}
        FROM J
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


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe EQUI-join — the generic form of `asof_join`'s
    salt_buckets: the big side scatters each row into one of `salt`
    buckets by a deterministic full-row hash (retries scatter
    identically; bucket choice never affects which rows match), the
    dim side replicates `salt`× via ONE map-side explode, and the join
    runs on (key, bucket) — a hot key's rows land on `salt` reducers
    instead of one straggler task.

    The repo's join ladder at 100 TB: (1) broadcast a small dim;
    (2) AQE skew-join splits oversized shuffle partitions at runtime;
    (3) THIS — when the dim is too big to broadcast AND the skew is
    known and extreme, or a deterministic plan is required regardless
    of runtime statistics. Salting only refines the shuffle key, never
    the semantics: the gate's oracle is the PLAIN join (x_salted_join).

    `how` supports inner/left: the left side keeps exactly one bucket
    per row, so unmatched left rows survive once. Dim rows are assumed
    unique per key (the usual dim contract — duplicates would
    duplicate matches exactly as in the plain join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # xxhash64 rejects MapType (same guard as asof_join's salt path);
    # rows identical on the hashable columns sharing a bucket is
    # harmless — bucket choice never affects which rows match
    hashable = [c for c, t in big.dtypes if not t.startswith("map")] or keys
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(salt))
    big2 = big.withColumn("__salt", bucket.cast("int"))
    dim2 = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return big2.join(dim2, keys + ["__salt"], how).drop("__salt")
