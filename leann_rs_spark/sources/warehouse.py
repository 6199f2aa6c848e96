"""Bucketed warehouse tables: pre-shuffled layouts for co-located joins.

At 100 TB the dominant cost of the engine's repeated join/agg shapes
(fact ⋈ dimension on a stable key, dedup-cluster lookups, postings ⋈
doc metadata) is the Exchange on the fact side. Spark's bucketed
tables move that shuffle to WRITE time: `bucketBy(n, key)` hashes rows
into a fixed number of buckets per table, the catalog records the
spec, and every later equi-join or aggregation on the bucket key reads
the co-located layout with NO Exchange (pinned by
tests/test_plans.py::test_bucketed_join_has_no_exchange). One write,
arbitrarily many shuffle-free reads — the same reason the BM25
postings (catalog.py) and IVF clusters persist bucket/cluster
partitioned.

Reference parity note: the reference is a single-node engine and has
no distributed-layout concept; this module is part of the
beyond-reference 100 TB surface (like dedup/sampling). The bucket
count is the knob: pick it so one bucket of the FACT table fits an
executor (n_buckets ≈ table_bytes / 256 MB), and give both sides of a
recurring join the SAME count so neither shuffles.

Local/test note: tables are registered as EXTERNAL (explicit `path`)
so nothing lands in a default `spark-warehouse/` under the repo; a
cluster deployment would use the real metastore with the identical
calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as an external parquet table bucketed by
    `bucket_cols` into `n_buckets`. `sort_cols` additionally sorts
    within each bucket file (lets sort-merge joins skip their sort and
    range predicates skip row groups). `mode="append"` adds files with
    the same bucket spec — the incremental-ingest path."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    if mode == "overwrite":
        # saveAsTable(overwrite) on an existing EXTERNAL table keeps the
        # old files; drop first so the layout is rebuilt cleanly.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    `spark.read.parquet(path)` would lose it and reintroduce the
    shuffle)."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def bucket_spec(spark: SparkSession, name: str) -> dict:
    """The recorded layout: {n_buckets, bucket_cols, sort_cols} (empty
    dict when the table is not bucketed) — lets callers assert two
    sides of a recurring join agree before relying on co-location."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return {}

    def _cols(v: str) -> list[str]:
        return [c.strip(" `") for c in v.strip("[]").split(",") if c.strip()]

    return {
        "n_buckets": int(info["Num Buckets"]),
        "bucket_cols": _cols(info.get("Bucket Columns", "")),
        "sort_cols": _cols(info.get("Sort Columns", "")),
    }


def _recover_swap(live: str) -> None:
    """Crash recovery for the two-rename sibling swap (`live` ↔
    `live__old`): a crash between `rename(live, old)` and
    `rename(tmp, live)` leaves no live directory — restore the backup;
    a crash after the second rename but before `rmtree(old)` leaves a
    stale backup beside a healthy live — discard it. Idempotent, run
    on entry by every operator that uses the swap."""
    import os
    import shutil

    old = live.rstrip("/") + "__old"
    if os.path.isdir(old):
        if os.path.exists(live):
            shutil.rmtree(old)  # swap completed, cleanup didn't
        else:
            os.rename(old, live)  # swap died mid-window; restore


def _swap_in(live: str, tmp: str) -> None:
    """Replace `live` with `tmp` via the recoverable two-rename swap."""
    import os
    import shutil

    old = live.rstrip("/") + "__old"
    if os.path.exists(live):
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)
    else:
        os.rename(tmp, live)  # brand-new partition directory


_UPSERT_MANIFEST = "_LEANN_UPSERT_MANIFEST.json"


def _partition_dirs(root: str, parts: list[str]) -> list[str]:
    """Relative `col=value/...` partition directories actually present
    under `root`, discovered by walking the hive layout (NOT by
    re-formatting values in Python: Spark %-escapes special characters
    via ExternalCatalogUtils.escapePathName and renders bools/dates/
    floats differently than str(), so only the directories Spark itself
    wrote are authoritative)."""
    import os

    rels: list[str] = []

    def rec(d: str, depth: int, rel: str) -> None:
        if depth == len(parts):
            rels.append(rel)
            return
        prefix = parts[depth] + "="
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if os.path.isdir(p) and name.startswith(prefix):
                rec(p, depth + 1, os.path.join(rel, name) if rel else name)

    rec(root, 0, "")
    return rels


def _touched_pruned_base(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    partition_cols: list[str],
):
    """The pruned base scan the partitioned upsert merges against: an
    OR of per-tuple conjunctions over the update batch's (collected,
    batch-bounded) distinct partition tuples. The predicate compares
    typed column values (not directory strings), so it reaches the scan
    as PartitionFilters and untouched directories are never read.
    Exposed as its own function so tests can assert pruning on the
    operator's OWN plan (tests/test_plans.py), not a hand-rebuilt one.
    Returns (pruned_base, touched_tuples, predicate)."""
    from pyspark.sql import functions as F

    touched = [
        tuple(r[c] for c in partition_cols)
        for r in updates.select(partition_cols).distinct().collect()
    ]
    base = spark.read.parquet(path)
    pred = None
    for t in touched:
        conj = None
        for c, v in zip(partition_cols, t):
            cl = F.col(c) == F.lit(v)
            conj = cl if conj is None else (conj & cl)
        pred = conj if pred is None else (pred | conj)
    if pred is not None:
        base = base.filter(pred)
    return base, touched, pred


def _finish_pending_swaps(path: str, tmp: str) -> bool:
    """Complete a partitioned upsert that crashed mid-swap: the
    manifest written into `tmp` after the parquet write lists every
    partition directory pending a swap; directories already swapped
    have been renamed OUT of tmp, so re-running `_swap_in` for the rels
    still present finishes the batch instead of silently dropping it
    (rmtree-ing a manifest-bearing tmp would discard applied-but-
    unswapped updates). Returns True if a manifest was found and the
    pending swaps were completed."""
    import json
    import os
    import shutil

    mpath = os.path.join(tmp, _UPSERT_MANIFEST)
    if not os.path.isfile(mpath):
        return False
    rels = json.load(open(mpath))
    for rel in rels:
        src = os.path.join(tmp, rel)
        dst = os.path.join(path.rstrip("/"), rel)
        _recover_swap(dst)
        if os.path.isdir(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            _swap_in(dst, src)
    shutil.rmtree(tmp)
    return True


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str] | str,
    partition_cols: list[str] | str | None = None,
    check_partition_stability: bool = False,
) -> dict:
    """MERGE INTO over a plain parquet directory: rows in `updates`
    REPLACE base rows sharing their key, new keys are inserted — the
    Delta/Iceberg MERGE shape for parquet-only environments (document
    re-crawls, metadata corrections, label fixes feeding the dedup
    and curation operators).

    Physical shape: ONE left-anti hash join of base against the
    distinct update keys (drops superseded rows) + union, written to
    a sibling directory and swapped in via a recoverable two-rename
    (a crash at any point either leaves the live table intact or is
    repaired by the next call's `_recover_swap`).

    100 TB path — `partition_cols`: when the base table is laid out
    hive-partitioned on these columns (written with
    `df.write.partitionBy(*cols)`), only the partitions PRESENT IN THE
    UPDATE BATCH are scanned, anti-joined, rewritten, and swapped;
    every other partition directory is untouched (rewrite bytes ∝
    touched partitions, not table size). Constraint: the partition
    value of a key must be stable — a base row's key must not exist
    under a partition value the update batch doesn't carry for that
    key, otherwise the pruned scan cannot see (and so cannot replace)
    it, and the merge silently leaves BOTH rows (duplicate key: the
    stale one in the unscanned partition plus the fresh one). In
    practice: include the partition columns in the key, or derive them
    deterministically from it. `check_partition_stability=True` makes
    the constraint a hard error instead: it semi-joins the update keys
    against the base OUTSIDE the touched partitions (a full-table scan
    of the key/partition columns — opt-in because it forfeits the
    pruning win) and raises ValueError on any hit.

    `updates` must be key-unique (one winner per key is ill-defined
    otherwise) and key-non-null (a NULL key never matches an anti-join
    and would duplicate instead of replace) — both validated in ONE
    aggregation job, ValueError if violated. Returns
    {"updated": n, "inserted": n, "total": n} (`total` counts via
    parquet footer metadata, no data scan).
    """
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    parts = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols or [])
    )
    _recover_swap(path.rstrip("/"))
    tmp = path.rstrip("/") + "__upserting"
    if os.path.isdir(tmp):
        # A manifest means a previous partitioned upsert crashed AFTER
        # its parquet write, mid-swap: finish its pending swaps (its
        # updates are committed data). No manifest means it crashed
        # during the write: nothing was swapped, discard.
        if not _finish_pending_swaps(path, tmp):
            shutil.rmtree(tmp)

    # All update-batch validation in one aggregation job: row count,
    # distinct-key count, NULL-key count (NULL partition values are
    # rejected too — hive's __HIVE_DEFAULT_PARTITION__ escape hatch is
    # not a merge target).
    null_cond = None
    for c in dict.fromkeys(keys + parts):
        cond = F.col(c).isNull()
        null_cond = cond if null_cond is None else (null_cond | cond)
    stats = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("nd"),
        F.sum(F.when(null_cond, 1).otherwise(0)).alias("nnull"),
    ).collect()[0]
    n_updates = stats["n"]
    if stats["nnull"]:
        raise ValueError(
            f"updates must be key-non-null on {keys + parts}: "
            f"{stats['nnull']} of {n_updates} rows carry a NULL"
        )
    if stats["nd"] != n_updates:
        raise ValueError(
            f"updates must be key-unique on {keys}: "
            f"{n_updates} rows, {stats['nd']} distinct keys"
        )
    if n_updates == 0:
        # Nothing to merge; the partitioned path would otherwise build
        # an empty predicate (filter(None) TypeError).
        return {
            "updated": 0,
            "inserted": 0,
            "total": spark.read.parquet(path).count(),
        }

    if parts:
        # Sweep partition-level swap leftovers BEFORE reading: a crash
        # mid-loop can leave `col=v__old` directories that hive
        # partition discovery would otherwise surface as bogus
        # partitions (value "v__old") with duplicate rows.
        root = path.rstrip("/")
        for dirpath, dirnames, _ in os.walk(root):
            for d in list(dirnames):
                if d.endswith("__old"):
                    _recover_swap(os.path.join(dirpath, d[: -len("__old")]))
                    dirnames.remove(d)

    if parts:
        base, touched, pred = _touched_pruned_base(
            spark, path, updates, parts
        )
        if check_partition_stability:
            # Opt-in validation of the stability constraint: any update
            # key that also lives OUTSIDE the touched partitions would
            # survive the pruned merge as a stale duplicate.
            # null-safe complement: a base row with a NULL partition
            # value (__HIVE_DEFAULT_PARTITION__ written by another
            # tool) makes `pred` NULL, and filter(~NULL) would drop it
            # from the stray scan — exactly the row that evades the
            # pruned merge (ADVICE r6)
            strays = (
                spark.read.parquet(path)
                .filter(~F.coalesce(pred, F.lit(False)))
                .join(updates.select(keys).distinct(), keys, "left_semi")
                .count()
            )
            if strays:
                raise ValueError(
                    f"partition-stability violated: {strays} base rows "
                    f"share an update key but live outside the update "
                    f"batch's partitions {parts}; merging would leave "
                    f"stale duplicates"
                )
    else:
        base = spark.read.parquet(path)
    kept = base.join(updates.select(keys).distinct(), keys, "left_anti")
    n_base = base.count()  # parquet footer count over the PRUNED scan
    out = kept.unionByName(updates)

    w = out.write
    if parts:
        w = w.partitionBy(*parts)
    w.parquet(tmp)
    n_kept = spark.read.parquet(tmp).count() - n_updates

    if parts:
        # Swap only the partition directories Spark actually wrote
        # under tmp (exactly the touched set: the pruned base and the
        # update batch both carry only touched tuples). Discovering
        # them by walking tmp — instead of re-formatting the collected
        # values in Python — keeps the swap correct for values Spark
        # hive-escapes ('=', '/', ':', '%', …) or renders differently
        # than str() (True→'true', dates, floats). The manifest makes
        # the non-atomic loop recoverable: a crash mid-loop is finished
        # (not discarded) by the next call's _finish_pending_swaps.
        touched_dirs = _partition_dirs(tmp, parts)
        if len(touched_dirs) != len(touched):
            raise RuntimeError(
                f"upsert wrote {len(touched_dirs)} partition dirs for "
                f"{len(touched)} touched partition tuples under {tmp}; "
                f"refusing to swap a mismatched set"
            )
        with open(os.path.join(tmp, _UPSERT_MANIFEST), "w") as fh:
            json.dump(touched_dirs, fh)
        for rel in touched_dirs:
            src = os.path.join(tmp, rel)
            dst = os.path.join(path.rstrip("/"), rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            _recover_swap(dst)
            _swap_in(dst, src)
        shutil.rmtree(tmp)
    else:
        _swap_in(path.rstrip("/"), tmp)
    updated = n_base - n_kept
    total = spark.read.parquet(path).count()
    return {
        "updated": updated,
        "inserted": n_updates - updated,
        "total": total,
    }


def table_stats(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """→ (col_name, n, n_null, ndv, min_r, max_r): exact per-column
    table statistics for numeric columns — the ANALYZE pass feeding
    layout/pruning decisions (which columns are selective enough to
    z-order or partition by, whether a dimension is broadcastable).
    ONE aggregation pass computes every measure (Spark expands the
    count-distincts inside a single exchange); the long format comes
    from a stack() unpivot of that 1-row frame, so adding columns
    never adds passes. ndv is EXACT (count distinct) — at 100 TB swap
    in approx_count_distinct for the same shape at a fraction of the
    cost; the gate pins the exact form so the twin can match values.
    `exact=False` IS that swap — approx_count_distinct (HLL++, default
    rsd 5%) replaces the expensive expand, everything else identical.
    min/max ride the 6-dp round(x·1e6)/1e6 recipe."""
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__n_{c}"),
            F.coalesce(
                F.sum(col.isNull().cast("long")), F.lit(0)
            ).cast("long").alias(f"__nn_{c}"),
            (
                F.countDistinct(col)
                if exact
                else F.approx_count_distinct(col)
            ).alias(f"__ndv_{c}"),
            (F.round(F.min(col.cast("double")) * F.lit(1e6)) / F.lit(1e6)
             + F.lit(0.0)).alias(f"__mn_{c}"),
            (F.round(F.max(col.cast("double")) * F.lit(1e6)) / F.lit(1e6)
             + F.lit(0.0)).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __ndv_{c}, __mn_{c}, __mx_{c}"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack})"
        " AS (col_name, n, n_null, ndv, min_r, max_r)"
    ).orderBy("col_name")


def duckdb_table_stats(cols: list[str], table: str) -> str:
    """SQL twin of `table_stats`: one SELECT per column UNION ALL'd —
    same exact measures, same rounding, same ordering."""
    parts = [
        f"""SELECT '{c}' AS col_name,
               count({c}) AS n,
               CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_null,
               count(DISTINCT {c}) AS ndv,
               round(min(CAST({c} AS DOUBLE)) * 1e6) / 1e6 + 0.0 AS min_r,
               round(max(CAST({c} AS DOUBLE)) * 1e6) / 1e6 + 0.0 AS max_r
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


def diff_tables(
    base: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """→ (key_cols..., change ∈ added|removed|changed): snapshot diff
    between two versions of a table — the audit view behind an upsert
    (what WILL this batch do?) and ingest monitoring (how much churned
    between snapshots?). ONE full-outer join on the key; unchanged
    rows are dropped. `compare_cols` defaults to every shared non-key
    column; comparison is null-safe (NULL ≡ NULL, the eqNullSafe of a
    MERGE condition). At 100 TB both sides shuffle once on the key —
    the same exchange the upsert itself would pay; pre-bucketed
    snapshots (write_bucketed) co-locate and skip it."""
    from pyspark.sql import functions as F

    compare_cols = compare_cols or [
        c for c in base.columns if c in set(new.columns) and c not in key_cols
    ]
    if not compare_cols:
        # a key-only table has no changed/unchanged distinction, and
        # side presence is detected via struct nullness — F.struct()
        # with zero fields fails (and the twin's ROW() would be
        # invalid SQL). Refuse loudly instead (ADVICE r7).
        raise ValueError(
            "diff_tables needs at least one non-key column to compare "
            f"(key_cols={key_cols!r} cover every shared column)"
        )
    b = base.select(
        *[F.col(c) for c in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__b"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__n"),
    )
    j = b.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__b").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(~F.col("__b").eqNullSafe(F.col("__n")), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def duckdb_diff_tables(
    base_sql: str,
    new_sql: str,
    key_cols: list[str],
    compare_cols: list[str],
) -> str:
    """SQL twin of `diff_tables`: same full-outer join, same null-safe
    row comparison (IS NOT DISTINCT FROM over the compare struct).
    Side presence is detected through injected TRUE flags, not key
    nullness — a base row whose KEY is NULL never joins and must
    classify as 'removed' (the Spark side's struct-null test), not
    'added'."""
    coal_keys = ", ".join(
        f"coalesce(b.{c}, n.{c}) AS {c}" for c in key_cols
    )
    on = " AND ".join(f"b.{c} = n.{c}" for c in key_cols)
    brow = "ROW(" + ", ".join(f"b.{c}" for c in compare_cols) + ")"
    nrow = "ROW(" + ", ".join(f"n.{c}" for c in compare_cols) + ")"
    return f"""
        SELECT * FROM (
            SELECT {coal_keys},
                   CASE WHEN b.__bp IS NULL THEN 'added'
                        WHEN n.__np IS NULL THEN 'removed'
                        WHEN NOT ({brow} IS NOT DISTINCT FROM {nrow})
                             THEN 'changed'
                   END AS change
            FROM (SELECT *, TRUE AS __bp FROM ({base_sql})) b
            FULL OUTER JOIN (SELECT *, TRUE AS __np FROM ({new_sql})) n
            ON {on}
        ) WHERE change IS NOT NULL
    """
