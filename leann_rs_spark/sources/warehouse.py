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


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str] | str,
) -> dict:
    """MERGE INTO over a plain parquet directory: rows in `updates`
    REPLACE base rows sharing their key, new keys are inserted — the
    Delta/Iceberg MERGE shape for parquet-only environments (document
    re-crawls, metadata corrections, label fixes feeding the dedup
    and curation operators).

    Physical shape: ONE left-anti hash join of base against the
    distinct update keys (drops superseded rows) + union, written to
    a sibling directory and atomically swapped — a crash mid-write
    leaves the live table intact (same recipe as
    catalog.compact_ivf_index). At 100 TB, partition the table and
    prune the base scan to the partitions present in `updates` so
    untouched partitions are never rewritten; the join itself
    broadcast-hashes when the update batch is small.

    `updates` must be key-unique (one winner per key is ill-defined
    otherwise) — validated, ValueError if violated. Returns
    {"updated": n, "inserted": n, "total": n}.
    """
    import os
    import shutil

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    n_updates = updates.count()
    n_distinct = updates.select(keys).distinct().count()
    if n_distinct != n_updates:
        raise ValueError(
            f"updates must be key-unique on {keys}: "
            f"{n_updates} rows, {n_distinct} distinct keys"
        )
    base = spark.read.parquet(path)
    kept = base.join(
        updates.select(keys).distinct(), keys, "left_anti"
    )
    n_base = base.count()
    out = kept.unionByName(updates)
    tmp = path.rstrip("/") + "__upserting"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # leftover from a crashed upsert
    out.write.parquet(tmp)
    n_kept = spark.read.parquet(tmp).count() - n_updates
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    updated = n_base - n_kept
    return {
        "updated": updated,
        "inserted": n_updates - updated,
        "total": n_kept + n_updates,
    }
