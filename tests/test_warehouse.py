"""Bucketed warehouse tables (sources/warehouse.py): spec round-trip,
append with a stable layout, overwrite rebuild. The no-shuffle plan
property lives in test_plans.py."""

from pyspark.sql import functions as F

from leann_rs_spark.sources.warehouse import (
    bucket_spec,
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_round_trip_and_spec(spark, tmp_path):
    od = spark.read.parquet(f"{SF}/orders.parquet")
    try:
        write_bucketed(
            od, "tw_orders", str(tmp_path / "od"), "o_orderkey", 4,
            sort_cols="o_orderkey",
        )
        back = read_bucketed(spark, "tw_orders")
        assert back.count() == od.count()
        assert sorted(back.columns) == sorted(od.columns)
        spec = bucket_spec(spark, "tw_orders")
        assert spec == {
            "n_buckets": 4,
            "bucket_cols": ["o_orderkey"],
            "sort_cols": ["o_orderkey"],
        }
    finally:
        drop_bucketed(spark, "tw_orders")


def test_bucketed_append_keeps_spec(spark, tmp_path):
    od = spark.read.parquet(f"{SF}/orders.parquet")
    half1 = od.filter(F.col("o_orderkey") % 2 == 0)
    half2 = od.filter(F.col("o_orderkey") % 2 == 1)
    try:
        write_bucketed(half1, "tw_app", str(tmp_path / "a"), "o_orderkey", 4)
        write_bucketed(
            half2, "tw_app", str(tmp_path / "a"), "o_orderkey", 4,
            mode="append",
        )
        assert read_bucketed(spark, "tw_app").count() == od.count()
        assert bucket_spec(spark, "tw_app")["n_buckets"] == 4
    finally:
        drop_bucketed(spark, "tw_app")


def test_bucketed_overwrite_replaces_rows(spark, tmp_path):
    od = spark.read.parquet(f"{SF}/orders.parquet")
    try:
        write_bucketed(od, "tw_ow", str(tmp_path / "o"), "o_orderkey", 4)
        write_bucketed(
            od.limit(10), "tw_ow", str(tmp_path / "o2"), "o_orderkey", 2
        )
        assert read_bucketed(spark, "tw_ow").count() == 10
        assert bucket_spec(spark, "tw_ow")["n_buckets"] == 2
    finally:
        drop_bucketed(spark, "tw_ow")


def test_unbucketed_table_has_empty_spec(spark, tmp_path):
    od = spark.read.parquet(f"{SF}/orders.parquet")
    try:
        od.write.format("parquet").option(
            "path", str(tmp_path / "p")
        ).saveAsTable("tw_plain")
        assert bucket_spec(spark, "tw_plain") == {}
    finally:
        drop_bucketed(spark, "tw_plain")


def test_upsert_parquet_semantics(spark, tmp_path):
    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).write.parquet(p)
    res = upsert_parquet(
        spark, p,
        spark.createDataFrame([(2, "B"), (9, "z")], "id long, v string"),
        "id",
    )
    assert res == {"updated": 1, "inserted": 1, "total": 4}
    rows = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 9: "z"}


def test_upsert_parquet_refuses_duplicate_keys(spark, tmp_path):
    import pytest

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    with pytest.raises(ValueError, match="key-unique"):
        upsert_parquet(
            spark, p,
            spark.createDataFrame(
                [(1, "x"), (1, "y")], "id long, v string"
            ),
            "id",
        )
    # table untouched by the refused upsert
    assert spark.read.parquet(p).count() == 1


def test_upsert_parquet_rejects_null_keys(spark, tmp_path):
    import pytest

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "t3")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    with pytest.raises(ValueError, match="key-non-null"):
        upsert_parquet(
            spark, p,
            spark.createDataFrame(
                [(None, "x"), (2, "y")], "id long, v string"
            ),
            "id",
        )
    assert spark.read.parquet(p).count() == 1


def test_upsert_parquet_partition_pruned(spark, tmp_path):
    """partition_cols: only partitions present in the update batch are
    rewritten — untouched partition files keep their inodes (the proof
    the base bytes were never moved, not just value-equal)."""
    import os

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "pt")
    spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "de", "c"), (4, "fr", "d")],
        "id long, lang string, v string",
    ).write.partitionBy("lang").parquet(p)

    def inodes(part):
        d = os.path.join(p, f"lang={part}")
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    de_before, fr_before = inodes("de"), inodes("fr")
    res = upsert_parquet(
        spark, p,
        spark.createDataFrame(
            [(2, "en", "B"), (9, "en", "z"), (7, "it", "new")],
            "id long, lang string, v string",
        ),
        "id",
        partition_cols="lang",
    )
    assert res == {"updated": 1, "inserted": 2, "total": 6}
    rows = {r["id"]: (r["lang"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert rows == {
        1: ("en", "a"), 2: ("en", "B"), 3: ("de", "c"),
        4: ("fr", "d"), 9: ("en", "z"), 7: ("it", "new"),
    }
    # untouched partitions: identical files, byte-for-byte never moved
    assert inodes("de") == de_before
    assert inodes("fr") == fr_before


def test_upsert_parquet_recovers_crashed_swap(spark, tmp_path):
    """A crash between rename(path, old) and rename(tmp, path) leaves
    only `path__old`; the next call restores it before merging."""
    import os

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "cr")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).write.parquet(p)
    os.rename(p, p + "__old")  # simulate the crash window
    res = upsert_parquet(
        spark, p,
        spark.createDataFrame([(2, "B")], "id long, v string"),
        "id",
    )
    assert res == {"updated": 1, "inserted": 0, "total": 2}
    rows = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert rows == {1: "a", 2: "B"}
    assert not os.path.isdir(p + "__old")


def test_upsert_parquet_cleans_stale_backup_and_partition_leftover(
    spark, tmp_path
):
    """A stale `__old` beside a healthy live table (crash after the
    second rename) is discarded; a partition-level `lang=v__old`
    leftover is healed before partition discovery can read it as a
    bogus partition."""
    import os
    import shutil

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "st")
    spark.createDataFrame(
        [(1, "en", "a"), (2, "de", "b")], "id long, lang string, v string"
    ).write.partitionBy("lang").parquet(p)
    # stale table-level backup + crashed partition-level swap window
    shutil.copytree(p, p + "__old")
    os.rename(os.path.join(p, "lang=de"), os.path.join(p, "lang=de__old"))
    res = upsert_parquet(
        spark, p,
        spark.createDataFrame(
            [(1, "en", "A")], "id long, lang string, v string"
        ),
        "id",
        partition_cols="lang",
    )
    assert res == {"updated": 1, "inserted": 0, "total": 2}
    rows = {r["id"]: (r["lang"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert rows == {1: ("en", "A"), 2: ("de", "b")}
    assert not os.path.isdir(p + "__old")
    assert not os.path.isdir(os.path.join(p, "lang=de__old"))
