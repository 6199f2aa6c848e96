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


def test_upsert_hive_escaped_and_typed_partition_values(spark, tmp_path):
    """Partition values Spark hive-escapes (':' → %3A) or renders
    differently than Python str() (True → 'true') must still be
    swapped: the swap list is discovered from the directories Spark
    actually wrote under tmp, never re-formatted in Python. Before
    that fix the swap was silently skipped and the partition's updates
    discarded while counts reported them applied."""
    import os

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "esc")
    spark.createDataFrame(
        [(1, "en:US", True, "a"), (2, "de", False, "b")],
        "id long, src string, flag boolean, v string",
    ).write.partitionBy("src", "flag").parquet(p)
    # the escaped directory really is escaped on disk
    assert any("%3A" in d for d in os.listdir(p)), os.listdir(p)
    res = upsert_parquet(
        spark, p,
        spark.createDataFrame(
            [(1, "en:US", True, "A"), (9, "en:US", True, "z")],
            "id long, src string, flag boolean, v string",
        ),
        "id",
        partition_cols=["src", "flag"],
    )
    assert res == {"updated": 1, "inserted": 1, "total": 3}
    rows = {r["id"]: (r["src"], r["flag"], r["v"])
            for r in spark.read.parquet(p).collect()}
    # partition type inference reads booleans back as strings — what
    # matters here is that the escaped/typed dirs were SWAPPED
    assert rows == {
        1: ("en:US", "true", "A"), 2: ("de", "false", "b"),
        9: ("en:US", "true", "z"),
    }
    assert not os.path.isdir(p + "__upserting")


def test_upsert_empty_update_batch_is_a_noop(spark, tmp_path):
    """A zero-row update batch short-circuits (the partitioned path
    would otherwise build no predicate) and reports zero changes."""
    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "empty")
    spark.createDataFrame(
        [(1, "en", "a")], "id long, lang string, v string"
    ).write.partitionBy("lang").parquet(p)
    empty = spark.createDataFrame([], "id long, lang string, v string")
    for parts in ("lang", None):
        res = upsert_parquet(spark, p, empty, "id", partition_cols=parts)
        assert res == {"updated": 0, "inserted": 0, "total": 1}
    rows = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert rows == {1: "a"}


def test_upsert_finishes_crashed_mid_loop_swap_batch(spark, tmp_path):
    """A crash in the middle of the per-partition swap loop leaves a
    manifest-bearing tmp; the NEXT call finishes the pending swaps
    (the updates are committed data) instead of rmtree-ing them away."""
    import json
    import os
    import shutil

    from leann_rs_spark.sources.warehouse import (
        _UPSERT_MANIFEST,
        upsert_parquet,
    )

    p = str(tmp_path / "mid")
    spark.createDataFrame(
        [(1, "en", "a"), (2, "de", "b")], "id long, lang string, v string"
    ).write.partitionBy("lang").parquet(p)
    # Simulate a crashed upsert that was applying {1→A (en), 2→B (de)}:
    # tmp holds the fully-written merged output + manifest, and the en
    # swap already completed (its dir moved out of tmp into live).
    tmp = p + "__upserting"
    spark.createDataFrame(
        [(1, "en", "A"), (2, "de", "B")], "id long, lang string, v string"
    ).write.partitionBy("lang").parquet(tmp)
    with open(os.path.join(tmp, _UPSERT_MANIFEST), "w") as fh:
        json.dump(["lang=en", "lang=de"], fh)
    shutil.rmtree(os.path.join(p, "lang=en"))
    os.rename(os.path.join(tmp, "lang=en"), os.path.join(p, "lang=en"))
    # crash here; next call must roll the de swap FORWARD
    res = upsert_parquet(
        spark, p,
        spark.createDataFrame(
            [(9, "fr", "z")], "id long, lang string, v string"
        ),
        "id",
        partition_cols="lang",
    )
    assert res == {"updated": 0, "inserted": 1, "total": 3}
    rows = {r["id"]: (r["lang"], r["v"])
            for r in spark.read.parquet(p).collect()}
    assert rows == {1: ("en", "A"), 2: ("de", "B"), 9: ("fr", "z")}
    assert not os.path.isdir(tmp)


def test_upsert_partition_stability_check(spark, tmp_path):
    """check_partition_stability=True turns the documented constraint
    (an update key must not also live under an untouched partition
    value) into a hard error instead of a silent duplicate key."""
    import pytest

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "stab")
    spark.createDataFrame(
        [(1, "en", "a"), (2, "de", "b")], "id long, lang string, v string"
    ).write.partitionBy("lang").parquet(p)
    moved = spark.createDataFrame(
        [(1, "de", "MOVED")], "id long, lang string, v string"
    )
    with pytest.raises(ValueError, match="partition-stability"):
        upsert_parquet(
            spark, p, moved, "id",
            partition_cols="lang", check_partition_stability=True,
        )
    # table untouched by the refused merge
    assert spark.read.parquet(p).count() == 2
    # without the check the documented outcome is the duplicate key
    res = upsert_parquet(spark, p, moved, "id", partition_cols="lang")
    assert res["total"] == 3
    ids = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert ids == [1, 1, 2]


def test_upsert_stability_check_catches_null_partition_stray(spark, tmp_path):
    """A stale duplicate key living in a NULL-partition directory
    (__HIVE_DEFAULT_PARTITION__, e.g. written by another tool) must
    trip the opt-in check: pred is NULL for such rows and a non-null-
    safe ~pred would silently exclude them (ADVICE r6)."""
    import pytest

    from leann_rs_spark.sources.warehouse import upsert_parquet

    p = str(tmp_path / "nullstab")
    spark.createDataFrame(
        [(1, "en", "a"), (2, None, "ghost")],
        "id long, lang string, v string",
    ).write.partitionBy("lang").parquet(p)
    moved = spark.createDataFrame(
        [(2, "en", "MOVED")], "id long, lang string, v string"
    )
    with pytest.raises(ValueError, match="partition-stability"):
        upsert_parquet(
            spark, p, moved, "id",
            partition_cols="lang", check_partition_stability=True,
        )
    assert spark.read.parquet(p).count() == 2


def test_table_stats_exact_measures_with_nulls(spark):
    """n / n_null / exact ndv / rounded min-max per column, long
    format, one row per column, NULL-bearing columns counted right."""
    from leann_rs_spark.sources.warehouse import table_stats

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 10.0), (None, 2.5)],
        "a long, b double",
    )
    rows = {r["col_name"]: r for r in table_stats(df, ["a", "b"]).collect()}
    assert list(rows) == ["a", "b"]
    a, b = rows["a"], rows["b"]
    assert (a["n"], a["n_null"], a["ndv"]) == (3, 1, 3)
    assert (a["min_r"], a["max_r"]) == (1.0, 3.0)
    assert (b["n"], b["n_null"], b["ndv"]) == (3, 1, 2)
    assert (b["min_r"], b["max_r"]) == (2.5, 10.0)


def test_diff_tables_classifies_added_removed_changed(spark):
    """Full-outer snapshot diff: unchanged rows vanish, NULL-bearing
    payloads compare null-safely (NULL == NULL is unchanged)."""
    from leann_rs_spark.sources.warehouse import diff_tables

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "id long, tag string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "C", 3.0), (5, "e", 5.0)],
        "id long, tag string, v double",
    )
    got = {
        r["id"]: r["change"]
        for r in diff_tables(base, new, ["id"]).collect()
    }
    # 1 unchanged (absent), 2 unchanged via NULL==NULL (absent)
    assert got == {3: "changed", 4: "removed", 5: "added"}

    # a NULL KEY never joins: the base-side row classifies as removed
    # (side presence, not key nullness — the twin's __bp/__np flags)
    base_n = spark.createDataFrame(
        [(None, "x", 0.0)], "id long, tag string, v double"
    )
    new_n = spark.createDataFrame(
        [], "id long, tag string, v double"
    )
    rows = diff_tables(base_n, new_n, ["id"]).collect()
    assert [(r["id"], r["change"]) for r in rows] == [(None, "removed")]


def test_table_stats_approx_ndv_scale_path(spark):
    """exact=False swaps the ndv measure for HLL++ in the same plan
    shape: identical schema, counts/min/max unchanged, ndv within the
    sketch's tolerance."""
    from leann_rs_spark.sources.warehouse import table_stats

    df = spark.range(5000).selectExpr("id", "id % 97 AS k")
    ex = {r["col_name"]: r for r in table_stats(df, ["id", "k"]).collect()}
    ap = {
        r["col_name"]: r
        for r in table_stats(df, ["id", "k"], exact=False).collect()
    }
    for c in ("id", "k"):
        assert (ap[c]["n"], ap[c]["n_null"]) == (ex[c]["n"], ex[c]["n_null"])
        assert (ap[c]["min_r"], ap[c]["max_r"]) == (
            ex[c]["min_r"], ex[c]["max_r"],
        )
        assert abs(ap[c]["ndv"] - ex[c]["ndv"]) <= 0.1 * ex[c]["ndv"]


def test_diff_tables_empty_sides(spark):
    """Empty new -> all removed; empty base -> all added; both empty ->
    no rows (never a crash on degenerate snapshots)."""
    from leann_rs_spark.sources.warehouse import diff_tables

    sch = "id long, v double"
    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], sch)
    empty = spark.createDataFrame([], sch)
    assert {
        (r["id"], r["change"]) for r in diff_tables(base, empty, ["id"]).collect()
    } == {(1, "removed"), (2, "removed")}
    assert {
        (r["id"], r["change"]) for r in diff_tables(empty, base, ["id"]).collect()
    } == {(1, "added"), (2, "added")}
    assert diff_tables(empty, empty, ["id"]).count() == 0


def test_diff_tables_refuses_key_only_tables(spark):
    """With no non-key columns to compare, side presence via struct
    nullness has no fallback (F.struct() with zero fields fails
    downstream, and the twin's ROW() would be invalid SQL): refuse
    loudly (ADVICE r7)."""
    import pytest

    from leann_rs_spark.sources.warehouse import diff_tables

    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(2,), (3,)], "k long")
    with pytest.raises(ValueError, match="non-key column"):
        diff_tables(a, b, ["k"])
