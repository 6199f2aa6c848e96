"""Z-order layout (sources/layout.py): Morton-key arithmetic and the
file-pruning locality it exists to buy."""

from pyspark.sql import functions as F


def test_zorder_key_interleaves_bucket_bits(spark):
    """2-bit, 2-column grid over [0,3]×[0,3]: buckets equal the values
    themselves, so zkey must be the textbook Morton number."""
    from leann_rs_spark.sources.layout import with_zorder_key

    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in with_zorder_key(df, ["x", "y"], bits=2).collect()
    }

    def morton(x: int, y: int) -> int:
        z = 0
        for b in range(2):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    # value 3 = max lands in the clamped top bucket (still 3 at 2 bits)
    assert got == {(x, y): morton(x, y) for x, y in rows}
    assert min(got.values()) == 0 and max(got.values()) == 15


def test_zorder_key_constant_and_null_columns(spark):
    """A constant column has span 0 → bucket 0 for every row (the key
    degrades to the other columns); NULLs bucket to 0, never NULL."""
    from leann_rs_spark.sources.layout import with_zorder_key

    df = spark.createDataFrame(
        [(1, 7.0), (2, 7.0), (None, 7.0)], "x int, c double"
    )
    rows = with_zorder_key(df, ["x", "c"], bits=4).collect()
    assert all(r["zkey"] is not None for r in rows)
    # c contributes nothing: zkey is x's bucket interleaved with zeros
    ks = {r["x"]: r["zkey"] for r in rows}
    assert ks[None] == 0 and ks[1] == 0  # x=1 is the min → bucket 0
    assert ks[2] > 0


def test_zorder_confines_queries_on_every_dimension(spark, tmp_path):
    """The point of the layout, on a uniform 2-D grid: a filter on the
    dimension a 1-D sort IGNORES lives in every file of that layout,
    but in a bounded fraction of the z-ordered one; and a small 2-D box
    lives in a corner of the z-ordered layout. ("lives in" = files
    holding matching rows, via input_file_name — the per-file min/max
    envelope a stats-pruning reader skips by.)"""
    from leann_rs_spark.sources.layout import zorder_write

    n = 64
    rows = [(a, b, a * n + b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a int, b int, v long")
    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(df, zp, ["a", "b"], bits=6, files=16)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lp)
    )

    def touched(path: str, pred) -> int:
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    assert spark.read.parquet(zp).count() == n * n
    # the dimension the 1-D layout ignores: b<8 rows sit in EVERY
    # a-sorted file, but only in the b-low stripes of the z-curve
    lin_b = touched(lp, F.col("b") < 8)
    z_b = touched(zp, F.col("b") < 8)
    assert lin_b >= 15  # effectively all 16 files
    assert z_b <= lin_b // 2
    # a 1/64 box lives in the z-origin corner
    assert touched(zp, (F.col("a") < 8) & (F.col("b") < 8)) <= 2


def test_zorder_key_is_python_free_broadcast_projection(spark):
    """The key computation is native: one min/max aggregate broadcast
    back (BroadcastNestedLoopJoin over a 1-row frame), then a pure
    projection — no Python stage anywhere in the plan."""
    from leann_rs_spark.sources.layout import with_zorder_key

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "a int, b double"
    )
    plan = (
        with_zorder_key(df, ["a", "b"], bits=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_zorder_empty_and_single_row(spark, tmp_path):
    """Degenerate inputs: an empty frame writes an empty (readable)
    layout; a single row gets zkey 0 (span 0 on every column)."""
    from leann_rs_spark.sources.layout import with_zorder_key, zorder_write

    empty = spark.createDataFrame([], "a int, b double")
    p = str(tmp_path / "e")
    zorder_write(empty, p, ["a", "b"], bits=4, files=2)
    assert spark.read.parquet(p).count() == 0
    one = spark.createDataFrame([(3, 7.0)], "a int, b double")
    rows = with_zorder_key(one, ["a", "b"], bits=4).collect()
    assert rows[0]["zkey"] == 0


def test_zorder_key_nan_parity_with_twin(spark):
    """A NaN value buckets to 0 in BOTH engines (Spark floor(NaN) is 0
    while DuckDB CAST(floor('NaN') AS BIGINT) errors — ADVICE r7), and
    one NaN row must not poison the min/max span for every other row
    (both engines sort NaN above all doubles)."""
    import math

    import duckdb

    from leann_rs_spark.sources.layout import (
        duckdb_zorder_key,
        with_zorder_key,
    )

    rows = [(1, 0.0, 10), (2, float("nan"), 20), (3, 8.0, 30)]
    df = spark.createDataFrame(rows, "id int, v double, u int")
    got = {
        r["id"]: r["zkey"]
        for r in with_zorder_key(df, ["v", "u"], bits=4).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'CAST(' + chr(39) + 'NaN' + chr(39) + ' AS DOUBLE)' if math.isnan(v) else v}, {u})"
            for i, v, u in rows
        )
        + ") t(id, v, u)"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT id, zkey FROM ({duckdb_zorder_key(['v', 'u'], bits=4)})"
        ).fetchall()
    }
    assert got == want
    # NaN row buckets v to 0; the other rows keep a finite span
    assert got[2] is not None
    assert got[3] > got[1]
