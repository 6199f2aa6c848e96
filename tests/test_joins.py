"""Temporal joins: as-of (backward, inclusive, tolerance) and bucketed
interval containment — hand vectors, brute-force parity, plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.joins import asof_join, interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:05"), 100.0),
            (1, _ts("2024-01-01 10:00:10"), 101.0),
            (1, _ts("2024-01-01 09:59:00"), 99.0),   # before any quote
            (2, _ts("2024-01-01 10:00:07"), 200.0),
        ],
        "user_id long, ts timestamp, price double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 10:00:05"), 2.0),   # tie with trade 1
            (1, _ts("2024-01-01 10:00:09"), 3.0),
            (2, _ts("2024-01-01 09:00:00"), 9.0),
            (3, _ts("2024-01-01 10:00:00"), 7.0),   # key with no trades
        ],
        "user_id long, ts timestamp, quote double",
    )


def test_asof_backward_inclusive(spark, trades, quotes):
    out = {
        (r["user_id"], r["price"]): (r["ts_right"], r["quote_right"])
        for r in asof_join(trades, quotes, on="user_id").collect()
    }
    # equal timestamps match (inclusive)
    assert out[(1, 100.0)] == (_ts("2024-01-01 10:00:05"), 2.0)
    assert out[(1, 101.0)] == (_ts("2024-01-01 10:00:09"), 3.0)
    # no prior quote -> NULLs, left row kept
    assert out[(1, 99.0)] == (None, None)
    # match from an hour earlier still counts without tolerance
    assert out[(2, 200.0)] == (_ts("2024-01-01 09:00:00"), 9.0)
    assert len(out) == 4


def test_asof_tolerance(spark, trades, quotes):
    out = {
        (r["user_id"], r["price"]): r["quote_right"]
        for r in asof_join(
            trades, quotes, on="user_id", tolerance="10 minutes"
        ).collect()
    }
    assert out[(2, 200.0)] is None  # stale match dropped
    assert out[(1, 101.0)] == 3.0   # fresh match kept
    assert len(out) == 4            # left rows always kept


def test_asof_single_exchange(trades, quotes):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(trades, quotes, on="user_id").explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("(1) ")[0]  # tree section only (details repeat names)
    # union-sort method: exactly one exchange (the key window), no
    # nested-loop range join anywhere
    assert tree.count("Exchange") == 1, plan
    assert "NestedLoop" not in plan, plan


def test_asof_matches_brute_force_on_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    got = {
        r["event_id"]: (r["ts_right"], r["v_right"])
        for r in asof_join(clicks, views, on="user_id", right_cols=["v"]).collect()
    }
    vs = [(r["user_id"], r["ts"], r["v"]) for r in views.collect()]
    for c in clicks.collect():
        cands = [(t, v) for (u, t, v) in vs if u == c["user_id"] and t <= c["ts"]]
        want = max(cands, key=lambda x: x[0]) if cands else (None, None)
        assert got[c["event_id"]] == want, c


def test_interval_join_containment(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:30:00"), "a"),
            (1, _ts("2024-01-01 13:00:00"), "b"),   # in no interval
            (2, _ts("2024-01-01 10:30:00"), "c"),   # other key
        ],
        "user_id long, ts timestamp, tag string",
    )
    ivs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "s1"),
            (1, _ts("2024-01-01 10:15:00"), _ts("2024-01-01 10:45:00"), "s2"),
            (2, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00"), "s3"),
        ],
        "user_id long, start_ts timestamp, end_ts timestamp, sid string",
    )
    got = sorted(
        (r["tag"], r["sid"])
        for r in interval_join(points, ivs, on="user_id", bucket_seconds=600).collect()
    )
    assert got == [("a", "s1"), ("a", "s2")]
    # end exclusive
    edge = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), "e")],
        "user_id long, ts timestamp, tag string",
    )
    assert interval_join(edge, ivs, on="user_id").count() == 0


def test_asof_salted_exact_semantics(spark, trades, quotes):
    """salt_buckets must be invisible in the results: every left row
    still sees the full right history for its key (right rows
    replicate into every bucket)."""
    base = sorted(
        (r["user_id"], r["price"], r["ts_right"], r["quote_right"])
        for r in asof_join(trades, quotes, on="user_id").collect()
    )
    for b in (2, 4, 7):
        salted = sorted(
            (r["user_id"], r["price"], r["ts_right"], r["quote_right"])
            for r in asof_join(
                trades, quotes, on="user_id", salt_buckets=b
            ).collect()
        )
        assert salted == base, f"salt_buckets={b}"


def test_asof_salted_exact_on_skewed_events(spark):
    """90 %-single-key skew: the salted form must still be exact vs the
    unsalted one (and vs tolerance interplay)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # concentrate most rows on one key — the hot-key regime salting is for
    skew = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(7)).otherwise(F.col("user_id")),
    )
    clicks = skew.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = skew.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    key = lambda df: sorted(
        (r["event_id"], r["ts_right"], r["v_right"]) for r in df.collect()
    )
    base = key(asof_join(clicks, views, on="user_id", right_cols=["v"]))
    salted = key(
        asof_join(clicks, views, on="user_id", right_cols=["v"], salt_buckets=8)
    )
    assert salted == base


def test_asof_salted_partitions_by_salt(trades, quotes):
    """The salted window's partition key must include the salt column —
    otherwise the hot key still lands in one partition."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(trades, quotes, on="user_id", salt_buckets=4).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "__salt" in plan
    assert "hashpartitioning" in plan and "__salt" in plan.split(
        "hashpartitioning", 1
    )[1]


def test_asof_salted_with_map_column(spark):
    """xxhash64 rejects MapType — the salt hash must skip map columns
    instead of failing at plan time on frames carrying map payloads."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), {"a": "1"}),
         (1, _ts("2024-01-01 10:00:10"), {"b": "2"})],
        "user_id long, ts timestamp, attrs map<string,string>",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0)],
        "user_id long, ts timestamp, quote double",
    )
    out = asof_join(left, right, on="user_id", salt_buckets=4).collect()
    assert len(out) == 2
    assert all(r["quote_right"] == 1.0 for r in out)


# --- direction: forward / nearest -----------------------------------------

def _asof_map(df):
    return {
        (r["user_id"], r["ts"]): (r["ts_right"], r["quote_right"])
        for r in df.collect()
    }


def test_asof_forward_hand_vectors(trades, quotes):
    out = _asof_map(
        asof_join(trades, quotes, on="user_id", right_cols=["quote"],
                  direction="forward")
    )
    # trade 10:00:05 has a quote AT 10:00:05 (inclusive)
    assert out[(1, _ts("2024-01-01 10:00:05"))][1] == 2.0
    # trade 10:00:10: no later quote -> NULL
    assert out[(1, _ts("2024-01-01 10:00:10"))] == (None, None)
    # trade 09:59:00: next quote is 10:00:00
    assert out[(1, _ts("2024-01-01 09:59:00"))][1] == 1.0
    # user 2's only quote is earlier -> NULL forward
    assert out[(2, _ts("2024-01-01 10:00:07"))] == (None, None)


def test_asof_nearest_hand_vectors(trades, quotes):
    out = _asof_map(
        asof_join(trades, quotes, on="user_id", right_cols=["quote"],
                  direction="nearest")
    )
    # 10:00:05: backward match is AT the ts (distance 0) -> 2.0
    assert out[(1, _ts("2024-01-01 10:00:05"))][1] == 2.0
    # 10:00:10: backward 10:00:09 (1s) beats nothing forward
    assert out[(1, _ts("2024-01-01 10:00:10"))][1] == 3.0
    # 09:59:00: only forward exists (10:00:00)
    assert out[(1, _ts("2024-01-01 09:59:00"))][1] == 1.0
    # user 2: only backward exists
    assert out[(2, _ts("2024-01-01 10:00:07"))][1] == 9.0


def test_asof_nearest_tie_goes_backward(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), 0.0)],
        "user_id long, ts timestamp, price double",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:03"), 11.0),
         (1, _ts("2024-01-01 10:00:07"), 22.0)],
        "user_id long, ts timestamp, quote double",
    )
    out = asof_join(left, right, on="user_id", right_cols=["quote"],
                    direction="nearest").head()
    assert out["quote_right"] == 11.0  # equal 2s distance -> backward


def test_asof_forward_tolerance(trades, quotes):
    out = _asof_map(
        asof_join(trades, quotes, on="user_id", right_cols=["quote"],
                  direction="forward", tolerance="30 seconds")
    )
    # 09:59:00 -> next quote 10:00:00 is 60s away: outside tolerance
    assert out[(1, _ts("2024-01-01 09:59:00"))] == (None, None)
    assert out[(1, _ts("2024-01-01 10:00:05"))][1] == 2.0


def test_asof_unknown_direction_raises(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="user_id", direction="sideways")


def test_asof_nearest_tolerance_nearer_side_invalid(spark):
    """The nearer side out of tolerance, the farther side within: the
    valid side must win (the 'nearest VALID match' rule)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 0.0)],
        "user_id long, ts timestamp, price double",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 11.0),  # backward, 60 min away
            (1, _ts("2024-01-01 10:05:00"), 22.0),  # forward, 5 min away
        ],
        "user_id long, ts timestamp, quote double",
    )
    # no tolerance: forward is nearer
    out = asof_join(left, right, on="user_id", right_cols=["quote"],
                    direction="nearest").head()
    assert out["quote_right"] == 22.0
    # tolerance 10 min: forward still valid, backward not -> forward
    out = asof_join(left, right, on="user_id", right_cols=["quote"],
                    direction="nearest", tolerance="10 minutes").head()
    assert out["quote_right"] == 22.0
    # tolerance 2 min: neither valid -> NULL
    out = asof_join(left, right, on="user_id", right_cols=["quote"],
                    direction="nearest", tolerance="2 minutes").head()
    assert out["quote_right"] is None and out["ts_right"] is None
    # flip: nearer FORWARD invalid, farther BACKWARD valid
    right2 = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:55:00"), 11.0),  # backward, 5 min
            (1, _ts("2024-01-01 10:01:00"), 22.0),  # forward, 1 min
        ],
        "user_id long, ts timestamp, quote double",
    )
    out = asof_join(
        left, right2.filter(F.col("quote") != 0), on="user_id",
        right_cols=["quote"], direction="nearest",
    ).head()
    assert out["quote_right"] == 22.0  # unconstrained: forward nearer
    # (hypothetical regression target: a tolerance covering only the
    # backward side must pick backward even though forward is nearer)
    out = asof_join(left, right2, on="user_id", right_cols=["quote"],
                    direction="nearest", tolerance="30 seconds").head()
    assert out["quote_right"] is None  # neither within 30s


def test_asof_null_payload_stays_row_atomic(spark):
    """A right row with a NULL payload value must match AS A ROW: the
    output may not stitch its ts with an older row's value (the
    per-column-carry bug class; DuckDB ASOF is row-atomic)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), 0.0)],
        "user_id long, ts timestamp, price double",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:01"), 5.0),
            (1, _ts("2024-01-01 10:00:04"), None),  # latest prior: NULL value
        ],
        "user_id long, ts timestamp, quote double",
    )
    out = asof_join(left, right, on="user_id", right_cols=["quote"]).head()
    assert out["ts_right"] == _ts("2024-01-01 10:00:04")
    assert out["quote_right"] is None  # NOT 5.0 from the older row


def test_salted_join_equals_plain_join_under_skew(spark):
    """90% of probe rows share one key: the salted result must be the
    plain join row-for-row, for inner and left (including unmatched
    left rows surviving exactly once)."""
    from leann_rs_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(i, 7 if i % 10 else i) for i in range(500)], "row_id long, k long"
    )
    dim = spark.createDataFrame(
        [(7, "hot"), (10, "cold"), (20, "cold")], "k long, tag string"
    )
    for how in ("inner", "left"):
        want = sorted(
            tuple(r) for r in big.join(dim, "k", how)
            .select("row_id", "k", "tag").collect()
        )
        got = sorted(
            tuple(r) for r in salted_join(big, dim, "k", salt=4, how=how)
            .select("row_id", "k", "tag").collect()
        )
        assert got == want
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, dim, "k", how="outer")


def test_salted_join_shuffles_on_key_plus_bucket(spark):
    """With broadcast off, the shuffle key must include the salt
    bucket — that's the whole point (a hot key spreads over `salt`
    reducers)."""
    from leann_rs_spark.operators.joins import salted_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.range(1000).select(
            F.col("id").alias("row_id"), (F.col("id") % 5).alias("k")
        )
        dim = spark.range(5).select(
            F.col("id").alias("k"), F.lit("t").alias("tag")
        )
        plan = (
            salted_join(big, dim, "k", salt=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan
        # the exchange hashes on (k, __salt), not k alone
        import re

        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert parts and all("__salt" in p for p in parts if "k#" in p)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_with_map_column(spark):
    """xxhash64 rejects MapType — the bucket hash must skip map
    columns instead of failing at plan time."""
    from leann_rs_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(1, 7, {"a": "1"}), (2, 7, {"b": "2"}), (3, 8, {"c": "3"})],
        "row_id long, k long, attrs map<string,string>",
    )
    dim = spark.createDataFrame([(7, "hot")], "k long, tag string")
    got = sorted(
        (r["row_id"], r["tag"])
        for r in salted_join(big, dim, "k", salt=4).collect()
    )
    assert got == [(1, "hot"), (2, "hot")]


def test_salted_join_empty_sides(spark):
    """Empty dim -> inner empty / left keeps all; empty big -> empty."""
    from leann_rs_spark.operators.joins import salted_join

    big = spark.createDataFrame([(1, 7), (2, 8)], "row_id long, k long")
    nodim = spark.createDataFrame([], "k long, tag string")
    assert salted_join(big, nodim, "k").count() == 0
    left = salted_join(big, nodim, "k", how="left").collect()
    assert sorted(r["row_id"] for r in left) == [1, 2]
    assert all(r["tag"] is None for r in left)
    nobig = spark.createDataFrame([], "row_id long, k long")
    dim = spark.createDataFrame([(7, "t")], "k long, tag string")
    assert salted_join(nobig, dim, "k").count() == 0
