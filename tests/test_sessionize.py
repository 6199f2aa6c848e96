"""Sessionization: batch gaps-and-islands vs DuckDB oracle, and the
applyInPandasWithState streaming twin vs the batch semantics."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from leann_rs_spark.sources.tables import read_events
from leann_rs_spark.streaming import (
    duckdb_sessionize,
    sessionize_events,
    stream_sessionize_events,
)

from conftest import SF_SMOKE

GAP = "30 minutes"
TIMEOUT_S = 120


def _norm(df: pd.DataFrame) -> list[tuple]:
    df = df.copy()
    df["sum_value"] = df["sum_value"].round(6)
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    return sorted(df[cols].itertuples(index=False, name=None))


def test_batch_sessionize_matches_duckdb(spark):
    got = sessionize_events(read_events(spark, SF_SMOKE), gap=GAP).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    want = con.execute(duckdb_sessionize(GAP)).df()
    assert _norm(got) == _norm(want)
    assert len(got) > 0


def test_batch_sessionize_gap_boundaries(spark):
    # events exactly `gap` apart stay in ONE session (strict > gap splits)
    rows = [
        (1, "2026-01-01 00:00:00", 7, "a", 1.0, "{}"),
        (2, "2026-01-01 00:30:00", 7, "a", 2.0, "{}"),  # == gap → same
        (3, "2026-01-01 01:00:01", 7, "a", 4.0, "{}"),  # > gap → new
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sessionize_events(ev, gap=GAP).orderBy("session_start").collect()
    assert [(r["n_events"], r["sum_value"]) for r in out] == [(2, 3.0), (1, 4.0)]


def test_stream_sessionize_matches_batch(spark, tmp_path):
    events = read_events(spark, SF_SMOKE).filter(F.col("user_id") < 20)
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    events.drop("ts_ns").write.parquet(inp) if "ts_ns" in events.columns else events.write.parquet(inp)

    q = stream_sessionize_events(spark, inp, outp, ckpt, gap=GAP, watermark="1 minutes")
    assert q.awaitTermination(TIMEOUT_S), "stream did not drain"

    got = _norm(spark.read.parquet(outp).toPandas())
    want = _norm(sessionize_events(events, gap=GAP).toPandas())
    # stream emits gap-closed + timed-out sessions; each emitted session
    # must exist identically in the batch result, and most sessions close
    # (only each user's trailing open session can be withheld)
    assert set(got) <= set(want)
    n_users = events.select("user_id").distinct().count()
    assert len(got) >= len(want) - n_users
    assert len(got) > 0


def test_batch_sessionize_property(spark):
    """Property check vs a pure-Python gaps-and-islands reference over
    deterministic generated event sets (dense bursts, exact-gap edges,
    many/few users)."""
    import datetime as dt

    gap_s = 1800.0
    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # deterministic pseudo-random offsets from a simple LCG
    seed = 12345

    def nxt():
        nonlocal seed
        seed = (seed * 1103515245 + 12345) % (2**31)
        return seed

    for user in range(7):
        t = 0.0
        for _ in range(40):
            step = [1.0, 10.0, 1799.999, 1800.0, 1800.001, 9000.0][nxt() % 6]
            t += step
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(seconds=t), user, "e",
                 float(nxt() % 100), "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = sessionize_events(ev, gap=GAP).toPandas()

    # python reference: sort per user, strict > gap splits
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r[2]].append(r)
    want = []
    for user, evs in by_user.items():
        evs.sort(key=lambda r: (r[1], r[0]))
        cur = None
        for r in evs:
            if cur is None or (r[1] - cur["end"]).total_seconds() > gap_s:
                if cur is not None:
                    want.append(cur)
                cur = {"user": user, "start": r[1], "end": r[1],
                       "n": 1, "s": r[4]}
            else:
                cur["end"] = r[1]
                cur["n"] += 1
                cur["s"] += r[4]
        if cur is not None:
            want.append(cur)
    want_t = sorted(
        (w["user"], w["start"], w["end"], w["n"], round(w["s"], 6))
        for w in want
    )
    assert _norm(got) == want_t


def test_stream_sessionize_ms_boundary_semantics(spark, tmp_path):
    """Spark tracks event-time watermarks and GroupState timeouts at
    TRUNCATED milliseconds while timestamps carry microseconds. The
    gate oracle's emission rule is floor_ms(session_end) + gap_ms <
    floor_ms(max_ts) - wm_ms — pin both sides of that boundary: a
    timeout EQUAL to the watermark at ms precision must hold (even
    though a µs-precision comparison would emit), one 1 ms below must
    emit."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    gap_wm_s = 1800  # gap = watermark = 30 minutes

    def run(tag, tmax_us):
        rows = [
            # user 1: a single event with a 100 µs component — its
            # timeout is floor_ms = base + 1800 s exactly
            (1, base + dt.timedelta(microseconds=100), 1, "e", 1.0, "{}"),
            # user 2 defines max event time (its own trailing session is
            # always held)
            (2, base + dt.timedelta(seconds=3600, microseconds=tmax_us),
             2, "e", 1.0, "{}"),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        d = str(tmp_path / tag)
        ev.coalesce(1).write.parquet(f"{d}/in")
        from leann_rs_spark.streaming.sessionize import (
            stream_sessionize_events,
        )

        q = stream_sessionize_events(
            spark, f"{d}/in", f"{d}/out", f"{d}/ckpt",
            gap="30 minutes", watermark="30 minutes",
        )
        assert q.awaitTermination(120)
        return {
            r["user_id"] for r in spark.read.parquet(f"{d}/out").collect()
        }

    # watermark floor_ms = base+1800.000 == timeout → NOT fired (strict <)
    assert run("hold", 900) == set()
    # watermark floor_ms = base+1800.001 > timeout → fired
    assert run("emit", 1900) == {1}
