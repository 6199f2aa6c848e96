"""Streaming: ingest parity with the batch pipeline, windowed aggs,
watermark-bounded dedup. All with Trigger.AvailableNow on file sources."""

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.chunker import chunk_documents
from leann_rs_spark.operators.embedder import embed_documents
from leann_rs_spark.streaming import (
    stream_dedup_events,
    stream_ingest_documents,
    stream_windowed_event_stats,
    windowed_event_stats,
)

from conftest import SF_SMOKE

TIMEOUT_S = 120


def _drain(query):
    assert query.awaitTermination(TIMEOUT_S), "stream did not drain in time"


def test_stream_ingest_matches_batch(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "source", "text")
    )
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    docs.write.parquet(inp)

    q = stream_ingest_documents(
        spark, inp, outp, ckpt, dims=16, chunk_size=16, chunk_overlap=4
    )
    _drain(q)

    got = spark.read.parquet(outp)
    batch = chunk_documents(docs, strategy="auto", chunk_size=16, chunk_overlap=4)
    batch = batch.withColumn(
        "passage_id", F.xxhash64(F.col("doc_id"), F.col("chunk_index"))
    )
    want = embed_documents(batch, dims=16).select(
        "passage_id", "doc_id", "chunk_index", "source", "text", "embedding"
    )
    assert got.count() == want.count() > 0
    g = {r["passage_id"]: (r["text"], tuple(r["embedding"])) for r in got.collect()}
    w = {r["passage_id"]: (r["text"], tuple(r["embedding"])) for r in want.collect()}
    assert g == w


def test_stream_ingest_incremental_append(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    docs.filter(F.col("doc_id") < 5).write.mode("append").parquet(inp)
    _drain(stream_ingest_documents(spark, inp, outp, ckpt, dims=8, chunk_size=16, chunk_overlap=4))
    n1 = spark.read.parquet(outp).count()

    docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).write.mode(
        "append"
    ).parquet(inp)
    _drain(stream_ingest_documents(spark, inp, outp, ckpt, dims=8, chunk_size=16, chunk_overlap=4))
    out = spark.read.parquet(outp)
    n2 = out.count()
    # second drain processed ONLY the new files (checkpoint), appending
    assert n2 > n1
    assert out.select("passage_id").distinct().count() == n2


def test_windowed_stats_stream_prefix_of_batch(spark, tmp_path):
    from leann_rs_spark.sources.tables import read_events

    events = read_events(spark, SF_SMOKE).drop("ts_ns")
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    events.write.parquet(inp)

    _drain(stream_windowed_event_stats(
        spark, inp, outp, ckpt, window_duration="10 minutes", watermark="1 minutes"
    ))
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(outp).collect()
    }
    assert got, "append mode should emit closed windows"
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in windowed_event_stats(events, "10 minutes", "1 minutes").collect()
    }
    # stream emits only watermark-closed windows → subset of batch, equal values
    assert set(got) <= set(want)
    for k, v in got.items():
        assert want[k] == v
    # ...and it's a large subset (only the trailing window can be held back)
    assert len(got) >= len(want) - len({r[1] for r in want})


def test_stream_dedup(spark, tmp_path):
    from leann_rs_spark.sources.tables import read_events

    events = read_events(spark, SF_SMOKE).drop("ts_ns").limit(200)
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    events.write.mode("append").parquet(inp)
    events.write.mode("append").parquet(inp)  # duplicate every event

    _drain(stream_dedup_events(spark, inp, outp, ckpt))
    out = spark.read.parquet(outp)
    assert out.count() == out.select("event_id").distinct().count() == 200


def test_hopping_each_event_in_duration_over_slide_windows(spark):
    from leann_rs_spark.streaming.ingest import hopping_event_stats

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = hopping_event_stats(ev, "10 minutes", "5 minutes")
    total = out.agg(F.sum("n_events")).head()[0]
    assert total == 2 * ev.count()  # duration/slide = 2 windows per event


def test_hopping_batch_equals_stream(spark, tmp_path):
    import shutil

    from leann_rs_spark.streaming.ingest import hopping_event_stats

    # streaming watermarks require TIMESTAMP (not NTZ) event time
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in hopping_event_stats(ev, "10 minutes", "5 minutes").collect()
    }
    src = str(tmp_path / "src")
    shutil.copytree(f"{SF_SMOKE}", src, ignore=shutil.ignore_patterns("*"))
    ev.write.mode("overwrite").parquet(f"{src}/events")
    stream = (
        spark.readStream.schema(ev.schema).parquet(f"{src}/events")
    )
    q = (
        hopping_event_stats(stream, "10 minutes", "5 minutes")
        .writeStream.format("memory")
        .queryName("hoptest")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM hoptest").collect()
    }
    q.stop()
    assert got == batch


def test_stream_enrich_matches_batch_join(spark, tmp_path):
    from leann_rs_spark.streaming.ingest import stream_enrich_events

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    dim = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_acctbal"
    )
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(
        tmp_path / "ck"
    )
    events.write.parquet(inp)
    _drain(stream_enrich_events(spark, inp, outp, ckpt, dim))
    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.read.parquet(outp).collect()
    }
    want = {
        (r["event_id"], r["c_mktsegment"])
        for r in events.join(dim, "user_id", "left").collect()
    }
    assert got == want and len(got) == events.count()


def test_stream_enrich_missing_dim_row_flows_null(spark, tmp_path):
    from leann_rs_spark.streaming.ingest import stream_enrich_events

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, "click", 1.0, ""),
         (2, "2024-01-01 00:00:01", 99, "click", 2.0, "")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dim = spark.createDataFrame(
        [(10, "SEG", 5.0)], "user_id bigint, c_mktsegment string, c_acctbal double"
    )
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(
        tmp_path / "ck"
    )
    events.write.parquet(inp)
    _drain(stream_enrich_events(spark, inp, outp, ckpt, dim))
    rows = {r["event_id"]: r for r in spark.read.parquet(outp).collect()}
    assert rows[1]["c_mktsegment"] == "SEG"
    assert rows[2]["c_mktsegment"] is None  # left join: fact never dropped


def test_stream_stream_join_matches_batch_interval_join(spark, tmp_path):
    from leann_rs_spark.streaming.ingest import stream_stream_interval_join

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("left_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("right_id"), "user_id",
        F.col("ts").alias("rts"), "value",
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    clicks.write.parquet(lp)
    views.write.parquet(rp)
    _drain(
        stream_stream_interval_join(spark, lp, rp, outp, ckpt, gap="10 minutes")
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in spark.read.parquet(outp).collect()
    }
    want = {
        (r["left_id"], r["right_id"])
        for r in clicks.join(
            views,
            (clicks["user_id"] == views["user_id"])
            & (F.col("rts") >= F.col("ts") - F.expr("INTERVAL 10 minutes"))
            & (F.col("rts") <= F.col("ts")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_join_respects_interval_bounds(spark, tmp_path):
    """Hand vectors: view 11 min before the click is out; 5 min before
    is in; 1 min after is out."""
    from leann_rs_spark.streaming.ingest import stream_stream_interval_join

    clicks = spark.createDataFrame(
        [(1, 10, "2024-01-01 01:00:00")],
        "left_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    views = spark.createDataFrame(
        [
            (100, 10, "2024-01-01 00:49:00", 1.0),  # 11 min before: out
            (101, 10, "2024-01-01 00:55:00", 2.0),  # 5 min before: in
            (102, 10, "2024-01-01 01:01:00", 3.0),  # after: out
            (103, 99, "2024-01-01 00:55:00", 4.0),  # other user: out
        ],
        "right_id bigint, user_id bigint, rts string, value double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    clicks.write.parquet(lp)
    views.write.parquet(rp)
    _drain(stream_stream_interval_join(spark, lp, rp, outp, ckpt))
    rows = spark.read.parquet(outp).collect()
    assert [(r["left_id"], r["right_id"]) for r in rows] == [(1, 101)]


def test_multibatch_ivf_ingest_matches_batch_append(spark, tmp_path):
    """Incremental IVF append composes across micro-batches: 3 files
    fed one-per-trigger through foreachBatch append must yield the
    same SEARCH results (doc_id, text, score) as one batch append of
    all docs — ids may be assigned in a different order across
    batches, scores and hit sets may not differ."""
    from leann_rs_spark import catalog

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 40
    )
    first = docs.filter(F.col("doc_id") < 10)
    rest = docs.filter(F.col("doc_id") >= 10)

    whs = {m: str(tmp_path / f"wh_{m}") for m in ("stream", "batch")}
    for wh in whs.values():
        catalog.build_index(
            spark, wh, "g", first, chunk_size=16, chunk_overlap=4,
            dims=32, with_bm25=False,
        )
        catalog.build_ivf_index(
            spark, wh, "g", n_centroids=4, centroids="take"
        )
    catalog.append_to_index(
        spark, whs["batch"], "g", rest, ivf_append="incremental"
    )

    ind = str(tmp_path / "in")
    for lo, hi in ((10, 20), (20, 30), (30, 40)):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(ind)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ind)
    )

    def _ingest(batch_df, batch_id):
        if batch_df.count() > 0:
            catalog.append_to_index(
                spark, whs["stream"], "g", batch_df,
                ivf_append="incremental",
            )

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    def hits(wh):
        return sorted(
            (r["doc_id"], r["text"], round(r["score"], 9))
            for r in catalog.search_ivf_index(
                spark, wh, "g", "alpha beta", k=5, nprobe=4
            ).collect()
        )

    assert hits(whs["stream"]) == hits(whs["batch"])
    m_s = catalog.load_meta(whs["stream"], "g")
    m_b = catalog.load_meta(whs["batch"], "g")
    assert m_s.passage_count == m_b.passage_count
