"""Structured Streaming: incremental index ingest + event-stream operators.

The reference has NO stream processing (SURVEY §2.5) — its
`StreamingIndexBuilder` (/root/reference/src/index/builder.rs:132-149)
only means incremental disk writes to bound build memory. The Spark
rebuild gets true streaming for free from the same DataFrame code:

- `stream_ingest_documents`: the build pipeline (chunk → embed) bound
  to a file-source `readStream` with an append parquet sink — the
  semantic upgrade of StreamingIndexBuilder, plus exactly-once via
  checkpointing. New parquet drops into the input dir are chunked and
  embedded incrementally; `Trigger.AvailableNow` drains the backlog and
  stops (our test mode), a continuous trigger tails it in production.
  Passage ids: global dense ids need a total order over an unbounded
  stream, which doesn't exist — streaming rows get a STABLE id
  xxhash64(doc_id, chunk_index) instead (the batch path keeps dense
  row_number ids; same dedup key either way).
- `stream_windowed_event_stats`: watermarked tumbling-window
  aggregation over the events table — the canonical late-data-safe
  streaming agg (beyond-reference operator).
- `stream_dedup_events`: dropDuplicatesWithinWatermark on event_id —
  streaming exact dedup with bounded state.

Scale: file-source streams list incrementally (maxFilesPerTrigger
bounds batch size); state stores are keyed by (window) or (event_id)
and pruned by the watermark, so state is O(keys in watermark horizon),
not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from leann_rs_spark.operators.chunker import chunk_documents
from leann_rs_spark.operators.embedder import embed_documents


def stream_ingest_documents(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    schema: str = "doc_id bigint, source string, text string",
    dims: int = 64,
    chunk_size: int = 256,
    chunk_overlap: int = 128,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """documents parquet stream → passages+embeddings parquet (append).

    Returns the started StreamingQuery; callers awaitTermination/stop.
    Output rows: (passage_id, doc_id, chunk_index, source, text,
    embedding).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_path)

    chunks = chunk_documents(
        docs, strategy="auto", chunk_size=chunk_size, chunk_overlap=chunk_overlap
    )
    passages = chunks.withColumn(
        "passage_id", F.xxhash64(F.col("doc_id"), F.col("chunk_index"))
    )
    out = embed_documents(passages, dims=dims).select(
        "passage_id", "doc_id", "chunk_index", "source", "text", "embedding"
    )

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window stats per event_type. Works on BOTH a
    stream and a batch DataFrame (watermark is a no-op in batch — that
    equivalence is the correctness test)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hopping_event_stats(
    events: DataFrame,
    window_duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Hopping (sliding) window stats per event_type: each event counts
    toward duration/slide overlapping windows (trend smoothing /
    rate-over-trailing-window queries). Same batch↔stream duality as
    `windowed_event_stats` — F.window(duration, slide) explodes each
    row into its windows map-side, then ONE groupBy shuffle; at scale
    the shuffle volume is duration/slide × events, the knob to watch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration, slide).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_stats(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    schema: str = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ),
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
):
    """File-source stream → windowed stats → parquet (append on
    watermark close). `max_files_per_trigger` bounds each micro-batch
    to that many input files (AvailableNow still drains the backlog —
    in several batches — so multi-batch state/watermark behavior is
    testable deterministically)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_path)
    out = windowed_event_stats(events, window_duration, watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_events(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    schema: str = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ),
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
):
    """Streaming exact dedup on event_id with watermark-bounded state —
    the streaming twin of operators/dedup.exact_dedup."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_path)
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_enrich_events(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    dim: DataFrame,
    *,
    on: str = "user_id",
    schema: str = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ),
):
    """Stream-static enrichment join: each micro-batch of the event
    stream joins the (small) static dimension `dim` — pre-keyed on
    `on` — and the enriched rows append to parquet. The static side is
    broadcast into every batch (stream-static joins are stateless:
    no watermark, no state store — the planner re-reads/broadcasts the
    dim per trigger, which is exactly the desired physical shape when
    the dim fits an executor and the stream does not).

    Left join: an event with no dim row still flows (NULL attrs), so
    a lagging dimension load never drops facts. At 100 TB/day of
    events the dim stays a broadcast; a dim too big to broadcast is
    the cue to switch to the batch as-of/interval join operators.
    """
    events = spark.readStream.schema(schema).parquet(input_path)
    enriched = events.join(F.broadcast(dim), on, "left")
    return (
        enriched.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_interval_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    left_schema: str = "left_id bigint, user_id bigint, ts timestamp",
    right_schema: str = (
        "right_id bigint, user_id bigint, rts timestamp, value double"
    ),
):
    """Stream-STREAM inner join with an event-time interval: each left
    row (e.g. a click) joins every right row (e.g. a view) of the same
    user whose time falls in [left.ts − gap, left.ts] — the streaming
    twin of the batch interval join (operators/joins.py). Both sides
    carry watermarks and the join condition bounds event-time distance,
    which is exactly what lets Spark EVICT state: a buffered right row
    can be dropped once the left watermark passes rts + gap (and vice
    versa), so state is O(rows inside the watermark horizon), never
    O(stream). Without the time bound Spark rejects the stream-stream
    inner join outright — unbounded state.

    Output: (left_id, user_id, ts, right_id, rts, value), append mode;
    inner-join rows emit as soon as both sides have arrived.
    """
    left = (
        spark.readStream.schema(left_schema)
        .parquet(left_path)
        .withWatermark("ts", watermark)
    )
    right = (
        spark.readStream.schema(right_schema)
        .parquet(right_path)
        .withWatermark("rts", watermark)
    )
    joined = left.join(
        right,
        (left["user_id"] == right["user_id"])
        & (F.col("rts") >= F.col("ts") - F.expr(f"INTERVAL {gap}"))
        & (F.col("rts") <= F.col("ts")),
        "inner",
    ).select(
        "left_id", left["user_id"].alias("user_id"), "ts",
        "right_id", "rts", "value",
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
