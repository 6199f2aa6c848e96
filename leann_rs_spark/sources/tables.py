"""Readers for the driver's parquet tables.

`events.parquet` stores TIMESTAMP(NANOS) which Spark's parquet reader
rejects by default (PARQUET_TYPE_ILLEGAL) and DuckDB truncates to
micros. Reading with an explicit LongType schema works on any session —
no config needed — and `ts = timestamp_micros(ts_ns div 1000)` then
matches DuckDB's value exactly (truncation, verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as a proper TIMESTAMP (micros) + ts_ns raw nanos."""
    raw = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        # `div` = exact integer division; a double-precision `/ 1000`
        # loses the low bits of ns-epoch longs (~2^60) → off-by-1µs vs
        # DuckDB's exact ns→µs truncation of the same parquet column
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        F.col("ts").alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
