"""Shared utilities: deterministic dense id assignment at scale.

The reference threads a driver-side sequential u64 counter through its
chunkers (/root/reference/src/cli/build.rs:286-298,
src/chunker/simple.rs:38-40). The naive Spark translation —
`row_number()` over an unpartitioned Window — funnels every row through
ONE task, a non-starter at 100 TB. `with_dense_index` produces the same
ids with a two-phase plan:

1. range-repartition + in-partition sort on the ordering key (one
   shuffle — the unavoidable cost of a globally-ordered id),
2. per-partition row counts (a few hundred longs to the driver),
3. map-side `offset[pid] + local_rank` — no second shuffle.

Determinism requires the ordering key to be a total order (unique);
callers pass e.g. (doc_id, chunk_index).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def with_dense_index(
    df: DataFrame,
    order_cols: list[str],
    idx_col: str = "idx",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based (or `start`-based) BIGINT index following the
    total order of `order_cols`, without a global single-task window."""
    np_ = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # repartitionByRange runs a SAMPLING pass over the input to pick
    # range bounds, then the real pass — an expensive upstream (the
    # Python chunker in the build path) would run twice. Persist the
    # input so both passes read the materialized rows.
    df = df.persist()
    parted = (
        df.repartitionByRange(np_, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
    )
    parted = parted.persist()
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in parted.schema.fields if f.name != "__pid"]
        + [T.StructField(idx_col, T.LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = offsets.get(pid, 0) + pos.get(pid, 0)
            pos[pid] = pos.get(pid, 0) + len(pdf)
            out = pdf.drop(columns="__pid")
            out[idx_col] = range(base, base + len(pdf))
            yield out

    return parted.mapInPandas(assign, schema=out_schema)
