"""Z-order (Morton-key) data layout for multi-dimensional scan pruning.

Parquet keeps per-row-group min/max statistics for every column, but a
layout sorted on ONE column makes those stats selective for that column
alone — a box predicate on two columns still opens every file. Bit-
interleaving per-column range-bucket ranks yields a single sort key
whose contiguous ranges are small hyper-rectangles: clustering by it
makes EVERY interleaved column's min/max tight per file, so a
multi-dimensional box touches O(box/corpus) files instead of all of
them. This is the public OPTIMIZE ZORDER idea (Delta Lake / Databricks
docs; Morton 1966) re-expressed as plain DataFrame ops:
`repartitionByRange(zkey) + sortWithinPartitions(zkey) + write`.

No reference counterpart (decisiongraph/leann-rs stores vector indexes,
not analytic tables — SURVEY §2 S7-S9 are row sinks); this is part of
the beyond-reference warehouse surface (sources/warehouse.py).

100 TB notes:
- The only full-width pass is the range repartition on zkey (one
  shuffle, same cost class as any re-layout); computing the key itself
  is a pure projection over broadcast 1-row stats.
- Stats come from ONE distributed min/max aggregate (never a collect of
  data rows); the 1-row frame rides `crossJoin(broadcast(...))` — the
  repo's corpus-stats pattern.
- Bucket arithmetic is shared with the DuckDB twin operation-for-
  -operation ((v − mn) · 2^bits / span, floor, clamp — identical IEEE
  sequences), so layouts are reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_DEFAULT_BITS = 8


def _bucket(v: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Range-bucket rank in [0, 2^bits): floor((v − mn) · 2^bits / span)
    clamped to the top bucket (v = mx lands in 2^bits − 1), 0 when the
    column is constant or the value is NULL or NaN. Double arithmetic
    in this exact operation order — the twin replays it bit-for-bit."""
    span = mx - mn
    dv = v.cast("double")
    scaled = F.floor(
        (dv - mn) * F.lit(float(2**bits)) / span
    ).cast("long")
    top = F.lit((1 << bits) - 1).cast("long")
    # NULL/NaN first: least()/greatest() IGNORE nulls in both engines
    # (a NULL would clamp to the top bucket), and a NaN diverges
    # cross-engine — Spark floor(NaN)::long is 0 while DuckDB's CAST
    # errors (ADVICE r7). Both land in bucket 0 explicitly.
    return (
        F.when(v.isNull() | F.isnan(dv), F.lit(0))
        .when(span > F.lit(0.0), F.least(scaled, top))
        .otherwise(F.lit(0))
        .cast("long")
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of bucket i lands at position
    b · ncols + i. A sum of shifted single bits — exact integer
    arithmetic, identical in both engines."""
    n = len(buckets)
    out: Column | None = None
    for b in range(bits):
        for i, bk in enumerate(buckets):
            term = F.shiftleft(
                F.shiftrightunsigned(bk, b).bitwiseAND(F.lit(1)),
                b * n + i,
            )
            out = term if out is None else (out + term)
    return out.cast("long")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = ZORDER_DEFAULT_BITS,
    key_col: str = "zkey",
) -> DataFrame:
    """→ df + `key_col`: the Morton key over `cols`. ONE distributed
    min/max aggregate feeds a broadcast 1-row stats frame; the key is
    then a pure projection (no per-row Python, no second pass)."""
    # NaN-excluding stats: both engines sort NaN above every double,
    # so ONE NaN row would make mx (and the span) NaN for EVERY row —
    # min/max over the non-NaN values keeps the layout meaningful and
    # cross-engine identical (NaN rows themselves bucket to 0)
    def _finite(c: str) -> Column:
        dv = F.col(c).cast("double")
        return F.when(~F.isnan(dv), dv)

    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(_finite(c)).alias(f"__mn_{c}"),
                F.max(_finite(c)).alias(f"__mx_{c}"),
            )
        ]
    )
    buckets = [
        _bucket(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        key_col, _interleave(buckets, bits)
    )
    return keyed.drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_DEFAULT_BITS,
    files: int = 32,
) -> None:
    """Cluster `df` by the Morton key over `cols` and write parquet:
    range-partition on zkey (contiguous key ranges per file → tight
    per-file min/max on every interleaved column), sort within
    partitions (tight ROW-GROUP stats inside each file), drop the key
    (it is derivable; layouts stay schema-transparent)."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def duckdb_zorder_key(
    cols: list[str],
    bits: int = ZORDER_DEFAULT_BITS,
    table: str = "events",
) -> str:
    """SQL twin of `with_zorder_key`'s key expression, as a SELECT
    over `table` with a 1-row stats cross join — same bucket
    arithmetic, same interleave, bit-identical keys. Exposes every
    source column plus zkey."""
    stats = ", ".join(
        f"min(CASE WHEN isnan(CAST({c} AS DOUBLE)) THEN NULL "
        f"ELSE CAST({c} AS DOUBLE) END) AS __mn_{c}, "
        f"max(CASE WHEN isnan(CAST({c} AS DOUBLE)) THEN NULL "
        f"ELSE CAST({c} AS DOUBLE) END) AS __mx_{c}"
        for c in cols
    )
    n = len(cols)
    bks = []
    for c in cols:
        span = f"(__mx_{c} - __mn_{c})"
        scaled = (
            f"CAST(floor((CAST({c} AS DOUBLE) - __mn_{c}) * {float(2**bits)!r}"
            f" / {span}) AS BIGINT)"
        )
        bks.append(
            f"(CASE WHEN {c} IS NULL OR isnan(CAST({c} AS DOUBLE)) THEN 0 "
            f"WHEN {span} > 0.0 THEN "
            f"least({scaled}, CAST({(1 << bits) - 1} AS BIGINT)) "
            f"ELSE 0 END)"
        )
    terms = []
    for b in range(bits):
        for i, bk in enumerate(bks):
            terms.append(f"((({bk} >> {b}) & 1) << {b * n + i})")
    zkey = " + ".join(terms)
    return f"""
        SELECT {table}.*, CAST({zkey} AS BIGINT) AS zkey
        FROM {table}, (SELECT {stats} FROM {table}) __st
    """
