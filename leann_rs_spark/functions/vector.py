"""Vector scoring as native Catalyst higher-order functions.

The reference scores with an f32 scalar loop (inner product only:
/root/reference/src/index/recompute.rs:136-139, usearch MetricKind::IP
/root/reference/src/backend/hnsw.rs:45). Here scoring is a JVM-side
expression — no Python in the hot path, whole-stage codegen applies, and
the fold accumulates in DOUBLE sequentially, which is bit-exact
reproducible in DuckDB (`list_reduce` fold — verified in
tools/parity_exp.py: 0/500 mismatches). DOUBLE accumulation also avoids
the f32 non-associativity the reference silently tolerates.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def sql_double(x: float) -> str:
    """One DOUBLE literal as SQL text. `repr` emits the shortest
    round-tripping decimal and Spark's parser (Java Double.parseDouble)
    maps it back to the identical bit pattern — verified for denormal
    min, max double, -0.0 and accumulated-error values. The `D` suffix
    forces DoubleType (a bare decimal literal would parse as DECIMAL)."""
    v = float(x)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(v) + "D"


def lit_vec(values) -> Column:
    """array<double> literal built in ONE spark call.

    The elementwise form `F.array(*[F.lit(float(x)) for x in v])` pays
    a py4j round-trip per element — measured ~2 s of pure driver time
    to build an M=8/K=16/d=8 PQ codebook (~1.4k calls) at zero job
    cost. Parsing one SQL string is ~300x faster and yields the same
    Literal tree (values and schema verified bit-identical, including
    5e-324 / 1.8e308 / -0.0)."""
    return F.expr("array(" + ",".join(sql_double(x) for x in values) + ")")


def lit_vec_sql(values) -> str:
    """The SQL text of `lit_vec` — for embedding into larger one-call
    literal expressions (codebooks of struct('cid','cv') rows)."""
    return "array(" + ",".join(sql_double(x) for x in values) + ")"


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product <a, b>, DOUBLE accumulation, deterministic order."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """x / max(||x||, 1e-12) — clamp mirrors the reference's local-model
    normalize (/root/reference/src/embedding/candle.rs:218-225)."""
    a = F.col(a) if isinstance(a, str) else a
    n = F.greatest(l2_norm(a), F.lit(1e-12))
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. For the registry models the reference uses,
    embeddings arrive L2-normalized so IP == cosine
    (/root/reference/src/embedding/models.rs:43,52); we provide both."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# DuckDB oracle fragments — the exact SQL equivalents of the expressions
# above, used by __spark_entry__.oracle_sql(). Keeping them next to the
# Spark definitions makes drift impossible to miss.
# ---------------------------------------------------------------------------

def duckdb_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform({a}, (x,i) -> x::double * {b}[i]::double),"
        f" (acc,x) -> acc + x)::double"
    )


def duckdb_l2_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, x -> x::double * x::double),"
        f" (acc,x) -> acc + x)::double)"
    )


def duckdb_cosine(a: str, b: str) -> str:
    return (
        f"(case when {duckdb_l2_norm(a)} * {duckdb_l2_norm(b)} > 0 then "
        f"{duckdb_dot(a, b)} / ({duckdb_l2_norm(a)} * {duckdb_l2_norm(b)}) "
        f"else 0.0 end)"
    )
