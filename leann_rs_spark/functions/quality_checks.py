"""Data-quality expectations for pipeline gating.

Beyond-reference (SURVEY §2.5): a 100 TB ingest runs expectation checks
before anything downstream trusts the table. Each check is ONE
aggregation pass returning violation counts (never a driver-side scan),
so a whole expectation suite is a single job over one shuffle; gating is
`assert all counts == 0` (or route to quarantine).

All checks are plain ANSI aggregates with DuckDB twins, so the gate
query is oracle-verified like every other operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def expectation_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """→ one row: a violation count per named check. `checks` maps
    check name → boolean Column that is TRUE when the row VIOLATES the
    expectation. One aggregation pass for the whole suite."""
    aggs = [
        F.count(F.when(cond, F.lit(1))).alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def violates_non_null(col: str) -> Column:
    return F.col(col).isNull()


def violates_unique(df: DataFrame, col: str) -> DataFrame:
    """Uniqueness needs its own groupBy pass: → one row with the count
    of keys appearing more than once."""
    return (
        df.groupBy(col)
        .count()
        .agg(
            F.count(F.when(F.col("count") > 1, F.lit(1))).alias(
                f"dup_{col}"
            )
        )
    )


def violates_in_range(col: str, lo: float, hi: float) -> Column:
    c = F.col(col)
    return c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))


def violates_matches(col: str, pattern: str) -> Column:
    c = F.col(col)
    return c.isNull() | ~c.rlike(pattern)


def violates_in_set(col: str, allowed: list) -> Column:
    c = F.col(col)
    return c.isNull() | ~c.isin(allowed)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def duckdb_expectation_report(table: str, checks: dict[str, str]) -> str:
    """`checks` maps name → SQL boolean expr (TRUE = violation)."""
    aggs = ", ".join(
        f"count(CASE WHEN {cond} THEN 1 END)::bigint AS {name}"
        for name, cond in checks.items()
    )
    return f"SELECT {aggs} FROM {table}"


def duckdb_violates_unique(table: str, col: str) -> str:
    return (
        f"SELECT count(CASE WHEN c > 1 THEN 1 END)::bigint AS dup_{col} "
        f"FROM (SELECT {col}, count(*) AS c FROM {table} GROUP BY {col})"
    )
