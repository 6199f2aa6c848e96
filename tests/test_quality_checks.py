"""Expectation checks: single-pass violation counts + DuckDB parity."""

import duckdb
from pyspark.sql import functions as F

from leann_rs_spark.functions.quality_checks import (
    duckdb_expectation_report,
    duckdb_violates_unique,
    expectation_report,
    violates_in_range,
    violates_in_set,
    violates_matches,
    violates_non_null,
    violates_unique,
)

from conftest import SF_SMOKE


def test_expectation_report_counts(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, None, -5), (3, "xx", 3), (3, "de", 10**7)],
        "id long, lang string, n long",
    )
    out = expectation_report(
        df,
        {
            "null_lang": violates_non_null("lang"),
            "bad_lang": violates_in_set("lang", ["en", "de"]),
            "bad_n": violates_in_range("n", 0, 1000),
        },
    ).head()
    assert (out["null_lang"], out["bad_lang"], out["bad_n"]) == (1, 2, 2)
    dup = violates_unique(df, "id").head()
    assert dup["dup_id"] == 1


def test_expectation_matches_duckdb(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    checks_spark = {
        "null_text": violates_non_null("text"),
        "bad_source": violates_matches("source", "^src[0-9]+$"),
    }
    checks_sql = {
        "null_text": "text IS NULL",
        "bad_source": "source IS NULL OR NOT regexp_matches(source, '^src[0-9]+$')",
    }
    got = expectation_report(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet"), checks_spark
    ).head()
    want = con.execute(
        duckdb_expectation_report("documents", checks_sql)
    ).fetchone()
    assert (got["null_text"], got["bad_source"]) == want
    g = violates_unique(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet"), "doc_id"
    ).head()["dup_doc_id"]
    w = con.execute(duckdb_violates_unique("documents", "doc_id")).fetchone()[0]
    assert g == w == 0
