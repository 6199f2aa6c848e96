"""Exact MIPS / cosine top-k search — the canonical query path.

Reference semantics: "recompute mode" brute-force exact search
(/root/reference/src/index/recompute.rs:52-123): score every passage by
inner product, sort desc, take top-k. The indexed ANN paths
(src/backend/hnsw.rs:79-93, src/backend/diskann.rs:47-62) are physical
approximations of this; leann_rs_spark.operators.ann holds ours.

Scale design (100 TB / 1000 executors):
- Single query: `ORDER BY score DESC, id ASC LIMIT k` — Catalyst plans
  TakeOrderedAndProject: per-partition heap top-k, then a k-row merge on
  the driver. No shuffle of the scored table, no full sort. This is the
  same heap-vs-sort tradeoff the reference benchmarks
  (/root/reference/benches/benchmarks.rs:222-284) — Catalyst already
  implements the winning variant.
- Query batch: broadcast the Q queries (they're small), score Q×N
  map-side (no shuffle), then prune to k rows per (partition, query)
  *before* the single shuffle that ranks globally per query. Shuffle
  volume drops from N×Q rows to P×k×Q (P = #partitions) — at 100 TB the
  difference between an impossible job and a cheap one.
- Tie-break `score DESC, id ASC` everywhere: the reference's float sort
  leaves tie order unspecified (src/index/recompute.rs:106-110); the
  oracle needs a total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from leann_rs_spark.functions.vector import cosine, dot, lit_vec


def _score(metric: str, vec_col: Column, query_col: Column) -> Column:
    if metric == "ip":
        return dot(vec_col, query_col)
    if metric == "cosine":
        return cosine(vec_col, query_col)
    raise ValueError(f"unknown metric {metric!r} (expected 'ip' or 'cosine')")


def exact_search(
    vectors: DataFrame,
    query_vector: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "ip",
    predicate: Column | None = None,
) -> DataFrame:
    """Single-query exact top-k.

    Filter is applied *before* scoring — the reference's own pushdown
    ("Apply filter early to avoid computing unnecessary embeddings",
    src/index/recompute.rs:66-79); with Catalyst the predicate reaches
    the Parquet scan.
    Returns (id_col, score) with score DOUBLE, ordered score DESC, id ASC.
    """
    q = lit_vec(query_vector)
    df = vectors
    if predicate is not None:
        df = df.filter(predicate)
    return (
        df.select(id_col, _score(metric, F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def batch_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    metric: str = "ip",
    predicate: Column | None = None,
    prune_partitions: bool = True,
) -> DataFrame:
    """Top-k per query for a whole table of queries.

    Plan: broadcast-nested-loop join (map-side, no shuffle of `vectors`)
    → score → optional partition-local prune to k rows per query (a
    shuffle-volume optimization that cannot change the exact result) →
    global rank per query.
    """
    df = vectors
    if predicate is not None:
        df = df.filter(predicate)

    scored = (
        df.join(F.broadcast(queries.select(query_id_col, query_vec_col)))
        .select(
            query_id_col,
            id_col,
            _score(metric, F.col(vec_col), F.col(query_vec_col)).alias("score"),
        )
    )

    if prune_partitions:
        # Selection only — no float math happens in Python, so results
        # stay bit-identical; Arrow round-trips doubles losslessly.
        import pandas as pd

        schema = scored.schema

        def local_topk(batches):
            for pdf in batches:
                if len(pdf):
                    yield (
                        pdf.sort_values(
                            ["score", id_col], ascending=[False, True]
                        ).groupby(query_id_col, sort=False).head(k)
                    )

        scored = scored.mapInPandas(local_topk, schema=schema)

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def assemble_results(
    hits: DataFrame,
    passages: DataFrame,
    id_col: str = "vec_id",
    passage_id_col: str = "doc_id",
) -> DataFrame:
    """Join scored hits back to their text/metadata — the reference's
    idx→id→JSONL-seek assembly (src/index/searcher.rs:171-207) becomes a
    broadcast join of the tiny hit set against the passage table."""
    return F.broadcast(hits).join(
        passages, hits[id_col] == passages[passage_id_col], "inner"
    )


def mrl_search(
    vectors: DataFrame,
    query_vector: list[float],
    d: int,
    k: int = 10,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncated-dimension search (MRL, Kusupati et al.,
    arXiv:2205.13147 — "adaptive retrieval"): rank by COSINE over the
    first `d` dimensions only (MRL embeddings front-load information,
    so a d-dim prefix is a valid low-cost embedding), then optionally
    exact-rescore the top refine·k with the full vector — the
    coarse-to-fine funnel the paper serves with. Scan cost of the
    first pass is d/D of the full scan; the funnel shape is the same
    broadcast-shortlist refine as SQ8/PQ/BQ.

    Cosine (not IP) on the prefix: truncation changes norms, so
    prefix scores are only comparable normalized. All float math
    stays in the verified dot/l2 folds — deterministic cross-engine.
    """
    qd = lit_vec(query_vector[:d])
    pref = F.slice(F.col(vec_col), 1, d)
    ranked = vectors.select(
        id_col, cosine(pref, qd).alias("score")
    ).orderBy(F.col("score").desc(), F.col(id_col).asc())
    if refine <= 0:
        return ranked.limit(k)
    q = lit_vec(query_vector)
    shortlist = ranked.limit(refine * k).select(id_col)
    return (
        vectors.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(id_col, dot(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def duckdb_mrl_search(
    query_vec_id: int,
    d: int,
    k: int = 10,
    refine: int = 0,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of mrl_search, query = embedding of `query_vec_id`."""
    from leann_rs_spark.functions.vector import duckdb_cosine, duckdb_dot

    trunc_score = duckdb_cosine(
        f"list_slice(e.{vec_col}, 1, {d})", f"list_slice(q.{vec_col}, 1, {d})"
    )
    base = f"""
        SELECT e.{id_col}, {trunc_score} AS score
        FROM {table} e, {table} q
        WHERE q.{id_col} = {query_vec_id}
        ORDER BY score DESC, e.{id_col} ASC
    """
    if refine <= 0:
        return base + f" LIMIT {k}"
    return f"""
        WITH shortlist AS ({base} LIMIT {refine * k})
        SELECT e.{id_col}, {duckdb_dot(f"e.{vec_col}", f"q.{vec_col}")} AS score
        FROM {table} e JOIN shortlist USING ({id_col}), {table} q
        WHERE q.{id_col} = {query_vec_id}
        ORDER BY score DESC, e.{id_col} ASC
        LIMIT {k}
    """


def mmr_search(
    vectors: DataFrame,
    query_vector: list[float],
    k: int = 5,
    fetch_k: int = 25,
    lam: float = 0.7,
    metric: str = "ip",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR 1998): greedily pick k results maximizing
    λ·rel(d) − (1−λ)·max_{s∈chosen} sim(d, s) over a top-fetch_k
    candidate pool — the standard diversity rerank for RAG context
    assembly (near-duplicate passages crowd out coverage at λ=1).

    Scale shape: the DISTRIBUTED work is the top-fetch_k candidate cut
    (TakeOrderedAndProject over the full corpus); the greedy is
    inherently sequential in k, so each of the k steps is one tiny job
    over the persisted ≤fetch_k candidate frame, with the chosen
    vectors folded in as literals. All score arithmetic stays in the
    verified dot() fold + F.round (HALF_UP, the DuckDB-matching
    selection-key recipe) — the unrolled SQL twin reproduces every
    pick exactly.

    → (rank, id_col, rel DOUBLE) — rank 1..k in pick order; rel is the
    candidate's original relevance score.
    """
    q = lit_vec(query_vector)
    cand = (
        vectors.select(
            id_col, vec_col, _score(metric, F.col(vec_col), q).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(fetch_k)
        .persist()
    )
    cand.count()
    sel: list[tuple] = []  # (id, vec, rel)
    for _ in range(k):
        rem = cand
        if sel:
            rem = cand.filter(
                ~F.col(id_col).isin([s[0] for s in sel])
            )
            dots = [
                dot(F.col(vec_col), lit_vec(vec))
                for _, vec, _ in sel
            ]
            sim = dots[0] if len(dots) == 1 else F.greatest(*dots)
            key = F.round(
                F.lit(float(lam)) * F.col("score")
                - F.lit(1.0 - float(lam)) * sim,
                6,
            )
        else:
            key = F.round(F.col("score"), 6)
        row = (
            rem.orderBy(key.desc(), F.col(id_col).asc())
            .select(id_col, vec_col, "score")
            .head()
        )
        if row is None:
            break
        sel.append((row[id_col], list(row[vec_col]), row["score"]))
    cand.unpersist()
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(i + 1, s[0], float(s[2])) for i, s in enumerate(sel)],
        f"rank int, {id_col} bigint, rel double",
    )


def duckdb_mmr_search(
    query_vec_id: int,
    k: int = 5,
    fetch_k: int = 25,
    lam: float = 0.7,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of mmr_search (metric='ip'): the greedy unrolled as
    k chained CTEs — step n picks argmax of the identical rounded MMR
    key over candidates not yet chosen, ties by id."""
    from leann_rs_spark.functions.vector import duckdb_dot

    rel = duckdb_dot(f"e.{vec_col}", f"q.{vec_col}")
    ctes = [
        f"""cand AS (
            SELECT e.{id_col} AS id, {rel} AS rel, e.{vec_col} AS v
            FROM {table} e, {table} q
            WHERE q.{id_col} = {query_vec_id}
            ORDER BY rel DESC, e.{id_col} ASC
            LIMIT {fetch_k}
        )""",
        """s1 AS (
            SELECT c.id, c.rel, c.v FROM cand c
            ORDER BY round(c.rel, 6) DESC, c.id ASC LIMIT 1
        )""",
    ]
    for n in range(2, k + 1):
        prev = ", ".join(f"s{m}" for m in range(1, n))
        not_in = " AND ".join(
            f"c.id <> (SELECT id FROM s{m})" for m in range(1, n)
        )
        sims = [
            f"(SELECT {duckdb_dot('c.v', f's{m}.v')} FROM s{m})"
            for m in range(1, n)
        ]
        sim = sims[0] if len(sims) == 1 else "greatest(" + ", ".join(sims) + ")"
        ctes.append(
            f"""s{n} AS (
                SELECT c.id, c.rel, c.v FROM cand c
                WHERE {not_in}
                ORDER BY round({float(lam)!r} * c.rel
                              - {1.0 - float(lam)!r} * {sim}, 6) DESC,
                         c.id ASC
                LIMIT 1
            )"""
        )
    union = " UNION ALL ".join(
        f"SELECT {n} AS rank, id AS {id_col}, rel FROM s{n}"
        for n in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{union} ORDER BY rank"
