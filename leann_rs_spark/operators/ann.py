"""Approximate nearest-neighbor search — the IVF scale path.

The reference's ANN backends are pointer-chasing graph indexes (HNSW:
/root/reference/src/backend/hnsw.rs:96-139, DiskANN/Vamana:
/root/reference/src/backend/diskann.rs:69-105) — inherently single-node,
stateful, anti-Spark. Exact brute-force top-k stays the canonical
semantics (operators/search.py, mirroring the reference's own recompute
ground truth, src/index/recompute.rs:52-123); this module is the
*physical approximation* for when N is too large to scan per query.

Design: classic IVF (inverted-file) partitioning, expressed entirely in
DataFrame ops so Catalyst handles pushdown and AQE handles skew:

  build:  pick C centroids deterministically → assign every vector to
          its nearest centroid (broadcast join + per-vector top-1) →
          persist `assigned` partitioned/clustered BY cluster_id.
  search: rank centroids for the query (driver-trivial: C rows) → keep
          the top `nprobe` clusters → exact top-k over only those
          clusters.

At 100 TB: the assigned table is written with
`.write.partitionBy("cluster_id")`, so a query's scan prunes to
nprobe/C of the files — partition pruning does the work a graph index
does on a single node, with no custom storage format. Probing more
clusters trades cost for recall exactly like the reference's
`complexity` beam-width knob (src/backend/diskann.rs:47-62).

Centroid choice is `vec_id < n_centroids` (deterministic, oracle-
reproducible). Quality-wise this is a random sample for synthetic data;
swap in KMeans(seed=…) offline for production — search semantics are
unchanged, which is why the oracle pins THIS module's math, not the
centroid policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from leann_rs_spark.functions.vector import duckdb_dot, dot


def take_centroids(
    vectors: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid sample: the n smallest ids.

    Returns (centroid_id, centroid_vec). A learned codebook (MLlib
    KMeans with a fixed seed) can replace this without touching
    `ivf_assign`/`ivf_search`.
    """
    return vectors.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its best (max inner product) centroid.

    Broadcast the C centroids, score C candidates per vector map-side,
    keep the arg-max with a hash aggregation: `max(struct(score, -id))`
    is lexicographic, so partial (map-side-combine) aggregation reduces
    each vector to one row BEFORE the shuffle — shuffle volume is O(N),
    not O(N·C), with no window sort. Ties break on centroid_id ASC
    (larger -id == smaller id) for a total order.
    """
    scored = vectors.join(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "centroid_id",
        dot(F.col(vec_col), F.col("centroid_vec")).alias("__cscore"),
    )
    return (
        scored.groupBy(id_col, vec_col)
        .agg(
            F.max(
                F.struct(
                    F.col("__cscore").alias("s"),
                    (-F.col("centroid_id")).alias("neg_id"),
                )
            ).alias("__best")
        )
        .select(id_col, vec_col, (-F.col("__best.neg_id")).alias("cluster_id"))
    )


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vector: list[float],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate: Column | None = None,
) -> DataFrame:
    """Probe the `nprobe` centroids nearest the query; exact top-k inside.

    `nprobe == n_centroids` degrades to exact search (tests pin this).
    The cluster filter is `cluster_id IN (<nprobe literals>)` — when
    `assigned` is written partitionBy("cluster_id"), that's static
    partition pruning at the file level.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    probe_rows = (
        centroids.select(
            "centroid_id", dot(F.col("centroid_vec"), q).alias("__qs")
        )
        .orderBy(F.col("__qs").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .collect()
    )
    probe_ids = [r["centroid_id"] for r in probe_rows]
    df = assigned.filter(F.col("cluster_id").isin(probe_ids))
    if predicate is not None:
        df = df.filter(predicate)
    return (
        df.select(id_col, dot(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle — same math end-to-end (assign, probe, score).
# ---------------------------------------------------------------------------

def duckdb_ivf_search(
    query_vec_id: int,
    k: int,
    nprobe: int,
    n_centroids: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    d_ec = duckdb_dot(f"e.{vec_col}", "c.centroid_vec")
    d_cq = duckdb_dot("c.centroid_vec", "q.qv")
    d_aq = duckdb_dot(f"a.{vec_col}", "q.qv")
    return f"""
        WITH cent AS (
            SELECT {id_col} AS centroid_id, {vec_col} AS centroid_vec
            FROM {table} WHERE {id_col} < {n_centroids}
        ),
        assigned AS (
            SELECT {id_col}, {vec_col}, centroid_id AS cluster_id FROM (
                SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY e.{id_col}
                           ORDER BY {d_ec} DESC, c.centroid_id ASC
                       ) AS rn
                FROM {table} e, cent c
            ) WHERE rn = 1
        ),
        q AS (SELECT {vec_col} AS qv FROM {table} WHERE {id_col} = {query_vec_id}),
        probes AS (
            SELECT centroid_id FROM (
                SELECT c.centroid_id,
                       row_number() OVER (ORDER BY {d_cq} DESC, c.centroid_id ASC) AS rn
                FROM cent c, q
            ) WHERE rn <= {nprobe}
        )
        SELECT a.{id_col}, {d_aq} AS score
        FROM assigned a JOIN probes p ON a.cluster_id = p.centroid_id, q
        ORDER BY score DESC, a.{id_col} ASC
        LIMIT {k}
    """
