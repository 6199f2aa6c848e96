"""Binary quantization (BQ) — the extreme end of the storage ladder.

Completes the compression tiers below SQ8/PQ (operators/sq.py,
operators/pq.py): f32 (4·D bytes) → SQ8 (D bytes) → PQ (M bytes) →
**BQ (D bits = D/8 bytes, 32× less scan I/O than f32)**. This is the
Lucene/Elasticsearch BBQ / FAISS IndexBinaryFlat shape made public by
rank-then-refine systems: each dimension stores ONE bit (is the value
above its per-dimension threshold?), candidate generation is Hamming
distance over packed words — a single codegen'd `bit_count(a XOR b)`
per word, the SimHash trick (operators/dedup.py) repurposed for
serving — and a broadcast exact rescore restores true scores for the
shortlist.

Spark-first shape:
- train: per-dimension MEDIAN threshold from ONE aggregate pass
  (exact `percentile` — bit-identical to DuckDB's `quantile_cont`,
  verified 0/64 mismatches on float embeddings; at 100 TB swap in
  `percentile_approx`, the documented knob). Median keeps the bit
  budget balanced per dimension regardless of the embedding
  distribution — a mean threshold skews bits on heavy-tailed dims.
- encode: shuffle-free projection packing ceil(D/63) BIGINT words
  (63 bits per word — DuckDB's left-shift overflows at bit 63, the
  same carry bound the SimHash packing documents). 64-dim corpus →
  16 bytes/row at scan time.
- search: Hamming shortlist via `ORDER BY hamming ASC, id ASC LIMIT
  refine·k` (TakeOrderedAndProject: per-partition heap, k-row driver
  merge, no shuffle of the code table), then broadcast semi-join of
  the shortlist against the full-vector table for the exact rescore —
  the PQ/SQ8 refine shape, reusing the bit-parity-verified
  dot()/duckdb_dot() fold.

Hamming ties are broken by id, so the shortlist — and therefore the
whole composed result — is deterministic and SQL-oracle-exact
(gate: __spark_entry__.x_bq_topk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from leann_rs_spark.functions.vector import dot, duckdb_dot, lit_vec

_WORD_BITS = 63  # DuckDB `1::BIGINT << 63` overflows; 63 bits/word both engines


def _n_words(dims: int) -> int:
    return (dims + _WORD_BITS - 1) // _WORD_BITS


def bq_train(
    vectors: DataFrame,
    dims: int,
    vec_col: str = "embedding",
) -> list[float]:
    """Per-dimension median thresholds — one aggregate pass, plan
    literals thereafter (the sq8_train convention)."""
    aggs = [
        F.expr(f"percentile(element_at({vec_col}, {j + 1}), 0.5)").alias(f"t{j}")
        for j in range(dims)
    ]
    row = vectors.agg(*aggs).first()
    return [float(row[f"t{j}"]) for j in range(dims)]


def bq_encode_col(vec: Column, thresholds: list[float]) -> Column:
    """array<bigint> of ceil(D/63) packed words; bit (j mod 63) of word
    (j div 63) is set when vec[j+1] > thresholds[j]. Unrolled OR chain:
    thresholds are literals, so the whole pack stays inside one
    codegen'd projection — no Python, no shuffle."""
    dims = len(thresholds)
    words = []
    for w in range(_n_words(dims)):
        acc = F.lit(0).cast("long")
        for b in range(min(_WORD_BITS, dims - w * _WORD_BITS)):
            j = w * _WORD_BITS + b  # 0-based dim
            acc = acc.bitwiseOR(
                F.when(
                    F.element_at(vec, j + 1).cast("double")
                    > F.lit(thresholds[j]),
                    F.lit(1 << b).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            )
        words.append(acc)
    return F.array(*words)


def bq_encode(
    vectors: DataFrame,
    thresholds: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bcode) — shuffle-free projection; D/8 bytes per row at rest."""
    return vectors.select(
        id_col, bq_encode_col(F.col(vec_col), thresholds).alias("bcode")
    )


def bq_query_words(query_vector: list[float], thresholds: list[float]) -> list[int]:
    """Driver-side query packing — pure integer math, trivially
    engine-exact (mirrors the reference's driver-side query embed)."""
    dims = len(thresholds)
    words = [0] * _n_words(dims)
    for j, (v, t) in enumerate(zip(query_vector, thresholds)):
        if float(v) > t:
            words[j // _WORD_BITS] |= 1 << (j % _WORD_BITS)
    return words


def bq_hamming_col(bcode: Column, query_words: list[int]) -> Column:
    """Σ_w bit_count(bcode[w] XOR qw_w) — one codegen'd expression."""
    h = F.lit(0)
    for w, qw in enumerate(query_words):
        h = h + F.bit_count(
            F.element_at(bcode, w + 1).bitwiseXOR(F.lit(qw).cast("long"))
        )
    return h


def bq_search(
    codes: DataFrame,
    thresholds: list[float],
    query_vector: list[float],
    k: int = 10,
    refine: int = 4,
    vectors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hamming-shortlist → exact-rescore top-k.

    refine·k candidates by Hamming distance (ASC, id ASC — integer
    distance, so the shortlist is deterministic), then the true
    dot-product top-k over the shortlist. refine == 0 returns the raw
    Hamming ranking (diagnostics only — scores are distances)."""
    qwords = bq_query_words(query_vector, thresholds)
    ranked = codes.select(
        id_col, bq_hamming_col(F.col("bcode"), qwords).alias("hamming")
    ).orderBy(F.col("hamming").asc(), F.col(id_col).asc())
    if refine <= 0:
        return ranked.limit(k)
    if vectors is None:
        raise ValueError("refine > 0 needs the full-vector table")
    q = lit_vec(query_vector)
    shortlist = ranked.limit(refine * k).select(id_col)
    return (
        vectors.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(id_col, dot(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin — derives thresholds, codes, query words, Hamming
# shortlist, and the exact rescore from the parquet table alone.
# ---------------------------------------------------------------------------

def duckdb_bq_search(
    query_vec_id: int,
    k: int,
    refine: int = 4,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of bq_train → bq_encode → bq_search(refine),
    query = the embedding of `query_vec_id` (the q1 convention)."""
    n_words = _n_words(dims)

    def pack(vec: str) -> str:
        """One packed word per array slot, same 63-bit layout."""
        words = []
        for w in range(n_words):
            lo = w * _WORD_BITS + 1
            hi = min((w + 1) * _WORD_BITS, dims)
            words.append(
                f"list_reduce(list_transform(generate_series({lo}, {hi}),"
                f" j -> CASE WHEN {vec}[j]::double > s.thr[j]"
                f" THEN (1::BIGINT << (j - {lo})) ELSE 0::BIGINT END),"
                f" (a, x) -> a | x)"
            )
        return "[" + ", ".join(words) + "]"

    hamming = " + ".join(
        f"bit_count(xor(c.bcode[{w + 1}], qw.w[{w + 1}]))"
        for w in range(n_words)
    )
    return f"""
        WITH dims AS (SELECT jj.i AS j FROM unnest(generate_series(1, {dims})) jj(i)),
        med AS (
            SELECT d.j, quantile_cont(e.{vec_col}[d.j]::double, 0.5) AS m
            FROM {table} e, dims d GROUP BY d.j
        ),
        s AS (SELECT list(m ORDER BY j) AS thr FROM med),
        codes AS (
            SELECT e.{id_col}, {pack(f"e.{vec_col}")} AS bcode
            FROM {table} e, s
        ),
        q AS (
            SELECT {vec_col} AS qv FROM {table} WHERE {id_col} = {query_vec_id}
        ),
        qw AS (SELECT {pack("q.qv")} AS w FROM q, s),
        shortlist AS (
            SELECT c.{id_col}
            FROM codes c, qw
            ORDER BY {hamming} ASC, c.{id_col} ASC
            LIMIT {refine * k}
        )
        SELECT e.{id_col}, {duckdb_dot(f"e.{vec_col}", "q.qv")} AS score
        FROM {table} e JOIN shortlist USING ({id_col}), q
        ORDER BY score DESC, e.{id_col} ASC
        LIMIT {k}
    """


def ivfbq_search(
    assigned_codes: DataFrame,
    centroids: DataFrame,
    thresholds: list[float],
    query_vector: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 4,
    vectors: DataFrame | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-BQ — the composed serving shape: coarse probe pruning
    (read only nprobe/C of the corpus) × binary codes inside the
    probed clusters (1 bit/dim of what IS read) × broadcast exact
    rescore. Per-query scan bytes ≈ (nprobe/C) · N · D/8 — the
    multiplicative combination of the IVF and BQ cuts, the same
    composition as IVF-PQ (operators/pq.py) at the cheaper rung.

    `assigned_codes`: (id_col, cluster_id, bcode) — bq_encode output
    joined with ivf_assign's cluster ids (or read from a
    cluster-partitioned layout, where the probe filter is static
    partition pruning at the file level)."""
    from leann_rs_spark.functions.vector import dot as _dot

    q = lit_vec(query_vector)
    probe_rows = (
        centroids.select(
            "centroid_id", _dot(F.col("centroid_vec"), q).alias("__qs")
        )
        .orderBy(F.col("__qs").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .collect()
    )
    probe_ids = [r["centroid_id"] for r in probe_rows]
    qwords = bq_query_words(query_vector, thresholds)
    ranked = (
        assigned_codes.filter(F.col("cluster_id").isin(probe_ids))
        .select(id_col, bq_hamming_col(F.col("bcode"), qwords).alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
    )
    if refine <= 0:
        return ranked.limit(k)
    if vectors is None:
        raise ValueError("refine > 0 needs the full-vector table")
    shortlist = ranked.limit(refine * k).select(id_col)
    return (
        vectors.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(id_col, dot(F.col("embedding"), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def duckdb_ivfbq_search(
    query_vec_id: int,
    k: int,
    nprobe: int,
    n_centroids: int,
    refine: int = 4,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin: IVF assignment + probe set (the duckdb_ivf_search
    construction) intersected with the BQ code ranking, then the exact
    rescore."""
    n_words = _n_words(dims)

    def pack(vec: str) -> str:
        words = []
        for w in range(n_words):
            lo = w * _WORD_BITS + 1
            hi = min((w + 1) * _WORD_BITS, dims)
            words.append(
                f"list_reduce(list_transform(generate_series({lo}, {hi}),"
                f" j -> CASE WHEN {vec}[j]::double > s.thr[j]"
                f" THEN (1::BIGINT << (j - {lo})) ELSE 0::BIGINT END),"
                f" (a, x) -> a | x)"
            )
        return "[" + ", ".join(words) + "]"

    d_ec = duckdb_dot(f"e.{vec_col}", "c.centroid_vec")
    d_cq = duckdb_dot("c.centroid_vec", "q.qv")
    hamming = " + ".join(
        f"bit_count(xor(cd.bcode[{w + 1}], qw.w[{w + 1}]))"
        for w in range(n_words)
    )
    return f"""
        WITH cent AS (
            SELECT {id_col} AS centroid_id, {vec_col} AS centroid_vec
            FROM {table} WHERE {id_col} < {n_centroids}
        ),
        assigned AS (
            SELECT {id_col}, centroid_id AS cluster_id FROM (
                SELECT e.{id_col}, c.centroid_id,
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
        ),
        dims_t AS (SELECT jj.i AS j FROM unnest(generate_series(1, {dims})) jj(i)),
        med AS (
            SELECT d.j, quantile_cont(e.{vec_col}[d.j]::double, 0.5) AS m
            FROM {table} e, dims_t d GROUP BY d.j
        ),
        s AS (SELECT list(m ORDER BY j) AS thr FROM med),
        codes AS (
            SELECT e.{id_col}, {pack(f"e.{vec_col}")} AS bcode
            FROM {table} e, s
        ),
        qw AS (SELECT {pack("q.qv")} AS w FROM q, s),
        shortlist AS (
            SELECT cd.{id_col}
            FROM codes cd
            JOIN assigned a ON cd.{id_col} = a.{id_col}
            JOIN probes p ON a.cluster_id = p.centroid_id, qw
            ORDER BY {hamming} ASC, cd.{id_col} ASC
            LIMIT {refine * k}
        )
        SELECT e.{id_col}, {duckdb_dot(f"e.{vec_col}", "q.qv")} AS score
        FROM {table} e JOIN shortlist USING ({id_col}), q
        ORDER BY score DESC, e.{id_col} ASC
        LIMIT {k}
    """


def bq_search_batch(
    codes: DataFrame,
    thresholds: list[float],
    queries: DataFrame,
    k: int = 10,
    refine: int = 4,
    vectors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    prune_partitions: bool = True,
) -> DataFrame:
    """Batch-serving BQ (the batch_search twin over bits): query
    vectors are packed IN-PLAN with the same bq_encode_col (thresholds
    are literals — no driver round), the Q-row code table broadcasts
    into the corpus scan (Q×N Hamming pairs map-side, corpus never
    shuffled), an Arrow local prune caps the per-query ranking shuffle
    at P·(refine·k)·Q rows, and a broadcast candidate set drives the
    exact rescore. → (query_id, id, score, rank)."""
    from pyspark.sql import Window

    n_words = _n_words(len(thresholds))
    qcodes = queries.select(
        query_id_col,
        bq_encode_col(F.col(query_vec_col), thresholds).alias("__qc"),
    )
    ham = F.lit(0)
    for w in range(n_words):
        ham = ham + F.bit_count(
            F.element_at(F.col("bcode"), w + 1).bitwiseXOR(
                F.element_at(F.col("__qc"), w + 1)
            )
        )
    scored = codes.join(F.broadcast(qcodes)).select(
        query_id_col, id_col, ham.alias("hamming")
    )
    shortlist_k = k if refine <= 0 else refine * k
    if prune_partitions:
        # selection only — integer Hamming, no float math in Python
        schema = scored.schema

        def local_topk(batches):
            for pdf in batches:
                if len(pdf):
                    yield (
                        pdf.sort_values(
                            ["hamming", id_col], ascending=[True, True]
                        ).groupby(query_id_col, sort=False).head(shortlist_k)
                    )

        scored = scored.mapInPandas(local_topk, schema=schema)
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    shortlist = scored.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= shortlist_k
    )
    if refine <= 0:
        return shortlist.select(query_id_col, id_col, "hamming", "rank")
    if vectors is None:
        raise ValueError("refine > 0 needs the full-vector table")
    cand = shortlist.select(query_id_col, id_col).join(
        F.broadcast(queries.select(query_id_col, query_vec_col)),
        query_id_col,
    )
    rescored = vectors.join(F.broadcast(cand), id_col).select(
        query_id_col,
        id_col,
        dot(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    w_score = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_score))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def duckdb_bq_search_batch(
    n_queries: int,
    k: int,
    refine: int = 4,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of bq_search_batch, queries = the first `n_queries`
    embeddings (the q2 convention)."""
    n_words = _n_words(dims)

    def pack(vec: str) -> str:
        words = []
        for w in range(n_words):
            lo = w * _WORD_BITS + 1
            hi = min((w + 1) * _WORD_BITS, dims)
            words.append(
                f"list_reduce(list_transform(generate_series({lo}, {hi}),"
                f" j -> CASE WHEN {vec}[j]::double > s.thr[j]"
                f" THEN (1::BIGINT << (j - {lo})) ELSE 0::BIGINT END),"
                f" (a, x) -> a | x)"
            )
        return "[" + ", ".join(words) + "]"

    hamming = " + ".join(
        f"bit_count(xor(c.bcode[{w + 1}], qc.qcode[{w + 1}]))"
        for w in range(n_words)
    )
    return f"""
        WITH dims_t AS (SELECT jj.i AS j FROM unnest(generate_series(1, {dims})) jj(i)),
        med AS (
            SELECT d.j, quantile_cont(e.{vec_col}[d.j]::double, 0.5) AS m
            FROM {table} e, dims_t d GROUP BY d.j
        ),
        s AS (SELECT list(m ORDER BY j) AS thr FROM med),
        codes AS (
            SELECT e.{id_col}, {pack(f"e.{vec_col}")} AS bcode
            FROM {table} e, s
        ),
        qs AS (
            SELECT {id_col} AS query_id, {vec_col} AS qv
            FROM {table} WHERE {id_col} < {n_queries}
        ),
        qcodes AS (
            SELECT q.query_id, q.qv, {pack("q.qv")} AS qcode FROM qs q, s
        ),
        shortlist AS (
            SELECT query_id, {id_col} FROM (
                SELECT qc.query_id, c.{id_col},
                       row_number() OVER (
                           PARTITION BY qc.query_id
                           ORDER BY {hamming} ASC, c.{id_col} ASC
                       ) AS hrank
                FROM codes c, qcodes qc
            ) WHERE hrank <= {refine * k}
        )
        SELECT sl.query_id, e.{id_col},
               {duckdb_dot(f"e.{vec_col}", "qc.qv")} AS score,
               row_number() OVER (
                   PARTITION BY sl.query_id
                   ORDER BY {duckdb_dot(f"e.{vec_col}", "qc.qv")} DESC,
                            e.{id_col} ASC
               ) AS rank
        FROM shortlist sl
        JOIN {table} e USING ({id_col})
        JOIN qcodes qc ON qc.query_id = sl.query_id
        QUALIFY rank <= {k}
        ORDER BY sl.query_id, rank
    """
