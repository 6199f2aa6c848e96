"""Product quantization (PQ) — compressed-vector ANN for the 100 TB tier.

The reference stores full f32 vectors and recomputes exact scores per
candidate (src/index/recompute.rs:52-123); its `is_compact` storage mode
drops embeddings from the index and re-embeds on demand
(src/index/meta.rs, builder.rs). At 100 TB the binding constraint is
SCAN BYTES: a 64-dim f32 embedding is 256 bytes/row, so even an
IVF-pruned probe reads nprobe/C × 256 B × N. PQ (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011) stores
an M-byte code instead — here M=8 subspaces over 64 dims → 32× less
scan I/O — and scores queries against codes alone (asymmetric distance,
ADC); an optional refine step rescores the top ADC candidates against
the full vectors for exact-quality results at code-scan cost.

Spark-first shape — every step is a narrow projection or a broadcast:

  train:   codebook = M sub-codebooks of K centroids each (K·M·(D/M)
           floats — a few KB; lives as a plan literal / Python object).
  encode:  per-subspace argmin ‖sub − c‖² over the K sub-centroids —
           ONE projection, no shuffle (the same inline-literal trick as
           ivf_assign). Codes are `array<int>` of length M; at K ≤ 256
           that is M bytes on disk after parquet byte-packing.
  search:  reconstruct each code to its decoded vector (a per-row
           literal lookup) and score dot(query, decode(code)) — the
           textbook ADC lookup-table sum evaluated as the equivalent
           decode-then-dot, which reuses the bit-parity-verified
           dot()/duckdb_dot() fold (functions/vector.py). Top-k is one
           TakeOrderedAndProject over a column the scan never shuffles.
  refine:  top (refine·k) by ADC → broadcast those ids into a semi-join
           with the full-vector table → exact top-k. The full vectors
           are touched for only refine·k rows per query.

Composes with IVF (operators/ann.py): encode the assigned table once,
then a probed search scans nprobe/C of the corpus at M bytes/vector —
IVF-PQ, the standard billion-scale layout (FAISS IndexIVFPQ is the
public reference implementation of the same math).

Codebook policy mirrors the IVF module: `take_subcodebooks` (sub-slices
of the K smallest ids — deterministic, oracle-reproducible; the gates
pin THIS module's math, not codebook quality) and `kmeans_subcodebooks`
(per-subspace seeded k-means — the production default; encoding uses
plain L2 per subspace, so no spherical correction is needed here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from leann_rs_spark.functions.vector import (
    dot, duckdb_dot, lit_vec, lit_vec_sql, sql_double,
)

PQ_DEFAULT_M = 8
PQ_DEFAULT_K = 16

Codebook = list[list[list[float]]]  # [m][cid][component]


def _sub_dim(codebook: Codebook) -> int:
    return len(codebook[0][0])


def take_subcodebooks(
    vectors: DataFrame,
    m: int = PQ_DEFAULT_M,
    k: int = PQ_DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebook:
    """Deterministic codebook: sub-centroid j of subspace i is the i-th
    slice of the vector with id j (the `take_centroids` policy, so the
    oracle can rebuild it from the table alone). Returns the Python
    nested-list codebook — it is KB-sized and becomes plan literals.
    """
    rows = sorted(
        vectors.filter(F.col(id_col) < k).select(id_col, vec_col).collect(),
        key=lambda r: r[id_col],
    )
    dims = len(rows[0][vec_col])
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    d = dims // m
    return [
        [[float(x) for x in r[vec_col][i * d : (i + 1) * d]] for r in rows]
        for i in range(m)
    ]


def kmeans_subcodebooks(
    vectors: DataFrame,
    m: int = PQ_DEFAULT_M,
    k: int = PQ_DEFAULT_K,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> Codebook:
    """Learned codebook: one seeded KMeans per subspace (plain L2 — the
    encoding metric — so centers are NOT normalized, unlike the IVF
    coarse codebook whose inner-product ranking needs spherical
    centers). Same return shape as `take_subcodebooks`; everything
    downstream is policy-agnostic."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = vectors.select(F.size(vec_col).alias("n")).first()["n"]
    if first % m:
        raise ValueError(f"dims={first} not divisible by m={m}")
    d = first // m
    out: Codebook = []
    for i in range(m):
        feats = vectors.select(
            array_to_vector(
                F.slice(F.col(vec_col), i * d + 1, d).cast("array<double>")
            ).alias("features")
        )
        model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
        out.append([[float(x) for x in c] for c in model.clusterCenters()])
    return out


def _sub_cb_lit(sub_cb: list[list[float]]) -> Column:
    # one SQL-parse call instead of ~K*(d+3) py4j calls (functions/
    # vector.lit_vec rationale): same Literal tree, bit-identical values
    return F.expr(
        "array("
        + ",".join(
            f"named_struct('cid',{j},'cv',{lit_vec_sql(cv)})"
            for j, cv in enumerate(sub_cb)
        )
        + ")"
    )


def _l2_dist2(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as the same sequential DOUBLE fold as dot() — the
    bit-reproducible shape duckdb's list_reduce mirrors. The
    difference is let-bound (single-element transform) so it is
    evaluated once per element, not once per factor (the CLAUDE.md
    HOF-CSE trap)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.transform(
                F.array(x.cast("double") - y.cast("double")),
                lambda d: d * d,
            )[0],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode_col(vec: Column, codebook: Codebook) -> Column:
    """The code of `vec`: array<int> of length M, element m = argmin
    over the K sub-centroids of ‖vec[m·d:(m+1)·d] − c‖², ties broken
    cid ASC (array_min's lexicographic struct order). A pure
    expression — encoding a corpus is one map pass, zero shuffle."""
    d = _sub_dim(codebook)
    codes = []
    for i, sub_cb in enumerate(codebook):
        # let-bind the slice: referencing it directly inside the
        # per-centroid lambda would re-slice the vector once per
        # codebook entry (K× per subspace — the CLAUDE.md HOF-CSE trap)
        cb_lit = _sub_cb_lit(sub_cb)
        best = F.transform(
            F.array(F.slice(vec, i * d + 1, d)),
            lambda sub: F.array_min(
                F.transform(
                    cb_lit,
                    lambda c: F.struct(
                        _l2_dist2(sub, c["cv"]).alias("dist"),
                        c["cid"].alias("cid"),
                    ),
                )
            ),
        )[0]
        codes.append(best["cid"])
    return F.array(*codes)


def pq_encode(
    vectors: DataFrame,
    codebook: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
    kernel: bool = False,
) -> DataFrame:
    """(id, code[, extras]) for every vector — the compressed index
    table. At scale this is what gets persisted; pass
    extra_cols=["cluster_id"] on an ivf_assign output to build the
    IVF-PQ layout (partition-prunable codes).

    kernel=True runs the encoding as an Arrow-batched numpy kernel
    (mapInPandas) instead of the Catalyst expression, accumulating
    distances with the SAME sequential d-fold as _l2_dist2 and
    breaking ties argmin-first (= smallest cid) — BIT-IDENTICAL to
    the expression form (test-pinned, the lsh_near_dups kernel
    precedent). Measured result: at 5k-20k rows x 64 dims the kernel
    is ~2.5x SLOWER — Arrow transfer of the vector column dominates
    while the interpreted HOF runs at ~10 µs/row — so the expression
    form is the default everywhere; the kernel exists for regimes
    where per-row expression cost grows (large K·M codebooks) and as
    the template for a future columnar-input variant."""
    if not kernel:
        return vectors.select(
            id_col,
            pq_encode_col(F.col(vec_col), codebook).alias("code"),
            *(extra_cols or []),
        )

    import numpy as np
    import pandas as pd
    from typing import Iterator

    m = len(codebook)
    d = _sub_dim(codebook)
    extras = list(extra_cols or [])
    # (M, K, d) float64 — exactly the literal values of the expression
    cb = np.array(codebook, dtype=np.float64)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"__id": [], "code": [], **{c: [] for c in extras}}
                )
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ).reshape(n, m, d)
            codes = np.empty((n, m), dtype=np.int32)
            for i in range(m):
                # sequential fold over d matches _l2_dist2's
                # ((0+t1)+t2)+... bracketing bit-for-bit
                acc = np.zeros((n, cb.shape[1]), dtype=np.float64)
                for j in range(d):
                    diff = x[:, i, j, None] - cb[i, None, :, j]
                    acc += diff * diff
                # argmin returns the FIRST minimum = smallest cid,
                # matching array_min's (dist, cid) lexicographic order
                codes[:, i] = np.argmin(acc, axis=1)
            out = {"__id": pdf[id_col].values, "code": list(codes)}
            for c in extras:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    in_schema = dict(vectors.dtypes)
    schema = ", ".join(
        [f"__id {in_schema[id_col]}", "code array<int>"]
        + [f"{c} {in_schema[c]}" for c in extras]
    )
    sel = [id_col, vec_col] + [c for c in extras if c not in (id_col, vec_col)]
    return (
        vectors.select(*sel)
        .mapInPandas(run, schema=schema)
        .withColumnRenamed("__id", id_col)
    )


def pq_bits(k: int) -> int:
    """Bits per sub-code: ceil(log2(k))."""
    return max((k - 1).bit_length(), 1)


def pq_pack_col(code: Column, m: int, bits: int) -> Column:
    """Pack an M-element code array into ONE non-negative BIGINT
    (requires m·bits ≤ 60): sub-code i occupies bits [i·bits,
    (i+1)·bits). This is the persisted-artifact form — 8 bytes per row
    in shuffles and scans regardless of M (the simhash packed-long
    trick applied to PQ codes)."""
    if m * bits > 60:
        raise ValueError(f"m*bits={m * bits} exceeds the 60-bit budget")
    total = F.lit(0).cast("long")
    for i in range(m):
        total = total + (
            F.element_at(code, i + 1).cast("long") * F.lit(1 << (i * bits))
        )
    return total


def pq_unpack_col(packed: Column, m: int, bits: int) -> Column:
    """Inverse of pq_pack_col — back to the array<int> the scoring
    expressions consume. Literal shifts per subspace keep this a pure
    codegen'd projection."""
    mask = (1 << bits) - 1
    return F.array(
        *[
            F.shiftright(packed, i * bits).bitwiseAND(F.lit(mask)).cast("int")
            for i in range(m)
        ]
    )


def codebook_to_rows(codebook: Codebook) -> list[tuple[int, int, list[float]]]:
    """(m, cid, cv) rows for persisting a codebook as parquet."""
    return [
        (m, cid, list(cv))
        for m, sub in enumerate(codebook)
        for cid, cv in enumerate(sub)
    ]


def codebook_from_rows(rows) -> Codebook:
    """Rebuild the nested-list codebook from (m, cid, cv) rows."""
    by_m: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_m.setdefault(int(r["m"]), {})[int(r["cid"])] = [
            float(x) for x in r["cv"]
        ]
    return [
        [by_m[m][c] for c in sorted(by_m[m])] for m in sorted(by_m)
    ]


def pq_reconstruct_col(code: Column, codebook: Codebook) -> Column:
    """decode(code): concatenation of the chosen sub-centroids — an
    array<double> literal lookup per row. ADC scoring is
    dot(query, decode(code)); evaluating it through the shared dot()
    fold keeps Spark and the DuckDB oracle bit-identical."""
    # one SQL-parse call for the M x K x d nested literal (~1k
    # elements): the per-element py4j form cost ~0.8s of driver time
    cb_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(lit_vec_sql(cv) for cv in sub_cb) + ")"
            for sub_cb in codebook
        )
        + ")"
    )
    return F.flatten(
        F.zip_with(
            code,
            cb_lit,
            lambda c, sub: F.element_at(sub, c + F.lit(1)),
        )
    )


def pq_search(
    codes: DataFrame,
    codebook: Codebook,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the code table alone: (id, score). The scan reads
    M bytes per row instead of the full vector; the plan is
    Scan → Project → TakeOrderedAndProject, no shuffle of the corpus."""
    q = lit_vec(query_vector)
    return (
        codes.select(
            id_col,
            dot(q, pq_reconstruct_col(F.col("code"), codebook)).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_search_refined(
    codes: DataFrame,
    vectors: DataFrame,
    codebook: Codebook,
    query_vector: list[float],
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist of refine·k, exact rescore of only those rows:
    the shortlist ids BROADCAST into the full-vector join, so the
    expensive table contributes refine·k point reads (on an id-sorted
    or bucketed table, a pruned scan), never a full pass."""
    q = lit_vec(query_vector)
    shortlist = (
        codes.select(
            id_col,
            dot(q, pq_reconstruct_col(F.col("code"), codebook)).alias("__adc"),
        )
        .orderBy(F.col("__adc").desc(), F.col(id_col).asc())
        .limit(refine * k)
        .select(id_col)
    )
    return (
        vectors.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(id_col, dot(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_search(
    assigned_codes: DataFrame,
    centroids: DataFrame,
    codebook: Codebook,
    query_vector: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 0,
    vectors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composed billion-scale serving shape (FAISS IndexIVFPQ):
    coarse IVF probing prunes the scan to nprobe/C of the corpus
    (static partition pruning on a cluster_id-partitioned table), ADC
    scores the survivors at M bytes/row, and refine > 0 exact-rescores
    the top refine·k against the full vectors (broadcast semi-join —
    refine·k point reads, never a second pass).

    `assigned_codes` is pq_encode(ivf_assign(...),
    extra_cols=["cluster_id"]). nprobe = C with refine covering k·refine
    ≥ probed rows degrades to exact search over the probed set
    (test-pinned). Per-query scan bytes: (nprobe/C) · N · M — the two
    knobs multiply.
    """
    q = lit_vec(query_vector)
    probe_rows = (
        centroids.select(
            "centroid_id", dot(F.col("centroid_vec"), q).alias("__qs")
        )
        .orderBy(F.col("__qs").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .collect()
    )
    probe_ids = [r["centroid_id"] for r in probe_rows]
    pruned = assigned_codes.filter(F.col("cluster_id").isin(probe_ids))
    adc = pruned.select(
        id_col,
        dot(q, pq_reconstruct_col(F.col("code"), codebook)).alias("score"),
    ).orderBy(F.col("score").desc(), F.col(id_col).asc())
    if refine <= 0:
        return adc.limit(k)
    if vectors is None:
        raise ValueError("refine > 0 needs the full-vector table")
    shortlist = adc.limit(refine * k).select(id_col)
    return (
        vectors.join(F.broadcast(shortlist), id_col, "left_semi")
        .select(id_col, dot(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_search_batch(
    assigned_codes: DataFrame,
    centroids: DataFrame,
    codebook: Codebook,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 0,
    vectors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch-serving IVF-PQ (the ivf_search_batch twin over codes):
    per-query probe ranking → the Q×nprobe probe table BROADCASTS into
    the code join (dynamic partition pruning on a cluster-partitioned
    table; the corpus is never shuffled) → ADC per (query, code) pair
    → per-query ADC top-(refine·k) window → optional exact rescore via
    a broadcast shortlist semi-join. Returns (query_id, id, score,
    rank). Per-batch scan bytes: union of probed clusters × M bytes."""
    from pyspark.sql import Window

    from leann_rs_spark.operators.ann import probe_ranks

    qv = F.col(query_vec_col)
    probes = (
        probe_ranks(queries, centroids, query_id_col, query_vec_col)
        .filter(F.col("probe_rank") <= nprobe)
        .drop("probe_rank")
    )
    scored = assigned_codes.join(F.broadcast(probes), "cluster_id").select(
        query_id_col,
        id_col,
        dot(qv, pq_reconstruct_col(F.col("code"), codebook)).alias("score"),
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    shortlist_k = k if refine <= 0 else refine * k
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= shortlist_k)
    )
    if refine <= 0:
        return shortlist.select(query_id_col, id_col, "score", "rank")
    if vectors is None:
        raise ValueError("refine > 0 needs the full-vector table")
    cand = shortlist.select(query_id_col, id_col).join(
        F.broadcast(queries.select(query_id_col, query_vec_col)),
        query_id_col,
    )
    rescored = vectors.join(
        F.broadcast(cand), id_col
    ).select(
        query_id_col,
        id_col,
        dot(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def pq_refine_recall_curve(
    vectors: DataFrame,
    codebook: Codebook,
    queries: DataFrame,
    k: int = 10,
    refines: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    intermediates: list | None = None,
) -> DataFrame:
    """Recall@k of PQ-ADC + exact-refine vs exact search, per refine
    factor — the compression-accuracy curve that picks the production
    (M, K, refine) point, the PQ analog of ivf_recall_curve. refine=r
    means: shortlist r·k by ADC, exact-rescore, take k. A refine that
    covers the whole corpus degrades to exact (recall 1.0), the same
    built-in self-check as the IVF sweep's nprobe=C point.

    One pass: each (query, vector) pair is scored ONCE with both its
    ADC score and its exact score (queries broadcast; the corpus is
    never shuffled); each sweep point is then a pair of windows over
    the persisted candidates. Diagnostic shape — run on a query SAMPLE
    (the exact baseline is Q×N by construction).
    """
    from pyspark.sql import Window

    refines = refines or [1, 2, 4, 8]
    qv = F.col(query_vec_col)
    enc = vectors.select(
        id_col,
        vec_col,
        pq_encode_col(F.col(vec_col), codebook).alias("code"),
    )
    cand = (
        enc.crossJoin(
            F.broadcast(queries.select(query_id_col, query_vec_col))
        )
        .select(
            query_id_col,
            id_col,
            dot(qv, pq_reconstruct_col(F.col("code"), codebook)).alias("adc"),
            dot(F.col(vec_col), qv).alias("exact"),
        )
        .persist()
    )
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    w_exact = Window.partitionBy(query_id_col).orderBy(
        F.col("exact").desc(), F.col(id_col).asc()
    )
    ranked = cand.select(
        query_id_col,
        id_col,
        "exact",
        F.row_number().over(w_adc).alias("adc_rank"),
        F.row_number().over(w_exact).alias("exact_rank"),
    ).persist()
    truth = ranked.filter(F.col("exact_rank") <= k).select(
        query_id_col, id_col
    ).persist()
    n_truth = truth.count()  # materializes the persists
    if intermediates is not None:
        intermediates.extend([cand, ranked, truth])
    # ONE window job for the whole sweep (the per-point loop paid a
    # full re-rank window + semi-join + agg per refine point — job
    # count dominated; same restructure as ann.ivf_recall_curve): a
    # shortlisted row explodes to the refine points that cover it
    # (r·k >= adc_rank, |sweep| ≈ 5 bounds the blowup), the exact
    # re-rank window partitions by (refine, query), the tiny truth
    # set broadcasts into the semi-join.
    expl = ranked.filter(F.col("adc_rank") <= max(refines) * k).select(
        query_id_col,
        id_col,
        "exact",
        F.explode(
            F.filter(
                F.array(*[F.lit(r) for r in refines]),
                lambda r: r * F.lit(k) >= F.col("adc_rank"),
            )
        ).alias("refine"),
    )
    w_point = Window.partitionBy("refine", query_id_col).orderBy(
        F.col("exact").desc(), F.col(id_col).asc()
    )
    hits = (
        expl.withColumn("__rr", F.row_number().over(w_point))
        .filter(F.col("__rr") <= k)
        .join(F.broadcast(truth), [query_id_col, id_col], "left_semi")
        .groupBy("refine")
        .agg(F.count("*").alias("n"))
    )
    spine = vectors.sparkSession.createDataFrame(
        [(r,) for r in refines], "refine int"
    )
    return spine.join(hits, "refine", "left").select(
        "refine",
        (
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.lit(float(n_truth)),
                6,
            )
            + F.lit(0.0)
        ).alias("recall_r"),
    ).orderBy("refine")


# ---------------------------------------------------------------------------
# DuckDB oracle twins — rebuild the take-policy codebook, the encoding,
# and the decode-then-dot ADC score from the parquet table alone, with
# the same fold shapes as the Spark expressions.
# ---------------------------------------------------------------------------

def _duckdb_l2_dist2(sub: str, cv: str, d: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {d}), i -> "
        f"({sub}[i]::double - {cv}[i]::double) * "
        f"({sub}[i]::double - {cv}[i]::double)), (acc, x) -> acc + x)"
    )


def _duckdb_pq_common(
    m: int,
    n_codebook: int,
    d: int,
    table: str,
    id_col: str,
    vec_col: str,
) -> str:
    """Shared CTE block: cbrows (m, cid, cv) with the take policy,
    per-vector codes via argmin, and the decoded vector `recon`."""
    dist = _duckdb_l2_dist2("s.sub", "cb.cv", d)
    return f"""
        cbrows AS (
            SELECT mm.i - 1 AS m, e.{id_col} AS cid,
                   e.{vec_col}[(mm.i - 1) * {d} + 1 : mm.i * {d}] AS cv
            FROM {table} e, unnest(generate_series(1, {m})) mm(i)
            WHERE e.{id_col} < {n_codebook}
        ),
        subs AS (
            SELECT e.{id_col}, mm.i - 1 AS m,
                   e.{vec_col}[(mm.i - 1) * {d} + 1 : mm.i * {d}] AS sub
            FROM {table} e, unnest(generate_series(1, {m})) mm(i)
        ),
        codes AS (
            SELECT {id_col}, m, cid FROM (
                SELECT s.{id_col}, s.m, cb.cid,
                       row_number() OVER (
                           PARTITION BY s.{id_col}, s.m
                           ORDER BY {dist} ASC, cb.cid ASC
                       ) AS rn
                FROM subs s JOIN cbrows cb ON cb.m = s.m
            ) WHERE rn = 1
        ),
        recon AS (
            SELECT c.{id_col}, flatten(list(cb.cv ORDER BY c.m)) AS rv
            FROM codes c JOIN cbrows cb ON cb.m = c.m AND cb.cid = c.cid
            GROUP BY c.{id_col}
        )"""


def duckdb_pq_search(
    query_vec_id: int,
    k: int,
    m: int = PQ_DEFAULT_M,
    n_codebook: int = PQ_DEFAULT_K,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of take-policy train → encode → ADC top-k, with the
    query = the embedding of `query_vec_id` (the q1 convention)."""
    d = dims // m
    common = _duckdb_pq_common(m, n_codebook, d, table, id_col, vec_col)
    score = duckdb_dot("q.qv", "r.rv")
    return f"""
        WITH {common},
        q AS (
            SELECT {vec_col} AS qv FROM {table}
            WHERE {id_col} = {query_vec_id}
        )
        SELECT r.{id_col}, {score} AS score
        FROM recon r, q
        ORDER BY score DESC, r.{id_col} ASC
        LIMIT {k}
    """


def duckdb_ivf_pq_search(
    query_vec_id: int,
    k: int,
    nprobe: int,
    n_centroids: int,
    refine: int = 0,
    m: int = PQ_DEFAULT_M,
    n_codebook: int = PQ_DEFAULT_K,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of `ivf_pq_search`: take-policy coarse centroids AND
    sub-codebooks, query = the embedding of `query_vec_id`."""
    d = dims // m
    common = _duckdb_pq_common(m, n_codebook, d, table, id_col, vec_col)
    d_ec = duckdb_dot(f"e.{vec_col}", "c.centroid_vec")
    d_cq = duckdb_dot("c.centroid_vec", "q.qv")
    adc = duckdb_dot("q.qv", "r.rv")
    exact = duckdb_dot(f"e.{vec_col}", "q.qv")
    final = (
        f"""
        shortlist AS (
            SELECT {id_col} FROM adc_ranked WHERE rn <= {refine * k}
        )
        SELECT e.{id_col}, {exact} AS score
        FROM {table} e JOIN shortlist s ON s.{id_col} = e.{id_col}, q
        ORDER BY score DESC, e.{id_col} ASC LIMIT {k}"""
        if refine > 0
        else f"""
        noop AS (SELECT 1)
        SELECT {id_col}, score FROM adc_ranked
        ORDER BY score DESC, {id_col} ASC LIMIT {k}"""
    )
    return f"""
        WITH {common},
        cent AS (
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
        q AS (
            SELECT {vec_col} AS qv FROM {table}
            WHERE {id_col} = {query_vec_id}
        ),
        probes AS (
            SELECT centroid_id FROM (
                SELECT c.centroid_id,
                       row_number() OVER (
                           ORDER BY {d_cq} DESC, c.centroid_id ASC
                       ) AS rn
                FROM cent c, q
            ) WHERE rn <= {nprobe}
        ),
        adc_ranked AS (
            SELECT r.{id_col}, {adc} AS score,
                   row_number() OVER (
                       ORDER BY {adc} DESC, r.{id_col} ASC
                   ) AS rn
            FROM recon r
            JOIN assigned a ON a.{id_col} = r.{id_col}
            JOIN probes p ON p.centroid_id = a.cluster_id, q
        ),
        {final}
    """


def duckdb_ivf_pq_search_batch(
    n_queries: int,
    k: int,
    nprobe: int,
    n_centroids: int,
    refine: int = 0,
    m: int = PQ_DEFAULT_M,
    n_codebook: int = PQ_DEFAULT_K,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of `ivf_pq_search_batch` (take policies, queries =
    the `n_queries` smallest ids — the q2 conventions)."""
    d = dims // m
    common = _duckdb_pq_common(m, n_codebook, d, table, id_col, vec_col)
    d_ec = duckdb_dot(f"e.{vec_col}", "c.centroid_vec")
    d_cq = duckdb_dot("c.centroid_vec", "q.qv")
    adc = duckdb_dot("q.qv", "r.rv")
    exact = duckdb_dot(f"e.{vec_col}", "q.qv")
    shortlist_k = k if refine <= 0 else refine * k
    final = (
        f"""
        rescored AS (
            SELECT s.query_id, e.{id_col}, {exact} AS score
            FROM {table} e
            JOIN short s ON s.{id_col} = e.{id_col}
            JOIN q ON q.query_id = s.query_id
        )
        SELECT query_id, {id_col}, score, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, {id_col} ASC
            ) AS rank FROM rescored
        ) WHERE rank <= {k}"""
        if refine > 0
        else f"""
        noop AS (SELECT 1)
        SELECT query_id, {id_col}, score, rank FROM short"""
    )
    return f"""
        WITH {common},
        cent AS (
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
        q AS (
            SELECT {id_col} AS query_id, {vec_col} AS qv
            FROM {table} WHERE {id_col} < {n_queries}
        ),
        probes AS (
            SELECT query_id, centroid_id FROM (
                SELECT q.query_id, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {d_cq} DESC, c.centroid_id ASC
                       ) AS rn
                FROM cent c, q
            ) WHERE rn <= {nprobe}
        ),
        adc AS (
            SELECT q.query_id, r.{id_col}, {adc} AS score
            FROM recon r
            JOIN assigned a ON a.{id_col} = r.{id_col}
            JOIN probes p ON p.centroid_id = a.cluster_id
            JOIN q ON q.query_id = p.query_id
        ),
        short AS (
            SELECT query_id, {id_col}, score, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, {id_col} ASC
                ) AS rank FROM adc
            ) WHERE rank <= {shortlist_k}
        ),
        {final}
    """


def duckdb_pq_refine_recall_curve(
    n_queries: int,
    k: int,
    refines: list[int],
    m: int = PQ_DEFAULT_M,
    n_codebook: int = PQ_DEFAULT_K,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle twin of `pq_refine_recall_curve` (take policy, queries =
    the `n_queries` smallest ids — the recall-gate conventions)."""
    d = dims // m
    common = _duckdb_pq_common(m, n_codebook, d, table, id_col, vec_col)
    adc = duckdb_dot("q.qv", "r.rv")
    exact = duckdb_dot(f"e.{vec_col}", "q.qv")
    sweep = ", ".join(str(r) for r in refines)
    return f"""
        WITH {common},
        q AS (
            SELECT {id_col} AS query_id, {vec_col} AS qv
            FROM {table} WHERE {id_col} < {n_queries}
        ),
        cand AS (
            SELECT q.query_id, e.{id_col}, {adc} AS adc, {exact} AS exact
            FROM {table} e
            JOIN recon r ON r.{id_col} = e.{id_col}
            CROSS JOIN q
        ),
        ranked AS (
            SELECT query_id, {id_col}, exact,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY adc DESC, {id_col} ASC
                   ) AS adc_rank,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY exact DESC, {id_col} ASC
                   ) AS exact_rank
            FROM cand
        ),
        truth AS (
            SELECT query_id, {id_col} FROM ranked WHERE exact_rank <= {k}
        ),
        sweep AS (SELECT unnest([{sweep}]) AS refine),
        got AS (
            SELECT refine, query_id, {id_col} FROM (
                SELECT s.refine, rk.query_id, rk.{id_col},
                       row_number() OVER (
                           PARTITION BY s.refine, rk.query_id
                           ORDER BY rk.exact DESC, rk.{id_col} ASC
                       ) AS rr
                FROM sweep s JOIN ranked rk ON rk.adc_rank <= s.refine * {k}
            ) WHERE rr <= {k}
        ),
        hits AS (
            SELECT g.refine, count(*) AS n
            FROM got g JOIN truth t
              ON g.query_id = t.query_id AND g.{id_col} = t.{id_col}
            GROUP BY g.refine
        )
        SELECT s.refine,
               round(coalesce(h.n, 0)::double
                     / (SELECT count(*) FROM truth), 6) + 0.0 AS recall_r
        FROM sweep s LEFT JOIN hits h USING (refine)
        ORDER BY s.refine
    """
