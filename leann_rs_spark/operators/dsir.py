"""DSIR — data selection via importance resampling (arXiv:2302.03169).

The training-data question the quality-filter family (Gopher rules,
lm_score) cannot answer: "give me the raw-crawl documents most LIKE my
high-quality target domain". DSIR fits two bag-of-hashed-n-gram
multinomials — p̂ over a small target corpus, q̂ over the raw corpus —
and resamples raw documents with importance weight

    log w(x) = Σ_grams  [ ln p̂(bucket(g)) − ln q̂(bucket(g)) ]

using Gumbel-top-n for sampling-without-replacement ∝ w. Here the
Gumbel noise is derived from a seeded md5 hash of the document id, so
selection is deterministic, reproducible across engines, and stable
under repartitioning — the same trick as sampling.deterministic_sample.

Scale shape (nothing driver-resident, one corpus pass per model):
  - feature extraction is a projection (tokenize + bigrams + md5
    bucket) followed by ONE map-side-combined groupBy per corpus; the
    model tables are ≤ `buckets` rows (default 4096 — KBs).
  - the log-ratio table BROADCASTS into the scoring join; per-document
    weights are one more map-side-combined groupBy.
  - selection is a TakeOrdered over (weight/T + gumbel) — no shuffle
    beyond the two count aggregations.
At 100 TB the raw-corpus counts are the only large aggregation, and
they are exactly the word-count shape Spark's partial aggregation is
built for. Add-α smoothing keeps unseen-in-target buckets finite.

Note the log-weight is also, up to the class prior, the log-odds of a
multinomial NAIVE BAYES classifier (target vs raw) over the same
hashed features — so `dsir_weights` doubles as the "fasttext-style
quality classifier score" of CCNet/GPT-3-era pipelines: threshold it
for filtering, Gumbel-top-n it for resampling (the paper argues
resampling beats thresholding on diversity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from leann_rs_spark.functions.text import (
    duckdb_hash64,
    duckdb_tokenize,
    duckdb_word_ngrams,
    hash64,
    tokenize,
    word_ngrams,
)

DSIR_BUCKETS = 4096
DSIR_ALPHA = 0.5
_U_MOD = 1 << 30  # uniform-noise resolution for the Gumbel keys


def _doc_buckets(
    docs: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, bucket) — one row per unigram/bigram occurrence, hashed
    into `buckets` feature slots (the paper's hashed n-gram features)."""
    toks = tokenize(text_col)
    grams = F.concat(toks, word_ngrams(toks, 2))
    return docs.select(
        F.col(id_col).alias("__id"), F.explode(grams).alias("__g")
    ).select("__id", F.pmod(hash64("__g"), F.lit(buckets)).alias("bucket"))


def dsir_log_ratio(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    raw_buckets: DataFrame | None = None,
) -> DataFrame:
    """(bucket, log_ratio): ln p̂_target − ln q̂_raw per feature bucket,
    add-α smoothed. Keyed by every bucket present in EITHER corpus
    (full outer join of the two count tables), so scoring joins never
    drop a gram. ≤ `buckets` rows — always broadcastable.

    `raw_buckets`: pre-computed _doc_buckets(raw) — dsir_weights passes
    its persisted copy so the raw corpus is tokenized/hashed ONCE for
    both the q-model counts and the per-document scoring."""
    ct = (
        _doc_buckets(target, id_col, text_col, buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("__ct"))
    )
    if raw_buckets is None:
        raw_buckets = _doc_buckets(raw, id_col, text_col, buckets)
    cr = raw_buckets.groupBy("bucket").agg(F.count("*").alias("__cr"))
    # corpus totals via an unpartitioned window over the ≤`buckets`-row
    # joined frame: the separate nt/nr aggregates + broadcast crossJoins
    # re-evaluated the UNPERSISTED ct subtree (the whole target
    # tokenize+explode+count) a second time per action — a duplicated
    # ~1s job in the x_dsir_select profile. Null-side rows of the full
    # outer join contribute nothing to either sum (SUM ignores NULLs),
    # so the totals are value-identical to the old per-table aggregates.
    from pyspark.sql import Window

    w = Window.partitionBy()
    nt_col = F.sum("__ct").over(w)
    nr_col = F.sum("__cr").over(w)
    ab = float(alpha) * buckets
    return (
        ct.join(cr, "bucket", "full_outer")
        .select(
            "bucket", "__ct", "__cr",
            nt_col.alias("__nt"), nr_col.alias("__nr"),
        )
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("__ct", F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("__nt") + F.lit(ab))
                )
                - F.log(
                    (F.coalesce("__cr", F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("__nr") + F.lit(ab))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    intermediates: list | None = None,
) -> DataFrame:
    """(id_col, n_grams, log_weight) for every raw document. Docs with
    no grams keep log_weight = 0 (an empty product), mirroring the
    paper's per-example independence.

    The exploded (id, bucket) frame feeds BOTH the q-model counts and
    the scoring aggregation (different exchange shapes), so it is
    persisted AND materialized — the tokenize+bigram+md5 explode is
    the dominant 100 TB cost and must run once, not twice (the
    lm_score persist-boundary rule). `intermediates` (caller-owned
    list) receives the persisted frame for unpersist in long-lived
    drivers."""
    db = _doc_buckets(raw, id_col, text_col, buckets).persist()
    db.count()  # materialize: two consumers with different exchanges
    if intermediates is not None:
        intermediates.append(db)
    ratio = dsir_log_ratio(
        raw, target, buckets, alpha, id_col, text_col, raw_buckets=db
    )
    per_doc = (
        db.join(F.broadcast(ratio), "bucket")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )
    return (
        raw.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def gumbel_key(id_col: str, seed: int) -> Column:
    """Deterministic Gumbel(0,1) noise from a seeded md5 of the id:
    u = (h mod 2³⁰ + 1)/(2³⁰ + 2) ∈ (0,1), g = −ln(−ln u). Stable
    under repartitioning and bit-reproducible in the SQL oracle."""
    u = (
        F.pmod(
            hash64(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
            F.lit(_U_MOD),
        )
        + F.lit(1)
    ).cast("double") / F.lit(float(_U_MOD + 2))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    temperature: float = 1.0,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    intermediates: list | None = None,
) -> DataFrame:
    """Gumbel-top-n resampling: the n raw documents maximizing
    log_weight/T + Gumbelᵢ — sampling without replacement with
    P(select) ∝ w^(1/T) (T→0 degrades to hard top-n by weight;
    test-pinned). Returns (id_col, n_grams, log_weight).

    The selection key is rounded to 6 dp before the cut: log_weight is
    a shuffle-order-dependent float sum, and an unrounded key could
    flip membership at the n-boundary between engines (or runs) on
    last-ulp noise. Rounding makes the cut deterministic; residual
    ties break on id ASC."""
    w = dsir_weights(
        raw, target, buckets, alpha, id_col, text_col,
        intermediates=intermediates,
    )
    key = F.round(
        (F.col("log_weight") / F.lit(float(temperature)))
        + gumbel_key(id_col, seed),
        6,
    )
    return (
        w.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(n)
        .select(id_col, "n_grams", "log_weight")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin — rebuilds both hashed-n-gram models, the smoothed
# log-ratio, the per-document weights, and the seeded Gumbel selection
# from the parquet table alone.
# ---------------------------------------------------------------------------

def duckdb_dsir_select(
    target_where: str,
    n: int,
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
    temperature: float = 1.0,
    seed: int = 42,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> str:
    """Oracle twin of dsir_select(raw=`table`, target=`table` WHERE
    `target_where`), log_weight rounded to `round_dp` (the weight is an
    unordered float sum — the lm_score parity recipe applies). Ordered
    by id for the gate compare."""
    toks = duckdb_tokenize(text_col)
    grams = f"list_concat(t, {duckdb_word_ngrams('t', 2)})"
    h = duckdb_hash64("g.g")
    ab = float(alpha) * buckets
    u_src = f"{id_col}::varchar || ':{seed}'"
    u = (
        f"((({duckdb_hash64(u_src)}) % {_U_MOD}) + 1)::double"
        f" / {float(_U_MOD + 2)}"
    )
    return f"""
        WITH gr AS (
            SELECT {id_col}, {grams} AS grams FROM (
                SELECT {id_col}, {toks} AS t FROM {table}
            )
        ),
        tgt_ids AS (SELECT {id_col} FROM {table} WHERE {target_where}),
        db AS (
            SELECT gr.{id_col}, ({h}) % {buckets} AS bucket
            FROM gr, unnest(gr.grams) g(g)
        ),
        ct AS (
            SELECT bucket, count(*) AS ct FROM db
            JOIN tgt_ids USING ({id_col}) GROUP BY 1
        ),
        cr AS (SELECT bucket, count(*) AS cr FROM db GROUP BY 1),
        ratio AS (
            SELECT coalesce(ct.bucket, cr.bucket) AS bucket,
                   ln((coalesce(ct, 0) + {float(alpha)})
                      / ((SELECT sum(ct) FROM ct) + {ab}))
                   - ln((coalesce(cr, 0) + {float(alpha)})
                        / ((SELECT sum(cr) FROM cr) + {ab})) AS log_ratio
            FROM ct FULL OUTER JOIN cr ON ct.bucket = cr.bucket
        ),
        w AS (
            SELECT d.{id_col}, count(*) AS n_grams,
                   sum(r.log_ratio) AS log_weight
            FROM db d JOIN ratio r USING (bucket)
            GROUP BY 1
        ),
        allw AS (
            SELECT t.{id_col},
                   coalesce(w.n_grams, 0) AS n_grams,
                   coalesce(w.log_weight, 0.0) AS log_weight
            FROM {table} t LEFT JOIN w ON t.{id_col} = w.{id_col}
        ),
        sel AS (
            SELECT {id_col}, n_grams, log_weight
            FROM allw
            ORDER BY round((log_weight / {float(temperature)})
                     + (-ln(-ln({u}))), 6) DESC, {id_col} ASC
            LIMIT {n}
        )
        SELECT {id_col}, n_grams,
               round(log_weight, {round_dp}) + 0.0 AS logw_r
        FROM sel ORDER BY {id_col}
    """
