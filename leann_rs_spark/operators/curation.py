"""End-to-end corpus curation: the composition a training-data build
actually runs, as one declarative plan.

    quality gate (Gopher §A1.1, projection)
      → exact dedup (one hash shuffle, keep smallest id per text)
      → MinHash near-dup clusters, keep canonical (banded LSH join +
        label propagation)
      → stable train/val/test split assignment (projection)

Not a reference operator (SURVEY §2.5) — this is the brief's
training-pipeline surface, driven by `__spark_entry__.x_curation_pipeline`
(oracle: a CTE chain of the per-stage DuckDB twins) and `leann-spark
curate` on the CLI.

Two measured plan traps are handled here (98 s → 7.7 s at sf0.1):
  * FilterExec splits a conjunctive predicate into independent
    conditions, defeating subexpression reuse — the Gopher conditions
    share the words/lines arrays, so the keep flag is computed as a
    PROJECTED column behind a cache boundary (the boundary also stops
    CollapseProject/PushDownPredicate from rewriting it back into a
    filter).
  * Left inline, the predicate would be pushed into EVERY join branch
    of the downstream dedup self-joins; the persists give every
    consumer the materialized rows. Same at 100 TB — a curation run
    checkpoints the filtered corpus before the dedup joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher_params: dict | None = None,
    minhash_threshold: float = 0.5,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """→ the surviving rows of `docs` plus a `split` column.

    `gopher_params` are keyword overrides for
    functions.textstats.gopher_keep (defaults = the published
    thresholds); `split_weights` as in sampling.split_assign.
    """
    from leann_rs_spark.functions.textstats import gopher_keep
    from leann_rs_spark.operators.dedup import (
        dedup_keep_canonical,
        exact_dedup,
        minhash_near_dups,
    )
    from leann_rs_spark.operators.sampling import split_assign

    proj = docs.withColumn(
        "__keep", gopher_keep(text_col, **(gopher_params or {}))
    ).persist()
    q = proj.filter("__keep").drop("__keep")
    canon = (
        exact_dedup(q, id_col=id_col, text_col=text_col)
        .filter("is_canonical")
        .select(id_col)
    )
    q2 = q.join(canon, id_col, "left_semi").persist()
    pairs = minhash_near_dups(
        q2, id_col=id_col, text_col=text_col, threshold=minhash_threshold
    )
    kept = dedup_keep_canonical(q2, pairs, id_col=id_col).filter("keep")
    return split_assign(kept, id_col, weights=split_weights).drop(
        "cluster_id", "keep"
    )
