"""Clustering / SemDeDup tests: assignment semantics on constructed
cases, inline-vs-broadcast path equality, within-cluster pair subset
property, keep policy, and Spark ⟷ DuckDB parity on sf0.001."""

import duckdb
import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.ann import take_centroids
from leann_rs_spark.operators.clustering import (
    cluster_assign,
    duckdb_cluster_assign,
    duckdb_semantic_near_dups,
    semantic_keep,
    semantic_near_dups,
)
from leann_rs_spark.operators.dedup import embedding_near_dups

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _tiny(spark):
    # two tight groups along axes 0 and 1, plus one outlier between
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.1, 0.99, 0.0]),
        (4, [0.7, 0.7, 0.2]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_assign_picks_nearest_by_cosine(spark):
    df = _tiny(spark)
    cents = take_centroids(df, 2)  # vec_id 0 and 1 -> both near axis 0
    got = {r["vec_id"]: r["cluster_id"] for r in cluster_assign(df, cents).collect()}
    # centroid 0 is exactly [1,0,0]; vec 0 must map to itself (cos=1)
    assert got[0] == 0
    # every vector gets exactly one cluster
    assert set(got) == {0, 1, 2, 3, 4}


def test_assign_tie_breaks_on_smaller_centroid_id(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = take_centroids(df, 2)  # two IDENTICAL centroids -> tie
    got = {r["vec_id"]: r["cluster_id"] for r in cluster_assign(df, cents).collect()}
    assert set(got.values()) == {0}  # smaller centroid_id wins every tie


def test_inline_and_broadcast_paths_identical(spark):
    emb = _emb(spark)
    cents = take_centroids(emb, 8)
    a = sorted(
        (r["vec_id"], r["cluster_id"], r["cos"])
        for r in cluster_assign(emb, cents).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster_id"], r["cos"])
        for r in cluster_assign(emb, cents, inline_max=2).collect()
    )
    assert a == b  # bit-exact, not approximately equal


def test_semantic_pairs_subset_of_exact(spark):
    emb = _emb(spark)
    cents = take_centroids(emb, 8)
    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_dups(emb, cents, threshold=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold=0.5).collect()
    }
    assert sem <= exact  # precision 1.0: every emitted pair is real


def test_semantic_pairs_within_cluster_only(spark):
    df = _tiny(spark)
    cents = take_centroids(df, 2)
    assigned = {
        r["vec_id"]: r["cluster_id"] for r in cluster_assign(df, cents).collect()
    }
    for r in semantic_near_dups(df, cents, threshold=0.8).collect():
        assert assigned[r["id_a"]] == assigned[r["id_b"]]


def test_semantic_keep_drops_higher_id_of_pair(spark):
    df = _tiny(spark)
    cents = take_centroids(df, 2)
    pairs = semantic_near_dups(df, cents, threshold=0.95)
    kept = {r["vec_id"] for r in semantic_keep(pairs, df).collect()}
    dropped = {r["id_b"] for r in pairs.collect()}
    assert kept == {0, 1, 2, 3, 4} - dropped
    assert 0 in kept and 2 in kept  # the group minima always survive


def test_duckdb_parity_assign(spark):
    emb = _emb(spark)
    cents = take_centroids(emb, 8)
    got = sorted(
        (r["vec_id"], r["cluster_id"], r["cos"])
        for r in cluster_assign(emb, cents).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = sorted(tuple(t) for t in con.execute(duckdb_cluster_assign(8)).fetchall())
    assert got == want


def test_duckdb_parity_pairs(spark):
    emb = _emb(spark)
    cents = take_centroids(emb, 8)
    got = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in semantic_near_dups(emb, cents, threshold=0.5).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(duckdb_semantic_near_dups(8, threshold=0.5)).fetchall()
    )
    assert got == want


def test_kernel_verify_identical_to_expression(spark):
    from pyspark.sql import functions as F  # noqa: F811
    from leann_rs_spark.functions.vector import l2_normalize

    emb = _emb(spark).select(
        "vec_id", l2_normalize("embedding").alias("embedding")
    )
    cents = take_centroids(emb, 8)
    ex = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in semantic_near_dups(
            emb, cents, threshold=0.5, metric="ip"
        ).collect()
    )
    ke = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in semantic_near_dups(
            emb, cents, threshold=0.5, metric="ip", verify="kernel"
        ).collect()
    )
    assert ex == ke  # bit-exact, not approximately equal


def test_kernel_verify_sub_blocks_identical(spark):
    from leann_rs_spark.functions.vector import l2_normalize

    emb = _emb(spark).select(
        "vec_id", l2_normalize("embedding").alias("embedding")
    )
    cents = take_centroids(emb, 2)  # two huge clusters -> many sub-blocks
    big = sorted(
        tuple(r) for r in semantic_near_dups(
            emb, cents, threshold=0.5, metric="ip", verify="kernel",
            bucket_block=16,
        ).collect()
    )
    one = sorted(
        tuple(r) for r in semantic_near_dups(
            emb, cents, threshold=0.5, metric="ip", verify="kernel",
        ).collect()
    )
    assert big == one


def test_kernel_verify_requires_ip(spark):
    emb = _emb(spark)
    cents = take_centroids(emb, 4)
    with pytest.raises(ValueError):
        semantic_near_dups(emb, cents, metric="cosine", verify="kernel")


def test_suggest_centroids_scales_with_n():
    from leann_rs_spark.operators.clustering import suggest_centroids

    assert suggest_centroids(50_000, 256) == 195
    assert suggest_centroids(100, 256) == 1
    assert suggest_centroids(0) == 1


def test_empty_codebook_rejected(spark):
    emb = _emb(spark)
    empty = take_centroids(emb, 8).filter("centroid_id < 0")
    with pytest.raises(ValueError):
        cluster_assign(emb, empty)


# ------------------------------------------------------------- k-center


def test_kcenter_hand_vectors(spark):
    """2-d square + center point: picks cover the corners before the
    middle, radius curve non-increasing."""
    from leann_rs_spark.operators.clustering import kcenter_sample

    rows = [
        (0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0]),
        (3, [10.0, 10.0]), (4, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kcenter_sample(df, k=5).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["vec_id"] == 0  # deterministic seed: min id
    # the farthest point from (0,0) is the opposite corner
    assert out[1]["vec_id"] == 3
    # middle point is covered last
    assert out[-1]["vec_id"] == 4
    radii = [r["radius_r"] for r in out[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_k_exceeds_corpus(spark):
    from leann_rs_spark.operators.clustering import kcenter_sample

    df = spark.createDataFrame(
        [(0, [1.0]), (1, [2.0])], "vec_id bigint, embedding array<double>"
    )
    out = kcenter_sample(df, k=10).collect()
    assert len(out) == 2


def test_kcenter_empty_corpus(spark):
    from leann_rs_spark.operators.clustering import kcenter_sample

    df = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert kcenter_sample(df, k=3).collect() == []


def test_kcenter_covers_clusters_on_real_embeddings(spark):
    """On the labeled corpus, 8 picks should touch several distinct
    label clusters — diversity is the operator's purpose."""
    from tests.conftest import SF_SMOKE
    from leann_rs_spark.operators.clustering import kcenter_sample

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    picks = [r["vec_id"] for r in kcenter_sample(emb, k=8).collect()]
    labels = {
        r["label"]
        for r in emb.filter(F.col("vec_id").isin(picks)).collect()
    }
    assert len(labels) >= 3


def test_embedding_drift_semantics(spark):
    """Identical slices → every KL term 0; a slice that abandons a
    cluster shows a negative term there and positive where it floods;
    all configured clusters emit a row even when empty."""
    from pyspark.sql import Row

    from leann_rs_spark.operators.clustering import embedding_drift

    def vec(i):  # 4 orthogonal unit directions
        v = [0.0] * 4
        v[i] = 1.0
        return v

    rows = [Row(vec_id=i, embedding=vec(i)) for i in range(4)]
    # ref: 10 in cluster 0, 10 in cluster 1; new: all 20 in cluster 0
    ref = rows + [Row(vec_id=100 + i, embedding=vec(i % 2)) for i in range(20)]
    new = rows + [Row(vec_id=200 + i, embedding=vec(0)) for i in range(20)]
    ref_df = spark.createDataFrame(ref)
    new_df = spark.createDataFrame(new)
    cents = ref_df.filter("vec_id < 4").selectExpr(
        "vec_id AS centroid_id", "embedding AS centroid_vec"
    )
    out = {r["cluster_id"]: r
           for r in embedding_drift(ref_df, new_df, cents).collect()}
    assert set(out) == {0, 1, 2, 3}  # grid keeps empty clusters
    assert out[0]["n_ref"] == 11 and out[0]["n_new"] == 21
    assert out[1]["n_ref"] == 11 and out[1]["n_new"] == 1
    assert out[0]["kl_term_r"] > 0      # flooded cluster
    assert out[1]["kl_term_r"] < 0      # abandoned cluster
    assert out[2]["kl_term_r"] == 0.0   # equal (empty) occupancy
    # self-drift is exactly zero everywhere
    same = embedding_drift(ref_df, ref_df, cents).collect()
    assert all(r["kl_term_r"] == 0.0 for r in same)
