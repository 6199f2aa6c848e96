"""Retrieval metrics (MRR/nDCG/recall) and time-series resample-ffill."""

import datetime as dt
import math

from pyspark.sql import functions as F

from leann_rs_spark.operators.features import resample_ffill
from leann_rs_spark.operators.retrieval_eval import eval_rankings


def _rankings(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long")


class TestEvalRankings:
    def test_perfect_ranking_is_exactly_one(self, spark):
        rk = _rankings(spark, [(1, d, r) for r, d in enumerate([7, 8, 9], 1)])
        qr = _qrels(spark, [(1, 7), (1, 8), (1, 9)])
        row = eval_rankings(rk, qr, k=10).collect()[0]
        assert row["ndcg_r"] == 1.0  # dcg == idcg bitwise
        assert row["mrr_r"] == 1.0
        assert row["recall_r"] == 1.0

    def test_no_hits_scores_zero(self, spark):
        rk = _rankings(spark, [(1, 7, 1), (1, 8, 2)])
        qr = _qrels(spark, [(1, 99), (2, 50)])
        out = {r["query_id"]: r for r in eval_rankings(rk, qr).collect()}
        assert out[1]["mrr_r"] == 0.0 and out[1]["ndcg_r"] == 0.0
        # query 2 has judgments but no ranking rows at all
        assert out[2]["recall_r"] == 0.0 and out[2]["n_hits"] == 0

    def test_rank_cutoff_and_values(self, spark):
        # hit at rank 2 and one beyond k → dcg = 1/log2(3), idcg over
        # min(k=2, n_rel=2) ranks
        rk = _rankings(spark, [(1, 5, 1), (1, 7, 2), (1, 8, 3)])
        qr = _qrels(spark, [(1, 7), (1, 8)])
        row = eval_rankings(rk, qr, k=2).collect()[0]
        assert row["n_hits"] == 1
        assert row["mrr_r"] == 0.5
        dcg = 1.0 / math.log2(3)
        idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3)
        assert abs(row["ndcg_r"] - dcg / idcg) < 2e-6
        assert row["recall_r"] == 0.5


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(t), u, "e", v, "{}")
         for i, t, u, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestResampleFfill:
    def test_gap_fill_and_flags(self, spark):
        ev = _ev(spark, [
            (1, "2024-01-01 00:10:00", 1, 10.0),
            (2, "2024-01-01 12:30:00", 1, 30.0),  # skips the 06:00 bucket
        ])
        out = resample_ffill(ev, bucket_seconds=21600).orderBy(
            "bucket_ts"
        ).collect()
        assert [r["value"] for r in out] == [10.0, 10.0, 30.0]
        assert [r["filled"] for r in out] == [False, True, False]
        assert [r["n_obs"] for r in out] == [1, 0, 1]
        assert out[0]["bucket_ts"] == dt.datetime(2024, 1, 1, 0, 0)
        assert out[1]["bucket_ts"] == dt.datetime(2024, 1, 1, 6, 0)

    def test_last_in_bucket_wins_with_id_tiebreak(self, spark):
        ev = _ev(spark, [
            (1, "2024-01-01 00:10:00", 1, 10.0),
            (3, "2024-01-01 00:20:00", 1, 33.0),  # same ts as id 2, higher id
            (2, "2024-01-01 00:20:00", 1, 22.0),
        ])
        out = resample_ffill(ev, bucket_seconds=21600).collect()
        assert len(out) == 1
        assert out[0]["value"] == 33.0 and out[0]["n_obs"] == 3

    def test_entities_are_independent(self, spark):
        ev = _ev(spark, [
            (1, "2024-01-01 00:00:00", 1, 1.0),
            (2, "2024-01-02 00:00:00", 1, 2.0),
            (3, "2024-01-01 18:00:00", 2, 9.0),
        ])
        out = resample_ffill(ev, bucket_seconds=21600)
        counts = {r["user_id"]: r["n"] for r in out.groupBy("user_id")
                  .agg(F.count("*").alias("n")).collect()}
        assert counts == {1: 5, 2: 1}  # user 1: 00:00→24:00 = 5 buckets


class TestResampleInterpolate:
    def test_linear_bridge_and_trailing_carry(self, spark):
        from leann_rs_spark.operators.features import resample_interpolate

        ev = _ev(spark, [
            (1, "2024-01-01 00:00:00", 1, 10.0),
            # two empty buckets then an observation at 18:00
            (2, "2024-01-01 18:00:00", 1, 40.0),
        ])
        out = resample_interpolate(ev, bucket_seconds=21600).orderBy(
            "bucket_ts"
        ).collect()
        assert [r["value"] for r in out] == [10.0, 20.0, 30.0, 40.0]
        assert [r["filled"] for r in out] == [False, True, True, False]

    def test_observed_values_untouched_and_carry_after_last(self, spark):
        from leann_rs_spark.operators.features import resample_interpolate

        ev = _ev(spark, [
            (1, "2024-01-01 00:00:00", 1, 7.25),
            (2, "2024-01-01 06:30:00", 1, 9.5),
            # one empty bucket, then two events in the 18:00 bucket
            (3, "2024-01-01 18:01:00", 1, 1.0),
            (4, "2024-01-01 18:02:00", 1, 2.0),
        ])
        out = {r["bucket_ts"].hour: r for r in resample_interpolate(
            ev, bucket_seconds=21600
        ).collect()}
        assert out[0]["value"] == 7.25 and not out[0]["filled"]
        assert out[6]["value"] == 9.5 and out[6]["n_obs"] == 1
        # 12:00 bridges 9.5 -> 2.0 (last obs in the 18:00 bucket):
        # fraction (12-6)/(18-6) = 0.5
        assert abs(out[12]["value"] - (9.5 + (2.0 - 9.5) * 0.5)) < 1e-12
        assert out[18]["value"] == 2.0  # last-in-bucket selection
