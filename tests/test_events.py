"""Event analytics: funnel ordering, retention cohorts, transitions."""

import datetime as dt

import pytest

from leann_rs_spark.operators.events import (
    event_transitions,
    funnel_steps,
    retention_cohorts,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def funnel_ev(spark):
    rows = [
        # user 1: full ordered funnel
        (1, _ts("2024-01-01 10:00:00"), 1, "signup"),
        (2, _ts("2024-01-01 10:01:00"), 1, "view"),
        (3, _ts("2024-01-01 10:02:00"), 1, "click"),
        # user 2: click BEFORE view — order matters, depth stops at 1
        (4, _ts("2024-01-02 09:00:00"), 2, "signup"),
        (5, _ts("2024-01-02 09:01:00"), 2, "click"),
        (6, _ts("2024-01-02 09:02:00"), 2, "view"),
        # user 3: never signed up
        (7, _ts("2024-01-03 08:00:00"), 3, "view"),
    ]
    return spark.createDataFrame(
        [(i, t, u, e, 0.0, "{}") for i, t, u, e in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestFunnel:
    def test_strict_order_semantics(self, spark, funnel_ev):
        out = {
            r["user_id"]: r
            for r in funnel_steps(
                funnel_ev, ["signup", "view", "click"]
            ).collect()
        }
        assert out[1]["steps_completed"] == 3
        # user 2's click precedes the view → not counted
        assert out[2]["steps_completed"] == 2
        assert out[2]["step_3_ts"] is None
        assert out[3]["steps_completed"] == 0

    def test_later_retry_completes(self, spark, funnel_ev):
        """A second click AFTER the view completes user 2's funnel."""
        extra = spark.createDataFrame(
            [(8, _ts("2024-01-02 09:03:00"), 2, "click", 0.0, "{}")],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        out = {
            r["user_id"]: r
            for r in funnel_steps(
                funnel_ev.unionByName(extra), ["signup", "view", "click"]
            ).collect()
        }
        assert out[2]["steps_completed"] == 3
        assert out[2]["step_3_ts"] == _ts("2024-01-02 09:03:00")


class TestRetentionAndTransitions:
    def test_cohort_triangle(self, spark, funnel_ev):
        out = retention_cohorts(funnel_ev, period="day").collect()
        m = {
            (r["cohort_period"].day, r["activity_period"].day): r["n_users"]
            for r in out
        }
        assert m[(1, 1)] == 1 and m[(2, 2)] == 1 and m[(3, 3)] == 1
        assert (1, 2) not in m  # user 1 not active on day 2

    def test_transitions(self, spark, funnel_ev):
        out = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in event_transitions(funnel_ev).collect()
        }
        assert out[("<start>", "signup")] == 2
        assert out[("<start>", "view")] == 1
        assert out[("signup", "view")] == 1
        assert out[("signup", "click")] == 1
