"""Round-4c operators: rolling event features, hashed quality
classifier, Bloom incremental dedup, URL canonicalization — hand
vectors + independent-model parity + plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.features import rolling_event_features


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 7, 1.0),
            (2, _ts("2024-01-01 10:00:02"), 7, 3.0),
            (3, _ts("2024-01-01 10:00:02"), 7, 5.0),   # ts tie → id order
            (4, _ts("2024-01-01 10:01:00"), 7, 7.0),
            (5, _ts("2024-01-01 09:00:00"), 8, 10.0),  # other entity
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )


class TestRollingFeatures:
    def test_hand_vector(self, ev):
        rows = {
            r["event_id"]: r
            for r in rolling_event_features(ev, n_last=2).collect()
        }
        assert rows[1]["prev_value"] is None
        assert rows[1]["gap_us"] is None
        assert rows[1]["cum_events"] == 1
        assert rows[2]["prev_value"] == 1.0
        assert rows[2]["gap_us"] == 2_000_000
        # ts tie: event 3 follows event 2 (id tie-break), gap 0
        assert rows[3]["prev_value"] == 3.0
        assert rows[3]["gap_us"] == 0
        assert rows[3]["roll_mean"] == pytest.approx((3.0 + 5.0) / 2)
        assert rows[4]["roll_mean"] == pytest.approx((5.0 + 7.0) / 2)
        assert rows[4]["cum_events"] == 4
        # entities are independent
        assert rows[5]["prev_value"] is None and rows[5]["cum_events"] == 1

    def test_single_exchange(self, ev):
        plan = (
            rolling_event_features(ev)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1


class TestQualityClassifier:
    def test_bounds_null_and_determinism(self, spark):
        from leann_rs_spark.functions.textstats import (
            quality_classifier_logit,
        )

        df = spark.createDataFrame(
            [(0, "the quick brown fox jumps"), (1, ""), (2, "a b c"),
             (3, "the quick brown fox jumps")],
            "doc_id long, text string",
        ).select("doc_id", quality_classifier_logit("text").alias("z"))
        rows = {r["doc_id"]: r["z"] for r in df.collect()}
        assert -1.0 <= rows[0] <= 1.0
        assert rows[1] is None          # no tokens
        assert rows[2] is None          # all tokens length <= 1
        assert rows[3] == rows[0]       # deterministic

    def test_mean_of_bucket_weights(self, spark):
        """Logit of a doc == mean of single-token logits (linearity)."""
        from leann_rs_spark.functions.textstats import (
            quality_classifier_logit,
        )

        toks = ["alpha", "beta", "gamma"]
        single = {
            r["t"]: r["z"]
            for r in spark.createDataFrame([(t,) for t in toks], "t string")
            .select("t", quality_classifier_logit("t").alias("z"))
            .collect()
        }
        combined = (
            spark.createDataFrame([(" ".join(toks),)], "text string")
            .select(quality_classifier_logit("text").alias("z"))
            .collect()[0]["z"]
        )
        assert combined == pytest.approx(sum(single.values()) / 3, abs=1e-12)


class TestBloomDedup:
    def test_no_false_negatives_and_fp_surface(self, spark):
        """Every exact dup is maybe_dup ∧ true_dup (Bloom FNs are
        impossible); with a DELIBERATELY tiny sketch (m_words=1) false
        positives appear and are true_dup=false."""
        from leann_rs_spark.operators.dedup import bloom_dedup_incremental

        corpus = spark.createDataFrame(
            [(i, f"corpus document number {i}") for i in range(50)],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [(100, "corpus document number 7"),   # exact dup
             (101, "corpus document number 13"),  # exact dup
             (102, "a genuinely new document")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in bloom_dedup_incremental(corpus, batch).collect()
        }
        assert rows[100]["maybe_dup"] and rows[100]["true_dup"]
        assert rows[101]["maybe_dup"] and rows[101]["true_dup"]
        assert not rows[102]["true_dup"]

        # tiny sketch: 63 bits for 50 docs × 5 positions → saturated,
        # the new doc false-positives but exact verify rescues it
        tiny = {
            r["doc_id"]: r
            for r in bloom_dedup_incremental(
                corpus, batch, m_words=1
            ).collect()
        }
        assert tiny[102]["maybe_dup"] and not tiny[102]["true_dup"]
        assert tiny[100]["true_dup"]  # exactness survives saturation

    def test_sketch_size_bounded(self, spark):
        from leann_rs_spark.operators.dedup import bloom_corpus_filter

        corpus = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
        )
        bloom = bloom_corpus_filter(corpus, m_words=16).collect()
        assert len(bloom) <= 16
        assert all(0 <= r["word"] < 16 for r in bloom)


class TestNormalizeUrl:
    CASES = [
        ("HTTPS://WWW.Example.COM/Path/", "https://www.example.com/Path"),
        ("http://site.com:80/a", "http://site.com/a"),
        ("https://site.com:443/a", "https://site.com/a"),
        ("https://site.com:8080/a", "https://site.com:8080/a"),  # kept
        ("http://s.com/p?utm_source=x&q=1", "http://s.com/p?q=1"),
        ("http://s.com/p?q=1&utm_medium=m", "http://s.com/p?q=1"),
        ("http://s.com/p?utm_a=1&utm_b=2", "http://s.com/p"),
        ("http://s.com/p#frag", "http://s.com/p"),
        ("http://s.com/p?x=UPPER", "http://s.com/p?x=UPPER"),  # path case kept
        ("http://s.com", "http://s.com"),
    ]

    def test_cases_and_duckdb_parity(self, spark, duck):
        from leann_rs_spark.functions.text import (
            duckdb_normalize_url,
            normalize_url,
        )

        df = spark.createDataFrame(
            [(u,) for u, _ in self.CASES], "u string"
        ).select("u", normalize_url("u").alias("n"))
        got = {r["u"]: r["n"] for r in df.collect()}
        for u, want in self.CASES:
            assert got[u] == want, u
        for u, want in self.CASES:
            (d,) = duck.sql(
                f"SELECT {duckdb_normalize_url('u')} FROM "
                f"(SELECT '{u}' AS u)"
            ).fetchone()
            assert d == want, f"duckdb {u}"

    def test_extract_urls(self, spark):
        from leann_rs_spark.functions.text import extract_urls

        out = (
            spark.createDataFrame(
                [("see https://a.com/x, then http://b.org/y) end",)],
                "text string",
            )
            .select(extract_urls("text").alias("us"))
            .collect()[0]["us"]
        )
        assert out == ["https://a.com/x", "http://b.org/y"]


class TestLmScoreRef:
    def test_reduces_to_self_trained_and_oov_scores_high(self, spark):
        """train==score ≡ lm_score (every bigram seen → identical
        add-k terms); an OOV doc scores strictly higher than an
        in-distribution one."""
        from leann_rs_spark.functions.textstats import lm_score, lm_score_ref

        docs = spark.createDataFrame(
            [(0, "the cat sat on the mat"), (1, "the cat sat on the hat"),
             (2, "the mat sat on the cat")],
            "doc_id long, text string",
        )
        a = {r["doc_id"]: r for r in lm_score(docs).collect()}
        b = {r["doc_id"]: r for r in lm_score_ref(docs, docs).collect()}
        for i in a:
            assert a[i]["n_bigrams"] == b[i]["n_bigrams"]
            assert a[i]["xent"] == pytest.approx(b[i]["xent"], abs=1e-12)

        score = spark.createDataFrame(
            [(10, "the cat sat on the mat"),
             (11, "zebra quagga wombat axolotl numbat dugong")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in lm_score_ref(docs, score).collect()}
        assert out[11]["xent"] > out[10]["xent"]
        assert out[11]["n_bigrams"] == 5  # OOV bigrams still scored


class TestDecontaminateSpans:
    def test_cut_and_survivors(self, spark):
        from leann_rs_spark.operators.dedup import decontaminate_spans

        leak = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
        docs = spark.createDataFrame(
            [(0, f"intro words {leak} trailing tail"),
             (1, "completely unrelated text with several plain words here"),
             (2, "short doc")],
            "doc_id long, text string",
        )
        evals = spark.createDataFrame(
            [(f"xx {leak} yy",)], "probe_text string"
        )
        rows = {
            r["doc_id"]: r
            for r in decontaminate_spans(docs, evals, n=8).collect()
        }
        assert rows[0]["contam_tokens"] == 8
        assert rows[0]["clean_text"] == "intro words trailing tail"
        assert rows[1]["contam_tokens"] == 0
        assert rows[1]["clean_text"].startswith("completely unrelated")
        assert rows[2]["n_tokens"] == 2 and rows[2]["contam_tokens"] == 0


class TestBudgetSelect:
    def _mk(self, spark):
        # (id, priority, weight)
        return spark.createDataFrame(
            [(1, 0.9, 10), (2, 0.9, 10), (3, 0.8, 15), (4, 0.7, 100),
             (5, 0.6, 5)],
            "doc_id long, priority double, n_tokens long",
        )

    def test_prefix_rule_and_overflow_blocks_tail(self, spark):
        from leann_rs_spark.operators.sampling import budget_select

        # order: 1,2,3,4,5 → cums 10,20,35,135,140; budget 40 keeps 1-3
        # (doc 5 would "fit" the remainder but the PREFIX rule stops at
        # the first overflow — pinned semantics)
        out = budget_select(self._mk(spark), budget=40).collect()
        assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
        assert {r["doc_id"]: r["cum_weight"] for r in out} == {
            1: 10, 2: 20, 3: 35,
        }

    def test_exact_fit_and_granularity_invariance(self, spark):
        from leann_rs_spark.operators.sampling import budget_select

        df = self._mk(spark)
        assert sorted(
            r["doc_id"] for r in budget_select(df, budget=35).collect()
        ) == [1, 2, 3]  # boundary inclusive
        for g in (1.0, 1000.0):
            got = sorted(
                (r["doc_id"], r["cum_weight"])
                for r in budget_select(
                    df, budget=135, shard_granularity=g
                ).collect()
            )
            assert got == [(1, 10), (2, 20), (3, 35), (4, 135)]


class TestMediaAhash:
    def _media(self, spark, rows):
        return spark.createDataFrame(
            [(i, t.encode()) for i, t in rows],
            "media_id long, content binary",
        )

    def test_locality_and_near_dup_pairs(self, spark):
        from leann_rs_spark.operators.multimodal import (
            media_ahash,
            media_ahash_near_dups,
        )

        base = (
            "a moderately long synthetic document body used as fake "
            "pixel source for the perceptual hash operator test"
        )
        perturbed = base[:20] + "X" + base[21:]  # same length, 1 char
        media = self._media(
            spark, [(1, base), (2, perturbed), (3, "completely different "
                    "content with other words and layout entirely")]
        )
        h = {r["media_id"]: r["ahash"] for r in media_ahash(media).collect()}
        assert h[1] != h[3]
        assert bin(h[1] ^ h[2]).count("1") <= 6  # locality preserved
        pairs = {
            (r["id_a"], r["id_b"])
            for r in media_ahash_near_dups(media).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs

    def test_identical_content_hamming_zero(self, spark):
        from leann_rs_spark.operators.multimodal import media_ahash_near_dups

        media = self._media(spark, [(1, "same bytes"), (2, "same bytes")])
        rows = media_ahash_near_dups(media).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [
            (1, 2, 0)
        ]

    def test_real_engine_hashes_pixels(self, spark):
        """Round 5 upgraded engine="real" from a NotImplementedError
        stub to an actual pixel kernel (decode_image → 8×8 nn_resize →
        grayscale mean threshold): decodable bytes hash, dirty bytes
        stay NULL. Deeper pins live in test_multimodal.py."""
        from leann_rs_spark.operators.multimodal import (
            bmp_encode,
            media_ahash,
            real_ahash_py,
        )
        import numpy as np

        arr = np.zeros((8, 8, 3), dtype=np.uint8)
        arr[:4] = 200  # top half bright -> deterministic bit pattern
        blob = bmp_encode(arr)
        media = spark.createDataFrame(
            [(1, bytearray(blob)), (2, bytearray(b"not an image"))],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r["ahash"]
                for r in media_ahash(media, engine="real").collect()}
        assert rows[1] == real_ahash_py(blob) and rows[1] is not None
        assert rows[2] is None


class TestGroupBudgetSelect:
    def test_dict_budgets_and_group_independence(self, spark):
        from leann_rs_spark.operators.sampling import group_budget_select

        df = spark.createDataFrame(
            [(1, "a", 0.9, 10), (2, "a", 0.8, 10), (3, "a", 0.7, 10),
             (4, "b", 0.9, 10), (5, "b", 0.5, 10),
             (6, "c", 0.9, 10)],
            "doc_id long, source string, priority double, n_tokens long",
        )
        out = group_budget_select(
            df, {"a": 20, "b": 100}, group_col="source"
        ).collect()
        got = sorted((r["doc_id"], r["cum_weight"]) for r in out)
        # a: top-2 fit 20; b: both fit; c: unlisted → budget 0 → dropped
        assert got == [(1, 10), (2, 20), (4, 10), (5, 20)]

    def test_scalar_budget(self, spark):
        from leann_rs_spark.operators.sampling import group_budget_select

        df = spark.createDataFrame(
            [(1, "a", 0.9, 10), (2, "a", 0.8, 10), (3, "b", 0.9, 10)],
            "doc_id long, source string, priority double, n_tokens long",
        )
        out = group_budget_select(df, 10, group_col="source").collect()
        assert sorted(r["doc_id"] for r in out) == [1, 3]


class TestStreamRollingKernel:
    def test_state_carries_across_batches(self):
        """Two micro-batches ≡ one batch: the tail state (prev value,
        last_us, window values, count) survives the batch boundary."""
        import pandas as pd

        from leann_rs_spark.streaming.features import _rolling_with_state

        class FakeState:
            _v = None

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v

        fn = _rolling_with_state(3)
        st = FakeState()
        b1 = pd.DataFrame(
            {"event_id": [1, 2],
             "ts": pd.to_datetime(["2024-01-01 10:00:00",
                                   "2024-01-01 10:00:02"]),
             "value": [1.0, 3.0]}
        )
        pd.concat(list(fn((7,), iter([b1]), st)))
        b2 = pd.DataFrame(
            {"event_id": [3],
             "ts": pd.to_datetime(["2024-01-01 10:00:05"]),
             "value": [5.0]}
        )
        out2 = pd.concat(list(fn((7,), iter([b2]), st)))
        row = out2.iloc[0]
        assert row["prev_value"] == 3.0
        assert row["gap_us"] == 3_000_000
        assert row["roll_mean"] == (1.0 + 3.0 + 5.0) / 3
        assert row["cum_events"] == 3


class TestTfidfKeywords:
    def test_rare_term_outranks_common(self, spark):
        from leann_rs_spark.operators.embedder import tfidf_keywords

        docs = spark.createDataFrame(
            [(0, "common zyzzyva common"),
             (1, "common alpha common"),
             (2, "common beta common"),
             (3, "common gamma common"),
             (4, "common delta common")],
            "doc_id long, text string",
        )
        rows = tfidf_keywords(docs, k=2).collect()
        top = {r["doc_id"]: r["term"] for r in rows if r["rank"] == 1}
        # tf(common)=2 but idf_q=1e6 (every doc) → 2.0e6; the unique
        # term scores ln(6/2)+1 ≈ 2.1e6 — rarity wins
        assert top[0] == "zyzzyva"
        for r in rows:
            assert isinstance(r["score_q"], int)  # integer key, no floats


class TestRollingAnomaly:
    def test_causal_window_and_flags(self, spark):
        from leann_rs_spark.operators.features import rolling_anomaly

        rows = [(i, _ts(f"2024-01-01 10:00:{i:02d}"), 1, 10.0)
                for i in range(8)]
        rows.append((8, _ts("2024-01-01 10:00:08"), 1, 10.0))   # normal
        rows.append((9, _ts("2024-01-01 10:00:09"), 1, 500.0))  # spike
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        out = {
            r["event_id"]: r
            for r in rolling_anomaly(ev, n_hist=8, min_hist=4).collect()
        }
        # first rows: not enough history → NULL stats, FALSE flag
        assert out[0]["hist_mean"] is None
        assert out[0]["is_anomaly"] is False
        # constant history, equal value → var 0, no flag
        assert out[8]["hist_var"] == 0.0 and out[8]["is_anomaly"] is False
        # spike vs constant history → var 0, any deviation flags
        assert out[9]["is_anomaly"] is True
        # causal: the spike's own value is NOT in its history
        assert out[9]["hist_mean"] == 10.0


class TestPmiPhrases:
    def test_collocation_beats_chance_pair(self, spark):
        from leann_rs_spark.functions.textstats import pmi_phrases

        # "alpha beta" always adjacent (perfect collocation); "xx yy"
        # co-occur but xx/yy also pair with everything else
        docs = spark.createDataFrame(
            [(i, "alpha beta xx yy xx zz yy ww") for i in range(5)],
            "doc_id long, text string",
        )
        rows = pmi_phrases(docs, min_count=5, k=10).collect()
        by_pair = {(r["w1"], r["w2"]): r["pmi_r"] for r in rows}
        assert ("alpha", "beta") in by_pair
        assert by_pair[("alpha", "beta")] == max(by_pair.values())

    def test_min_count_cut(self, spark):
        from leann_rs_spark.functions.textstats import pmi_phrases

        docs = spark.createDataFrame(
            [(0, "rare pair rare pair"), (1, "other words here")],
            "doc_id long, text string",
        )
        rows = pmi_phrases(docs, min_count=10, k=10).collect()
        assert rows == []  # nothing reaches min support
