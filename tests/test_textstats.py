"""Text-analysis tests: known-value checks, real multilingual lang-ID,
and Spark ⟷ DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from leann_rs_spark.functions.textstats import (
    alpha_ratio,
    bpe_ish_token_count,
    duckdb_fingerprint,
    duckdb_lang_id,
    duckdb_quality_score,
    duckdb_token_count,
    fingerprint,
    lang_id,
    mean_word_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    type_token_ratio,
)

MULTILINGUAL = [
    ("en", "the cat sat on the mat and it was happy with this state of things"),
    ("de", "der hund ist nicht mit der katze und wir sind auch nicht bei ihnen"),
    ("fr", "le chat est dans la maison et nous avons plus de temps pour ce travail"),
    ("es", "el perro es más grande que el gato pero los dos son de la casa"),
    ("zh", "这是一个中文句子用于测试语言识别功能"),
]


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("v")).head()["v"]


def test_token_counts(spark):
    assert _one(spark, "one two  three\nfour", token_count("t")) == 4
    assert _one(spark, "", token_count("t")) == 0
    # bpe-ish: "don" "'" "t" "stop" "99" -> don,'t -> ["don", "'", "t", "stop", "9", "9"]
    assert _one(spark, "don't stop 99", bpe_ish_token_count("t")) == 6


def test_ratios_known_values(spark):
    assert _one(spark, "abcd", alpha_ratio("t")) == 1.0
    assert _one(spark, "ab12", alpha_ratio("t")) == 0.5
    assert _one(spark, "a.b,", punct_ratio("t")) == 0.5
    assert _one(spark, "", alpha_ratio("t")) == 0.0
    # "the cat the" -> tokens [the, cat, the]; stopwords: 2/3
    assert _one(spark, "the cat the", stopword_ratio("t")) == pytest.approx(2 / 3)
    assert _one(spark, "aa bb aa", type_token_ratio("t")) == pytest.approx(2 / 3)
    assert _one(spark, "ab abcd", mean_word_len("t")) == 3.0


def test_quality_score_ranks_prose_over_noise(spark):
    prose = "the quick brown fox jumps over the lazy dog near the river bank"
    noise = "@@@ ### !!! ,,, ;;; ::: 111 222 ??? !!!"
    q_prose = _one(spark, prose, quality_score("t"))
    q_noise = _one(spark, noise, quality_score("t"))
    assert 0.0 <= q_noise < q_prose <= 1.0


def test_lang_id_real_sentences(spark):
    df = spark.createDataFrame(MULTILINGUAL, ["expected", "t"])
    rows = df.select("expected", lang_id(F.col("t")).alias("pred")).collect()
    for r in rows:
        assert r["pred"] == r["expected"], f"{r['expected']}: got {r['pred']}"


def test_lang_id_tie_breaks_deterministically(spark):
    # no profile words at all -> all scores 0 -> alphabetically first: de
    assert _one(spark, "xyzzy plugh qwerty", lang_id(F.col("t"))) == "de"


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", fingerprint("t"))
    b = _one(spark, "gamma beta alpha", fingerprint("t"))
    c = _one(spark, "alpha beta gamma", fingerprint("t"))
    assert a == c and a != b
    assert 0 <= a < (1 << 31) - 1


def test_duckdb_twins_parity(spark):
    texts = [t for _, t in MULTILINGUAL] + [
        "", "a.b,c!d?e", "the the the", "don't stop believing 1234 !!!",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: (
            r["tc"], round(r["q"], 9), r["lang"], r["fp"]
        )
        for r in df.select(
            "i",
            token_count("t").alias("tc"),
            quality_score("t").alias("q"),
            lang_id(F.col("t")).alias("lang"),
            fingerprint("t").alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        esc = t.replace("'", "''")
        tc, q, lang, fp = con.sql(
            f"select {duckdb_token_count(f'''cast('{esc}' as varchar)''')},"
            f" {duckdb_quality_score(f'''cast('{esc}' as varchar)''')},"
            f" {duckdb_lang_id(f'''cast('{esc}' as varchar)''')},"
            f" {duckdb_fingerprint(f'''cast('{esc}' as varchar)''')}"
        ).fetchall()[0]
        assert got[i] == (tc, round(q, 9), lang, fp), f"text {i}: {t!r}"


def test_redact_pii_patterns(spark):
    from leann_rs_spark.functions.textstats import redact_pii

    df = spark.createDataFrame(
        [(0, "bob@x.io sees https://a.b/c, calls +1 (555) 123-4567, "
             "card 4111111111111111; zip 02139 survives"),
         (1, "phones: 555-123-4567 (555) 987-6543 5550001111 end")],
        "id long, text string",
    )
    rows = {r["id"]: r["r"] for r in
            df.select("id", redact_pii("text").alias("r")).collect()}
    red = rows[0]
    assert "<EMAIL>" in red and "<URL>" in red
    assert "<PHONE>" in red and "<NUM>" in red
    assert "02139" in red
    assert "bob@" not in red and "4111" not in red
    # URL match keeps the sentence comma
    assert "<URL>," in red
    # common US formats all redact
    assert rows[1].count("<PHONE>") == 3
