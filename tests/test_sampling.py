"""Deterministic sampling/split/shuffle: stability, rates, DuckDB parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.sampling import (
    deterministic_sample,
    deterministic_shuffle,
    duckdb_deterministic_sample,
    duckdb_shuffle_key,
    duckdb_split_assign,
    split_assign,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    return con


def test_sample_rate_and_stability(docs):
    n = docs.count()
    s1 = deterministic_sample(docs, 0.2, "doc_id").select("doc_id").collect()
    s2 = deterministic_sample(docs, 0.2, "doc_id").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    assert 0.05 * n < len(s1) < 0.4 * n  # uniform-ish at small n
    # monotone in rate: a bigger sample CONTAINS the smaller one
    s3 = {r["doc_id"] for r in
          deterministic_sample(docs, 0.5, "doc_id").select("doc_id").collect()}
    assert {r["doc_id"] for r in s1} <= s3


def test_sample_matches_duckdb(docs, duck):
    got = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs, 0.2, "doc_id").select("doc_id").collect()
    )
    want = sorted(
        r[0]
        for r in duck.execute(
            "SELECT doc_id FROM ("
            + duckdb_deterministic_sample("documents", "doc_id", 0.2)
            + ")"
        ).fetchall()
    )
    assert got == want


def test_split_assign_covers_and_matches_duckdb(docs, duck):
    out = split_assign(docs, "doc_id").select("doc_id", "split").collect()
    got = {r["doc_id"]: r["split"] for r in out}
    case = duckdb_split_assign("doc_id")
    want = dict(
        duck.execute(f"SELECT doc_id, {case} FROM documents").fetchall()
    )
    assert got == want
    counts = {}
    for v in got.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts.get("train", 0) > counts.get("val", 0) >= 0
    assert set(counts) <= {"train", "val", "test"}


def test_shuffle_order_matches_duckdb(docs, duck):
    got = [
        r["doc_id"]
        for r in deterministic_shuffle(docs, "doc_id")
        .select("doc_id").collect()
    ]
    sk = duckdb_shuffle_key("doc_id")
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents ORDER BY {sk}, doc_id::varchar"
        ).fetchall()
    ]
    assert got == want
    assert got != sorted(got)  # it actually shuffles


def test_pack_sequences_budget_and_duckdb_parity(docs, duck):
    from leann_rs_spark.operators.sampling import (
        duckdb_pack_sequences,
        pack_sequences,
    )
    from leann_rs_spark.functions.textstats import (
        duckdb_token_count,
        token_count,
    )

    budget = 512
    out = pack_sequences(
        docs.withColumn("n_tokens", token_count("text")),
        "n_tokens", budget, "doc_id", n_shards=8, id_cols=["doc_id"],
    ).collect()
    got = sorted((r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"]) for r in out)

    sql = duckdb_pack_sequences(
        f"(SELECT doc_id, {duckdb_token_count('text')} AS n_tokens FROM documents)",
        "n_tokens", budget, "doc_id", n_shards=8, id_cols="doc_id",
    )
    want = sorted(duck.execute(sql).fetchall())
    assert got == want

    # every pack starts within budget: offsets inside a pack < budget + max row
    by_pack = {}
    for d, sh, p, off in got:
        by_pack.setdefault((sh, p), []).append(off)
    for (sh, p), offs in by_pack.items():
        assert min(offs) - p * budget < budget  # pack begins in its window


def test_weighted_mix_rates_and_determinism(spark, docs):
    from leann_rs_spark.operators.sampling import weighted_mix

    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    m1 = weighted_mix([(en, 1.0), (rest, 0.5)], "doc_id").select("doc_id").collect()
    m2 = weighted_mix([(en, 1.0), (rest, 0.5)], "doc_id").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in m1) == sorted(r["doc_id"] for r in m2)
    n_en = en.count()
    assert len(m1) > n_en  # full en plus some of the rest
    assert len(m1) < n_en + rest.count()

    with pytest.raises(ValueError):
        weighted_mix([(en, 1.5)], "doc_id")
    with pytest.raises(ValueError):
        weighted_mix([], "doc_id")


# ---------------------------------------------------------------------------
# stratified_sample / upsample
# ---------------------------------------------------------------------------

def test_stratified_quota_per_group(spark, docs):
    from leann_rs_spark.operators.sampling import stratified_sample

    out = stratified_sample(docs, "lang", 5, "doc_id")
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(5, full[lang])


def test_stratified_stable_under_repartition(spark, docs):
    from leann_rs_spark.operators.sampling import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(docs, "lang", 7, "doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(13), "lang", 7, "doc_id").collect()}
    assert a == b


def test_stratified_duckdb_parity(spark, docs, duck):
    from leann_rs_spark.operators.sampling import (
        duckdb_stratified_sample,
        stratified_sample,
    )

    got = sorted(r["doc_id"] for r in
                 stratified_sample(docs, "lang", 7, "doc_id").collect())
    want = sorted(r[0] for r in duck.execute(
        f"SELECT doc_id FROM ({duckdb_stratified_sample('documents', 'lang', 7, 'doc_id')})"
    ).fetchall())
    assert got == want


def test_upsample_copy_counts(spark, docs):
    from leann_rs_spark.operators.sampling import upsample

    n = docs.count()
    out = upsample(docs, 2.5, "doc_id")
    total = out.count()
    # every row at least twice, at most three times; fraction ~0.5
    assert 2 * n < total < 3 * n
    per = out.groupBy("doc_id").agg(F.count("*").alias("k"))
    ks = {r["k"] for r in per.collect()}
    assert ks == {2, 3}
    # copy indices are dense 0..k-1
    mx = out.groupBy("doc_id").agg(F.max("copy").alias("m"), F.count("*").alias("k"))
    assert mx.filter(F.col("m") != F.col("k") - 1).count() == 0


def test_upsample_rate_below_one_is_bernoulli(spark, docs):
    from leann_rs_spark.operators.sampling import upsample

    out = upsample(docs, 0.4, "doc_id")
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert 0 < out.count() < docs.count()


def test_upsample_rejects_negative(spark, docs):
    from leann_rs_spark.operators.sampling import duckdb_upsample, upsample

    with pytest.raises(ValueError):
        upsample(docs, -0.1, "doc_id")
    with pytest.raises(ValueError):
        duckdb_upsample("documents", -0.1, "doc_id")


def test_upsample_duckdb_parity(spark, docs, duck):
    from leann_rs_spark.operators.sampling import duckdb_upsample, upsample

    got = sorted((r["doc_id"], r["copy"]) for r in
                 upsample(docs, 1.3, "doc_id").collect())
    want = sorted((a, b) for a, b in duck.execute(
        f"SELECT doc_id, copy FROM ({duckdb_upsample('documents', 1.3, 'doc_id')})"
    ).fetchall())
    assert got == want


# ---------------------------------------------------------------- concat


def test_concat_chunk_hand_vectors(spark):
    """Two docs, block 4: stream = [aa bb cc EOD dd ee] → block 0 =
    [aa bb cc EOD] (1 doc), block 1 = [dd ee EOD] (1 doc, short tail).
    Doc 1 splits? No — doc 0 fills block 0 exactly; doc 1 is the tail."""
    from leann_rs_spark.operators.sampling import concat_chunk

    docs = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "dd ee")], "doc_id bigint, text string"
    )
    rows = {
        r["block_id"]: r
        for r in concat_chunk(docs, 4, eod="<e>").collect()
    }
    assert list(rows[0]["tokens"]) == ["aa", "bb", "cc", "<e>"]
    assert rows[0]["n_tokens"] == 4 and rows[0]["n_docs"] == 1
    assert list(rows[1]["tokens"]) == ["dd", "ee", "<e>"]
    assert rows[1]["n_tokens"] == 3 and rows[1]["n_docs"] == 1


def test_concat_chunk_splits_docs_across_blocks(spark):
    """A 5-token doc with block 3 splits: block 0 = first 3 tokens,
    block 1 = rest + EOD + next doc's head."""
    from leann_rs_spark.operators.sampling import concat_chunk

    docs = spark.createDataFrame(
        [(0, "aa bb cc dd ee"), (1, "ff gg")], "doc_id bigint, text string"
    )
    rows = {
        r["block_id"]: r for r in concat_chunk(docs, 3, eod="<e>").collect()
    }
    assert list(rows[0]["tokens"]) == ["aa", "bb", "cc"]
    assert rows[0]["n_docs"] == 1
    assert list(rows[1]["tokens"]) == ["dd", "ee", "<e>"]
    assert list(rows[2]["tokens"]) == ["ff", "gg", "<e>"]
    # doc 0 contributed to blocks 0 and 1
    assert rows[1]["n_docs"] == 1 and rows[2]["n_docs"] == 1


def test_concat_chunk_stream_reconstructs(docs, spark):
    """Concatenating all blocks in order reproduces the corpus token
    stream exactly — nothing lost, nothing duplicated, order intact."""
    from leann_rs_spark.functions.text import tokenize
    from leann_rs_spark.operators.sampling import concat_chunk

    sub = docs.filter(F.col("doc_id") < 40)
    blocks = concat_chunk(sub, 64, eod="<e>").orderBy("block_id").collect()
    got = [t for b in blocks for t in b["tokens"]]
    want_rows = (
        sub.select("doc_id", tokenize("text").alias("t"))
        .orderBy("doc_id")
        .collect()
    )
    want = [t for r in want_rows for t in list(r["t"]) + ["<e>"]]
    assert got == want
    # every block but the last is exactly full
    for b in blocks[:-1]:
        assert b["n_tokens"] == 64


def test_concat_chunk_shard_width_invariant(docs):
    """The two-pass prefix sum gives the same blocks at any shard
    width — sharding is a physical knob, not a semantic one."""
    from leann_rs_spark.operators.sampling import concat_chunk

    sub = docs.filter(F.col("doc_id") < 30)

    def run(w):
        return sorted(
            (r["block_id"], r["n_tokens"], r["n_docs"], tuple(r["tokens"]))
            for r in concat_chunk(sub, 32, shard_width=w).collect()
        )

    assert run(1) == run(7) == run(1 << 20)


def test_concat_chunk_empty_text_is_eod_only(spark):
    from leann_rs_spark.operators.sampling import concat_chunk

    docs = spark.createDataFrame(
        [(0, ""), (1, "aa bb")], "doc_id bigint, text string"
    )
    rows = concat_chunk(docs, 10, eod="<e>").collect()
    assert len(rows) == 1
    assert list(rows[0]["tokens"]) == ["<e>", "aa", "bb", "<e>"]
    assert rows[0]["n_docs"] == 2


# ------------------------------------------------------------ temperature


def test_temperature_alpha1_is_proportional(docs):
    """α = 1 → q_g ∝ c_g → every group keeps rate target/N: group
    shares in the sample track the corpus shares."""
    from leann_rs_spark.operators.sampling import temperature_mix

    out = temperature_mix(docs, "lang", 1.0, 200, "doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    n = sum(tot.values())
    for lang, c in tot.items():
        # expected c * 200/N with Bernoulli noise; loose band
        exp = c * 200 / n
        assert abs(got.get(lang, 0) - exp) <= max(6, 0.6 * exp), (lang, exp, got)


def test_temperature_alpha0_upweights_rare_groups(spark):
    """α = 0 → uniform across groups: a 10-row group and a 1000-row
    group get the same expected sample size; the rare group's KEEP
    RATE must be much higher (here rate 1.0: fully kept)."""
    from leann_rs_spark.operators.sampling import temperature_mix

    rows = [(i, "rare") for i in range(10)] + [
        (100 + i, "common") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_mix(df, "lang", 0.0, 40, "doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    # rare group: target share 20 > group size 10 → rate 1 → all kept
    assert got["rare"] == 10
    # common group: rate 20/1000 = 2% → ~20 rows
    assert 5 <= got["common"] <= 45


def test_temperature_rate_caps_at_one(spark):
    from leann_rs_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(i, "only") for i in range(50)], "doc_id bigint, lang string"
    )
    out = temperature_mix(df, "lang", 0.5, 10_000, "doc_id")
    assert out.count() == 50  # rate clamps at 1.0 — never upsamples


def test_temperature_partition_invariant(docs):
    from leann_rs_spark.operators.sampling import temperature_mix

    a = sorted(
        r["doc_id"]
        for r in temperature_mix(docs, "lang", 0.3, 150, "doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_mix(
            docs.repartition(13), "lang", 0.3, 150, "doc_id"
        ).collect()
    )
    assert a == b


def test_temperature_validation(docs):
    from leann_rs_spark.operators.sampling import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix(docs, "lang", -0.1, 100, "doc_id")
    with pytest.raises(ValueError):
        temperature_mix(docs, "lang", 0.3, -5, "doc_id")


# ------------------------------------------------------------ length batch


def test_length_batches_waste_bounded_by_bucket(docs):
    from leann_rs_spark.functions.textstats import token_count
    from leann_rs_spark.operators.sampling import length_bucket_batches

    d = docs.withColumn("n_tokens", token_count("text"))
    out = length_bucket_batches(d, batch_size=8, bucket_width=32).collect()
    assert len(out) == d.count()
    for r in out:
        assert 0 <= r["pad_waste"] < 32
        assert r["batch_max_tokens"] >= r["n_tokens"]
        assert r["length_bucket"] == r["n_tokens"] // 32


def test_length_batches_full_except_tail(docs):
    """Within every (bucket, shard), each batch_id except the highest
    holds exactly batch_size rows."""
    from collections import Counter

    from leann_rs_spark.functions.textstats import token_count
    from leann_rs_spark.operators.sampling import length_bucket_batches

    d = docs.withColumn("n_tokens", token_count("text"))
    rows = length_bucket_batches(d, batch_size=8, n_shards=2).collect()
    sizes = Counter((r["length_bucket"], r["shard"], r["batch_id"]) for r in rows)
    last = {}
    for (b, s, i), _n in sizes.items():
        last[(b, s)] = max(last.get((b, s), -1), i)
    for (b, s, i), n in sizes.items():
        if i < last[(b, s)]:
            assert n == 8, (b, s, i, n)
        else:
            assert 1 <= n <= 8


def test_length_batches_partition_invariant(docs):
    from leann_rs_spark.functions.textstats import token_count
    from leann_rs_spark.operators.sampling import length_bucket_batches

    d = docs.withColumn("n_tokens", token_count("text"))

    def run(df):
        return sorted(
            (r["doc_id"], r["batch_id"], r["batch_max_tokens"])
            for r in length_bucket_batches(df, batch_size=8).collect()
        )

    assert run(d) == run(d.repartition(17))


class TestWeightedSampleN:
    def test_without_replacement_and_deterministic(self, spark):
        from leann_rs_spark.operators.sampling import weighted_sample_n

        df = spark.createDataFrame(
            [(i, float(i % 7 + 1)) for i in range(200)], "id long, w double"
        )
        a = [r["id"] for r in weighted_sample_n(df, 50, "w", "id").collect()]
        assert len(a) == len(set(a)) == 50
        b = [r["id"] for r in
             weighted_sample_n(df.repartition(7), 50, "w", "id").collect()]
        assert a == b  # partitioning-independent

    def test_overwhelming_weight_always_selected(self, spark):
        from leann_rs_spark.operators.sampling import weighted_sample_n

        df = spark.createDataFrame(
            [(0, 1e12)] + [(i, 1e-6) for i in range(1, 400)],
            "id long, w double",
        )
        # -ln(u)/1e12 ~ 1e-12 quantizes to race_key 0; a 1e-6-weight
        # row needs u > exp(-5e-13) — not a reachable slot value
        got = {r["id"] for r in weighted_sample_n(df, 5, "w", "id").collect()}
        assert 0 in got and len(got) == 5

    def test_nonpositive_weight_raises(self, spark):
        from leann_rs_spark.operators.sampling import weighted_sample_n

        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        df = spark.createDataFrame(
            [(0, 1.0), (1, 0.0)], "id long, w double"
        )
        with pytest.raises((PySparkException, Py4JJavaError)):
            weighted_sample_n(df, 1, "w", "id").collect()

    def test_n_larger_than_table_returns_all(self, spark):
        from leann_rs_spark.operators.sampling import weighted_sample_n

        df = spark.createDataFrame([(0, 1.0), (1, 2.0)], "id long, w double")
        assert weighted_sample_n(df, 10, "w", "id").count() == 2

    def test_tiny_weight_clamps_identically_cross_engine(self, spark):
        """w below ~2e-12 drives k·1e6 past Long.MaxValue: Spark's
        non-ANSI cast would saturate while DuckDB's raises. The shared
        least(·, 9e18) clamp makes both engines agree — same winners,
        same race keys — with clamped rows falling to the key
        tie-break."""
        import duckdb

        from leann_rs_spark.operators.sampling import (
            duckdb_weighted_sample_n,
            weighted_sample_n,
        )

        rows = [(i, 1e-15 if i % 3 == 0 else float(i % 7 + 1))
                for i in range(60)]
        df = spark.createDataFrame(rows, "id long, w double")
        got = [(r["id"], r["race_key"])
               for r in weighted_sample_n(df, 25, "w", "id").collect()]
        assert all(k <= 9_000_000_000_000_000_000 for _, k in got)
        vals = ", ".join(f"({i}, {w!r})" for i, w in rows)
        sql = duckdb_weighted_sample_n(
            f"SELECT * FROM (VALUES {vals}) t(id, w)", 25, "w", "id"
        )
        want = duckdb.sql(sql).fetchall()
        assert got == [(r[0], r[2]) for r in want]

    def test_twin_guards_nonpositive_weights_too(self, spark):
        import duckdb
        import pytest

        from leann_rs_spark.operators.sampling import duckdb_weighted_sample_n

        sql = duckdb_weighted_sample_n(
            "SELECT * FROM (VALUES (0, 1.0), (1, -1.0)) t(id, w)",
            1, "w", "id",
        )
        with pytest.raises(Exception, match="weight must be > 0"):
            duckdb.sql(sql).fetchall()
