"""Property test: duplicate_spans vs an independent pure-Python model.

The Spark operator marks every token covered by an n-token gram that
occurs ≥2 times corpus-wide and cuts those tokens from the text. The
model below recomputes that from first principles (dict of gram
counts, set of covered positions) — agreeing on random corpora over a
tiny vocabulary (maximizing collisions) pins the operator's semantics
independently of the DuckDB oracle, which shares none of this code.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from leann_rs_spark.operators.dedup import duplicate_spans

VOCAB = ["a", "b", "cc", "d"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _model(texts: list[str], n: int):
    toks = [[t for t in txt.split(" ") if t] for txt in texts]
    counts: Counter = Counter()
    for ts in toks:
        for i in range(len(ts) - n + 1):
            counts[" ".join(ts[i : i + n])] += 1
    out = {}
    for doc_id, ts in enumerate(toks):
        covered: set[int] = set()
        for i in range(len(ts) - n + 1):
            if counts[" ".join(ts[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        clean = " ".join(t for i, t in enumerate(ts) if i not in covered)
        ntok = len(ts)
        out[doc_id] = (
            ntok,
            len(covered),
            (len(covered) / ntok) if ntok else 0.0,
            clean,
        )
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_corpus, n=st.integers(2, 4))
def test_duplicate_spans_matches_model(spark, corpus, n):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            round(r["dup_frac"], 9),
            r["clean_text"],
        )
        for r in duplicate_spans(df, n=n).collect()
    }
    want = {
        k: (a, b, round(c, 9), d) for k, (a, b, c, d) in _model(corpus, n).items()
    }
    assert got == want
