"""Property tests: concat_chunk and paragraph_dedup vs independent
pure-Python models on random corpora over a tiny vocabulary
(maximizing duplication and boundary collisions)."""

from collections import defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st

from leann_rs_spark.operators.dedup import paragraph_dedup
from leann_rs_spark.operators.sampling import concat_chunk

VOCAB = ["aa", "bb", "cc", "dd"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=9).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)
_para = st.lists(st.sampled_from(VOCAB + ["", "  "]), min_size=0, max_size=4)
_pages = st.lists(
    _para.map("\n".join), min_size=1, max_size=6
)


def _concat_model(texts: list[str], L: int, eod: str):
    stream = []
    for t in texts:
        stream += [w for w in t.split(" ") if len(w) > 1] + [eod]
    blocks = defaultdict(list)
    for pos, tok in enumerate(stream):
        blocks[pos // L].append(tok)
    return {b: toks for b, toks in blocks.items()}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, L=st.integers(min_value=1, max_value=7))
def test_concat_chunk_matches_model(spark, corpus, L):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    got = {
        r["block_id"]: list(r["tokens"])
        for r in concat_chunk(df, L, eod="<e>", shard_width=2).collect()
    }
    assert got == _concat_model(corpus, L, "<e>")


def _paragraph_model(pages: list[str]):
    first: dict[str, tuple[int, int]] = {}
    paras = {}
    for pid, text in enumerate(pages):
        ps = [(i, p) for i, p in enumerate(text.split("\n")) if p.strip()]
        paras[pid] = ps
        for i, p in ps:
            if p not in first:
                first[p] = (pid, i)
    out = {}
    for pid, ps in paras.items():
        keep = [p for i, p in ps if first[p] == (pid, i)]
        n, d = len(ps), len(ps) - len(keep)
        out[pid] = (n, d, "\n".join(keep))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pages=_pages)
def test_paragraph_dedup_matches_model(spark, pages):
    df = spark.createDataFrame(
        list(enumerate(pages)), "page_id bigint, text string"
    )
    got = {
        r["page_id"]: (r["n_paras"], r["dup_paras"], r["clean_text"])
        for r in paragraph_dedup(df, id_col="page_id").collect()
    }
    assert got == _paragraph_model(pages)
