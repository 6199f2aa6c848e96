"""Distributed BPE (operators/bpe.py) vs an independent pure-Python
reference implementation (greedy left-to-right merges, same
tie-breaks): merge-sequence and encoding equality, overlap semantics,
early stop."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    word_bracket_string,
)
from tests.conftest import SF_SMOKE

TOKEN_RE = __import__("re").compile(r"[^a-z0-9]+")


def _ref_tokenize(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if len(t) > 1]


def _ref_merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(texts: list[str], num_merges: int):
    """Independent reference: word-frequency BPE with the same
    (freq DESC, left ASC, right ASC) tie-break."""
    vocab = Counter()
    for t in texts:
        for w in _ref_tokenize(t):
            vocab[w] += 1
    words = {w: list(w) + [EOW] for w in vocab}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), pf = best
        if pf < 2:
            break
        merges.append((l, r, pf))
        words = {w: _ref_merge_word(s, (l, r)) for w, s in words.items()}
    return merges, words


def test_bpe_matches_reference_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    want, _ = _ref_bpe(texts, 10)
    got = bpe_train(docs, 10)
    assert got == want


def test_bpe_encode_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 30
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    merges = bpe_train(docs, 6)
    ref_merges, ref_words = _ref_bpe(list(texts.values()), 6)
    assert merges == ref_merges
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for did, text in texts.items():
        want = [s for w in _ref_tokenize(text) for s in ref_words[w]]
        assert got[did] == want, did


def test_bracket_string_roundtrip(spark):
    df = spark.createDataFrame([("hello",)], "w string")
    ws = df.select(word_bracket_string("w").alias("ws")).head()["ws"]
    assert ws == "[h][e][l][l][o][</w>]"


def test_overlapping_same_symbol_pair_is_greedy(spark):
    """'aaaaa' merging (a,a): greedy left-to-right → aa aa a — the
    string-replace representation must reproduce the fold exactly."""
    docs = spark.createDataFrame(
        [(0, "aaaaa aaaaa")], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, 1)
    assert merges[0][:2] == ("a", "a")
    toks = bpe_encode(docs, merges).head()["tokens"]
    assert list(toks) == ["aa", "aa", "a", EOW, "aa", "aa", "a", EOW]


def test_bpe_early_stop_when_nothing_repeats(spark):
    docs = spark.createDataFrame([(0, "ab cd")], "doc_id bigint, text string")
    # every pair occurs once → pf < 2 → no merges at all
    assert bpe_train(docs, 5) == []


def test_bpe_merged_symbols_chain(spark):
    """Later merges can consume earlier merged symbols (er + </w>)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    merges = bpe_train(docs, 8)
    syms = {l + r for l, r, _ in merges}
    assert any(l in syms or r in syms for l, r, _ in merges[1:])


def _ref_bpe_batched(texts: list[str], num_merges: int, batch_k: int):
    """Reference for the batched variant: per round, greedily select up
    to batch_k pairs with pairwise-disjoint symbols (including the new
    merged symbol) from the (-pf, l, r)-sorted counts, apply all."""
    vocab = Counter()
    for t in texts:
        for w in _ref_tokenize(t):
            vocab[w] += 1
    words = {w: list(w) + [EOW] for w in vocab}
    merges = []
    while len(merges) < num_merges:
        pairs = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        cands = sorted(
            ((p, f) for p, f in pairs.items() if f >= 2),
            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
        )
        if not cands:
            break
        used, batch = set(), []
        want = min(batch_k, num_merges - len(merges))
        for (l, r), f in cands[: 4 * want]:
            if l in used or r in used:
                continue
            used.update((l, r, l + r))
            batch.append((l, r, f))
            if len(batch) >= want:
                break
        merges.extend(batch)
        for l, r, _ in batch:
            words = {w: _ref_merge_word(s, (l, r)) for w, s in words.items()}
    return merges


def test_bpe_batched_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, 12, batch_k=4)
    want = _ref_bpe_batched(texts, 12, 4)
    assert got == want
    assert len(got) == 12


def test_bpe_batched_symbols_disjoint_within_round(spark):
    """No symbol (or newly created symbol) repeats inside one batch —
    the invariant that keeps batched counts exact."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    merges = bpe_train(docs, 12, batch_k=4)
    for start in range(0, 12, 4):
        batch = merges[start : start + 4]
        seen: set = set()
        for l, r, _ in batch:
            assert l not in seen and r not in seen
            seen.update((l, r, l + r))


def test_bpe_batch1_equals_classic_reference(spark):
    """batch_k=1 must remain bit-for-bit the classic sequence."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_train(docs, 6, batch_k=1) == _ref_bpe(texts, 6)[0]


def test_bpe_batch_validation(spark):
    docs = spark.createDataFrame([(0, "aa bb")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bpe_train(docs, 3, batch_k=0)
