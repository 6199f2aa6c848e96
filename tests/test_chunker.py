"""Chunker tests — reference vectors from
/root/reference/src/chunker/ast.rs:421-466 plus property checks on the
byte-exact simple-chunker port (simple.rs:24-118)."""

import pytest
from hypothesis import given, settings, strategies as st

from leann_rs_spark.operators.chunker import (
    code_chunk,
    simple_chunk,
    smart_chunk,
)


def test_simple_small_text_single_chunk():
    out = simple_chunk("hello world", chunk_size=256, chunk_overlap=128)
    assert out == [{"chunk_index": 0, "chunk_type": "simple", "text": "hello world"}]


def test_simple_chunk_boundaries():
    # 26 words of 5 chars -> 155 bytes; window 10*4=40 bytes, overlap 2*4=8
    text = " ".join(f"w{i:03d}x" for i in range(26))
    out = simple_chunk(text, chunk_size=10, chunk_overlap=2)
    assert len(out) > 1
    # every chunk respects the 40-byte cap
    assert all(len(c["text"].encode()) <= 40 for c in out)
    # every chunk is a contiguous slice of the input (overlap rewinds can
    # start mid-word — that's the reference's behavior, simple.rs:95-99)
    for c in out:
        assert c["text"] in text
    # overlap: consecutive chunks share their boundary region
    assert out[0]["chunk_index"] == 0
    assert [c["chunk_index"] for c in out] == list(range(len(out)))


def test_simple_chunk_covers_all_words():
    text = " ".join(f"word{i}" for i in range(100))
    out = simple_chunk(text, chunk_size=16, chunk_overlap=4)
    covered = set()
    for c in out:
        covered.update(c["text"].split())
    # superset: overlap rewinds may start mid-word (simple.rs:95-99),
    # adding fragments — but no full word may be lost
    assert covered >= set(text.split())


def test_simple_chunk_utf8_boundary_safe():
    # multi-byte chars with no whitespace force mid-text boundaries
    text = "é" * 300  # 600 bytes
    out = simple_chunk(text, chunk_size=32, chunk_overlap=8)  # 128-byte window
    for c in out:
        c["text"].encode("utf-8")  # must be valid (would raise otherwise)
        assert set(c["text"]) == {"é"}


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("ab é漢 ")),
        min_size=0,
        max_size=400,
    ),
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=0, max_value=32),
)
def test_simple_chunk_always_terminates_and_valid(text, size, overlap):
    out = simple_chunk(text, chunk_size=size, chunk_overlap=overlap)
    for c in out:
        assert isinstance(c["text"], str)
        if len(text.encode()) > size * 4:
            assert c["text"] == c["text"].strip()


def test_rust_function_detection():
    code = """
fn hello_world() {
    println!("Hello, world!");
}

pub async fn async_func() -> Result<(), Error> {
    Ok(())
}
"""
    chunks = code_chunk(code, "rust", 256, 64)
    assert chunks
    assert any("hello" in (c.get("name") or "") for c in chunks)


def test_python_class_detection():
    code = """
class MyClass:
    def __init__(self):
        self.value = 0

    def get_value(self):
        return self.value

def standalone_func():
    pass
"""
    chunks = code_chunk(code, "python", 256, 64)
    assert chunks
    names = [c.get("name") for c in chunks]
    assert "MyClass" in names
    assert "standalone_func" in names


def test_code_chunk_keep_first_dedup():
    # MyClass block spans the methods; methods overlap -> dropped
    code = "class A:\n    def m1(self):\n        pass\n    def m2(self):\n        pass\n"
    chunks = code_chunk(code, "python", 256, 64)
    ast_chunks = [c for c in chunks if c["chunk_type"] == "ast"]
    assert len(ast_chunks) == 1 and ast_chunks[0]["name"] == "A"


def test_code_chunk_gap_context():
    code = (
        "// a long leading comment that is certainly more than twenty chars\n"
        "// second line of comment\n"
        "fn foo() {\n    body();\n}\n"
    )
    chunks = code_chunk(code, "rust", 256, 64)
    types = [c["chunk_type"] for c in chunks]
    assert "context" in types and "ast" in types
    # sorted by position: context (line 1) before the fn block
    assert types.index("context") < types.index("ast")


def test_code_chunk_oversized_block_splits_with_parts():
    body = "\n".join(f"    let x{i} = {i};" for i in range(200))
    code = f"fn big() {{\n{body}\n}}\n"
    chunks = code_chunk(code, "rust", max_chunk_size=32, chunk_overlap=16)
    parts = [c for c in chunks if "part" in c and c["part"] is not None]
    assert len(parts) > 1
    assert parts[0]["name"] == "big_part0"
    # terminates (the reference's unconditional rewind would hang here)


def test_code_chunk_fallback_no_language():
    out = code_chunk("plain text " * 30, None, 16, 4)
    assert all(c["chunk_type"] == "simple" for c in out)


def test_code_chunk_fallback_no_blocks():
    out = code_chunk("no code here just words " * 20, "rust", 16, 4)
    assert all(c["chunk_type"] == "simple" for c in out)


def test_smart_dispatch():
    rust = "fn main() {}\n"
    assert smart_chunk(rust, "x/main.rs", "auto")[0]["chunk_type"] == "ast"
    assert smart_chunk(rust, "x/main.txt", "auto")[0]["chunk_type"] == "simple"
    assert smart_chunk(rust, "x/main.rs", "simple")[0]["chunk_type"] == "simple"
    with pytest.raises(ValueError):
        smart_chunk(rust, "main.rs", "bogus")


def test_chunk_documents_spark(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from leann_rs_spark.operators.chunker import chunk_documents
    from leann_rs_spark.utils import with_dense_index

    chunks = chunk_documents(
        docs, strategy="simple", chunk_size=16, chunk_overlap=4
    )
    passages = with_dense_index(chunks, ["doc_id", "chunk_index"], "idx")
    rows = passages.select("doc_id", "chunk_index", "idx").collect()
    assert len(rows) >= 500
    idxs = sorted(r["idx"] for r in rows)
    assert idxs == list(range(len(rows)))  # dense, gapless
    in_order = sorted(rows, key=lambda r: (r["doc_id"], r["chunk_index"]))
    assert [r["idx"] for r in in_order] == list(range(len(rows)))  # order-faithful

    # parity with the local port
    local = []
    for r in sorted(docs.collect(), key=lambda r: r["doc_id"]):
        for c in simple_chunk(r["text"], 16, 4):
            local.append((r["doc_id"], c["chunk_index"], c["text"]))
    got = [
        (r["doc_id"], r["chunk_index"], r["text"])
        for r in sorted(
            passages.select("doc_id", "chunk_index", "text").collect(),
            key=lambda r: (r["doc_id"], r["chunk_index"]),
        )
    ]
    assert got == local
