"""Reference-index import (sources/leann_import.py): a synthetic
`.leann/indexes/<name>` directory laid out exactly as the reference
writes it (passages.rs JSONL + idx json, builder.rs ids.txt,
embeddings.rs flat little-endian f32, meta.rs JSON) round-trips into
the catalog and serves the read path."""

import json
import math
import struct

import pytest
from pyspark.sql import functions as F

from leann_rs_spark import catalog
from leann_rs_spark.sources.leann_import import import_reference_index

DIMS = 8


def _vec(seed: int) -> list[float]:
    # deterministic, non-trivial directions
    raw = [math.sin(seed * 13.7 + j * 2.1) for j in range(DIMS)]
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


@pytest.fixture()
def ref_index(tmp_path):
    """Write a reference-format index dir with 6 passages."""
    d = tmp_path / "refidx"
    d.mkdir()
    base = d / "documents"
    ids = [str(i) for i in range(6)]
    passages = [
        {
            "id": pid,
            "text": f"passage number {pid} about topic {int(pid) % 2}",
            "metadata": {"source": f"/src/file{int(pid) % 3}.txt",
                         "chunk_index": int(pid)},
        }
        for pid in ids
    ]
    offsets = {}
    with open(base.with_suffix(".passages.jsonl"), "wb") as f:
        for p in passages:
            offsets[p["id"]] = f.tell()
            f.write((json.dumps(p) + "\n").encode())
    (base.parent / "documents.passages.idx.json").write_text(
        json.dumps(offsets)
    )
    (base.parent / "documents.ids.txt").write_text("\n".join(ids))
    with open(base.parent / "documents.embeddings", "wb") as f:
        for i in range(6):
            f.write(struct.pack(f"<{DIMS}f", *_vec(i)))
    (base.parent / "documents.leann.meta.json").write_text(
        json.dumps(
            {
                "version": "1.0",
                "backend_name": "hnsw",
                "embedding_model": "nomic-embed-text",
                "embedding_mode": "ollama",
                "dimensions": DIMS,
                "passage_count": 6,
                "is_recompute": True,
                "is_pruned": False,
            }
        )
    )
    return str(d)


class _StubProvider:
    """Plays the reference's reconstructed network provider at query
    time: returns the stored vector of passage 3 for any query."""

    def embed(self, texts):
        return [_vec(3) for _ in texts]


def test_import_round_trip_and_search(spark, tmp_path, ref_index):
    wh = str(tmp_path / "wh")
    meta = import_reference_index(spark, ref_index, wh, "imp")
    assert meta.passage_count == 6 and meta.dimensions == DIMS
    assert meta.embedding_mode == "ollama"
    assert meta.extra["source_meta"]["backend_name"] == "hnsw"

    passages = spark.read.parquet(f"{wh}/imp/passages")
    assert passages.count() == 6
    row = passages.filter(F.col("idx") == 2).head()
    assert row["text"].startswith("passage number 2")
    assert row["source"] == "/src/file2.txt"
    assert row["chunk_index"] == 2

    emb = {
        r["idx"]: r["embedding"]
        for r in spark.read.parquet(f"{wh}/imp/embeddings").collect()
    }
    assert len(emb) == 6
    # f32 storage round-trips to the f64 column within f32 precision
    for j, want in enumerate(_vec(4)):
        assert abs(emb[4][j] - want) < 1e-6

    # provider-built index refuses hash-embedded queries...
    with pytest.raises(ValueError, match="query_provider"):
        catalog.search_index(spark, wh, "imp", "topic", k=3, hybrid=False)
    # ...and serves exact top-k with the matching provider: query =
    # stored vector 3, so passage 3 must rank first with score ≈ 1
    out = catalog.search_index(
        spark, wh, "imp", "topic", k=3, hybrid=False,
        query_provider=_StubProvider(),
    ).collect()
    assert out[0]["idx"] == 3
    assert abs(out[0]["score"] - 1.0) < 1e-5


def test_import_detects_mismatched_meta(spark, tmp_path, ref_index):
    meta_path = f"{ref_index}/documents.leann.meta.json"
    src = json.loads(open(meta_path).read())
    src["passage_count"] = 7
    open(meta_path, "w").write(json.dumps(src))
    with pytest.raises(ValueError, match="7"):
        import_reference_index(spark, ref_index, str(tmp_path / "wh2"), "bad")


def test_import_pruned_index(spark, tmp_path, ref_index):
    import os

    os.remove(f"{ref_index}/documents.embeddings")
    wh = str(tmp_path / "wh3")
    meta = import_reference_index(spark, ref_index, wh, "pruned")
    assert meta.is_pruned
    assert not os.path.isdir(f"{wh}/pruned/embeddings")
    # BM25 over the imported passages still works without embeddings
    assert os.path.isdir(f"{wh}/pruned/bm25_postings")


def test_export_import_round_trip(spark, tmp_path):
    """Catalog → reference format → catalog is the identity on
    passages, embeddings (to f32 precision), and search results."""
    from leann_rs_spark.sources.leann_import import export_reference_index

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 15)
        .select("doc_id", "source", "text")
    )
    wh = str(tmp_path / "wh")
    catalog.build_index(
        spark, wh, "orig", docs, chunk_size=16, chunk_overlap=4, dims=16,
        with_bm25=False,
    )
    out_dir = str(tmp_path / "exported")
    summary = export_reference_index(spark, wh, "orig", out_dir)
    meta0 = catalog.load_meta(wh, "orig")
    assert summary["passages"] == summary["embeddings"] == meta0.passage_count

    meta = import_reference_index(spark, out_dir, wh, "back", with_bm25=False)
    assert meta.passage_count == meta0.passage_count
    assert meta.dimensions == 16

    # same exact top-k through the re-imported index, via a provider
    # that replays the hash embedder (mode is 'custom' after export)
    from leann_rs_spark.operators.embedder import HashEmbedder

    q = "alpha beta"
    want = catalog.search_index(spark, wh, "orig", q, k=5, hybrid=False)
    got = catalog.search_index(
        spark, wh, "back", q, k=5, hybrid=False,
        query_provider=HashEmbedder(dims=16),
    )
    # doc_id must survive the round trip (chunked docs: passage id is
    # the idx, doc_id travels in metadata — a doc_id-as-pid scheme
    # silently reassigns later chunks to other documents' ids)
    w = [(r["doc_id"], r["text"], round(r["score"], 4)) for r in want.collect()]
    g = [(r["doc_id"], r["text"], round(r["score"], 4)) for r in got.collect()]
    assert g == w  # scores equal to f32-storage precision
    p_orig = spark.read.parquet(f"{wh}/orig/passages")
    p_back = spark.read.parquet(f"{wh}/back/passages")
    pairs = lambda df: sorted(
        (r["idx"], r["doc_id"], r["chunk_index"])
        for r in df.select("idx", "doc_id", "chunk_index").collect()
    )
    assert pairs(p_back) == pairs(p_orig)
    # multi-chunk docs exist in this corpus, or the test proves nothing
    assert p_orig.groupBy("doc_id").count().agg(F.max("count")).head()[0] > 1
