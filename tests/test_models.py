"""Model registry (models.py) vs the reference's registry vectors
(/root/reference/src/embedding/models.rs:33-125 and its unit tests),
plus the build/search lifecycle applying resolved prefixes."""

import pytest
from pyspark.sql import functions as F

from leann_rs_spark import catalog
from leann_rs_spark.models import ModelConfig, get_model_config
from conftest import SF_SMOKE


def test_nomic_config():
    cfg = get_model_config("nomic-embed-text")
    assert cfg.document_prefix == "search_document: "
    assert cfg.query_prefix == "search_query: "
    assert cfg.normalized and cfg.dimensions == 768


def test_version_tag_stripped():
    assert get_model_config("nomic-embed-text:latest") == get_model_config(
        "nomic-embed-text"
    )
    assert get_model_config("e5-base:v1.2") == get_model_config("e5-base")


def test_e5_family():
    for name, dims in (
        ("e5-small", 384), ("e5-base", 768), ("e5-large", 1024),
        ("e5-small-v2", 384), ("e5-base-v2", 768), ("e5-large-v2", 1024),
        ("multilingual-e5-small", 384), ("multilingual-e5-large", 1024),
    ):
        cfg = get_model_config(name)
        assert cfg.document_prefix == "passage: ", name
        assert cfg.query_prefix == "query: ", name
        assert cfg.normalized and cfg.dimensions == dims, name


def test_bge_query_side_only():
    for name, dims in (
        ("bge-small-en", 384), ("bge-base-en-v1.5", 768),
        ("bge-large-en-v1.5", 1024),
    ):
        cfg = get_model_config(name)
        assert cfg.document_prefix == ""
        assert cfg.query_prefix.startswith("Represent this sentence")
        assert cfg.dimensions == dims


def test_mxbai_prefixes():
    cfg = get_model_config("mxbai-embed-large")
    assert cfg.document_prefix == "Represent this document for retrieval: "
    assert cfg.query_prefix.startswith("Represent this sentence")
    assert cfg.dimensions == 1024


def test_no_prefix_families():
    for name, dims in (
        ("gte-small", 384), ("gte-base", 768), ("gte-large", 1024),
        ("all-minilm", 384), ("all-MiniLM-L6-v2", 384),
        ("text-embedding-3-small", 1536),
        ("text-embedding-3-large", 3072),
        ("text-embedding-ada-002", 1536),
    ):
        cfg = get_model_config(name)
        assert cfg.document_prefix == "" and cfg.query_prefix == "", name
        assert cfg.normalized and cfg.dimensions == dims, name


def test_unknown_model_default():
    assert get_model_config("some-unknown-model") == ModelConfig(
        document_prefix="", query_prefix="", normalized=False, dimensions=768
    )


# ---------------------------------------------------------------------------
# Lifecycle: build_index resolves the registry, search applies it
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .cache()
    )


def test_build_resolves_registry_prefixes(spark, docs, tmp_path):
    wh = str(tmp_path / "wh")
    meta = catalog.build_index(
        spark, wh, "e5", docs, chunk_size=16, chunk_overlap=4, dims=32,
        embedding_model="e5-base:latest", with_bm25=False,
    )
    assert meta.doc_prompt_template == "passage: "
    assert meta.query_prompt_template == "query: "
    assert meta.extra["model_config"]["model"] == "e5-base:latest"
    assert meta.extra["model_config"]["document_prefix"] == "passage: "
    # hash mode keeps its version pin — the model name must NOT clobber
    # the embedding_model version check (append would refuse itself)
    assert meta.embedding_model == "hash-v2"
    catalog.append_to_index(spark, wh, "e5", docs.limit(2))


def test_registry_build_matches_explicit_templates(spark, docs, tmp_path):
    """`--embedding-model e5-base` must be indistinguishable from
    hand-supplying the E5 prefixes (the round-3 gap: the mechanism
    existed but the name resolved to nothing)."""
    wh = str(tmp_path / "wh")
    catalog.build_index(
        spark, wh, "byname", docs, chunk_size=16, chunk_overlap=4, dims=32,
        embedding_model="e5-base", with_bm25=False,
    )
    catalog.build_index(
        spark, wh, "byhand", docs, chunk_size=16, chunk_overlap=4, dims=32,
        doc_prompt_template="passage: ", query_prompt_template="query: ",
        with_bm25=False,
    )
    q = "alpha beta"
    got = catalog.search_index(spark, wh, "byname", q, k=5, hybrid=False)
    want = catalog.search_index(spark, wh, "byhand", q, k=5, hybrid=False)
    rows = lambda df: [
        (r["doc_id"], r["text"], round(r["score"], 9)) for r in df.collect()
    ]
    assert rows(got) == rows(want)
    # and it differs from a prefix-less index: the prefix is load-bearing
    catalog.build_index(
        spark, wh, "plain", docs, chunk_size=16, chunk_overlap=4, dims=32,
        with_bm25=False,
    )
    plain = catalog.search_index(spark, wh, "plain", q, k=5, hybrid=False)
    assert rows(got) != rows(plain)


def test_explicit_template_overrides_registry(spark, docs, tmp_path):
    wh = str(tmp_path / "wh")
    meta = catalog.build_index(
        spark, wh, "ovr", docs, chunk_size=16, chunk_overlap=4, dims=32,
        embedding_model="e5-base", doc_prompt_template="custom: ",
        with_bm25=False,
    )
    assert meta.doc_prompt_template == "custom: "
    assert meta.query_prompt_template == "query: "  # still from registry
