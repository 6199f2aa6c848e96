"""Embedding-model registry: name → prompt prefixes / dims / normalization.

Re-expresses the reference's model registry
(/root/reference/src/embedding/models.rs:33-125): asymmetric retrieval
models (E5, BGE, nomic, mxbai) need model-specific document/query
prefixes or recall silently degrades; the registry resolves them from
the model NAME so `build --embedding-model e5-base` applies
`passage: ` / `query: ` automatically, exactly as the reference's
`embed_with_template` (src/embedding/mod.rs:126-143). All entries are
the models' own published usage conventions (public model cards).

Version tags are stripped before lookup (`e5-base:latest` → `e5-base`,
models.rs:34-35); unknown models get the no-prefix default.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    """Parity with ModelConfig (models.rs:9-19)."""

    document_prefix: str = ""
    query_prefix: str = ""
    normalized: bool = False
    dimensions: int = 768


_NOMIC = ModelConfig(
    document_prefix="search_document: ",
    query_prefix="search_query: ",
    normalized=True,
    dimensions=768,
)
_MXBAI = ModelConfig(
    document_prefix="Represent this document for retrieval: ",
    query_prefix=(
        "Represent this sentence for searching relevant passages: "
    ),
    normalized=True,
    dimensions=1024,
)


def _sized(small: int, base: int, large: int, name: str) -> int:
    if "small" in name:
        return small
    if "large" in name:
        return large
    return base


def get_model_config(model_name: str) -> ModelConfig:
    """Resolve a model name (optionally version-tagged) to its config.

    Families (models.rs:37-118): nomic (search_document/search_query
    prefixes), mxbai (Represent prefixes), BGE (query-side instruction
    only), E5 (passage:/query:), GTE / all-MiniLM / OpenAI
    (no prefixes). Unknown names → the unnormalized 768-dim default
    (models.rs:21-30).
    """
    base = model_name.split(":", 1)[0]

    if base in (
        "nomic-embed-text", "nomic-embed-text-v1", "nomic-embed-text-v1.5",
        "text-embedding-nomic-embed-text-v1.5",
    ):
        return _NOMIC
    if base in ("mxbai-embed-large", "mxbai-embed-large-v1"):
        return _MXBAI
    if base in (
        "bge-small-en", "bge-base-en", "bge-large-en",
        "bge-small-en-v1.5", "bge-base-en-v1.5", "bge-large-en-v1.5",
    ):
        return ModelConfig(
            document_prefix="",
            query_prefix=(
                "Represent this sentence for searching relevant passages: "
            ),
            normalized=True,
            dimensions=_sized(384, 768, 1024, base),
        )
    if base in (
        "e5-small", "e5-base", "e5-large",
        "e5-small-v2", "e5-base-v2", "e5-large-v2",
        "multilingual-e5-small", "multilingual-e5-base",
        "multilingual-e5-large",
    ):
        return ModelConfig(
            document_prefix="passage: ",
            query_prefix="query: ",
            normalized=True,
            dimensions=_sized(384, 768, 1024, base),
        )
    if base in ("gte-small", "gte-base", "gte-large"):
        return ModelConfig(
            normalized=True, dimensions=_sized(384, 768, 1024, base)
        )
    if base in ("all-minilm", "all-MiniLM-L6-v2", "all-MiniLM-L12-v2"):
        return ModelConfig(normalized=True, dimensions=384)
    if base == "text-embedding-3-small":
        return ModelConfig(normalized=True, dimensions=1536)
    if base == "text-embedding-3-large":
        return ModelConfig(normalized=True, dimensions=3072)
    if base == "text-embedding-ada-002":
        return ModelConfig(normalized=True, dimensions=1536)
    return ModelConfig()
