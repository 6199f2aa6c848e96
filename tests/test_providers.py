"""R4 network providers against a local stub HTTP server: request
shapes, response parsing, error surfacing, and the mapInPandas
integration (executors → server directly, retry via embed_pandas)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from leann_rs_spark.providers import (
    AnthropicLLM,
    GeminiEmbeddingProvider,
    OllamaEmbeddingProvider,
    OllamaLLM,
    OpenAIEmbeddingProvider,
    OpenAILLM,
)


def fake_vec(text: str) -> list[float]:
    """Deterministic fake embedding — computable on both sides."""
    return [float(len(text)), float(sum(map(ord, text)) % 97)]


class _Stub(BaseHTTPRequestHandler):
    fail_next = set()  # paths that 500 exactly once

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        path = self.path.split("?")[0]
        if path in _Stub.fail_next:
            _Stub.fail_next.discard(path)
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b'{"error": "transient"}')
            return
        if path == "/v1/embeddings":
            # echo OpenAI shape; return data out of order to pin the
            # index-sort in the client
            data = [
                {"index": i, "embedding": fake_vec(t)}
                for i, t in enumerate(body["input"])
            ]
            out = {"data": list(reversed(data)), "model": body["model"]}
        elif path == "/api/embed":
            out = {"embeddings": [fake_vec(t) for t in body["input"]]}
        elif path.endswith(":batchEmbedContents"):
            out = {
                "embeddings": [
                    {"values": fake_vec(r["content"]["parts"][0]["text"])}
                    for r in body["requests"]
                ]
            }
        elif path == "/v1/chat/completions":
            msg = body["messages"][0]["content"]
            out = {"choices": [{"message": {"role": "assistant",
                                            "content": f"echo:{msg}"}}]}
        elif path == "/api/generate":
            assert body["stream"] is False
            out = {"response": f"gen:{body['prompt']}"}
        elif path == "/v1/messages":
            assert self.headers["x-api-key"] == "k"
            assert self.headers["anthropic-version"] == "2023-06-01"
            out = {"content": [{"type": "text",
                                "text": f"claude:{body['messages'][0]['content']}"}]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_openai_embeddings_sorted_by_index(server):
    p = OpenAIEmbeddingProvider("m", api_key="k", base_url=f"{server}/v1")
    texts = ["alpha", "bb", "c"]
    assert p.embed(texts) == [fake_vec(t) for t in texts]


def test_ollama_embeddings(server):
    p = OllamaEmbeddingProvider("m", host=server)
    texts = [f"doc {i}" for i in range(40)]  # spans two 32-batches
    assert p.embed(texts) == [fake_vec(t) for t in texts]


def test_gemini_embeddings(server):
    p = GeminiEmbeddingProvider("m", api_key="k", base_url=server)
    assert p.embed(["x", "yy"]) == [fake_vec("x"), fake_vec("yy")]


def test_llm_clients(server):
    assert OpenAILLM("m", "k", f"{server}/v1").generate("hi") == "echo:hi"
    assert OllamaLLM("m", server).generate("hi") == "gen:hi"
    assert AnthropicLLM("m", "k", server).generate("hi") == "claude:hi"


def test_http_error_surfaces_status(server):
    _Stub.fail_next.add("/v1/embeddings")
    p = OpenAIEmbeddingProvider("m", base_url=f"{server}/v1")
    with pytest.raises(RuntimeError, match="HTTP 500"):
        p.embed(["x"])


def test_embed_pandas_with_http_provider(spark, server):
    """End-to-end: executors call the local server through the hardened
    embed_pandas slot; a one-shot 500 is absorbed by its retry ladder."""
    from pyspark.sql import functions as F

    from leann_rs_spark.operators.embedder import embed_pandas

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(25)
        .coalesce(1)  # single task → the one-shot 500 hits this lineage
    )
    _Stub.fail_next.add("/v1/embeddings")
    out = embed_pandas(
        docs,
        OpenAIEmbeddingProvider("m", base_url=f"{server}/v1"),
        batch_size=7,
        max_retries=2,
        backoff_s=0.01,
    )
    rows = out.select("doc_id", "text", "embedding").collect()
    assert len(rows) == 25
    for r in rows:
        assert list(r["embedding"]) == fake_vec(r["text"])


def test_make_provider_construction():
    from leann_rs_spark.cli import make_provider

    assert make_provider("hash") is None
    p = make_provider("openai", "m", api_key="k", base_url="http://x/v1")
    assert type(p).__name__ == "OpenAIEmbeddingProvider" and p.base_url == "http://x/v1"
    assert type(make_provider("ollama", "m")).__name__ == "OllamaEmbeddingProvider"
    assert type(make_provider("gemini", "m", api_key="k")).__name__ == "GeminiEmbeddingProvider"
    with pytest.raises(ValueError, match="Unknown embedding mode"):
        make_provider("candle")


def test_cli_openai_mode_lifecycle(spark, server, tmp_path):
    """build --embedding-mode openai against the stub server, then
    search/update reconstruct the provider FROM meta — the reference's
    meta-driven provider wiring (search.rs:100-117) end-to-end."""
    import json

    from leann_rs_spark.cli import main

    wh = str(tmp_path / "wh")
    rc = main([
        "build", "net", "--warehouse", wh,
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8",
        "--embedding-mode", "openai", "--embedding-model", "m",
        "--embedding-base-url", f"{server}/v1", "--api-key", "k",
    ])
    assert rc == 0
    from leann_rs_spark.catalog import load_meta

    meta = load_meta(wh, "net")
    assert meta.embedding_mode == "openai" and meta.embedding_model == "m"
    assert meta.dimensions == 2  # probed from the stub's fake_vec

    rc = main([
        "update", "net", "--warehouse", wh,
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--embedding-base-url", f"{server}/v1", "--api-key", "k",
    ])
    assert rc == 0

    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "search", "net", "some document text", "--warehouse", wh,
            "--top-k", "3", "--json",
            "--embedding-base-url", f"{server}/v1", "--api-key", "k",
        ])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert len(out) == 3 and {"idx", "score", "text"} <= set(out[0])


def test_ask_with_http_llm(spark, server, tmp_path):
    """ask --llm openai routes generation through the mapInPandas LLM
    stage to the stub server; the prompt carries retrieved context."""
    import contextlib
    import io

    from leann_rs_spark.cli import main

    wh = str(tmp_path / "wh2")
    assert main([
        "build", "ix", "--warehouse", wh,
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
    ]) == 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "ask", "ix", "what is this corpus about?", "--warehouse", wh,
            "--llm", "openai", "--llm-model", "m",
            "--llm-base-url", f"{server}/v1", "--api-key", "k",
        ])
    assert rc == 0
    out = buf.getvalue()
    assert out.startswith("echo:")         # generated via the stub LLM
    assert "retrieved context" in out and "what is this corpus about?" in out
