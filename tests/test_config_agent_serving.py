"""R3/R5/R6/R7: config management, ReAct agent, HTTP + MCP veneers.

The agent/serving layers are driver-side veneers over the distributed
read path (SURVEY §2.4); these tests pin the protocol/string semantics
against the reference's control flow (react.rs, serve.rs, mcp.rs,
config.rs) and run one end-to-end pass over a real warehouse index.
"""

from __future__ import annotations

import json

import pytest

from leann_rs_spark.agent import (
    format_observation,
    index_search_tool,
    parse_action,
    react_loop,
    scripted_llm,
    simulated_llm,
)
from leann_rs_spark.config import (
    Config,
    create_example_if_missing,
    resolve_build_settings,
)
from leann_rs_spark.serving import (
    IndexService,
    format_search_markdown,
    handle_http,
    handle_mcp,
)

# ---------------------------------------------------------------------------
# R7: config
# ---------------------------------------------------------------------------


def test_config_defaults():
    # config.rs test_default_config (config.rs:232-238)
    c = Config()
    assert c.embedding.provider == "ollama"
    assert c.embedding.model == "nomic-embed-text"
    assert c.build.chunk_size == 256
    assert c.build.chunk_overlap == 128
    assert c.build.max_file_size_kb == 1024


def test_config_parse_roundtrip(tmp_path):
    # config.rs test_parse_config (config.rs:240-256)
    p = tmp_path / "config.toml"
    p.write_text(
        "[embedding]\n"
        'provider = "lmstudio"\n'
        'model = "mxbai-embed-large-v1"\n'
        'base_url = "http://localhost:1234/v1"\n'
        "\n[build]\nchunk_size = 512\n"
    )
    c = Config.load(str(p))
    assert c.embedding.provider == "lmstudio"
    assert c.embedding.model == "mxbai-embed-large-v1"
    assert c.embedding.base_url == "http://localhost:1234/v1"
    assert c.build.chunk_size == 512
    assert c.build.chunk_overlap == 128  # untouched default

    # save → load round-trips
    out = tmp_path / "saved.toml"
    c.save(str(out))
    c2 = Config.load(str(out))
    assert c2 == c


def test_config_missing_and_invalid_fall_back(tmp_path):
    # config.rs:137-158 — never raises, returns defaults
    assert Config.load(str(tmp_path / "nope.toml")) == Config()
    bad = tmp_path / "bad.toml"
    bad.write_text("[embedding\nprovider = ???")
    assert Config.load(str(bad)) == Config()


def test_config_example_created_once(tmp_path):
    p = tmp_path / "cfg" / "config.toml"
    assert create_example_if_missing(str(p)) is True
    assert Config.load(str(p)).embedding.provider == "ollama"
    assert create_example_if_missing(str(p)) is False


def test_cli_precedence_merge():
    # build.rs:160-191: default CLI values yield to config; explicit wins
    cfg = Config.from_dict(
        {"embedding": {"provider": "gemini", "model": "embed-x"},
         "build": {"chunk_size": 512}}
    )
    merged = resolve_build_settings(cfg)
    assert merged["embedding_mode"] == "gemini"
    assert merged["embedding_model"] == "embed-x"
    assert merged["chunk_size"] == 512
    explicit = resolve_build_settings(
        cfg, embedding_mode="openai", embedding_model="my-model", chunk_size=64
    )
    # "openai" IS the CLI default string → yields to config (build.rs:160-163)
    assert explicit["embedding_mode"] == "gemini"
    assert explicit["embedding_model"] == "my-model"
    assert explicit["chunk_size"] == 64


# ---------------------------------------------------------------------------
# R3: action parser + loop (react.rs:88-239)
# ---------------------------------------------------------------------------


def test_parse_action_bare_forms():
    a = parse_action('Thought: x\nsearch("spark joins")')
    assert (a.kind, a.arg) == ("search", "spark joins")
    # finish uses rfind: nested parens survive (react.rs:184-190)
    a = parse_action("finish(f(x) is the answer)")
    assert (a.kind, a.arg) == ("finish", "f(x) is the answer")
    # search( has priority over finish( (react.rs:175-190 order)
    a = parse_action("search(a) finish(b)")
    assert a.kind == "search"


def test_parse_action_action_lines():
    a = parse_action("Thought: hmm\nAction: search('vector db')")
    assert (a.kind, a.arg) == ("search", "vector db")
    a = parse_action("Action: finish(the final answer)")
    assert (a.kind, a.arg) == ("finish", "the final answer")
    assert parse_action("no action here") is None


def test_format_observation():
    assert format_observation([]) == "No relevant results found."
    obs = format_observation(["short", "x" * 400])
    lines = obs.splitlines()
    assert lines[0] == "[1] short"
    assert lines[1].startswith("[2] " + "x" * 300)
    assert lines[1].endswith("...")
    assert len(lines[1]) == len("[2] ") + 300 + 3


def test_react_loop_search_then_finish():
    calls = []

    def tool(q):
        calls.append(q)
        return ["relevant passage"]

    llm = scripted_llm(
        ["Thought: look\nAction: search(test query)", "finish(42)"]
    )
    assert react_loop("what is x?", llm, tool) == "42"
    assert calls == ["test query"]


def test_react_loop_no_action_nudge_then_final_answer_text():
    llm = scripted_llm(["I think...", "The answer is definitely yes."])
    out = react_loop("q", llm, lambda q: [])
    assert out == "The answer is definitely yes."


def test_react_loop_max_steps_final_prompt():
    # max_steps searches, then the post-loop finish() is honored
    llm = scripted_llm(
        ["search(a)", "search(b)", "finish(late answer)"]
    )
    assert react_loop("q", llm, lambda q: ["t"], max_steps=2) == "late answer"


def test_simulated_llm_matches_reference_branches():
    gen = simulated_llm()
    with_q = gen("stuff\nQuestion: why?\nmore")
    assert 'asking about "why?"' in with_q  # no-context branch
    with_ctx = gen("Context: things\nQuestion: why?\n")
    assert 'response to "why?"' in with_ctx
    assert "Key points from the context" in with_ctx


# ---------------------------------------------------------------------------
# R5/R6 + R3 end-to-end over a real index
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    from leann_rs_spark.catalog import build_index

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    docs = spark.createDataFrame(
        [
            (0, "doc0.txt", "the quick brown fox jumps over the lazy dog"),
            (1, "doc1.txt", "spark executes distributed dataframe queries"),
            (2, "doc2.txt", "vector search ranks passages by inner product"),
            (3, "doc3.txt", "bm25 scores lexical term overlap in documents"),
        ],
        "doc_id long, source string, text string",
    )
    build_index(
        spark, warehouse, "idx1", docs,
        strategy="simple", chunk_size=16, chunk_overlap=4, dims=32,
    )
    return IndexService(spark, warehouse, "idx1")


def test_http_static_routes(service):
    status, _, body = handle_http(service, "GET", "/health")
    assert (status, body) == (200, "ok")
    status, _, body = handle_http(service, "GET", "/")
    assert status == 200 and "POST /search" in body
    status, _, body = handle_http(service, "GET", "/info")
    info = json.loads(body)
    assert info["index"] == "idx1" and info["dimensions"] == 32
    status, _, body = handle_http(service, "GET", "/indexes")
    listing = json.loads(body)
    assert [e["name"] for e in listing] == ["idx1"]
    assert handle_http(service, "GET", "/nope")[0] == 404


def test_http_search_route(service):
    status, ctype, body = handle_http(
        service, "POST", "/search",
        json.dumps({"query": "vector search ranking", "top_k": 2}).encode(),
    )
    assert status == 200 and ctype == "application/json"
    resp = json.loads(body)
    assert resp["query"] == "vector search ranking"
    assert len(resp["results"]) == 2
    r0 = resp["results"][0]
    assert set(r0) == {"id", "score", "text", "metadata"}
    assert "took_ms" in resp
    # bad requests (serve.rs error mapping)
    assert handle_http(service, "POST", "/search", b"not json")[0] == 400
    assert handle_http(service, "POST", "/search", b"{}")[0] == 400


def test_http_server_roundtrip(service):
    import threading
    import urllib.request

    from leann_rs_spark.serving import serve_http

    server = serve_http(service)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.read() == b"ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"query": "lazy dog", "top_k": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert len(resp["results"]) == 1
    finally:
        server.shutdown()
        server.server_close()


def test_mcp_protocol(service):
    init = handle_mcp(service, {"jsonrpc": "2.0", "id": 1, "method": "initialize"})
    assert init["result"]["serverInfo"]["name"] == "leann-spark-mcp"
    tools = handle_mcp(service, {"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
    assert [t["name"] for t in tools["result"]["tools"]] == ["search", "list_indexes"]

    call = handle_mcp(
        service,
        {
            "jsonrpc": "2.0", "id": 3, "method": "tools/call",
            "params": {"name": "search",
                       "arguments": {"query": "distributed queries", "top_k": 1}},
        },
    )
    assert call["result"]["isError"] is False
    text = call["result"]["content"][0]["text"]
    assert text.startswith("**[1]** (score: ")

    listing = handle_mcp(
        service,
        {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
         "params": {"name": "list_indexes", "arguments": {}}},
    )
    assert "idx1" in listing["result"]["content"][0]["text"]

    unknown = handle_mcp(
        service,
        {"jsonrpc": "2.0", "id": 5, "method": "tools/call",
         "params": {"name": "bogus", "arguments": {}}},
    )
    assert unknown["result"]["isError"] is True
    bad_method = handle_mcp(service, {"jsonrpc": "2.0", "id": 6, "method": "x/y"})
    assert bad_method["error"]["code"] == -32601


def test_format_search_markdown_empty():
    assert format_search_markdown([]) == "No results found."


def test_react_agent_over_index(service):
    tool = index_search_tool(service.spark, service.warehouse, "idx1", top_k=2)
    seen = {}

    def llm(history):
        # the system prompt itself contains one "Observation:" literal
        if history.count("Observation:") == 1:
            return "Thought: search first\nAction: search(inner product ranking)"
        seen["obs"] = history.rsplit("Observation:", 1)[1]
        return "finish(passages are ranked by inner product)"

    out = react_loop("how are passages ranked?", llm, tool)
    assert out == "passages are ranked by inner product"
    assert seen["obs"].lstrip().startswith("[1] ")
