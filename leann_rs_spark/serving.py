"""R5/R6: serving veneers — HTTP and MCP front-ends over the read path.

Reference: /root/reference/src/cli/serve.rs (axum router :90-96, search
handler :260-311, info/health/indexes :125-160) and
/root/reference/src/cli/mcp.rs (tools `search` + `list_indexes` over
stdio JSON-RPC, :105-271). Both are thin veneers over the engine's
search internals (SURVEY §2.4) — NOT part of the correctness surface.

Design: all protocol logic lives in pure functions over an
``IndexService`` facade so tests exercise request→response behavior
without sockets; ``serve_http`` wraps the same functions in a stdlib
ThreadingHTTPServer (no third-party web framework — the container has
none, and the reference gates its server behind a feature flag the same
way, serve.rs:313-316).

Routes (serve.rs:90-96):
    GET  /         banner          GET  /health   "ok"
    GET  /info     index metadata  GET  /indexes  catalog listing
    POST /search   {query, top_k=5, filter?, hybrid=false, hybrid_alpha=0.7}
                   → {results: [{id, score, text, metadata}], query, took_ms}

MCP (mcp.rs:105-133): JSON-RPC 2.0 messages `initialize`, `tools/list`,
`tools/call` with tools `search` (markdown-formatted results) and
`list_indexes`; unknown tool → error result, matching the reference's
CallToolResult::error path.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict
from typing import Any

from pyspark.sql import SparkSession

SERVER_BANNER = (
    "LEANN API Server\n\nEndpoints:\n  POST /search - Search the index\n"
    "  GET  /info   - Get index information\n  GET  /health - Health check\n"
)
DEFAULT_TOP_K = 5  # serve.rs:237-238
DEFAULT_ALPHA = 0.7  # serve.rs:240-241


class IndexService:
    """One bound index (serve.rs AppState analog): the Spark session,
    warehouse, and index name the veneers serve."""

    def __init__(self, spark: SparkSession, warehouse: str, name: str):
        self.spark = spark
        self.warehouse = warehouse
        self.name = name

    def meta(self) -> dict[str, Any]:
        from leann_rs_spark.catalog import load_meta

        return asdict(load_meta(self.warehouse, self.name))

    def search(
        self,
        query: str,
        top_k: int = DEFAULT_TOP_K,
        filter_str: str | None = None,
        hybrid: bool = False,
        hybrid_alpha: float = DEFAULT_ALPHA,
    ) -> list[dict[str, Any]]:
        from leann_rs_spark.catalog import search_index

        rows = search_index(
            self.spark,
            self.warehouse,
            self.name,
            query,
            k=top_k,
            filter_str=filter_str,
            hybrid=hybrid,
            hybrid_alpha=hybrid_alpha,
        ).collect()
        return [
            {
                "id": str(r["idx"]),
                "score": float(r["score"]),
                "text": r["text"],
                "metadata": {"doc_id": r["doc_id"], "source": r["source"]},
            }
            for r in rows
        ]

    def list_indexes(self) -> list[dict[str, Any]]:
        from leann_rs_spark.catalog import list_indexes

        return [r.asDict() for r in list_indexes(self.spark, self.warehouse).collect()]


# ---------------------------------------------------------------------------
# R5: HTTP protocol functions (serve.rs:125-311)
# ---------------------------------------------------------------------------

def handle_http(
    service: IndexService, method: str, path: str, body: bytes | None = None
) -> tuple[int, str, str]:
    """(status, content_type, payload) for one request — the router."""
    if method == "GET" and path == "/":
        return 200, "text/plain", SERVER_BANNER
    if method == "GET" and path == "/health":
        return 200, "text/plain", "ok"  # serve.rs:129-131
    if method == "GET" and path == "/info":
        # serve.rs info_handler: index name + meta fields
        return 200, "application/json", json.dumps(
            {"index": service.name, **service.meta()}
        )
    if method == "GET" and path == "/indexes":
        return 200, "application/json", json.dumps(service.list_indexes())
    if method == "POST" and path == "/search":
        try:
            req = json.loads(body or b"{}")
        except json.JSONDecodeError as e:
            return 400, "text/plain", f"invalid JSON: {e}"
        if "query" not in req:
            return 400, "text/plain", "missing required field: query"
        start = time.perf_counter()
        try:
            results = service.search(
                req["query"],
                top_k=int(req.get("top_k", DEFAULT_TOP_K)),
                filter_str=req.get("filter"),
                hybrid=bool(req.get("hybrid", False)),
                hybrid_alpha=float(req.get("hybrid_alpha", DEFAULT_ALPHA)),
            )
        except Exception as e:  # serve.rs maps errors to 500
            return 500, "text/plain", str(e)
        took_ms = int((time.perf_counter() - start) * 1000)
        return 200, "application/json", json.dumps(
            {"results": results, "query": req["query"], "took_ms": took_ms}
        )
    return 404, "text/plain", "not found"


def serve_http(service: IndexService, host: str = "127.0.0.1", port: int = 0):
    """Start a ThreadingHTTPServer bound to the service; returns the
    server (caller runs serve_forever / shutdown). port=0 → ephemeral."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _respond(self, body: bytes | None) -> None:
            status, ctype, payload = handle_http(
                service, self.command, self.path, body
            )
            data = payload.encode()
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
            self._respond(None)

        def do_POST(self) -> None:  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            self._respond(self.rfile.read(n) if n else None)

        def log_message(self, *args: Any) -> None:
            pass

    return ThreadingHTTPServer((host, port), Handler)


# ---------------------------------------------------------------------------
# R6: MCP protocol functions (mcp.rs:105-271)
# ---------------------------------------------------------------------------

MCP_TOOLS = [
    {
        "name": "search",
        "description": (
            "Search for documents in the LEANN vector database using "
            "semantic similarity. Returns relevant passages with scores "
            "and source metadata."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "index": {"type": "string"},
                "top_k": {"type": "integer", "default": DEFAULT_TOP_K},
                "filter": {"type": "string"},
            },
            "required": ["query"],
        },
    },
    {
        "name": "list_indexes",
        "description": "List all available LEANN indexes.",
        "inputSchema": {"type": "object", "properties": {}},
    },
]


def format_search_markdown(results: list[dict[str, Any]]) -> str:
    """mcp.rs markdown result formatting: numbered, scored entries."""
    if not results:
        return "No results found."
    lines = []
    for i, r in enumerate(results):
        lines.append(f"**[{i + 1}]** (score: {r['score']:.4f})")
        lines.append(r["text"])
        src = r.get("metadata", {}).get("source")
        if src:
            lines.append(f"*Source: {src}*")
        lines.append("")
    return "\n".join(lines).rstrip()


def handle_mcp(service: IndexService, message: dict[str, Any]) -> dict[str, Any]:
    """One JSON-RPC request → response dict (stdio transport elsewhere)."""
    mid = message.get("id")
    method = message.get("method", "")

    def ok(result: dict[str, Any]) -> dict[str, Any]:
        return {"jsonrpc": "2.0", "id": mid, "result": result}

    if method == "initialize":
        return ok(
            {
                "protocolVersion": "2024-11-05",
                "serverInfo": {"name": "leann-spark-mcp", "version": "1.0"},
                "capabilities": {"tools": {}},
            }
        )
    if method == "tools/list":
        return ok({"tools": MCP_TOOLS})
    if method == "tools/call":
        params = message.get("params", {})
        tool = params.get("name")
        args = params.get("arguments", {})
        try:
            if tool == "search":
                results = service.search(
                    args["query"],
                    top_k=int(args.get("top_k", DEFAULT_TOP_K)),
                    filter_str=args.get("filter"),
                )
                text = format_search_markdown(results)
            elif tool == "list_indexes":
                entries = service.list_indexes()
                text = "\n".join(
                    f"- {e['name']} ({e['passage_count']} passages, "
                    f"dims={e['dimensions']})"
                    for e in entries
                ) or "No indexes found."
            else:
                return ok(
                    {
                        "content": [
                            {"type": "text", "text": f"Unknown tool: {tool}"}
                        ],
                        "isError": True,
                    }
                )
        except Exception as e:  # mcp.rs CallToolResult::error path
            return ok(
                {
                    "content": [{"type": "text", "text": f"Search error: {e}"}],
                    "isError": True,
                }
            )
        return ok({"content": [{"type": "text", "text": text}], "isError": False})
    return {
        "jsonrpc": "2.0",
        "id": mid,
        "error": {"code": -32601, "message": f"Method not found: {method}"},
    }


def serve_mcp_stdio(service: IndexService, stdin=None, stdout=None) -> None:
    """Line-delimited JSON-RPC over stdio (mcp.rs transport)."""
    import sys

    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            message = json.loads(line)
        except json.JSONDecodeError:
            continue
        response = handle_mcp(service, message)
        stdout.write(json.dumps(response) + "\n")
        stdout.flush()
