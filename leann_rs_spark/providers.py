"""Concrete network embedding / LLM providers (R4).

Reference clients re-expressed over stdlib urllib (no extra deps):

- OpenAI embeddings: POST {base}/embeddings, batches of 100
  (src/embedding/openai.rs:82-106; batch size :90).
- Ollama embeddings: POST {host}/api/embed, batches of 32
  (src/embedding/ollama.rs:70-97).
- Gemini embeddings: POST {base}/models/{model}:batchEmbedContents
  (src/embedding/gemini.rs:140-170).
- OpenAI chat LLM: POST {base}/chat/completions
  (src/llm/openai.rs:45-60).
- Ollama LLM: POST {host}/api/generate, stream=false
  (src/llm/ollama.rs:51-70).
- Anthropic LLM: POST {base}/v1/messages with x-api-key +
  anthropic-version headers (src/llm/anthropic.rs:76-96).

The embedding classes expose `.embed(list[str]) -> list[list[float]]`
— the exact slot `operators/embedder.embed_pandas` batches, retries,
and bounds concurrency around; the LLMs expose
`.generate(str) -> str` — the callable `operators/rag.rag_batch` and
`agent.react_loop` accept. Each call raises on transport/HTTP/shape
errors and performs NO internal retry: retry policy belongs to the
caller (embed_pandas's backoff ladder, then Spark task retry).

The reference's fourth embedding backend (candle.rs, an in-process
local model) has no network API to speak; its engine slot here is the
deterministic HashEmbedder plus any callable with the same `.embed`
shape.

Scale shape: providers are plain picklable objects shipped to
executors inside mapInPandas closures; each executor talks to the
service directly (no driver funnel), so cluster-wide throughput is
executors × max_concurrency requests in flight.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

DEFAULT_TIMEOUT_S = 60.0


def _post_json(url: str, payload: dict, headers: dict | None = None,
               timeout: float = DEFAULT_TIMEOUT_S) -> dict:
    data = json.dumps(payload).encode("utf-8")
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json", **(headers or {})}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:  # non-2xx: surface status + body
        body = e.read().decode("utf-8", "replace")[:500]
        raise RuntimeError(f"HTTP {e.code} from {url}: {body}") from e


class OpenAIEmbeddingProvider:
    """/embeddings client (src/embedding/openai.rs:82-106)."""

    batch_size = 100  # OpenAI limit (openai.rs:90)

    def __init__(self, model: str, api_key: str = "",
                 base_url: str = "https://api.openai.com/v1",
                 timeout: float = DEFAULT_TIMEOUT_S):
        self.model = model
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def embed(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        headers = {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        for i in range(0, len(texts), self.batch_size):
            batch = texts[i : i + self.batch_size]
            resp = _post_json(
                f"{self.base_url}/embeddings",
                {"model": self.model, "input": batch},
                headers, self.timeout,
            )
            rows = sorted(resp["data"], key=lambda d: d["index"])
            out.extend([[float(x) for x in r["embedding"]] for r in rows])
        return out


class OllamaEmbeddingProvider:
    """/api/embed client (src/embedding/ollama.rs:70-97)."""

    batch_size = 32  # Ollama recommendation (ollama.rs:80)

    def __init__(self, model: str, host: str = "http://localhost:11434",
                 timeout: float = DEFAULT_TIMEOUT_S):
        self.model = model
        self.host = host.rstrip("/")
        self.timeout = timeout

    def embed(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            batch = texts[i : i + self.batch_size]
            resp = _post_json(
                f"{self.host}/api/embed",
                {"model": self.model, "input": batch},
                None, self.timeout,
            )
            out.extend([[float(x) for x in v] for v in resp["embeddings"]])
        return out


class GeminiEmbeddingProvider:
    """:batchEmbedContents client (src/embedding/gemini.rs:140-170)."""

    batch_size = 100  # gemini.rs batches of 100

    def __init__(self, model: str, api_key: str = "",
                 base_url: str = "https://generativelanguage.googleapis.com/v1beta",
                 timeout: float = DEFAULT_TIMEOUT_S):
        self.model = model
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def embed(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            batch = texts[i : i + self.batch_size]
            resp = _post_json(
                f"{self.base_url}/models/{self.model}:batchEmbedContents"
                f"?key={self.api_key}",
                {
                    "requests": [
                        {
                            "model": f"models/{self.model}",
                            "content": {"parts": [{"text": t}]},
                        }
                        for t in batch
                    ]
                },
                None, self.timeout,
            )
            out.extend([[float(x) for x in e["values"]] for e in resp["embeddings"]])
        return out


class OpenAILLM:
    """/chat/completions client (src/llm/openai.rs:45-60)."""

    def __init__(self, model: str, api_key: str = "",
                 base_url: str = "https://api.openai.com/v1",
                 timeout: float = DEFAULT_TIMEOUT_S):
        self.model = model
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def generate(self, prompt: str) -> str:
        headers = {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        resp = _post_json(
            f"{self.base_url}/chat/completions",
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
            },
            headers, self.timeout,
        )
        return resp["choices"][0]["message"]["content"]

    __call__ = generate  # rag_batch/react_loop take a plain callable


class OllamaLLM:
    """/api/generate client (src/llm/ollama.rs:51-70)."""

    def __init__(self, model: str, host: str = "http://localhost:11434",
                 timeout: float = DEFAULT_TIMEOUT_S):
        self.model = model
        self.host = host.rstrip("/")
        self.timeout = timeout

    def generate(self, prompt: str) -> str:
        resp = _post_json(
            f"{self.host}/api/generate",
            {"model": self.model, "prompt": prompt, "stream": False},
            None, self.timeout,
        )
        return resp["response"]

    __call__ = generate


class AnthropicLLM:
    """/v1/messages client (src/llm/anthropic.rs:76-96)."""

    def __init__(self, model: str, api_key: str = "",
                 base_url: str = "https://api.anthropic.com",
                 max_tokens: int = 1024,
                 timeout: float = DEFAULT_TIMEOUT_S):
        self.model = model
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.max_tokens = max_tokens
        self.timeout = timeout

    def generate(self, prompt: str) -> str:
        resp = _post_json(
            f"{self.base_url}/v1/messages",
            {
                "model": self.model,
                "max_tokens": self.max_tokens,
                "messages": [{"role": "user", "content": prompt}],
            },
            {
                "x-api-key": self.api_key,
                "anthropic-version": "2023-06-01",  # anthropic.rs:86
            },
            self.timeout,
        )
        return resp["content"][0]["text"]

    __call__ = generate
