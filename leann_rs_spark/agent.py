"""R3: ReAct agent loop — driver-side orchestration over the search API.

Reference: /root/reference/src/cli/react.rs (loop :88-171, action parser
:173-218, search tool :220-239). The agent is NOT a distributed op
(SURVEY §2.4): it is a driver-side loop whose only heavy step is the
search tool, which runs the engine's distributed read path
(catalog.search_index). Everything else is string handling.

Semantics preserved:
- System prompt + "Question: .. Let me search" seed history (react.rs:89-112).
- ≤ max_steps (default 5) LLM rounds; each response appended to history.
- Action parser: bare ``search(q)`` (first ')'), bare ``finish(a)``
  (LAST ')'), then line-scanned ``Action: search/finish(...)`` —
  quote-trimmed, in exactly that priority order (react.rs:173-218).
- No action: return the response if it claims a final answer
  ("final answer"/"the answer is", case-insensitive), else nudge with
  "Please use an action: ..." (react.rs:149-160).
- Search observation: top-k results "[i] <text truncated to 300 chars
  + '...'>" one per line; "No relevant results found." when empty
  (react.rs:220-239). Default tool top_k = 3 (react.rs mirrors the CLI
  default; SURVEY §2.4 R3).
- Max steps exhausted: one final "Maximum steps reached..." prompt; the
  finish() payload if parseable, else the raw response (react.rs:163-171).

The LLM is a plain ``Callable[[str], str]`` — the simulated provider
(operators/rag.py, the reference's own no-network test strategy) or a
scripted sequence for tests; real providers batch HTTP driver-side.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession

SYSTEM_PROMPT = """You are a helpful assistant that answers questions using available tools.

Available tools:
1. search(query) - Search the knowledge base for relevant information
2. finish(answer) - Provide the final answer

For each step, use the following format:
Thought: [Your reasoning about what to do next]
Action: [tool_name(argument)]

After getting search results, you'll see:
Observation: [results from the tool]

Continue until you have enough information, then use finish(answer) to provide your final answer.

Important:
- Always search for relevant information before answering
- If the first search doesn't give enough info, try different search queries
- Be concise in your final answer
"""

SNIPPET_CHARS = 300  # react.rs:230-234
DEFAULT_TOP_K = 3
DEFAULT_MAX_STEPS = 5  # react.rs: max_steps default


@dataclass
class Action:
    kind: str  # "search" | "finish"
    arg: str


def _trim_quotes(s: str) -> str:
    return s.strip().strip('"').strip("'")


def parse_action(response: str) -> Action | None:
    """react.rs:173-218 verbatim priority: bare search( → bare finish(
    → line-scanned ``Action:`` forms."""
    i = response.find("search(")
    if i != -1:
        rest = response[i + len("search(") :]
        j = rest.find(")")
        if j != -1:
            return Action("search", _trim_quotes(rest[:j]))
    i = response.find("finish(")
    if i != -1:
        rest = response[i + len("finish(") :]
        j = rest.rfind(")")  # rfind: answers may contain ')'
        if j != -1:
            return Action("finish", _trim_quotes(rest[:j]))
    for line in response.splitlines():
        line = line.strip()
        if not line.startswith("Action:"):
            continue
        action_str = line[len("Action:") :].strip()
        for kind, find in (("search", str.find), ("finish", str.rfind)):
            if action_str.startswith(kind):
                k = action_str.find("(")
                if k != -1:
                    rest = action_str[k + 1 :]
                    j = find(rest, ")")
                    if j != -1:
                        return Action(kind, _trim_quotes(rest[:j]))
    return None


def format_observation(texts: list[str]) -> str:
    """react.rs:220-239: numbered 300-char snippets, one per line."""
    if not texts:
        return "No relevant results found."
    out = []
    for i, text in enumerate(texts):
        snippet = text[:SNIPPET_CHARS] + "..." if len(text) > SNIPPET_CHARS else text
        out.append(f"[{i + 1}] {snippet}")
    return "\n".join(out) + "\n"


def react_loop(
    query: str,
    llm: Callable[[str], str],
    search_tool: Callable[[str], list[str]],
    *,
    max_steps: int = DEFAULT_MAX_STEPS,
) -> str:
    """The react.rs:88-171 control flow with pluggable LLM + search."""
    history = (
        f"{SYSTEM_PROMPT}\n\nQuestion: {query}\n\n"
        "Let me search for relevant information.\n"
    )
    for _ in range(max_steps):
        response = llm(history)
        history += response + "\n"
        action = parse_action(response)
        if action is None:
            low = response.lower()
            if "final answer" in low or "the answer is" in low:
                return response
            history += "Please use an action: search(query) or finish(answer)\n"
            continue
        if action.kind == "finish":
            return action.arg
        observation = format_observation(search_tool(action.arg))
        history += f"Observation: {observation}\n\n"

    history += (
        "Maximum steps reached. Please provide your final answer using "
        "finish(answer).\n"
    )
    final = llm(history)
    action = parse_action(final)
    if action is not None and action.kind == "finish":
        return action.arg
    return final


def index_search_tool(
    spark: SparkSession,
    warehouse: str,
    name: str,
    *,
    top_k: int = DEFAULT_TOP_K,
) -> Callable[[str], list[str]]:
    """Bind the distributed read path as the agent's search tool.
    Each call is one Spark job returning k rows to the driver — the
    `searcher.search(.., top_k, 64)` analog of react.rs:220-224."""
    from leann_rs_spark.catalog import search_index

    def tool(q: str) -> list[str]:
        rows = (
            search_index(spark, warehouse, name, q, k=top_k, hybrid=False)
            .select("text")
            .collect()
        )
        return [r["text"] for r in rows]

    return tool


def simulated_llm(model_name: str = "simulated") -> Callable[[str], str]:
    """Python twin of operators/rag.simulated_generate (the reference's
    /root/reference/src/llm/simulated.rs:17-56) for driver-side loops."""
    from leann_rs_spark.operators.rag import _SIM_NO_CONTEXT, _SIM_WITH_CONTEXT

    def generate(prompt: str) -> str:
        if "Question:" in prompt:
            q = prompt.split("Question:", 1)[1].split("\n", 1)[0].strip()
        else:
            q = "your question"
        has_context = "Context:" in prompt or "passages" in prompt
        template = _SIM_WITH_CONTEXT if has_context else _SIM_NO_CONTEXT
        return template.replace("{q}", q).replace("{m}", model_name)

    return generate


def scripted_llm(responses: list[str]) -> Callable[[str], str]:
    """Deterministic scripted provider for agent tests — plays the role
    simulated.rs plays for ask (no network, fixed outputs)."""
    it = iter(responses)

    def generate(_prompt: str) -> str:
        try:
            return next(it)
        except StopIteration:
            return "finish(out of scripted responses)"

    return generate
