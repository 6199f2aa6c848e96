"""Chunkers (T1-T3): sliding-window text chunker + AST-ish code chunker.

Byte-exact ports of the reference's chunking semantics:
- SimpleChunker (/root/reference/src/chunker/simple.rs:24-118): windows
  of chunk_size*4 BYTES (1 token ≈ 4 chars, :33-35), backward search for
  a whitespace boundary, overlap*4-byte overlap, UTF-8-boundary safe,
  forward-progress guards. The port operates on UTF-8 bytes so offsets
  match Rust's byte indexing on non-ASCII input.
- CodeChunker (/root/reference/src/chunker/ast.rs): per-language regex
  block starts, brace-count or indentation block ends, keep-first
  overlap dedup, oversized-block line splitting with overlap, >20-char
  inter-block gaps as "context" chunks, simple-chunker fallback.
- SmartChunker dispatch (/root/reference/src/chunker/mod.rs:83-117):
  strategy simple|ast|auto, auto → AST for 18 code extensions.

Spark-side, chunking is embarrassingly parallel per document: a
mapInPandas over the documents table emits (doc ref, chunk_index,
chunk_type, …, text) rows; global passage ids come from
utils.ids.with_dense_index (the scalable replacement for the
reference's driver-side sequential counter, src/cli/build.rs:286-298).
"""

from __future__ import annotations

import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

DEFAULT_CHUNK_SIZE = 256   # tokens; src/cli/build.rs:85-91
DEFAULT_OVERLAP = 128

_WS_BYTES = frozenset(b" \t\n\r\x0b\x0c")  # ASCII whitespace; Unicode ws handled below


def _is_char_boundary(b: bytes, i: int) -> bool:
    if i == 0 or i >= len(b):
        return True
    return (b[i] & 0xC0) != 0x80


def _rfind_ws(b: bytes, start: int, end: int) -> int | None:
    """Byte offset (relative to start) of the last whitespace char in
    b[start:end], mirroring Rust's rfind(char::is_whitespace)."""
    s = b[start:end].decode("utf-8")
    for i in range(len(s) - 1, -1, -1):
        if s[i].isspace():
            return len(s[:i].encode("utf-8"))
    return None


def simple_chunk(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                 chunk_overlap: int = DEFAULT_OVERLAP) -> list[dict[str, Any]]:
    """→ [{chunk_index, chunk_type:'simple', text}] — simple.rs:24-118."""
    b = text.encode("utf-8")
    n = len(b)
    char_chunk = chunk_size * 4
    char_overlap = chunk_overlap * 4

    if n <= char_chunk:
        return [{"chunk_index": 0, "chunk_type": "simple", "text": text}]

    chunks: list[dict[str, Any]] = []
    start = 0
    chunk_index = 0
    while start < n:
        end = min(start + char_chunk, n)
        while end > start and not _is_char_boundary(b, end):
            end -= 1

        if end < n:
            pos = _rfind_ws(b, start, end)
            chunk_end = start + pos if pos is not None else end
        else:
            chunk_end = end

        chunk_text = b[start:chunk_end].decode("utf-8").strip()
        if chunk_text:
            chunks.append(
                {"chunk_index": chunk_index, "chunk_type": "simple", "text": chunk_text}
            )
            chunk_index += 1

        if chunk_end <= start:
            # force progress to the next char boundary (ceil_char_boundary)
            start += 1
            while start < n and not _is_char_boundary(b, start):
                start += 1
            continue

        new_start = chunk_end - char_overlap if chunk_end > start + char_overlap else chunk_end
        while new_start > 0 and not _is_char_boundary(b, new_start):
            new_start -= 1
        if new_start <= start:
            new_start = chunk_end
        start = new_start

        if start >= n or chunk_end >= n:
            break

    return chunks


# ---------------------------------------------------------------------------
# Code chunker (T2) — ast.rs
# ---------------------------------------------------------------------------

EXT_TO_LANGUAGE = {
    "rs": "rust", "py": "python", "js": "javascript", "jsx": "javascript",
    "ts": "typescript", "tsx": "typescript", "go": "go", "java": "java",
    "c": "c", "h": "c", "cpp": "cpp", "cc": "cpp", "hpp": "cpp",
    "rb": "ruby", "php": "php", "swift": "swift", "kt": "kotlin",
    "scala": "scala", "cs": "csharp",
}

# ast.rs:193-240
_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "rust": [
        ("function", r"^\s*(?:pub\s+)?(?:async\s+)?fn\s+(\w+)"),
        ("struct", r"^\s*(?:pub\s+)?struct\s+(\w+)"),
        ("enum", r"^\s*(?:pub\s+)?enum\s+(\w+)"),
        ("impl", r"^\s*impl(?:<[^>]+>)?\s+(?:(\w+)|for\s+(\w+))"),
        ("trait", r"^\s*(?:pub\s+)?trait\s+(\w+)"),
        ("mod", r"^\s*(?:pub\s+)?mod\s+(\w+)\s*\{"),
    ],
    "python": [
        ("function", r"^\s*(?:async\s+)?def\s+(\w+)"),
        ("class", r"^\s*class\s+(\w+)"),
    ],
    "javascript": [
        ("function", r"^\s*(?:async\s+)?function\s+(\w+)"),
        ("function", r"^\s*(?:export\s+)?(?:async\s+)?function\s+(\w+)"),
        ("class", r"^\s*(?:export\s+)?class\s+(\w+)"),
        ("method", r"^\s*(?:async\s+)?(\w+)\s*\([^)]*\)\s*\{"),
        ("arrow", r"^\s*(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s+)?\([^)]*\)\s*=>"),
    ],
    "go": [
        ("function", r"^\s*func\s+(?:\([^)]+\)\s+)?(\w+)"),
        ("struct", r"^\s*type\s+(\w+)\s+struct"),
        ("interface", r"^\s*type\s+(\w+)\s+interface"),
    ],
    "java": [
        ("class", r"^\s*(?:public\s+)?(?:abstract\s+)?class\s+(\w+)"),
        ("interface", r"^\s*(?:public\s+)?interface\s+(\w+)"),
        ("method", r"^\s*(?:public|private|protected)?\s*(?:static\s+)?(?:\w+(?:<[^>]+>)?)\s+(\w+)\s*\("),
    ],
    "c": [
        ("function", r"^\s*(?:\w+(?:\s*\*)?)\s+(\w+)\s*\([^)]*\)\s*\{?"),
        ("class", r"^\s*class\s+(\w+)"),
        ("struct", r"^\s*struct\s+(\w+)"),
    ],
    "ruby": [
        ("class", r"^\s*class\s+(\w+)"),
        ("module", r"^\s*module\s+(\w+)"),
        ("method", r"^\s*def\s+(\w+)"),
    ],
}
_PATTERNS["typescript"] = _PATTERNS["javascript"]
_PATTERNS["cpp"] = _PATTERNS["c"]
_GENERIC_PATTERNS = [
    ("function", r"^\s*(?:def|func|function)\s+(\w+)"),
    ("class", r"^\s*class\s+(\w+)"),
]


def _find_indentation_end(lines: list[str], start: int) -> int:
    if start >= len(lines):
        return start + 1
    base = len(lines[start]) - len(lines[start].lstrip())
    end = start + 1
    while end < len(lines):
        line = lines[end]
        if not line.strip():
            end += 1
            continue
        if len(line) - len(line.lstrip()) <= base:
            break
        end += 1
    return end


def _find_brace_end(lines: list[str], start: int) -> int:
    count = 0
    found = False
    for idx in range(start, len(lines)):
        for ch in lines[idx]:
            if ch == "{":
                count += 1
                found = True
            elif ch == "}":
                count -= 1
                if found and count == 0:
                    return idx + 1
    return min(start + 50, len(lines))


def _extract_blocks(text: str, language: str) -> list[dict[str, Any]]:
    lines = text.splitlines()
    blocks: list[dict[str, Any]] = []
    for block_type, pat in _PATTERNS.get(language, _GENERIC_PATTERNS):
        rx = re.compile(pat)
        for line_idx, line in enumerate(lines):
            m = rx.search(line)
            if m:
                # the reference reads only capture group 1 (ast.rs:81),
                # so `impl<T> for X` yields "anonymous", not X
                name = m.group(1) or "anonymous"
                if language in ("python", "ruby"):
                    end = _find_indentation_end(lines, line_idx)
                else:
                    end = _find_brace_end(lines, line_idx)
                blocks.append(
                    {
                        "block_type": block_type,
                        "name": name,
                        "start_line": line_idx,
                        "end_line": end,
                        "content": "\n".join(lines[line_idx:end]),
                    }
                )
    blocks.sort(key=lambda bk: bk["start_line"])
    # keep-first overlap dedup (ast.rs:175-190)
    result: list[dict[str, Any]] = []
    for bk in blocks:
        if not any(
            bk["start_line"] < ex["end_line"] and bk["end_line"] > ex["start_line"]
            for ex in result
        ):
            result.append(bk)
    return result


def code_chunk(text: str, language: str | None,
               max_chunk_size: int = DEFAULT_CHUNK_SIZE,
               chunk_overlap: int = DEFAULT_OVERLAP) -> list[dict[str, Any]]:
    """→ chunk dicts with ast/context metadata — ast.rs:365-407.
    `language` is a language name (see EXT_TO_LANGUAGE); None falls back
    to the simple chunker."""
    if language is None:
        return simple_chunk(text, max_chunk_size, chunk_overlap)
    blocks = _extract_blocks(text, language)
    if not blocks:
        return simple_chunk(text, max_chunk_size, chunk_overlap)

    lines = text.splitlines()
    char_limit = max_chunk_size * 4
    chunks: list[dict[str, Any]] = []

    for bk in blocks:
        content = bk["content"]
        if len(content.encode("utf-8")) <= char_limit:
            chunks.append(
                {
                    "chunk_type": "ast",
                    "block_type": bk["block_type"],
                    "name": bk["name"],
                    "language": language,
                    "start_line": bk["start_line"] + 1,
                    "end_line": bk["end_line"],
                    "text": content,
                }
            )
        else:
            blines = content.splitlines()
            line_idx = 0
            part = 0
            overlap_lines = (chunk_overlap * 4) // 80  # ~80 chars/line, ast.rs:288
            while line_idx < len(blines):
                iter_start = line_idx
                chunk_lines: list[str] = []
                chunk_len = 0
                while line_idx < len(blines) and chunk_len < char_limit:
                    chunk_len += len(blines[line_idx].encode("utf-8")) + 1
                    chunk_lines.append(blines[line_idx])
                    line_idx += 1
                # Deliberate deviation: the reference rewinds by
                # overlap_lines unconditionally (ast.rs:288-289), which
                # loops forever once the tail chunk is shorter than the
                # overlap (every split block with default params).
                # Rewind only when it still makes forward progress.
                nxt = max(line_idx - overlap_lines, 0)
                if nxt > iter_start:
                    line_idx = nxt
                if chunk_lines:
                    chunks.append(
                        {
                            "chunk_type": "ast",
                            "block_type": bk["block_type"],
                            "name": f"{bk['name']}_part{part}",
                            "language": language,
                            "start_line": bk["start_line"] + 1,
                            "end_line": bk["end_line"],
                            "part": part,
                            "text": "\n".join(chunk_lines),
                        }
                    )
                    part += 1

    # gap filling (ast.rs:317-362)
    current = 0
    for bk in blocks:
        if bk["start_line"] > current:
            gap = "\n".join(lines[current:bk["start_line"]])
            trimmed = gap.strip()
            if trimmed and len(trimmed.encode("utf-8")) > 20 and len(gap.encode("utf-8")) <= char_limit:
                chunks.append(
                    {
                        "chunk_type": "context",
                        "start_line": current + 1,
                        "end_line": bk["start_line"],
                        "text": gap,
                    }
                )
        current = bk["end_line"]

    chunks.sort(key=lambda c: c.get("start_line", 0))
    for i, c in enumerate(chunks):
        c["chunk_index"] = i
    return chunks


def smart_chunk(text: str, source: str, strategy: str = "auto",
                chunk_size: int = DEFAULT_CHUNK_SIZE,
                chunk_overlap: int = DEFAULT_OVERLAP) -> list[dict[str, Any]]:
    """SmartChunker dispatch (mod.rs:83-117): simple | ast | auto."""
    ext = source.rsplit(".", 1)[-1] if "." in source else ""
    language = EXT_TO_LANGUAGE.get(ext)
    if strategy == "simple":
        return simple_chunk(text, chunk_size, chunk_overlap)
    if strategy == "ast":
        return code_chunk(text, language, chunk_size, chunk_overlap)
    if strategy == "auto":
        if language is not None:
            return code_chunk(text, language, chunk_size, chunk_overlap)
        return simple_chunk(text, chunk_size, chunk_overlap)
    raise ValueError(f"unknown chunking strategy {strategy!r}")


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("chunk_type", T.StringType()),
        T.StructField("block_type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("start_line", T.IntegerType()),
        T.StructField("end_line", T.IntegerType()),
        T.StructField("part", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def chunk_documents(
    docs: DataFrame,
    strategy: str = "auto",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """documents → passages rows (no global ids yet; apply
    utils.ids.with_dense_index over (doc_id, chunk_index) for T4).

    Pure per-row Python with no cross-row state → mapInPandas batches,
    embarrassingly parallel, no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for c in smart_chunk(
                    r[text_col], str(r[source_col]), strategy, chunk_size, chunk_overlap
                ):
                    rows.append(
                        {
                            "doc_id": r[id_col],
                            "source": r[source_col],
                            "chunk_index": c["chunk_index"],
                            "chunk_type": c["chunk_type"],
                            "block_type": c.get("block_type"),
                            "name": c.get("name"),
                            "language": c.get("language"),
                            "start_line": c.get("start_line"),
                            "end_line": c.get("end_line"),
                            "part": c.get("part"),
                            "text": c["text"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in CHUNK_SCHEMA.fields]
            )

    cols = [id_col, text_col, source_col]
    return docs.select(*cols).mapInPandas(run, schema=CHUNK_SCHEMA)
