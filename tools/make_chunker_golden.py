#!/usr/bin/env python3
"""Generate the committed golden chunker tables that oracle-gate
t1_chunk_passages / t2_code_chunks.

The chunk-boundary loops (reference src/chunker/simple.rs:24-118,
src/chunker/ast.rs:365-407) resist SQL, so the oracle for these two
queries is a committed parquet produced by the LOCAL PYTHON PARITY PORT
(leann_rs_spark/operators/chunker.py's simple_chunk / smart_chunk) —
the same kernels tests/test_chunker.py pins against the reference's own
unit vectors — run driver-side over the sf0.01 tables with the dense-id
rank computed by plain sorting. Any regression in the Spark-side
plumbing (mapInPandas batching, dense-id assignment, partitioning, row
loss) breaks the exact-match gate; kernel semantics stay pinned by the
reference vectors.

Usage: python3 tools/make_chunker_golden.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 → <repo>/fixtures/
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from leann_rs_spark.operators.chunker import simple_chunk, smart_chunk  # noqa: E402


def synth_code_text(doc_id, text: str) -> str:
    """Mirror of t2_code_chunks' Spark concat/substring expression
    (__spark_entry__.py) — substring is character-based in both."""
    return (
        f"def handler_{doc_id}(x):\n"
        f'    return process(\n        "{text[:400]}"\n    )\n\n'
        f"# link section\n\nclass Worker_{doc_id}:\n"
        f'    def run(self):\n        data = "{text[:2000]}"\n        return data\n'
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).df()

    # --- t1: simple chunker, chunk_size=16, chunk_overlap=4 ---
    rows = []
    for r in docs.itertuples(index=False):
        for c in simple_chunk(r.text, chunk_size=16, chunk_overlap=4):
            rows.append((int(r.doc_id), int(c["chunk_index"]), c["text"]))
    rows.sort(key=lambda t: (t[0], t[1]))
    t1 = pd.DataFrame(rows, columns=["doc_id", "chunk_index", "text"])
    t1.insert(0, "idx", pd.array(range(len(t1)), dtype="int64"))
    t1["chunk_index"] = t1["chunk_index"].astype("int32")
    t1_path = os.path.join(out_dir, f"chunker_golden_t1_{sf_tag}.parquet")
    t1.to_parquet(t1_path, index=False)
    print(f"{t1_path}: {len(t1)} rows")

    # --- t2: auto strategy on synthesized .py sources, 64/16 ---
    rows2 = []
    for r in docs.itertuples(index=False):
        code = synth_code_text(r.doc_id, r.text)
        for c in smart_chunk(
            code, f"doc_{r.doc_id}.py", "auto", chunk_size=64, chunk_overlap=16
        ):
            rows2.append(
                (
                    int(r.doc_id),
                    int(c["chunk_index"]),
                    c["chunk_type"],
                    c.get("block_type"),
                    c.get("name"),
                    c.get("language"),
                    c.get("start_line"),
                    c.get("end_line"),
                    c["text"],
                )
            )
    rows2.sort(key=lambda t: (t[0], t[1]))
    t2 = pd.DataFrame(
        rows2,
        columns=[
            "doc_id", "chunk_index", "chunk_type", "block_type",
            "name", "language", "start_line", "end_line", "text",
        ],
    )
    t2.insert(0, "idx", pd.array(range(len(t2)), dtype="int64"))
    t2["chunk_index"] = t2["chunk_index"].astype("int32")
    t2["start_line"] = t2["start_line"].astype("Int32")
    t2["end_line"] = t2["end_line"].astype("Int32")
    t2_path = os.path.join(out_dir, f"chunker_golden_t2_{sf_tag}.parquet")
    t2.to_parquet(t2_path, index=False)
    print(f"{t2_path}: {len(t2)} rows")


if __name__ == "__main__":
    main()
