#!/usr/bin/env python3
"""Reproduce the SURVEY §10 10× scale validation.

Builds a 10× corpus in a scratch dir by near-duplicating the sf0.1
tables (each doc gains 9 planted near-dups via a ' v<k>' suffix — a
dup-heavy-crawl stress; events shift ids and time), then times the
operator families at 1× and 10× and prints one JSON line per run.

Usage:
    python3 tools/scale_check.py [--base /root/testdata/sf0.1]
                                 [--scratch /tmp/leann-scale10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_10x(base: str, scratch: str) -> None:
    import duckdb

    os.makedirs(scratch, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id + 5000*k.x AS doc_id,
                 CASE WHEN k.x = 0 THEN text
                      ELSE text || ' v' || k.x::varchar END AS text,
                 lang, source, n_chars
          FROM '{base}/documents.parquet', unnest(generate_series(0,9)) k(x)
        ) TO '{scratch}/documents.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id + 5000*k.x AS vec_id, embedding, label
          FROM '{base}/embeddings.parquet', unnest(generate_series(0,9)) k(x)
        ) TO '{scratch}/embeddings.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
        COPY (
          SELECT event_id + 100000*k.x AS event_id,
                 ts + (k.x * INTERVAL '7 days') AS ts,
                 user_id + 10000*k.x AS user_id, event_type, value, props
          FROM '{base}/events.parquet', unnest(generate_series(0,9)) k(x)
        ) TO '{scratch}/events.parquet' (FORMAT parquet)
    """)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scratch", default="/tmp/leann-scale10")
    args = ap.parse_args()
    build_10x(args.base, args.scratch)

    import __spark_entry__ as entry
    from leann_rs_spark.session import get_spark

    spark = get_spark(app_name="scale-check")
    qs = entry.queries()
    # operators whose scale behavior the SURVEY claims; curation and
    # semantic dedup exercise the measured plan fixes end-to-end
    names = [
        "x_dedup_exact", "x_exact_substr", "x_cluster_assign",
        "x_dedup_minhash", "x_ann_lsh_near_dups", "x_semantic_dedup",
        "x_curation_pipeline", "x_asof_join", "x_interval_join",
        "x_sessionize", "x_window_stats", "x_hopping_stats",
    ]
    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for sf_dir, label in ((args.base, "1x"), (args.scratch, "10x")):
            t0 = time.perf_counter()
            try:
                n = qs[name](spark, sf_dir).count()
            except Exception as exc:
                print(f"# {name} {label} FAILED: {exc}", file=sys.stderr)
                continue
            dt = round(time.perf_counter() - t0, 2)
            results[name][label] = dt
            results[name][f"{label}_rows"] = n
            print(f"# {label:3} {name}: {dt}s rows={n}", file=sys.stderr)
            spark.catalog.clearCache()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
