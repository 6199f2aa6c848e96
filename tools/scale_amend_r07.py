"""One-shot amendment for SCALE_r07.json: the main scale_check run was
launched before x_token_index_compact / x_table_stats / x_salted_join
landed, so time just those three families at 1x/10x (same warmup +
artifact-gate first-call convention as tools/scale_check.py) and merge
the rows into the existing artifact. Delete after round 7."""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (__spark_entry__)
sys.path.insert(0, _HERE)  # tools (scale_check)

from scale_check import build_10x  # noqa: E402


def main() -> None:
    base = "/root/testdata/sf0.1"
    scratch = "/tmp/leann-scale10"
    build_10x(base, scratch)

    import __spark_entry__ as entry
    from leann_rs_spark.session import get_spark

    spark = get_spark(app_name="scale-amend")
    qs = entry.queries()
    names = [
        "x_token_index_compact", "x_table_stats", "x_salted_join",
        "x_table_diff", "x_li_bm25_hybrid", "x_token_cid_balance",
    ]
    artifact_gates = {
        "x_token_index_compact", "x_li_bm25_hybrid", "x_token_cid_balance",
    }

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
            spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for name in names:
        results[name] = {}
        for sf_dir, label in ((base, "1x"), (scratch, "10x")):
            if name in artifact_gates:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                results[name][f"{label}_first_call"] = round(
                    time.perf_counter() - t0, 2
                )
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 2)
            results[name][label] = dt
            results[name][f"{label}_rows"] = n
            print(f"# {label:3} {name}: {dt}s rows={n}", file=sys.stderr)
            spark.catalog.clearCache()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_r07.json",
    )
    with open(path) as f:
        doc = json.load(f)
    doc.update(results)
    doc["amended_families"] = names
    with open(path, "w") as f:
        json.dump(doc, f)
    print(f"amended {path} with {names}")
    spark.stop()


if __name__ == "__main__":
    main()
