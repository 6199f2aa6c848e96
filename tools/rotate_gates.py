#!/usr/bin/env python3
"""Regenerate the queries() ordering in __spark_entry__.py.

The driver's capped correctness run covers the FIRST N entries of
queries(), so ordering is the coverage lever: gates with no driver
CORRECTNESS row ever come first, then everything else ascending by the
round of its most recent driver verification (ties keep current order).

Run AFTER a round's CORRECTNESS_r{N}.json lands:

    python3 tools/rotate_gates.py          # rewrite in place
    python3 tools/rotate_gates.py --check  # exit 1 if ordering is stale
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")


def last_seen() -> dict[str, int]:
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for k in data:
            seen[k] = max(seen.get(k, 0), rnd)
    return seen


def current_keys(src: str) -> list[str]:
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        raise SystemExit("queries() return dict not found")
    return re.findall(r'"([A-Za-z0-9_]+)":\s*\1,', m.group(1))


def rotated(keys: list[str], seen: dict[str, int]) -> list[str]:
    idx = {k: i for i, k in enumerate(keys)}
    return sorted(keys, key=lambda k: (seen.get(k, 0), idx[k]))


def main() -> int:
    src = open(ENTRY).read()
    keys = current_keys(src)
    want = rotated(keys, last_seen())
    if keys == want:
        print(f"ordering up to date ({len(keys)} gates)")
        return 0
    if "--check" in sys.argv:
        print("STALE: queries() ordering does not match driver artifacts")
        for i, (a, b) in enumerate(zip(keys, want)):
            if a != b:
                print(f"  first divergence at position {i}: have {a}, want {b}")
                break
        return 1
    body = "\n".join(f'        "{k}": {k},' for k in want)
    m = re.search(r"(    return \{\n)(.*?)(\n    \})", src[src.index("def queries()"):], re.S)
    start = src.index("def queries()")
    a = start + m.start(2)
    b = start + m.end(2)
    open(ENTRY, "w").write(src[:a] + body + src[b:])
    print(f"rewrote queries() ordering ({len(want)} gates)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
