#!/usr/bin/env python3
"""Regenerate the queries() ordering in __spark_entry__.py.

The driver's capped correctness run covers the FIRST N entries of
queries(), so ordering is the coverage lever. Priority (front to
back):

  1. gates with no driver CORRECTNESS row ever;
  2. CODE-STALE gates — the gate's implementation (its entry-file
     function closure + every leann_rs_spark module it transitively
     touches + its _ORACLES registration) changed since the commit
     that landed its most recent driver row, so that row no longer
     vouches for the current code;
  3. everything else ascending by the round of its most recent driver
     verification. Ties keep current order.

Run AFTER a round's CORRECTNESS_r{N}.json lands AND after any round
of code changes (a module edit re-flags its gates as stale):

    python3 tools/rotate_gates.py          # rewrite in place
    python3 tools/rotate_gates.py --check  # exit 1 if ordering is stale
"""
from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import re
import subprocess
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


# ---------------------------------------------------------------------------
# Code-staleness: does the gate's current implementation still match
# what its latest driver row verified?
# ---------------------------------------------------------------------------


def _entry_units(src: str) -> tuple[dict[str, str], dict[str, str], dict[str, str]]:
    """Parse the entry file into (top-level function name → source,
    imported name → leann_rs_spark module dotted path, gate key →
    source of its _ORACLES dict-literal value). Registration functions
    (`_ORACLES["g"] = …` inside a function) are folded in by
    gate_closure via a text scan of function sources."""
    tree = ast.parse(src)
    funcs: dict[str, str] = {}
    imports: dict[str, str] = {}
    oracle_literals: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs[node.name] = ast.get_source_segment(src, node) or ""
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.split(".")[0] == "leann_rs_spark":
                for a in node.names:
                    imports[a.asname or a.name] = (
                        node.module
                        if a.name == "*"
                        else f"{node.module}.{a.name}"
                    )
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets
                if isinstance(node, ast.Assign)
                else [node.target]
            )
            names = [
                t.id for t in targets if isinstance(t, ast.Name)
            ]
            if "_ORACLES" in names and isinstance(node.value, ast.Dict):
                for k, v in zip(node.value.keys, node.value.values):
                    if isinstance(k, ast.Constant) and isinstance(k.value, str):
                        oracle_literals[k.value] = (
                            ast.get_source_segment(src, v) or ""
                        )
    return funcs, imports, oracle_literals


def _module_relpath(dotted: str, read) -> str | None:
    """Resolve a dotted leann_rs_spark path (possibly module.symbol) to
    the module file that defines it, via the `read(relpath)` content
    callback (None if unreadable)."""
    parts = dotted.split(".")
    # longest prefix that is a real module file wins (the tail is the
    # imported symbol)
    for cut in range(len(parts), 0, -1):
        rel = "/".join(parts[:cut]) + ".py"
        if read(rel) is not None:
            return rel
        rel = "/".join(parts[:cut]) + "/__init__.py"
        if read(rel) is not None:
            return rel
    return None


def _module_deps(rel: str, read, cache: dict) -> set[str]:
    """Transitive leann_rs_spark module files imported by `rel`."""
    if rel in cache:
        return cache[rel]
    cache[rel] = set()  # cycle guard
    out = {rel}
    src = read(rel)
    if src is None:
        cache[rel] = out
        return out
    try:
        tree = ast.parse(src)
    except SyntaxError:
        cache[rel] = out
        return out
    for node in ast.walk(tree):
        mods: list[str] = []
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.module.split(".")[0] == "leann_rs_spark":
                mods = [f"{node.module}.{a.name}" for a in node.names]
        elif isinstance(node, ast.Import):
            mods = [
                a.name
                for a in node.names
                if a.name.split(".")[0] == "leann_rs_spark"
            ]
        for dotted in mods:
            dep = _module_relpath(dotted, read)
            if dep and dep not in out:
                out |= _module_deps(dep, read, cache)
    cache[rel] = out
    return out


def _local_imports(fsrc: str) -> dict[str, str]:
    """leann_rs_spark imports INSIDE a function body (gates import
    their operators locally) — name → dotted path."""
    out: dict[str, str] = {}
    try:
        t = ast.parse(fsrc)
    except SyntaxError:
        return out
    for node in ast.walk(t):
        if isinstance(node, ast.ImportFrom) and node.module:
            if node.module.split(".")[0] == "leann_rs_spark":
                for a in node.names:
                    out[a.asname or a.name] = (
                        node.module
                        if a.name == "*"
                        else f"{node.module}.{a.name}"
                    )
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.split(".")[0] == "leann_rs_spark":
                    out[a.asname or a.name.split(".")[0]] = a.name
    return out


# Registry/dispatch functions are NOT gate implementation: their
# bodies name every gate (queries() returns the full dict), so letting
# reachability walk into them fuses all closures into one — any gate
# edit or a rotation rewrite would re-flag every gate that merely uses
# a local variable shadowing one of these names (e.g. `queries = ...`
# in the batch-topk gates, the r10 finding).
_REGISTRY_FUNCS = frozenset({"entry", "queries", "oracle_sql"})


def gate_closure(src: str) -> dict[str, tuple[str, set[str]]]:
    """For every gate key in queries(): (sha of the gate's entry-file
    code — its function, every reachable helper function, and its
    oracle registration source — , set of dotted leann_rs_spark
    imports it references, top-level AND function-local)."""
    funcs, imports, oracle_literals = _entry_units(src)
    # which functions register which gates' oracles
    registrars: dict[str, list[str]] = {}
    for fname, fsrc in funcs.items():
        for g in re.findall(r'_ORACLES\[\s*"([A-Za-z0-9_]+)"\s*\]', fsrc):
            registrars.setdefault(g, []).append(fname)
    names_in: dict[str, set[str]] = {}
    local_imp: dict[str, dict[str, str]] = {}
    for fname, fsrc in funcs.items():
        try:
            t = ast.parse(fsrc)
        except SyntaxError:
            names_in[fname] = set()
            local_imp[fname] = {}
            continue
        names_in[fname] = {
            n.id for n in ast.walk(t) if isinstance(n, ast.Name)
        }
        local_imp[fname] = _local_imports(fsrc)
    out: dict[str, tuple[str, set[str]]] = {}
    for g in current_keys(src):
        roots = [g] + registrars.get(g, [])
        seen_f: set[str] = set()
        mods: set[str] = set()
        stack = [r for r in roots if r in funcs]
        while stack:
            f = stack.pop()
            if f in seen_f:
                continue
            seen_f.add(f)
            mine = local_imp.get(f, {})
            for name in names_in.get(f, ()):
                if name in mine:
                    mods.add(mine[name])
                elif (
                    name in funcs
                    and name not in seen_f
                    and name not in _REGISTRY_FUNCS
                ):
                    stack.append(name)
                elif name in imports:
                    mods.add(imports[name])
        code = "\n".join(
            [funcs[f] for f in sorted(seen_f)]
            + [oracle_literals.get(g, "")]
        )
        out[g] = (hashlib.sha256(code.encode()).hexdigest(), mods)
    return out


def _read_worktree(rel: str) -> str | None:
    p = os.path.join(REPO, rel)
    try:
        return open(p).read()
    except OSError:
        return None


def _read_at(rev: str):
    cache: dict[str, str | None] = {}

    def read(rel: str) -> str | None:
        if rel not in cache:
            r = subprocess.run(
                ["git", "-C", REPO, "show", f"{rev}:{rel}"],
                capture_output=True,
                text=True,
            )
            cache[rel] = r.stdout if r.returncode == 0 else None
        return cache[rel]

    return read


def _artifact_rev(rnd: int) -> str | None:
    for name in (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"):
        if os.path.exists(os.path.join(REPO, name)):
            r = subprocess.run(
                ["git", "-C", REPO, "log", "-n1", "--format=%H", "--", name],
                capture_output=True,
                text=True,
            )
            sha = r.stdout.strip()
            if r.returncode == 0 and sha:
                return sha
    return None


def _module_index(rel: str, read, cache: dict):
    """Parse a module file into (defs: top-level def/class name →
    source WITH decorators, imports: name → dotted leann_rs_spark path
    collected module-wide, consts: top-level simple-Name assignment →
    its source, rest: source of every OTHER top-level statement —
    module-level code, tuple unpacks, try-blocks — , ok). ok=False
    (parse/read failure) tells the caller to fall back to whole-file
    hashing.

    Constants are keyed by NAME so a gate's fingerprint covers only
    the module state its closure actually references — an unrelated
    constant edit must not re-flag every gate importing the module
    (the r7 blast-radius finding: 19 of 90 stale flags were
    preamble-only churn). Top-level import statements are excluded
    entirely: a referenced import's EFFECT is hashed through the
    resolved target module's content, and an unreferenced one cannot
    affect the closure."""
    if rel in cache:
        return cache[rel]
    src = read(rel)
    if src is None:
        cache[rel] = ({}, {}, {}, "", False)
        return cache[rel]
    try:
        tree = ast.parse(src)
    except SyntaxError:
        cache[rel] = ({}, {}, {}, "", False)
        return cache[rel]
    defs: dict[str, str] = {}
    consts: dict[str, str] = {}
    rest: list[str] = []
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            deco = "\n".join(
                ast.get_source_segment(src, d) or ""
                for d in node.decorator_list
            )
            defs[node.name] = deco + "\n" + (
                ast.get_source_segment(src, node) or ""
            )
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        else:
            targets = []
            if isinstance(node, ast.Assign):
                targets = node.targets
            elif isinstance(node, ast.AnnAssign):
                targets = [node.target]
            names = [t.id for t in targets if isinstance(t, ast.Name)]
            if targets and len(names) == len(targets):
                seg = ast.get_source_segment(src, node) or ""
                for nm in names:
                    consts[nm] = seg
            else:
                rest.append(ast.get_source_segment(src, node) or "")
    cache[rel] = (defs, _local_imports(src), consts, "\n".join(rest), True)
    return cache[rel]


def _closure_items(
    mods: set[str], read, midx_cache: dict, dep_cache: dict
) -> list[tuple[str, str]]:
    """Resolve a gate's dotted imports to the hashable content items
    its fingerprint covers — SYMBOL-level closures, so editing one
    operator function re-flags only the gates that reach it, not every
    gate importing the module (VERDICT r6 task 5).

    Per referenced symbol: its def/class source (decorators included)
    plus, transitively, every same-module def OR top-level constant it
    names and every import it follows into other leann_rs_spark
    modules. Every touched module also contributes its residual
    top-level code (non-assignment statements) — but NOT unreferenced
    constants (the r7 blast-radius tightening: constant edits re-flag
    only closures that read them). Anything unresolvable — a
    module-object import, `import *`, a symbol not defined at top
    level, a parse failure — falls back to hashing that module's
    whole file plus its transitive module deps (the old behavior):
    under-flagging is the failure mode that silently starves driver
    re-verification, so every ambiguity widens."""
    items: dict[str, str] = {}
    whole: set[str] = set()
    seen_sym: set[tuple[str, str]] = set()
    work: list[tuple[str, str]] = []

    def add_whole(rel: str) -> None:
        whole.update(_module_deps(rel, read, dep_cache))

    def resolve(dotted: str) -> None:
        rel = _module_relpath(dotted, read)
        if rel is None:
            return
        consumed = rel[: -len(".py")].replace("/", ".")
        if consumed.endswith(".__init__"):
            consumed = consumed[: -len(".__init__")]
        remainder = dotted[len(consumed):].lstrip(".")
        if not remainder or remainder == "*":
            add_whole(rel)  # module-object import / star import
            return
        work.append((rel, remainder.split(".")[0]))

    def chase(rel, source, defs, imports, consts) -> bool:
        """Follow every name a source fragment references; False on a
        parse failure (caller widens to whole-file)."""
        try:
            t = ast.parse(source)
        except SyntaxError:
            return False
        local = _local_imports(source)
        for n in ast.walk(t):
            if not isinstance(n, ast.Name):
                continue
            name = n.id
            if name in local:
                resolve(local[name])
            elif name in defs or name in consts:
                work.append((rel, name))
            elif name in imports:
                resolve(imports[name])
        return True

    for dotted in sorted(mods):
        resolve(dotted)
    while work:
        rel, sym = work.pop()
        if (rel, sym) in seen_sym:
            continue
        seen_sym.add((rel, sym))
        defs, imports, consts, rest, ok = _module_index(
            rel, read, midx_cache
        )
        if not ok:
            add_whole(rel)
            continue
        items[f"{rel}:__prerest__"] = rest
        if sym in defs:
            items[f"{rel}:{sym}"] = defs[sym]
            if not chase(rel, defs[sym], defs, imports, consts):
                add_whole(rel)
        elif sym in consts:
            items[f"{rel}:__const__:{sym}"] = consts[sym]
            if not chase(rel, consts[sym], defs, imports, consts):
                add_whole(rel)
        elif sym in imports:
            resolve(imports[sym])  # re-export
        else:
            add_whole(rel)  # defined dynamically / not top-level
    for rel in sorted(whole):
        items[f"{rel}:__file__"] = read(rel) or ""
        # whole-file supersedes any symbol items for the same module
        for k in [k for k in items if k.startswith(f"{rel}:") and not k.endswith(":__file__")]:
            del items[k]
    return sorted(items.items())


def _fingerprint(g: str, closure, read, dep_cache, midx_cache) -> str | None:
    if g not in closure:
        return None
    code_sha, mods = closure[g]
    h = hashlib.sha256(code_sha.encode())
    for label, content in _closure_items(mods, read, midx_cache, dep_cache):
        h.update(label.encode())
        h.update(content.encode())
    return h.hexdigest()


def code_stale(keys: list[str], seen: dict[str, int]) -> set[str]:
    """Gates whose implementation fingerprint at HEAD/worktree differs
    from the fingerprint at the commit that landed their most recent
    driver CORRECTNESS row. Gates never driver-checked are excluded
    (they already lead). Returns empty on any git unavailability —
    the rotation then degrades to the artifact-age-only rule."""
    src_now = _read_worktree("__spark_entry__.py")
    if src_now is None:
        return set()
    try:
        closure_now = gate_closure(src_now)
    except SyntaxError:
        return set()
    dep_now: dict = {}
    midx_now: dict = {}
    rev_cache: dict[int, str | None] = {}
    per_rev: dict[str, tuple] = {}
    stale: set[str] = set()
    for g in keys:
        if g not in seen:
            continue
        rnd = seen[g]
        if rnd not in rev_cache:
            rev_cache[rnd] = _artifact_rev(rnd)
        rev = rev_cache[rnd]
        if rev is None:
            continue
        if rev not in per_rev:
            read_old = _read_at(rev)
            src_old = read_old("__spark_entry__.py")
            try:
                closure_old = (
                    gate_closure(src_old) if src_old is not None else {}
                )
            except SyntaxError:
                closure_old = {}
            per_rev[rev] = (read_old, closure_old, {}, {})
        read_old, closure_old, dep_old, midx_old = per_rev[rev]
        fp_now = _fingerprint(g, closure_now, _read_worktree, dep_now, midx_now)
        fp_old = _fingerprint(g, closure_old, read_old, dep_old, midx_old)
        if fp_now is None or fp_old is None or fp_now != fp_old:
            stale.add(g)
    return stale


def rotated(
    keys: list[str], seen: dict[str, int], stale: set[str] = frozenset()
) -> list[str]:
    idx = {k: i for i, k in enumerate(keys)}
    return sorted(
        keys,
        key=lambda k: (
            0 if k not in seen else (1 if k in stale else 1 + seen[k]),
            idx[k],
        ),
    )


def main() -> int:
    src = open(ENTRY).read()
    keys = current_keys(src)
    seen = last_seen()
    stale = code_stale(keys, seen)
    want = rotated(keys, seen, stale)
    never = [k for k in keys if k not in seen]
    if stale or never:
        print(
            f"priority gates: {len(never)} never-checked, "
            f"{len(stale)} code-stale "
            f"({', '.join(sorted(stale)[:8])}{'…' if len(stale) > 8 else ''})"
        )
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
