"""Metadata filter mini-language: parser + AST + compilers.

The reference's only expression IR (/root/reference/src/index/filter.rs):
a tiny filter language (`source:*.rs`, `type=code,lines>50`,
`type in [code,text]`, `field?`, AND/OR) evaluated row-at-a-time over
schemaless JSON metadata. Here the same AST compiles three ways:

1. `compile_spark` → a `pyspark.sql.Column` boolean, so Catalyst can push
   the predicate into the Parquet scan *below* any scoring/embedding
   stage (the reference applies it manually before re-embedding,
   src/index/recompute.rs:66-79 — Catalyst does this reordering for us).
2. `compile_duckdb` → ANSI SQL for the correctness oracle.
3. `matches` → pure-Python evaluator mirroring the reference's
   `MetadataFilter::matches` (src/index/filter.rs:319-373) for
   unit-testing the ported test vectors.

Semantics preserved from the reference (src/index/filter.rs:328-373):
- `Ne` and `NotIn` are TRUE when the field is missing (:335,:349).
- Ordered comparisons on mixed/uncomparable types collapse to "equal"
  (compare_values → 0, :402-418), so `Gte`/`Lte` are true and
  `Gt`/`Lt` false.
- String ops (contains/startswith/endswith) are false for non-strings.

Documented deviation: over a JSON-string column, Spark's
`get_json_object` cannot distinguish a present-but-null field from a
missing one, nor `"100"` from `100`; both compilers treat JSON null as
missing and compare numerically whenever the *filter* value is numeric.
The reference's behavior differs only on degenerate inputs (filtering a
string field with a number, or exists() on an explicit null).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Union

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

OPS = {
    "eq", "ne", "gt", "gte", "lt", "lte",
    "in", "not_in", "contains", "starts_with", "ends_with", "exists",
}


@dataclass(frozen=True)
class Condition:
    field: str
    op: str
    value: Any = None

    def __post_init__(self):
        if self.op not in OPS:
            raise ValueError(f"unknown filter op {self.op!r}")


@dataclass(frozen=True)
class And:
    children: tuple

@dataclass(frozen=True)
class Or:
    children: tuple


Filter = Union[Condition, And, Or]


# ---------------------------------------------------------------------------
# Parser — same grammar and precedence as MetadataFilter::parse
# (src/index/filter.rs:52-316): OR splits first (not bracket-aware, as in
# the reference), then AND / top-level commas (bracket-aware), then single
# conditions in a fixed probe order.
# ---------------------------------------------------------------------------

def parse(filter_str: str) -> Filter | None:
    s = filter_str.strip()
    if not s:
        return None

    if " OR " in s:
        parts = [parse_single_or_group(p) for p in s.split(" OR ")]
        parts = [p for p in parts if p is not None]
        if len(parts) > 1:
            return Or(tuple(parts))
        return parts[0] if parts else None

    return parse_single_or_group(s)


def parse_single_or_group(s: str) -> Filter | None:
    s = s.strip()
    has_and = " AND " in s
    if has_and:
        pieces = s.split(" AND ")
    else:
        pieces = _split_commas_outside_brackets(s)
    if len(pieces) > 1:
        parts = [_parse_single(p.strip()) for p in pieces]
        parts = [p for p in parts if p is not None]
        if len(parts) > 1:
            return And(tuple(parts))
        return parts[0] if parts else None
    return _parse_single(s)


def _split_commas_outside_brackets(s: str) -> list[str]:
    parts, cur, depth = [], [], 0
    for c in s:
        if c == "[":
            depth += 1
            cur.append(c)
        elif c == "]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur))
    return parts


def _parse_value(s: str) -> Any:
    # i64 → f64 → bool → string, like parse_value (src/index/filter.rs:420-439)
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s == "true":
        return True
    if s == "false":
        return False
    return s


def _parse_single(s: str) -> Filter | None:
    s = s.strip()
    if not s:
        return None

    if s.endswith("?"):
        return Condition(s[:-1], "exists")

    for kw, op in ((" in [", "in"), (" not_in [", "not_in")):
        idx = s.find(kw)
        if idx != -1:
            rest = s[idx + len(kw):]
            end = rest.find("]")
            if end != -1:
                vals = tuple(_parse_value(v.strip()) for v in rest[:end].split(","))
                return Condition(s[:idx].strip(), op, vals)

    if "~" in s:
        field, _, val = s.partition("~")
        return Condition(field, "contains", val)
    if "^" in s and ">=" not in s:
        field, _, val = s.partition("^")
        return Condition(field, "starts_with", val)
    if "$" in s:
        field, _, val = s.partition("$")
        return Condition(field, "ends_with", val)

    for tok, op in (("!=", "ne"), (">=", "gte"), ("<=", "lte"), (">", "gt"), ("<", "lt")):
        if tok in s:
            field, _, val = s.partition(tok)
            return Condition(field, op, _parse_value(val))

    sep = "=" if "=" in s else (":" if ":" in s else None)
    if sep is None:
        return None
    field, _, value = s.partition(sep)

    # glob sugar (src/index/filter.rs:289-309)
    if "*" in value:
        if value.startswith("*") and value.endswith("*") and len(value) > 2:
            return Condition(field, "contains", value[1:-1])
        if value.startswith("*"):
            return Condition(field, "ends_with", value[1:])
        if value.endswith("*"):
            return Condition(field, "starts_with", value[:-1])
    return Condition(field, "eq", _parse_value(value))


# ---------------------------------------------------------------------------
# Spark compiler
# ---------------------------------------------------------------------------

def json_field_resolver(json_col: str | Column) -> Callable[[str], Column]:
    """Resolve dotted field paths inside a JSON-string column (the
    schemaless-metadata case, src/index/passages.rs:15-16)."""
    col = F.col(json_col) if isinstance(json_col, str) else json_col

    def resolve(field: str) -> Column:
        return F.get_json_object(col, "$." + field)

    return resolve


def column_resolver(field: str) -> Column:
    """Resolve fields as real (possibly nested-struct) columns."""
    return F.col(field)


def _num(c: Column) -> Column:
    # try_cast, not cast: ANSI mode (Spark 4 default) makes cast THROW
    # on non-numeric strings; the reference treats unparseable values as
    # non-numeric and falls through (filter.rs:402-418), never errors
    return c.try_cast("double")


def _eq_cond(v: Column, x: Any) -> Column:
    if isinstance(x, bool):
        b = F.when(F.lower(v.cast("string")).isin("true", "false"),
                   F.lower(v.cast("string")) == str(x).lower())
        return F.coalesce(b, F.lit(False))
    if isinstance(x, (int, float)):
        return F.coalesce(_num(v) == F.lit(float(x)), F.lit(False))
    return F.coalesce(v.cast("string") == F.lit(x), F.lit(False))


def compile_spark(
    node: Filter,
    resolve: Callable[[str], Column] = column_resolver,
    typed: bool | None = None,
) -> Column:
    """Compile the AST to a boolean Column.

    ``typed=True`` (default for the plain column resolver) emits raw
    three-valued predicates — `v == lit`, `v.isin(...)`, `v > lit` —
    which Catalyst can push into the Parquet scan (`PushedFilters`).
    This is sound because the DSL grammar has no NOT above leaves, so a
    NULL result only ever collapses to "row dropped" at the filter, the
    same as the reference's missing→false semantics; the two
    missing→TRUE ops (`ne`, `not_in`, src/index/filter.rs:335,349) emit
    an explicit `isNull() | ...` which still pushes down.

    ``typed=False`` (default for JSON resolvers, where every extract is
    a nullable string and pushdown is impossible anyway) adds the
    coalesce/when scaffolding that exactly replicates the reference's
    mixed-type edge cases.
    """
    if typed is None:
        typed = resolve is column_resolver
    if isinstance(node, And):
        out = compile_spark(node.children[0], resolve, typed)
        for ch in node.children[1:]:
            out = out & compile_spark(ch, resolve, typed)
        return out
    if isinstance(node, Or):
        out = compile_spark(node.children[0], resolve, typed)
        for ch in node.children[1:]:
            out = out | compile_spark(ch, resolve, typed)
        return out

    v = resolve(node.field)
    op, x = node.op, node.value

    if op == "exists":
        return v.isNotNull()

    if typed:
        if op == "eq":
            return v == F.lit(x)
        if op == "ne":
            return v.isNull() | (v != F.lit(x))
        if op in ("gt", "gte", "lt", "lte"):
            return {"gt": v > F.lit(x), "gte": v >= F.lit(x),
                    "lt": v < F.lit(x), "lte": v <= F.lit(x)}[op]
        if op == "in":
            return v.isin(*x)
        if op == "not_in":
            return v.isNull() | ~v.isin(*x)
        if op == "contains":
            return v.contains(F.lit(x))
        if op == "starts_with":
            return v.startswith(F.lit(x))
        if op == "ends_with":
            return v.endswith(F.lit(x))
        raise ValueError(f"unknown op {op!r}")

    if op == "eq":
        return _eq_cond(v, x)
    if op == "ne":
        return ~_eq_cond(v, x)
    if op in ("gt", "gte", "lt", "lte"):
        if isinstance(x, (int, float)) and not isinstance(x, bool):
            n = _num(v)
            cmp = {"gt": n > float(x), "gte": n >= float(x),
                   "lt": n < float(x), "lte": n <= float(x)}[op]
            # present-but-non-numeric → compare_values()==0
            # (src/index/filter.rs:402-418): gte/lte true, gt/lt false
            mixed = F.lit(op in ("gte", "lte"))
            return F.when(v.isNull(), F.lit(False)).otherwise(
                F.when(n.isNotNull(), cmp).otherwise(mixed)
            )
        # string filter value: a NUMERIC metadata value vs a string is
        # the reference's mixed-type compare → Ordering::Equal
        # (filter.rs:402-418): gte/lte true, gt/lt false. Only
        # string-vs-string compares lexically. (Through a JSON-string
        # resolver a quoted numeric like "0" is indistinguishable from
        # the number 0 — documented ambiguity; typed columns are exact.)
        s = v.cast("string")
        cmp = {"gt": s > F.lit(x), "gte": s >= F.lit(x),
               "lt": s < F.lit(x), "lte": s <= F.lit(x)}[op]
        mixed = F.lit(op in ("gte", "lte"))
        return F.when(v.isNull(), F.lit(False)).otherwise(
            F.when(_num(v).isNotNull(), mixed).otherwise(cmp)
        )
    if op == "in":
        any_eq = _eq_cond(v, x[0])
        for item in x[1:]:
            any_eq = any_eq | _eq_cond(v, item)
        return any_eq
    if op == "not_in":
        any_eq = _eq_cond(v, x[0])
        for item in x[1:]:
            any_eq = any_eq | _eq_cond(v, item)
        return ~any_eq
    s = v.cast("string")
    if op == "contains":
        return F.coalesce(s.contains(F.lit(x)), F.lit(False))
    if op == "starts_with":
        return F.coalesce(s.startswith(F.lit(x)), F.lit(False))
    if op == "ends_with":
        return F.coalesce(s.endswith(F.lit(x)), F.lit(False))
    raise ValueError(f"unknown op {op!r}")


# ---------------------------------------------------------------------------
# DuckDB compiler (oracle twin of compile_spark)
# ---------------------------------------------------------------------------

def duckdb_json_resolver(json_col: str) -> Callable[[str], str]:
    def resolve(field: str) -> str:
        return f"json_extract_string({json_col}, '$.{field}')"
    return resolve


def duckdb_column_resolver(field: str) -> str:
    return field


def _sql_quote(x: str) -> str:
    return "'" + str(x).replace("'", "''") + "'"


def _duck_eq(v: str, x: Any) -> str:
    if isinstance(x, bool):
        return (f"coalesce(case when lower({v}::varchar) in ('true','false') "
                f"then lower({v}::varchar) = '{str(x).lower()}' end, false)")
    if isinstance(x, (int, float)):
        return f"coalesce(try_cast({v} as double) = {float(x)!r}, false)"
    return f"coalesce({v}::varchar = {_sql_quote(x)}, false)"


def compile_duckdb(node: Filter, resolve: Callable[[str], str] = duckdb_column_resolver) -> str:
    if isinstance(node, And):
        return "(" + " AND ".join(compile_duckdb(c, resolve) for c in node.children) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(compile_duckdb(c, resolve) for c in node.children) + ")"

    v = resolve(node.field)
    op, x = node.op, node.value

    if op == "exists":
        return f"({v} IS NOT NULL)"
    if op == "eq":
        return _duck_eq(v, x)
    if op == "ne":
        return f"(NOT {_duck_eq(v, x)})"
    if op in ("gt", "gte", "lt", "lte"):
        sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}[op]
        if isinstance(x, (int, float)) and not isinstance(x, bool):
            mixed = "true" if op in ("gte", "lte") else "false"
            return (f"(case when {v} IS NULL then false "
                    f"when try_cast({v} as double) IS NOT NULL "
                    f"then try_cast({v} as double) {sym} {float(x)!r} "
                    f"else {mixed} end)")
        # mixed-type (numeric v vs string x) → Equal, filter.rs:402-418
        mixed = "true" if op in ("gte", "lte") else "false"
        return (f"(case when {v} IS NULL then false "
                f"when try_cast({v} as double) IS NOT NULL then {mixed} "
                f"else {v}::varchar {sym} {_sql_quote(x)} end)")
    if op == "in":
        return "(" + " OR ".join(_duck_eq(v, item) for item in x) + ")"
    if op == "not_in":
        return "(NOT (" + " OR ".join(_duck_eq(v, item) for item in x) + "))"
    if op == "contains":
        return f"coalesce(contains({v}::varchar, {_sql_quote(x)}), false)"
    if op == "starts_with":
        return f"coalesce(starts_with({v}::varchar, {_sql_quote(x)}), false)"
    if op == "ends_with":
        return f"coalesce(ends_with({v}::varchar, {_sql_quote(x)}), false)"
    raise ValueError(f"unknown op {op!r}")


# ---------------------------------------------------------------------------
# Pure-Python evaluator — faithful port of matches (src/index/filter.rs:319-373)
# for unit-test parity with the reference's own vectors.
# ---------------------------------------------------------------------------

def _get_nested(metadata: Any, path: str):
    cur = metadata
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None, False
        cur = cur[part]
    return cur, True


def _values_equal(a: Any, b: Any) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(float(a) - float(b)) < 2.220446049250313e-16
    if a is None and b is None:
        return True
    return False


def _compare(a: Any, b: Any) -> int:
    a_num = float(a) if isinstance(a, (int, float)) and not isinstance(a, bool) else None
    b_num = float(b) if isinstance(b, (int, float)) and not isinstance(b, bool) else None
    if a_num is not None and b_num is not None:
        return -1 if a_num < b_num else (1 if a_num > b_num else 0)
    if isinstance(a, str) and isinstance(b, str):
        return -1 if a < b else (1 if a > b else 0)
    return 0


def matches(node: Filter, metadata: dict) -> bool:
    if isinstance(node, And):
        return all(matches(c, metadata) for c in node.children)
    if isinstance(node, Or):
        return any(matches(c, metadata) for c in node.children)

    v, present = _get_nested(metadata, node.field)
    op, x = node.op, node.value
    if op == "exists":
        return present
    if op == "eq":
        return present and _values_equal(v, x)
    if op == "ne":
        return (not present) or (not _values_equal(v, x))
    if op == "gt":
        return present and _compare(v, x) > 0
    if op == "gte":
        return present and _compare(v, x) >= 0
    if op == "lt":
        return present and _compare(v, x) < 0
    if op == "lte":
        return present and _compare(v, x) <= 0
    if op == "in":
        return present and any(_values_equal(v, item) for item in x)
    if op == "not_in":
        return (not present) or not any(_values_equal(v, item) for item in x)
    if op == "contains":
        return present and isinstance(v, str) and (x or "") in v
    if op == "starts_with":
        return present and isinstance(v, str) and v.startswith(x or "")
    if op == "ends_with":
        return present and isinstance(v, str) and v.endswith(x or "")
    raise ValueError(f"unknown op {op!r}")
