"""Property-based 3-way differential test for the filter DSL.

Random ASTs × random JSON metadata rows, evaluated three ways:
  1. the pure-Python `matches` port (the executable spec of
     /root/reference/src/index/filter.rs:319-439),
  2. `compile_spark` over a JSON props column,
  3. `compile_duckdb` over the same JSON strings.
All three must agree row-for-row. Each hypothesis example evaluates a
BATCH of ASTs in one Spark select / one DuckDB query, so the example
count stays small while the AST space coverage stays wide.
"""

from __future__ import annotations

import json

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from leann_rs_spark.operators.filter_dsl import (
    And,
    Condition,
    Or,
    compile_duckdb,
    compile_spark,
    duckdb_json_resolver,
    json_field_resolver,
    matches,
)

FIELDS = ["a", "b", "nest.x"]
STRINGS = ["", "ab", "abc", "xy", "zz9"]

_scalar = st.one_of(
    st.integers(-5, 5),
    st.sampled_from([x / 2 for x in range(-4, 5)]),  # exact-in-binary floats
    st.sampled_from(STRINGS),
)

_ordered_value = st.one_of(st.integers(-5, 5), st.sampled_from(STRINGS))

_condition = st.one_of(
    st.builds(Condition, st.sampled_from(FIELDS), st.just("eq"), _scalar),
    st.builds(Condition, st.sampled_from(FIELDS), st.just("ne"), _scalar),
    st.builds(
        Condition, st.sampled_from(FIELDS),
        st.sampled_from(["gt", "gte", "lt", "lte"]), _ordered_value,
    ),
    st.builds(
        Condition, st.sampled_from(FIELDS),
        st.sampled_from(["in", "not_in"]),
        st.lists(_scalar, min_size=1, max_size=3),
    ),
    st.builds(
        Condition, st.sampled_from(FIELDS),
        st.sampled_from(["contains", "starts_with", "ends_with"]),
        st.sampled_from([s for s in STRINGS if s]),
    ),
    st.builds(Condition, st.sampled_from(FIELDS), st.just("exists"), st.none()),
)

_ast = st.recursive(
    _condition,
    lambda inner: st.one_of(
        st.builds(lambda cs: And(cs), st.lists(inner, min_size=2, max_size=3)),
        st.builds(lambda cs: Or(cs), st.lists(inner, min_size=2, max_size=3)),
    ),
    max_leaves=4,
)

_meta_value = st.one_of(
    st.integers(-5, 5),
    st.sampled_from([x / 2 for x in range(-4, 5)]),
    st.sampled_from(STRINGS),
)

_metadata = st.fixed_dictionaries(
    {},
    optional={
        "a": _meta_value,
        "b": _meta_value,
        "nest": st.fixed_dictionaries({}, optional={"x": _meta_value}),
    },
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    asts=st.lists(_ast, min_size=1, max_size=12),
    metas=st.lists(_metadata, min_size=1, max_size=12),
)
def test_three_way_differential(spark, asts, metas):
    rows = [(i, json.dumps(m, sort_keys=True)) for i, m in enumerate(metas)]

    want = [[matches(ast, m) for m in metas] for ast in asts]

    sdf = spark.createDataFrame(rows, "rid long, props string")
    cols = [
        F.coalesce(
            compile_spark(ast, json_field_resolver("props")), F.lit(False)
        ).alias(f"c{i}")
        for i, ast in enumerate(asts)
    ]
    got_spark = {
        r["rid"]: [bool(r[f"c{i}"]) for i in range(len(asts))]
        for r in sdf.select("rid", *cols).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{j}')".replace("''", "''") for i, j in
                    [(i, j.replace("'", "''")) for i, j in rows])
        + ") AS v(rid, props)"
    )
    sels = ", ".join(
        f"coalesce(({compile_duckdb(ast, duckdb_json_resolver('props'))}), false) AS c{i}"
        for i, ast in enumerate(asts)
    )
    got_duck = {
        row[0]: [bool(v) for v in row[1:]]
        for row in con.execute(f"SELECT rid, {sels} FROM t ORDER BY rid").fetchall()
    }

    for rid, m in enumerate(metas):
        for i, ast in enumerate(asts):
            expect = want[i][rid]
            assert got_spark[rid][i] == expect, (ast, m, "spark")
            assert got_duck[rid][i] == expect, (ast, m, "duckdb")
