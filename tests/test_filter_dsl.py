"""Filter DSL tests — the reference's own unit vectors
(/root/reference/src/index/filter.rs:441-552) ported verbatim, plus
three-way parity checks (python evaluator vs Spark compiler vs DuckDB
compiler) on randomized metadata.
"""

import json

import pytest

from leann_rs_spark.operators.filter_dsl import (
    And,
    Condition,
    Or,
    compile_duckdb,
    compile_spark,
    duckdb_json_resolver,
    json_field_resolver,
    matches,
    parse,
)

META = {"source": "main.rs", "type": "code", "lines": 100}


def test_parse_simple():
    f = parse("source:*.rs")
    assert isinstance(f, Condition)
    assert f.op == "ends_with" and f.value == ".rs"


def test_matches_reference_vectors():
    assert matches(parse("source:*.rs"), META)
    assert matches(parse("type=code"), META)
    assert matches(parse("lines>50"), META)


def test_in_not_in():
    m = {"type": "code", "lang": "rust"}
    assert matches(parse("type in [code,text,doc]"), m)
    assert not matches(parse("type in [text,doc]"), m)
    assert matches(parse("type not_in [text,doc]"), {"type": "code"})
    assert not matches(parse("type not_in [code,text]"), {"type": "code"})


def test_and_or():
    m = {"type": "code", "lines": 100}
    assert matches(parse("type=code,lines>50"), m)
    assert matches(parse("type=code AND lines>50"), m)
    assert not matches(parse("type=code,lines>200"), m)
    assert matches(parse("type=code OR type=text"), {"type": "code"})
    assert not matches(parse("type=text OR type=doc"), {"type": "code"})


def test_contains_exists():
    m = {"source": "/path/to/main.rs"}
    assert matches(parse("source~main"), m)
    assert matches(parse("source:*main*"), m)
    assert matches(parse("source?"), {"source": "main.rs"})
    assert not matches(parse("missing?"), {"source": "main.rs"})


def test_missing_field_semantics():
    # Ne/NotIn true when field missing (src/index/filter.rs:335,349)
    assert matches(parse("ghost!=1"), {})
    assert matches(parse("ghost not_in [a,b]"), {})
    assert not matches(parse("ghost=1"), {})
    assert not matches(parse("ghost>1"), {})
    assert not matches(parse("ghost~x"), {})


def test_mixed_type_ordered_compare():
    # compare_values → 0 on type mismatch: gte/lte true, gt/lt false
    m = {"lines": "not-a-number"}
    assert matches(parse("lines>=50"), m)
    assert matches(parse("lines<=50"), m)
    assert not matches(parse("lines>50"), m)
    assert not matches(parse("lines<50"), m)


def test_nested_path():
    m = {"a": {"b": {"c": 5}}}
    assert matches(parse("a.b.c=5"), m)
    assert matches(parse("a.b.c>4"), m)
    assert not matches(parse("a.b.x?"), m)


def test_glob_forms():
    assert parse("f:x*").op == "starts_with"
    assert parse("f:*x").op == "ends_with"
    assert parse("f:*x*").op == "contains"
    assert parse("f^pre").op == "starts_with"
    assert parse("f$suf").op == "ends_with"


def test_value_coercion():
    assert parse("a=5").value == 5
    assert parse("a=5.5").value == 5.5
    assert parse("a=true").value is True
    assert parse("a=hello").value == "hello"


FILTERS = [
    "k>50", "k>=50", "k<10", "k<=10", "k=42", "k!=42",
    "k in [1,2,3,42]", "k not_in [1,2,3]", "k?", "ghost?",
    "ghost!=5", "k>10,k<90", "k<5 OR k>95", "k>=0 AND k<=100",
]


@pytest.mark.parametrize("fs", FILTERS)
def test_three_way_parity_on_events(spark, duck, fs):
    """python evaluator == Spark compiled == DuckDB compiled, over the
    driver's events.props JSON column."""
    ast = parse(fs)
    rows = duck.sql("SELECT event_id, props FROM events").fetchall()
    expected = sorted(
        r[0] for r in rows if matches(ast, json.loads(r[1]))
    )

    from leann_rs_spark.sources.tables import read_events

    df = read_events(spark, "/root/testdata/sf0.001")
    got_spark = sorted(
        r["event_id"]
        for r in df.filter(
            compile_spark(ast, json_field_resolver("props"))
        ).select("event_id").collect()
    )
    assert got_spark == expected, f"spark mismatch for {fs!r}"

    sql = (
        "SELECT event_id FROM events WHERE "
        + compile_duckdb(ast, duckdb_json_resolver("props"))
    )
    got_duck = sorted(r[0] for r in duck.sql(sql).fetchall())
    assert got_duck == expected, f"duckdb mismatch for {fs!r}"


def test_parse_ast_shapes():
    f = parse("a=1,b=2 OR c=3")
    # OR has lower precedence: (a=1,b=2) OR (c=3)
    assert isinstance(f, Or)
    assert isinstance(f.children[0], And)
