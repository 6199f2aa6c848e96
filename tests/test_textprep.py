"""Text extraction / normalization (operators/textprep.py): the
HTML→text regexp chain's semantics and its cross-engine dialect
parity, plus NFC normalization equivalence with DuckDB's native
nfc_normalize."""

import duckdb
import pytest

from leann_rs_spark.operators.textprep import (
    duckdb_html_to_text,
    duckdb_nfc_normalize,
    html_to_text,
    nfc_normalize_text,
)

CASES = [
    # script/style content must vanish, not just the tags
    ("<p>keep</p><script>drop();</script>", "keep"),
    ("<style>p{x:1}</style><b>bold</b> text", "bold text"),
    # comments, nested tags, attributes
    ("<!-- gone --><div class='a'><span>hi</span> there</div>", "hi there"),
    # entity order: &amp;lt; must yield the LITERAL text "&lt;"
    ("a &amp;lt; b &lt; c &amp; d", "a &lt; b < c & d"),
    ("&quot;q&quot; &#39;s&#39; x&nbsp;y", "\"q\" 's' x y"),
    # multiline script bodies ((?s) flag) and whitespace collapse
    ("<script>\nvar x = 1;\nif(a&&b){}\n</script>one\n\n  two", "one two"),
    # case-insensitive tags ((?i) flag)
    ("<SCRIPT>x</SCRIPT><P>cased</P>", "cased"),
    # total over plain text
    ("no markup   at all", "no markup at all"),
    ("", ""),
]

DECOMPOSED = "cafe\u0301 A\u030Amstro\u0308m"  # e+acute, A+ring, o+diaeresis
COMPOSED = "caf\u00e9 \u00c5mstr\u00f6m"


def _duck_scalar(expr: str) -> str:
    return duckdb.sql("SELECT " + expr + " AS t").fetchone()[0]


@pytest.mark.parametrize("raw,want", CASES)
def test_html_to_text_semantics_in_duckdb_dialect(raw, want):
    lit = "'" + raw.replace("'", "''") + "'"
    assert _duck_scalar(duckdb_html_to_text(lit)) == want


def test_html_to_text_spark_matches_duckdb(spark):
    rows = (
        spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(CASES)],
            "id long, raw string",
        )
        .select("id", html_to_text("raw").alias("t"))
        .orderBy("id")
        .collect()
    )
    assert [r["t"] for r in rows] == [want for _, want in CASES]


def test_nfc_matches_duckdb_and_composes(spark):
    df = spark.createDataFrame(
        [(1, DECOMPOSED), (2, "plain"), (3, None)], "id long, text string"
    )
    rows = {
        r["id"]: r["text_nfc"]
        for r in nfc_normalize_text(df, "text").collect()
    }
    assert rows[1] == COMPOSED and len(rows[1]) < len(DECOMPOSED)
    assert rows[2] == "plain"
    assert rows[3] is None
    lit = "'" + DECOMPOSED + "'"
    assert _duck_scalar(duckdb_nfc_normalize(lit)) == rows[1]
