"""Text extraction / normalization — the step BEFORE every quality and
dedup operator in a crawl pipeline (CCNet/C4 both start by reducing
raw HTML to text and normalizing unicode; reference scope note: the
reference ingests pre-extracted text files, src/cli/mod.rs `index`, so
this module is part of the beyond-reference LLM-pipeline surface).

Two tiers, matching the repo's conventions:

- `html_to_text`: pure native expressions (regexp chains — JVM-side,
  whole-stage codegen, zero Python). Deliberately trafilatura-LITE:
  script/style/comment blocks dropped, tags to spaces, the six
  entities that dominate real crawl text unescaped, whitespace
  collapsed. Regexes are written to the COMMON dialect of Java regex
  and RE2 (no backreferences, explicit whitespace classes) so the
  DuckDB twin is the same chain verbatim.

- `nfc_normalize_text`: Unicode NFC via Arrow-batched mapInPandas
  (Spark has no NFC builtin; a per-row Python UDF is the forbidden
  slow path, a vectorized batch over `unicodedata.normalize` is the
  sanctioned one). The DuckDB twin is its native `nfc_normalize`.
  Both implement Unicode NFC, so parity is by standard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# Ordered (pattern, replacement) chain. Order matters twice over:
# block elements before the generic tag strip (their CONTENT goes
# too), and `&amp;` unescaped LAST so `&amp;lt;` correctly yields
# `&lt;` rather than `<`.
_HTML_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]
# explicit class: Java \s includes \x0B, RE2's does not — spell out
# the common subset so both engines collapse identically
_WS = r"[ \t\n\r\f]+"


def html_to_text(text: Column | str) -> Column:
    """HTML → plain text, all native expressions: drop script/style
    blocks with their content, drop comments, strip remaining tags to
    spaces, unescape the six common entities, collapse whitespace,
    trim. Total over non-HTML input (plain text passes through with
    only whitespace collapsing)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, rep in _HTML_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    return F.trim(F.regexp_replace(c, _WS, " "))


def duckdb_html_to_text(text_sql: str) -> str:
    """Oracle twin — the SAME chain verbatim (patterns live in the
    shared RE2 ∩ Java dialect: no backreferences, explicit whitespace
    class; flags are inline `(?is)` which both accept)."""
    c = text_sql
    for pat, rep in _HTML_STEPS:
        flags = ""
        if pat.startswith("(?is)"):
            pat, flags = pat[5:], "is"
        elif pat.startswith("(?s)"):
            pat, flags = pat[4:], "s"
        c = f"regexp_replace({c}, '{pat}', '{rep}', 'g{flags}')"
    for lit, rep in _ENTITY_STEPS:
        rep_sql = rep.replace("'", "''")
        lit_sql = lit.replace("'", "''")
        c = f"replace({c}, '{lit_sql}', '{rep_sql}')"
    return f"trim(regexp_replace({c}, '{_WS}', ' ', 'g'))"


def nfc_normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_nfc",
) -> DataFrame:
    """Unicode NFC normalization of one column — mojibake-adjacent
    cleanup every multilingual corpus needs before hashing/dedup
    (the SAME logical string in composed vs decomposed form hashes
    differently and defeats exact dedup). Arrow-batched mapInPandas
    over `unicodedata.normalize`; NULL rows stay NULL. Appends
    `out_col`, keeps every input column.

    100 TB shape: a pure map pass — no shuffle, no state; the batch
    kernel is a vectorized pandas `.map` over Arrow strings.
    """
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(
                lambda s: None
                if s is None
                else unicodedata.normalize("NFC", s)
            )
            yield pdf

    return df.mapInPandas(run, schema=schema)


def duckdb_nfc_normalize(text_sql: str) -> str:
    """Oracle twin: DuckDB's native utf8proc NFC. Parity with Python's
    unicodedata is by the Unicode standard (both implement canonical
    composition); the gate pins it on real data."""
    return f"nfc_normalize({text_sql})"
