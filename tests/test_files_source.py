"""S1/S2: corpus scan rules — extension lists, hidden dirs, skip dirs,
size caps (strict for .json), max_files, and text loading."""

import os

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.sources.files import (
    files_to_documents,
    load_file_content,
    scan_files,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")

    def put(rel, content):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)

    put("readme.md", "hello docs")
    put("src/main.py", "def main():\n    pass\n")
    put("src/util.rs", "fn util() {}")
    put("notes.txt", "plain notes")
    put("binary.exe", "not allowed ext")
    put("noext", "no extension -> dropped")
    put(".hidden/secret.md", "hidden dir")
    put("node_modules/dep/index.js", "skip-list dir")
    put("small.json", '{"k": 1}')
    put("big.json", "x" * (11 * 1024))  # > 10KB strict cap
    put("huge.txt", "y" * (2 * 1024 * 1024))  # > 1MB default cap
    return str(root)


def _paths(df):
    return {os.path.basename(r["path"]) for r in df.select("path").collect()}


def test_scan_default_rules(spark, corpus):
    got = _paths(scan_files(spark, corpus))
    assert got == {"readme.md", "main.py", "util.rs", "notes.txt", "small.json"}


def test_scan_include_hidden(spark, corpus):
    got = _paths(scan_files(spark, corpus, include_hidden=True))
    assert "secret.md" in got
    assert "index.js" not in got  # skip-list still applies


def test_scan_allow_and_exclude_lists(spark, corpus):
    got = _paths(scan_files(spark, corpus, file_types=[".md", ".txt"]))
    assert got == {"readme.md", "notes.txt"}
    got2 = _paths(scan_files(spark, corpus, exclude_types=[".md"]))
    assert "readme.md" not in got2 and "main.py" in got2


def test_scan_size_caps(spark, corpus):
    # default caps already exclude big.json (strict 10KB) and huge.txt (1MB)
    got = _paths(scan_files(spark, corpus))
    assert "big.json" not in got and "huge.txt" not in got
    # raising the general cap admits huge.txt but NOT big.json (strict)
    got2 = _paths(scan_files(spark, corpus, max_file_size_kb=4096))
    assert "huge.txt" in got2 and "big.json" not in got2


def test_scan_max_files_deterministic(spark, corpus):
    a = scan_files(spark, corpus, max_files=3).select("path").collect()
    b = scan_files(spark, corpus, max_files=3).select("path").collect()
    assert a == b and len(a) == 3


def test_load_content(spark, corpus):
    df = load_file_content(scan_files(spark, corpus, file_types=[".py"]))
    row = df.head()
    assert row["text"] == "def main():\n    pass\n"


def test_files_to_documents_dense_ids(spark, corpus):
    docs = files_to_documents(scan_files(spark, corpus)).collect()
    assert [r["doc_id"] for r in sorted(docs, key=lambda r: r["source"])] == list(
        range(len(docs))
    )
    assert all(r["text"] for r in docs)
