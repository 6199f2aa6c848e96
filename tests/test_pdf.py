"""S2 `.pdf` branch: the minimal extractor's parsing rules and the
Spark mapInPandas wiring (reference contract: text on success, row
dropped on failure — build.rs:631-661)."""

import zlib

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.sources.files import (
    files_to_documents,
    load_file_content,
    scan_files,
)
from leann_rs_spark.sources.pdf import (
    _extract_minimal,
    build_simple_pdf,
    extract_pdf_text,
)


# ---------------------------------------------------------------------------
# pure extractor
# ---------------------------------------------------------------------------

def test_uncompressed_pdf():
    pdf = build_simple_pdf(["Hello Spark PDF", "second line"])
    out = extract_pdf_text(pdf)
    assert out is not None
    assert "Hello Spark PDF" in out
    assert "second line" in out
    # Td line moves become separate lines
    assert out.index("Hello Spark PDF") < out.index("second line")


def test_flate_compressed_pdf():
    pdf = build_simple_pdf(["deflated content stream"], compress=True)
    out = extract_pdf_text(pdf)
    assert out is not None and "deflated content stream" in out


def test_escapes_and_parens():
    pdf = build_simple_pdf([r"nested (parens) and \ backslash", "tab\tkept"])
    out = extract_pdf_text(pdf)
    assert "nested (parens) and \\ backslash" in out
    assert "tab\tkept" in out


def test_hex_string_and_tj_array():
    # hand-built content stream: hex string + TJ array with kerning
    content = b"BT (ab) Tj <48657821> Tj [(x) -120 (y)] TJ ET"
    raw = b"%%PDF-1.4\n1 0 obj\n<</Length %d>>stream\n%s\nendstream\nendobj\n" % (
        len(content),
        content,
    )
    out = extract_pdf_text(raw)
    assert out is not None
    assert "Hex!" in out  # 48 65 78 21
    assert "ab" in out and "xy" in out  # kerning numbers ignored


def test_octal_escape():
    content = rb"BT (\101\102\103) Tj ET"
    raw = b"%%PDF-1.4\n1 0 obj\n<</Length %d>>stream\n%s\nendstream\nendobj\n" % (
        len(content),
        content,
    )
    assert "ABC" in extract_pdf_text(raw)


def test_failure_modes_return_none():
    assert extract_pdf_text(None) is None
    assert extract_pdf_text(b"") is None
    assert extract_pdf_text(b"plain text, not a pdf") is None
    # valid header, garbage body
    assert extract_pdf_text(b"%PDF-1.4\ngarbage with no streams") is None
    # encrypted docs are skipped, not mis-parsed
    enc = build_simple_pdf(["secret"]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R/Encrypt 9 0 R"
    )
    assert _extract_minimal(enc) is None
    # corrupt flate stream
    pdf = build_simple_pdf(["x"], compress=True)
    corrupt = pdf.replace(zlib.compress(b"BT\n/F1 12 Tf\n72 720 Td\n(x) Tj\nET"), b"\x00\x01\x02")
    assert extract_pdf_text(corrupt) is None


def test_image_only_stream_yields_none():
    # stream present but no text-showing operators
    content = b"q 100 0 0 100 0 0 cm /Im0 Do Q"
    raw = b"%%PDF-1.4\n1 0 obj\n<</Length %d>>stream\n%s\nendstream\nendobj\n" % (
        len(content),
        content,
    )
    assert extract_pdf_text(raw) is None


def test_nested_resource_dict_before_stream():
    # the dict scan must balance nested <<…>> (e.g. /DecodeParms)
    content = zlib.compress(b"BT (deep) Tj ET")
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<</Length %d/Filter/FlateDecode"
        b"/DecodeParms<</Predictor 1>>>>stream\n%s\nendstream\nendobj\n"
        % (len(content), content)
    )
    assert "deep" in extract_pdf_text(raw)


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mixed_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("pdfcorpus")
    (root / "notes.txt").write_text("plain text doc")
    (root / "report.pdf").write_bytes(
        build_simple_pdf(["quarterly numbers", "are up"], compress=True)
    )
    (root / "broken.pdf").write_bytes(b"%PDF-1.4\nnot really")
    return str(root)


def test_load_file_content_extracts_pdfs_and_drops_failures(spark, mixed_corpus):
    files = scan_files(spark, mixed_corpus)
    loaded = load_file_content(files)
    rows = {r["path"].split("/")[-1]: r["text"] for r in loaded.collect()}
    assert rows["notes.txt"] == "plain text doc"
    assert "quarterly numbers" in rows["report.pdf"]
    assert "are up" in rows["report.pdf"]
    assert "broken.pdf" not in rows  # None-on-failure row dropped


def test_files_to_documents_includes_pdf(spark, mixed_corpus):
    docs = files_to_documents(scan_files(spark, mixed_corpus))
    assert docs.filter(F.col("source").endswith(".pdf")).count() == 1
    # dense ids stay 0..n-1 over the mixed corpus
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert ids == list(range(len(ids)))
