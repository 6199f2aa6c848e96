"""PDF text extraction (the S2 `.pdf` branch).

Reference: `load_file_content` routes `.pdf` through `pdf_extract`
behind the `pdf` feature flag and returns None on any extraction
failure (/root/reference/src/cli/build.rs:631-661). This module keeps
that contract: `extract_pdf_text(bytes) -> str | None`, never raises.

Two engines, picked at import time:

- **pypdf** when importable — the full-fidelity path (CMaps,
  ToUnicode, encodings).
- **a minimal pure-Python extractor** otherwise: scans the raw bytes
  for stream objects (balanced `<< >>` dict + `stream…endstream`),
  inflates `/FlateDecode` streams with zlib (stdlib), and walks the
  content-stream text operators (`Tj`, `'`, `"`, `TJ`) with a real
  string tokenizer (nested parens, escape sequences, octal, hex
  strings). Enough for the vast majority of digitally-born PDFs with
  simple (non-CID) fonts; scanned/encrypted/CID PDFs return None —
  exactly the rows the reference also drops when extraction fails.

Scale shape: extraction runs inside an Arrow-batched `mapInPandas`
over the binaryFile scan's `content` column (sources/files.py), so at
100 TB it is a pure map stage — no shuffle, no driver involvement,
and only `.pdf` rows pay for it.
"""

from __future__ import annotations

import re
import zlib

try:  # optional dependency: full-fidelity engine when present
    from pypdf import PdfReader  # type: ignore

    _HAVE_PYPDF = True
except Exception:  # pragma: no cover - environment-dependent
    _HAVE_PYPDF = False


# ---------------------------------------------------------------------------
# Minimal pure-Python engine
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _dict_before(data: bytes, pos: int) -> bytes:
    """The balanced `<< … >>` dictionary ending nearest before `pos`
    (a stream object's dict immediately precedes the `stream` keyword,
    possibly with nested sub-dicts like /DecodeParms)."""
    end = data.rfind(b">>", 0, pos)
    if end < 0:
        return b""
    depth, i = 1, end
    while i > 1 and depth:
        i -= 1
        if data[i : i + 2] == b">>":
            depth += 1
            i -= 1
        elif data[i : i + 2] == b"<<":
            depth -= 1
            if depth == 0:
                return data[i : end + 2]
            i -= 1
    return b""


def _content_streams(data: bytes):
    """Yield decoded content-stream bytes for every stream object whose
    filter we can handle (none, or FlateDecode)."""
    for m in _STREAM_RE.finditer(data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        raw = data[start:end]
        # trailing EOL before `endstream` is not stream data
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        d = _dict_before(data, m.start())
        if b"/FlateDecode" in d:
            try:
                yield zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" not in d:
            yield raw
        # other filters (DCT, LZW, …): not text content we can read


def _read_literal_string(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a `(…)` literal string starting at the '('; returns
    (unescaped bytes, index past the closing paren)."""
    out, depth, i = bytearray(), 1, i + 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < n and j - i < 3 and 0x30 <= s[j] <= 0x37:
                    j += 1
                out.append(int(s[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:  # unknown escape: PDF says drop the backslash
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _read_hex_string(s: bytes, i: int) -> tuple[bytes, int]:
    end = s.find(b">", i)
    if end < 0:
        return b"", len(s)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", s[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except ValueError:
        return b"", end + 1


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _extract_stream_text(s: bytes) -> list[str]:
    """Walk one content stream's operators, collecting shown text.

    Text-showing ops `Tj ' \"` emit the pending string; `TJ` emits the
    strings of the pending array (kerning numbers ignored). Line moves
    (`Td TD T* ' \"`) and block ends (`ET`) become newlines."""
    parts: list[str] = []
    pending: list[bytes] = []  # string operands since the last operator
    i, n = 0, len(s)
    line: list[str] = []

    def flush_line():
        if line:
            parts.append("".join(line))
            line.clear()

    while i < n:
        c = s[i]
        if c == 0x28:  # (
            raw, i = _read_literal_string(s, i)
            pending.append(raw)
        elif c == 0x3C:  # < — hex string (<< dict start handled below)
            if s[i : i + 2] == b"<<":
                i += 2
            else:
                raw, i = _read_hex_string(s, i)
                pending.append(raw)
        elif c == 0x25:  # % comment to EOL
            j = s.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _OP_RE.match(s, i)
            if m:
                op = m.group()
                if op in (b"Tj", b"TJ"):
                    for raw in pending:
                        line.append(raw.decode("latin-1"))
                    pending.clear()
                elif op in (b"'", b'"'):
                    flush_line()
                    for raw in pending:
                        line.append(raw.decode("latin-1"))
                    pending.clear()
                elif op in (b"Td", b"TD", b"T*", b"ET"):
                    flush_line()
                    pending.clear()
                elif op not in (b"Tf", b"Tc", b"Tw", b"Tz", b"TL", b"Ts"):
                    # any other operator consumes its operands
                    pending.clear()
                i = m.end()
            else:
                i += 1
    flush_line()
    return parts


def _extract_minimal(data: bytes) -> str | None:
    if b"/Encrypt" in data:
        return None
    parts: list[str] = []
    for stream in _content_streams(data):
        # only streams that actually show text contribute
        if b"Tj" in stream or b"TJ" in stream or b"'" in stream:
            parts.extend(_extract_stream_text(stream))
    if not parts:
        return None
    return "\n".join(p for p in parts if p.strip())


def extract_pdf_text(data: bytes | bytearray | memoryview | None) -> str | None:
    """bytes → extracted text, or None when the file yields nothing
    (corrupt, encrypted, image-only) — the reference's skip contract
    (build.rs:652-657). Never raises."""
    if not data:
        return None
    data = bytes(data)
    if not data.startswith(b"%PDF"):
        return None
    if _HAVE_PYPDF:
        try:
            import io

            reader = PdfReader(io.BytesIO(data))
            text = "\n".join(page.extract_text() or "" for page in reader.pages)
            return text if text.strip() else None
        except Exception:
            return None
    try:
        return _extract_minimal(data)
    except Exception:  # total over dirty corpora, like the text branch
        return None


# ---------------------------------------------------------------------------
# Tiny PDF builder — test fixture / pipeline smoke utility
# ---------------------------------------------------------------------------

def build_simple_pdf(lines: list[str], compress: bool = False) -> bytes:
    """A minimal valid single-page PDF (proper xref + trailer, so full
    parsers accept it too) showing each line with Td/Tj."""

    def esc(t: str) -> str:
        return t.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for k, ln in enumerate(lines):
        if k:
            ops.append("0 -14 Td")
        ops.append(f"({esc(ln)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter/FlateDecode"

    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Contents 4 0 R/Resources<</Font<</F1 5 0 R>>>>>>",
        b"<</Length %d%s>>stream\n%s\nendstream" % (len(content), filt, content),
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<</Size %d/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
