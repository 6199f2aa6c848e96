"""Document corpus scan (S1) + content load (S2).

Reference: `collect_file_paths` (/root/reference/src/cli/build.rs:414-554)
— recursive walk honoring hidden/.gitignore rules, a build-dir skip
list, extension allow/deny lists, per-file size caps (10 KB strict for
`.json`, `max_file_size_kb` KiB default), and a `max_files` limit —
then `load_file_content` (:631-661) reads text (PDF behind a feature
flag).

Spark shape: one `binaryFile` scan with `recursiveFileLookup` gives a
distributed listing + content in a single DataFrame —
(path, modificationTime, length, content). Every reference rule becomes
a Column predicate on that listing, so Catalyst evaluates them during
the scan and `length`-based caps skip file *content* reads entirely
(binaryFile reads are lazy per-row). At 100 TB the listing itself is
distributed by the data source — no driver-side walk.

Differences kept deliberately (documented):
- .gitignore/.leannignore semantics are approximated by the hidden-dir
  rule + skip-list (full gitignore needs per-dir state, which a
  distributed listing cannot see; pass explicit `exclude_globs` for
  project-specific rules).
- `max_files` applies a deterministic `ORDER BY path LIMIT n`, not the
  reference's walk-order truncation (walk order is OS-dependent —
  nondeterministic across machines; path order is reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# build.rs:428-439; .pdf is appended there when pdf support is compiled
# in — this engine always has the sources/pdf.py extractor, so it's on.
DEFAULT_FILE_TYPES = [
    ".txt", ".md", ".py", ".js", ".ts", ".tsx", ".jsx", ".rs", ".go", ".java",
    ".c", ".cpp", ".cc", ".h", ".hpp", ".json", ".yaml", ".yml", ".toml",
    ".rb", ".php", ".swift", ".kt", ".scala", ".cs", ".pdf",
]

# build.rs:497-506 filter_entry skip list
SKIP_DIRS = [
    "target", "node_modules", ".git", "__pycache__", "venv", ".venv",
    "dist", "build", ".next", ".nuxt", "vendor", "Pods", ".gradle",
    ".cache", "deps", "_build", ".elixir_ls", ".hex", "priv",
]

STRICT_SIZE_EXTENSIONS = [".json"]  # build.rs:442-444
STRICT_SIZE_LIMIT = 10 * 1024  # 10 KB


def _ext(path_col):
    # ".ext" of the final path segment; files without an extension get
    # NULL and are dropped (the reference requires Some(ext), :464,:525)
    base = F.element_at(F.split(path_col, "/"), -1)
    return F.when(
        base.rlike(r"\.[^.]+$"), F.concat(F.lit("."), F.regexp_extract(base, r"\.([^.]+)$", 1))
    )


def scan_files(
    spark: SparkSession,
    path: str,
    file_types: list[str] | None = None,
    exclude_types: list[str] | None = None,
    include_hidden: bool = False,
    max_files: int | None = None,
    max_file_size_kb: int = 1024,
) -> DataFrame:
    """S1: → (path, length, modification_time, ext, content BINARY)."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if include_hidden:
        # Hadoop's FileIndex hard-filters dot-prefixed children during
        # listing, so hidden files are invisible to a directory load no
        # matter the option. Opt-in hidden scanning enumerates paths
        # driver-side (listing only — content reads stay distributed;
        # object stores have no hidden convention, so this branch is a
        # local-fs affordance mirroring the reference's local walker).
        import os as _os

        explicit: list[str] = []
        for dirpath, dirnames, filenames in _os.walk(path):
            dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
            explicit.extend(_os.path.join(dirpath, f) for f in filenames)
        df = reader.load(sorted(explicit))
    else:
        df = reader.load(path)
    df = (
        df.select(
            "path",
            "length",
            F.col("modificationTime").alias("modification_time"),
            "content",
        )
        .withColumn("ext", _ext(F.col("path")))
    )

    allowed = file_types if file_types is not None else DEFAULT_FILE_TYPES
    df = df.filter(F.col("ext").isin(allowed))
    if exclude_types:
        df = df.filter(~F.col("ext").isin(exclude_types))

    segs = F.split(F.col("path"), "/")
    df = df.filter(~F.arrays_overlap(segs, F.array(*[F.lit(d) for d in SKIP_DIRS])))

    strict = F.col("ext").isin(STRICT_SIZE_EXTENSIONS)
    cap = F.when(strict, F.lit(STRICT_SIZE_LIMIT)).otherwise(
        F.lit(max_file_size_kb * 1024)
    )
    df = df.filter(F.col("length") <= cap)

    if max_files is not None:
        df = df.orderBy("path").limit(max_files)
    return df


_LOADED_COLS = ["path", "ext", "length", "modification_time", "text"]


def load_file_content(files: DataFrame) -> DataFrame:
    """S2: binary → text. UTF-8 with replacement (the reference's
    read_to_string is strict UTF-8; replacement keeps the pipeline total
    over dirty corpora — documented deviation). `.pdf` rows route
    through an Arrow-batched mapInPandas extraction stage
    (sources/pdf.py: pypdf when importable, else a minimal pure-Python
    engine); rows whose extraction yields nothing are dropped — the
    reference's None-on-failure skip (build.rs:652-657). The branches
    stay separate so the non-pdf path never pays for extraction."""
    text = files.filter(F.col("ext") != ".pdf").withColumn(
        "text", F.decode(F.col("content"), "UTF-8")
    )
    pdf_rows = files.filter(F.col("ext") == ".pdf")

    def _extract(batches):
        from leann_rs_spark.sources.pdf import extract_pdf_text

        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = pdf["content"].map(
                lambda b: extract_pdf_text(None if b is None else bytes(b))
            )
            yield pdf[_LOADED_COLS]

    pdf_text = pdf_rows.mapInPandas(
        _extract,
        schema=(
            "path string, ext string, length long,"
            " modification_time timestamp, text string"
        ),
    ).filter(F.col("text").isNotNull())
    return text.select(*_LOADED_COLS).unionByName(pdf_text)


def files_to_documents(files: DataFrame) -> DataFrame:
    """Adapt a scan to the engine's documents shape:
    (doc_id, source, text). doc_id is a deterministic dense id in path
    order (T4 discipline — never monotonically_increasing_id)."""
    from leann_rs_spark.utils import with_dense_index

    loaded = load_file_content(files).select(
        F.col("path").alias("source"), "text"
    )
    return with_dense_index(loaded, ["source"], "doc_id").select(
        "doc_id", "source", "text"
    )
