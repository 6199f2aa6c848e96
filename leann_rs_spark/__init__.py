"""leann_rs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of decisiongraph/leann-rs (a single-binary
vector database for RAG), re-expressed Spark-first for 100 TB scale.

Architecture (vs. the reference, cited as file:line into /root/reference):

- The reference's PassageStore (JSONL + byte-offset map,
  src/index/passages.rs:19-26) and EmbeddingsStore (mmap'd flat f32,
  src/index/embeddings.rs:12-34) collapse into Parquet tables; Catalyst
  predicate pushdown + column pruning replace the hand-rolled point-seek
  machinery.
- Exact brute-force MIPS top-k (the reference's own semantic ground truth,
  "recompute mode", src/index/recompute.rs:52-123) is the canonical search
  path, expressed as pure DataFrame ops so Catalyst plans
  TakeOrderedAndProject (heap top-k, no full sort). ANN (HNSW/DiskANN,
  src/backend/*) is a physical approximation; our approximate paths are
  LSH/IVF bucket pruning (operators/ann.py).
- All float scoring folds in DOUBLE with a deterministic sequential order
  (F.aggregate over zip_with) — verified bit-exact against DuckDB's
  list_reduce fold (tools/parity_exp.py), which makes the oracle
  hash-check meaningful.
"""

__version__ = "0.1.0"

from leann_rs_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
