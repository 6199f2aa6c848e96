"""Distributed BPE vocabulary training (Sennrich et al., ACL 2016,
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, re-expressed Spark-first.

The classic algorithm: split the corpus into words, represent each
word as a symbol sequence (characters + a terminal '</w>' marker),
then repeatedly (1) count adjacent symbol pairs weighted by word
frequency, (2) merge the most frequent pair into one symbol
everywhere. The key scale property is preserved here: the CORPUS is
scanned exactly once (word counts — one map-side-combined shuffle);
every merge iteration runs over the DISTINCT-WORD table, which is
vocabulary-sized, not corpus-sized. At 100 TB the vocab table is a
few million rows regardless of corpus size.

The symbol-sequence representation is a BRACKET STRING:
'[h][e][l][l][o][</w>]'. Merging pair (a,b) is then EXACTLY
`replace(ws, '[a][b]', '[ab]')`: string replace is left-to-right
non-overlapping in both Spark and DuckDB (verified: '[a]'×5 with
pattern '[a][a]' → '[aa][aa][a]' in both), which is precisely BPE's
greedy merge order — no sequential fold, no UDF, and the whole
iterative trainer unrolls into a plain SQL oracle
(duckdb_bpe_merges). Tokens come from functions.text.tokenize
([a-z0-9]+ lowercase), so '[' / ']' can never appear inside a symbol.

Determinism: pair counts are integers; the argmax tie-breaks
(freq DESC, left ASC, right ASC). Per-iteration lineage is truncated
with localCheckpoint (the CLAUDE.md iterative-driver-loop rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from leann_rs_spark.functions.text import tokenize

EOW = "</w>"


def word_bracket_string(word: Column | str) -> Column:
    """'hello' → '[h][e][l][l][o][</w>]'."""
    word = F.col(word) if isinstance(word, str) else word
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )
    return F.concat(
        F.lit("["),
        F.array_join(F.concat(chars, F.array(F.lit(EOW))), "]["),
        F.lit("]"),
    )


def _syms(ws: Column) -> Column:
    """Bracket string → symbol array."""
    return F.split(F.substring(ws, 2, F.length(ws) - 2), r"\]\[")


def bpe_word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq, ws) — the ONE corpus pass; everything after is
    vocabulary-sized."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("ws", word_bracket_string("word"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
    batch_k: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn `num_merges` BPE merges → [(left, right, pair_freq)] in
    merge order. Stops early if no pair occurs twice (nothing left to
    compress). Each round: one vocab-sized pair count + a tiny
    TakeOrdered collect + one projection; the vocab frame is
    localCheckpoint'ed every `checkpoint_every` rounds so Catalyst
    never re-analyzes the growing replace chain.

    batch_k > 1 is the SCALABLE variant: each round applies up to
    batch_k merges whose symbols are pairwise DISJOINT (a pair sharing
    a symbol with an already-selected pair is deferred to the next
    round). Disjoint-symbol replaces commute and cannot create or
    destroy each other's occurrences, so every applied pair's recorded
    frequency is still its true corpus frequency at application time —
    the counts are exact, only the interleaving ORDER differs from
    classic BPE (batch_k=1 is bit-for-bit the classic sequence, the
    oracle-gated mode). Driver rounds drop from num_merges to
    ~num_merges/batch_k: a 32k-merge vocab at batch_k=256 is ~125
    rounds instead of 32k."""
    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k!r}")
    vocab = bpe_word_counts(docs, text_col=text_col).select("freq", "ws")
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        syms = _syms(F.col("ws"))
        n1 = F.greatest(F.size(syms) - 1, F.lit(0))
        pairs = F.zip_with(
            F.slice(syms, F.lit(1), n1),
            F.slice(syms, F.lit(2), n1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        want = min(batch_k, num_merges - len(merges))
        # over-fetch: conflicts defer candidates, 4× covers heavy overlap
        top = (
            vocab.select("freq", F.explode(pairs).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pf"))
            .filter(F.col("pf") >= 2)
            .orderBy(F.col("pf").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(4 * want)
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        batch: list[tuple[str, str, int]] = []
        for row in top:
            l, r = row["l"], row["r"]
            if l in used or r in used:
                continue
            used.update((l, r, l + r))
            batch.append((l, r, int(row["pf"])))
            if len(batch) >= want:
                break
        merges.extend(batch)
        ws = F.col("ws")
        for l, r, _ in batch:
            ws = F.replace(ws, F.lit(f"[{l}][{r}]"), F.lit(f"[{l}{r}]"))
        vocab = vocab.select("freq", ws.alias("ws"))
        rounds += 1
        if rounds % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, tokens array<string>, n_tokens) — each document's
    words encoded with the learned merges, applied in merge order as a
    chained replace projection (shuffle-free; one expression per
    merge). Word order is carried explicitly (posexplode + sorted
    reassembly) — collect_list order is not contractual across a
    shuffle."""
    enc = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(text_col)).alias("__pos", "word"),
    ).withColumn("ws", word_bracket_string("word"))
    ws = F.col("ws")
    for l, r, _ in merges:
        ws = F.replace(ws, F.lit(f"[{l}][{r}]"), F.lit(f"[{l}{r}]"))
    return (
        enc.select(id_col, "__pos", _syms(ws).alias("toks"))
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens"),
            F.sum(F.size("toks")).cast("bigint").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin: the trainer unrolled — iteration n = pair counts
# over vocab_{n-1}, argmax, replace. Bit-identical because pair counts
# are integers and replace semantics match.
# ---------------------------------------------------------------------------

def duckdb_bpe_merges(
    num_merges: int,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """→ SQL producing (step, left, right, pair_freq) for exactly
    `num_merges` merges (the gate corpus must support that many —
    selfcheck fails loudly if a bN CTE comes up empty, rather than
    silently diverging)."""
    from leann_rs_spark.functions.text import duckdb_tokenize

    # AS MATERIALIZED is load-bearing: without it DuckDB INLINES each
    # CTE; v_{n-1} is referenced twice per level (p_n and v_n), so the
    # plan tree doubles per merge — measured 38 s at 7 merges vs 0.4 s
    # materialized at 8.
    ctes = [
        f"""v0 AS MATERIALIZED (
            SELECT count(*)::bigint AS freq,
                   '[' || array_to_string(
                       list_append(
                           list_transform(generate_series(1, len(word)),
                                          i -> substr(word, i, 1)),
                           '{EOW}'), '][') || ']' AS ws
            FROM (SELECT unnest({duckdb_tokenize(text_col)}) AS word
                  FROM {table})
            GROUP BY word
        )"""
    ]
    for n in range(1, num_merges + 1):
        prev = f"v{n - 1}"
        ctes.append(
            f"""p{n} AS MATERIALIZED (
                SELECT s.l, s.r, sum(v.freq)::bigint AS pf
                FROM {prev} v, LATERAL (
                    SELECT syms[i] AS l, syms[i + 1] AS r
                    FROM (SELECT str_split(
                              substr(v.ws, 2, len(v.ws) - 2), '][') AS syms),
                         unnest(generate_series(1,
                             greatest(len(syms) - 1, 0))) t(i)
                ) s
                GROUP BY s.l, s.r
            )""")
        ctes.append(
            f"""b{n} AS MATERIALIZED (
                SELECT l, r, pf FROM p{n}
                ORDER BY pf DESC, l ASC, r ASC LIMIT 1
            )""")
        ctes.append(
            f"""v{n} AS MATERIALIZED (
                SELECT v.freq,
                       replace(v.ws,
                           (SELECT '[' || l || '][' || r || ']' FROM b{n}),
                           (SELECT '[' || l || r || ']' FROM b{n})) AS ws
                FROM {prev} v
            )""")
    union = " UNION ALL ".join(
        f"SELECT {n}::bigint AS step, l AS lsym, r AS rsym,"
        f" pf AS pair_freq FROM b{n}"
        for n in range(1, num_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{union} ORDER BY step"


def duckdb_bpe_encode(
    num_merges: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin of bpe_train → bpe_encode as one statement:
    (id_col, n_tokens, tokens_hash) with tokens_hash =
    md5 of the space-joined symbol stream (every word emits ≥ 1
    symbol, so per-word join + ordered string_agg ≡ the Spark side's
    flatten + array_join)."""
    from leann_rs_spark.functions.text import duckdb_tokenize

    merges_sql = duckdb_bpe_merges(num_merges, table=table, text_col=text_col)
    head, _tail = merges_sql.split("\nSELECT 1::bigint AS step", 1)
    ws = "w.ws"
    for n in range(1, num_merges + 1):
        ws = (
            f"replace({ws}, (SELECT '[' || l || '][' || r || ']' FROM b{n}),"
            f" (SELECT '[' || l || r || ']' FROM b{n}))"
        )
    return f"""{head},
    words AS MATERIALIZED (
        SELECT {id_col}, i AS pos,
               '[' || array_to_string(
                   list_append(
                       list_transform(generate_series(1, len(t[i])),
                                      j -> substr(t[i], j, 1)),
                       '{EOW}'), '][') || ']' AS ws
        FROM (SELECT {id_col}, {duckdb_tokenize(text_col)} AS t FROM {table}),
             unnest(generate_series(1, len(t))) s(i)
    ),
    encd AS MATERIALIZED (
        SELECT {id_col}, pos,
               str_split(substr(enc, 2, len(enc) - 2), '][') AS syms
        FROM (SELECT {id_col}, pos, {ws} AS enc FROM words w)
    )
    SELECT {id_col},
           sum(len(syms))::bigint AS n_tokens,
           md5(string_agg(array_to_string(syms, ' '), ' ' ORDER BY pos))
               AS tokens_hash
    FROM encd GROUP BY 1
    """
