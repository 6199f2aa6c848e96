"""CLI veneer: the reference's command surface end-to-end (build →
search/ask/react/list/prune → search-after-prune → remove), against a
temp warehouse. Mirrors the reference's own CLI smoke strategy
(tests/integration_test.rs) but WITH data-path coverage."""

import json

import pytest

from leann_rs_spark.cli import build_parser, main

from conftest import SF_SMOKE


def test_parser_covers_reference_commands():
    # mod.rs:48-84 command inventory
    p = build_parser()
    subs = p._subparsers._group_actions[0].choices
    for cmd in ["build", "update", "search", "ask", "react", "serve",
                "list", "remove", "prune", "config", "mcp"]:
        assert cmd in subs, cmd


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("cli_wh"))
    rc = main([
        "build", "idx", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
    ])
    assert rc == 0
    return wh


def test_cli_search_json(warehouse, capsys):
    rc = main([
        "search", "idx", "some document text", "--warehouse", warehouse,
        "--top-k", "3", "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out) == 3
    assert {"idx", "score", "doc_id", "source", "text"} <= set(out[0])


def test_cli_search_filtered(warehouse, capsys):
    rc = main([
        "search", "idx", "anything", "--warehouse", warehouse,
        "--filter", "doc_id<10", "--top-k", "5", "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out and all(r["doc_id"] < 10 for r in out)


def test_cli_ask_and_react(warehouse, capsys):
    assert main(["ask", "idx", "what is stored here?",
                 "--warehouse", warehouse]) == 0
    answer = capsys.readouterr().out
    assert "what is stored here?" in answer  # simulated-LLM echo

    assert main(["react", "idx", "what is stored?",
                 "--warehouse", warehouse, "--max-steps", "2"]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_list_update_prune_remove(warehouse, capsys):
    assert main(["list", "--warehouse", warehouse]) == 0
    assert "idx:" in capsys.readouterr().out

    assert main(["update", "idx", "--warehouse", warehouse,
                 "--docs", f"{SF_SMOKE}/documents.parquet"]) == 0
    assert "passages" in capsys.readouterr().out

    # compact / refresh refuse on a non-IVF index (error surfaced,
    # not a crash)
    assert main(["compact", "idx", "--warehouse", warehouse]) != 0
    capsys.readouterr()
    assert main(["refresh", "idx", "--warehouse", warehouse]) != 0
    capsys.readouterr()

    assert main(["prune", "idx", "--warehouse", warehouse]) == 0
    capsys.readouterr()
    # search still works after prune (recompute plan, S14/Q3)
    assert main(["search", "idx", "text", "--warehouse", warehouse,
                 "--top-k", "2", "--json"]) == 0
    assert len(json.loads(capsys.readouterr().out)) == 2

    assert main(["remove", "idx", "--warehouse", warehouse, "--force"]) == 0
    assert main(["list", "--warehouse", warehouse]) == 0
    assert "idx:" not in capsys.readouterr().out.split("Removed")[-1]


def test_cli_config(tmp_path, capsys):
    cfg = str(tmp_path / "c.toml")
    assert main(["config", "init", "--config", cfg]) == 0
    assert main(["config", "show", "--config", cfg]) == 0
    assert 'provider = "ollama"' in capsys.readouterr().out
    assert main(["config", "path", "--config", cfg]) == 0
    assert cfg in capsys.readouterr().out


def test_cli_ivf_backend_build_and_search(spark, tmp_path_factory, capsys):
    wh = str(tmp_path_factory.mktemp("cli_ivf_wh"))
    rc = main([
        "build", "ivfx", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
        "--backend", "ivf", "--ivf-centroids", "4",
    ])
    assert rc == 0
    capsys.readouterr()
    # nprobe=4 == n_centroids → identical to the exact path
    rc = main([
        "search", "ivfx", "some document text fragment", "--warehouse", wh,
        "--top-k", "3", "--json", "--nprobe", "4",
    ])
    assert rc == 0
    ivf_rows = json.loads(capsys.readouterr().out)
    rc = main([
        "search", "ivfx", "some document text fragment", "--warehouse", wh,
        "--top-k", "3", "--json", "--exact",
    ])
    assert rc == 0
    exact_rows = json.loads(capsys.readouterr().out)
    assert [(r["idx"], r["score"]) for r in ivf_rows] == [
        (r["idx"], r["score"]) for r in exact_rows
    ]

    # refresh: resize the codebook against the current corpus; search
    # at full probe width still equals exact (results are codebook-
    # independent at nprobe == C)
    assert main(["refresh", "ivfx", "--warehouse", wh,
                 "--centroids", "6"]) == 0
    out = capsys.readouterr().out
    assert "Refreshed IVF codebook" in out and "C=6" in out
    rc = main([
        "search", "ivfx", "some document text fragment", "--warehouse", wh,
        "--top-k", "3", "--json", "--nprobe", "6",
    ])
    assert rc == 0
    refreshed_rows = json.loads(capsys.readouterr().out)
    assert [(r["idx"], r["score"]) for r in refreshed_rows] == [
        (r["idx"], r["score"]) for r in exact_rows
    ]


def test_cli_ivfpq_backend_build_and_search(spark, tmp_path_factory, capsys):
    """--backend ivfpq: packed PQ codes ride the IVF layout; search
    defaults to the ADC+refine read path, --no-pq forces full vectors.
    With full probes and a generous refine both must match --exact."""
    wh = str(tmp_path_factory.mktemp("cli_ivfpq_wh"))
    rc = main([
        "build", "pqx", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
        "--backend", "ivfpq", "--ivf-centroids", "4",
        "--pq-m", "4", "--pq-k", "8",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "search", "pqx", "some document text fragment", "--warehouse", wh,
        "--top-k", "3", "--json", "--nprobe", "4", "--pq-refine", "1000",
    ])
    assert rc == 0
    pq_rows = json.loads(capsys.readouterr().out)
    rc = main([
        "search", "pqx", "some document text fragment", "--warehouse", wh,
        "--top-k", "3", "--json", "--exact",
    ])
    assert rc == 0
    exact_rows = json.loads(capsys.readouterr().out)
    assert [(r["idx"], r["score"]) for r in pq_rows] == [
        (r["idx"], r["score"]) for r in exact_rows
    ]
    # --no-pq on a pq-enabled index takes the full-vector IVF path;
    # with full probes it must also match exact
    rc = main([
        "search", "pqx", "some document text fragment", "--warehouse", wh,
        "--top-k", "3", "--json", "--nprobe", "4", "--no-pq",
    ])
    assert rc == 0
    nopq_rows = json.loads(capsys.readouterr().out)
    assert [(r["idx"], r["score"]) for r in nopq_rows] == [
        (r["idx"], r["score"]) for r in exact_rows
    ]


def test_cli_build_from_directory_with_filters(spark, tmp_path_factory, capsys):
    src = tmp_path_factory.mktemp("corpus")
    (src / "a.txt").write_text("alpha beta gamma delta " * 30)
    (src / "b.md").write_text("markdown notes here " * 30)
    (src / "c.bin").write_bytes(b"\x00\x01binary")
    (src / "d.py").write_text("def excluded():\n    return 1\n" * 20)
    wh = str(tmp_path_factory.mktemp("cli_dir_wh"))
    rc = main([
        "build", "diridx", "--warehouse", wh, "--docs", str(src),
        "--chunk-size", "16", "--chunk-overlap", "4", "--dims", "16",
        "--file-types", "txt,md",
    ])
    assert rc == 0
    import pyspark.sql.functions as F

    passages = spark.read.parquet(f"{wh}/diridx/passages")
    srcs = {r["source"] for r in passages.select("source").distinct().collect()}
    assert any(s.endswith("a.txt") for s in srcs)
    assert any(s.endswith("b.md") for s in srcs)
    assert not any(s.endswith("c.bin") for s in srcs)
    # .py IS in the default allowlist — its absence proves --file-types
    # actually reached scan_files rather than defaults applying
    assert not any(s.endswith("d.py") for s in srcs)


@pytest.fixture(scope="module")
def chat_wh(spark, tmp_path_factory):
    # own warehouse: the shared one is torn down by the remove test
    wh = str(tmp_path_factory.mktemp("chat_wh"))
    rc = main([
        "build", "idx", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
    ])
    assert rc == 0
    return wh


def test_interactive_chat_repl(spark, chat_wh):
    """R2 (ask.rs:200-317): scripted REPL session — commands, unknown
    command, blank lines, Q&A history accumulation, /clear, /quit; the
    history holds (question, answer) pairs but is never fed back into
    prompts (each answer equals the single-shot ask answer)."""
    from leann_rs_spark.cli import _make_answerer, run_interactive

    script = iter([
        "", "/help", "/history",
        "what is a document?",
        "/history",
        "/bogus",
        "/clear", "/history",
        "tell me about events",
        "/quit",
        "never reached",
    ])
    out_lines = []
    hist = run_interactive(
        spark, chat_wh, "idx", top_k=3,
        input_fn=lambda prompt: next(script), out=out_lines.append,
    )
    text = "\n".join(out_lines)
    assert "Commands:" in text
    assert "(empty)" in text           # /history before any question
    assert "1. what is a document?" in text
    assert "Unknown command: /bogus" in text
    assert "Conversation history cleared." in text
    assert "Goodbye!" in text
    assert "never reached" not in text  # /quit stops reading
    # post-/clear history holds only the second question
    assert [q for q, _ in hist] == ["tell me about events"]
    # history is NOT fed into prompts: answer == stateless single-shot
    single = _make_answerer(spark, chat_wh, "idx", 3)("tell me about events")
    assert hist[0][1] == single


def test_interactive_chat_eof_exits(spark, chat_wh):
    from leann_rs_spark.cli import run_interactive

    def eof(prompt):
        raise EOFError

    out_lines = []
    hist = run_interactive(
        spark, chat_wh, "idx", input_fn=eof, out=out_lines.append
    )
    assert hist == []
    assert "Goodbye!" in "\n".join(out_lines)


def test_ask_without_question_errors(chat_wh, capsys):
    rc = main(["ask", "idx", "--warehouse", chat_wh])
    assert rc == 2
    assert "provide a question" in capsys.readouterr().err


def test_cli_curate(spark, tmp_path_factory, capsys):
    out_dir = str(tmp_path_factory.mktemp("curated") / "out")
    rc = main([
        "curate",
        "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out_dir,
        "--min-words", "20",
        "--min-stopword-hits", "1",
    ])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "kept" in msg
    curated = spark.read.parquet(out_dir)
    n = curated.count()
    assert 0 < n < 500
    assert "split" in curated.columns
    # survivors pass the quality gate and are near-dup canonical
    assert curated.filter("split not in ('train','val','test')").count() == 0


def test_cli_curate_with_span_cut(spark, tmp_path_factory, capsys):
    out_dir = str(tmp_path_factory.mktemp("curated2") / "out")
    rc = main([
        "curate",
        "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out_dir,
        "--min-words", "20",
        "--min-stopword-hits", "1",
        "--cut-dup-spans", "8",
    ])
    assert rc == 0
    curated = spark.read.parquet(out_dir)
    assert curated.count() > 0
    # span cutting can only shorten text, never lengthen
    import pyspark.sql.functions as F
    orig = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", F.length("text").alias("orig_len")
    )
    grown = curated.select("doc_id", F.length("text").alias("new_len")).join(
        orig, "doc_id"
    ).filter("new_len > orig_len")
    assert grown.count() == 0


def test_cli_build_with_registry_model(spark, tmp_path_factory, capsys):
    """`build --embedding-model e5-base` must resolve the registry's
    prompt prefixes end-to-end through the CLI wiring (the r3 gap:
    the flag previously resolved to nothing)."""
    import json as _json

    wh = str(tmp_path_factory.mktemp("cli_wh_reg"))
    rc = main([
        "build", "regidx", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
        "--embedding-model", "e5-base",
    ])
    assert rc == 0
    meta = _json.loads(open(f"{wh}/regidx/meta.json").read())
    assert meta["doc_prompt_template"] == "passage: "
    assert meta["query_prompt_template"] == "query: "
    assert meta["extra"]["model_config"]["model"] == "e5-base"
    # hash mode keeps its version pin
    assert meta["embedding_model"] == "hash-v2"


def test_cli_analyze_report(spark, capsys):
    rc = main(["analyze", "--input", f"{SF_SMOKE}/documents.parquet"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    n = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert rep["n_docs"] == n
    assert len(rep["chars_p50_p90_p99"]) == 3
    assert rep["chars_p50_p90_p99"] == sorted(rep["chars_p50_p90_p99"])
    assert 0.0 <= rep["gopher_keep_rate"] <= 1.0
    assert 0.0 <= rep["exact_dup_rate"] <= 1.0
    assert sum(rep["languages"].values()) == n
    assert len(rep["top_ngrams"]) == 10
    assert rep["total_tokens"] > 0


def test_cli_select_dsir(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("cli_sel") / "sel.parquet")
    rc = main([
        "select", "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out, "--target-where", "source = 'src1'",
        "-n", "10", "--buckets", "512",
    ])
    assert rc == 0
    assert "Selected 10/500" in capsys.readouterr().out
    sel = spark.read.parquet(out)
    assert sel.count() == 10
    assert "log_weight" in sel.columns and "text" in sel.columns


def test_cli_select_empty_target_errors(tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("cli_sel2") / "sel.parquet")
    rc = main([
        "select", "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out, "--target-where", "source = 'nope'",
        "-n", "5",
    ])
    assert rc == 1


def test_cli_analyze_empty_corpus(spark, tmp_path_factory, capsys):
    p = str(tmp_path_factory.mktemp("empty") / "e.parquet")
    spark.createDataFrame([], "doc_id bigint, text string").write.parquet(p)
    rc = main(["analyze", "--input", p])
    assert rc == 0
    assert json.loads(capsys.readouterr().out) == {"n_docs": 0}


def test_cli_analyze_null_text_rows(spark, tmp_path_factory, capsys):
    p = str(tmp_path_factory.mktemp("nulls") / "n.parquet")
    spark.createDataFrame(
        [(1, "real words here"), (2, None), (3, None)],
        "doc_id bigint, text string",
    ).write.parquet(p)
    rc = main(["analyze", "--input", p])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_docs"] == 3
    assert rep["total_tokens"] >= 0
    # the two null-text docs are duplicates of the empty document
    assert rep["exact_dup_rate"] == round(1 - 2 / 3, 4)


def test_cli_tune_recall_curves(spark, tmp_path_factory, capsys):
    wh = str(tmp_path_factory.mktemp("cli_tune_wh"))
    rc = main([
        "build", "tunex", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
        "--backend", "ivfpq", "--ivf-centroids", "4",
        "--pq-m", "4", "--pq-k", "8",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main(["tune", "tunex", "--warehouse", wh, "--queries", "5"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["backend"] == "ivfpq"
    # nprobe = C degrades to exact -> recall 1.0 closes the sweep
    assert rep["nprobe_recall"]["4"] == 1.0
    assert all(0.0 <= v <= 1.0 for v in rep["nprobe_recall"].values())
    assert set(rep["pq_refine_recall"]) == {"1", "2", "4", "8"}
    rs = [rep["pq_refine_recall"][k] for k in ["1", "2", "4", "8"]]
    assert rs == sorted(rs)  # refine recall is monotone


def test_cli_tune_requires_ivf(tmp_path_factory, capsys):
    wh = str(tmp_path_factory.mktemp("cli_tune_wh2"))
    rc = main([
        "build", "flat", "--warehouse", wh,
        "--docs", f"{SF_SMOKE}/documents.parquet",
        "--chunk-size", "32", "--chunk-overlap", "8", "--dims", "16",
    ])
    assert rc == 0
    capsys.readouterr()
    assert main(["tune", "flat", "--warehouse", wh]) == 1


def test_cli_mix_temperature(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("cli_mix") / "mix.parquet")
    rc = main([
        "mix", "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out, "--alpha", "0.3", "--target-n", "100",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "docs at alpha=0.3" in text
    kept = spark.read.parquet(out)
    n = kept.count()
    assert 40 <= n <= 180  # Bernoulli around the 100-doc target
    # subset of the input, schema preserved
    assert set(kept.columns) == set(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").columns
    )


def test_cli_blocks_concat_chunk(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("cli_blocks") / "blocks.parquet")
    rc = main([
        "blocks", "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out, "--block-size", "128",
    ])
    assert rc == 0
    assert "blocks of 128 tokens" in capsys.readouterr().out
    res = spark.read.parquet(out)
    n = res.count()
    assert n > 0
    # every block but one (the tail) is exactly full
    assert res.filter("n_tokens = 128").count() == n - 1


def test_cli_bpe_train_and_encode(spark, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("cli_bpe") / "enc.parquet")
    rc = main([
        "bpe", "--input", f"{SF_SMOKE}/documents.parquet",
        "--merges", "5", "--encode-to", out,
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    import json as _json
    merges = [_json.loads(x) for x in lines[:-1]]
    assert [m["step"] for m in merges] == [1, 2, 3, 4, 5]
    assert all(m["pair_freq"] >= 2 for m in merges)
    assert "Encoded 500 docs with 5 merges" in lines[-1]
    enc = spark.read.parquet(out)
    assert enc.count() == 500
    assert {"doc_id", "tokens", "n_tokens"} <= set(enc.columns)


def test_cli_sql_over_tables(spark, capsys):
    rc = main([
        "sql",
        "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
        "--tables", SF_SMOKE.rstrip("/"),
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "lang\tn"
    got = {l.split("\t")[0]: int(l.split("\t")[1]) for l in out[1:]}
    want = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_cli_sql_max_rows_cap(capsys):
    rc = main([
        "sql", "SELECT doc_id FROM documents ORDER BY doc_id",
        "--tables", SF_SMOKE.rstrip("/"), "--max-rows", "7",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 8  # header + 7 rows


def test_cli_clean_strips_html_and_normalizes(spark, tmp_path_factory, capsys):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("cli_clean")
    inp, outp = str(d / "in"), str(d / "out")
    spark.createDataFrame(
        [(1, "<p>Hello <b>world</b></p><script>x()</script>"),
         (2, "plain café text")],
        "doc_id long, text string",
    ).write.parquet(inp)
    rc = main(["clean", "--input", inp, "--output", outp,
               "--strip-html", "--nfc"])
    assert rc == 0
    rows = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(outp).collect()}
    assert rows[1] == "Hello world"
    assert rows[2] == "plain café text"  # NFC composed
    assert "html+nfc" in capsys.readouterr().out


def test_cli_drift(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_drift")
    inp = str(d / "in")
    spark.createDataFrame(
        [(1, "aa aa aa aa", "web"), (2, "aa bb bb cc", "books")],
        "doc_id long, text string, source string",
    ).write.parquet(inp)
    rc = main(["drift", "--input", inp])
    assert rc == 0
    out = capsys.readouterr().out
    assert "books" in out and "web" in out and "kl_vs_corpus" in out
    # web is all-'aa': KL = ln(8/5), printed at 6dp
    assert "0.470004" in out


def test_cli_msearch(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_msearch")
    inp = str(d / "in")
    spark.createDataFrame(
        [(1, "merge sort for big batches"), (2, "unrelated content here")],
        "doc_id long, text string",
    ).write.parquet(inp)
    rc = main(["msearch", "merge sort", "--input", inp, "--top-k", "2",
               "--dims", "32"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert lines[0].startswith(" 1. [1]")  # full term match ranks first
    assert "merge sort" in lines[0]


def test_cli_msearch_batch_over_persisted_index(spark, tmp_path_factory, capsys):
    """--build-index persists the token index; a second invocation
    serves a multi-query batch from it via --index (no rebuild)."""
    import os

    d = tmp_path_factory.mktemp("cli_msearch_idx")
    inp = str(d / "in")
    idx = str(d / "wh") + "/tok"
    spark.createDataFrame(
        [(1, "merge sort for big batches"), (2, "hash join probe side")],
        "doc_id long, text string",
    ).write.parquet(inp)
    rc = main(["msearch", "merge sort", "--input", inp, "--dims", "16",
               "--build-index", idx])
    assert rc == 0
    assert os.path.isdir(f"{idx}/token_index")
    capsys.readouterr()
    rc = main(["msearch", "merge sort", "hash probe", "--input", inp,
               "--top-k", "1", "--index", idx])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert lines[0].startswith("query [0]")
    assert "[1]" in lines[1]          # merge-sort doc tops query 0
    assert lines[2].startswith("query [1]")
    assert "[2]" in lines[3]          # hash-join doc tops query 1


def test_cli_msearch_routed_index_nprobe(spark, tmp_path_factory, capsys):
    """--build-index --centroids routes + cid-partitions the artifact;
    --nprobe serves the centroid-pruned batch from it. A covering
    nprobe must still find the right docs; --nprobe over an unrouted
    index is refused."""
    import os

    d = tmp_path_factory.mktemp("cli_msearch_routed")
    inp = str(d / "in")
    idx = str(d / "wh") + "/tok"
    spark.createDataFrame(
        [(1, "merge sort for big batches"), (2, "hash join probe side")],
        "doc_id long, text string",
    ).write.parquet(inp)
    rc = main(["msearch", "merge sort", "--input", inp, "--dims", "16",
               "--build-index", idx, "--centroids", "4"])
    assert rc == 0
    assert any(
        e.startswith("cid=") for e in os.listdir(f"{idx}/token_index")
    )
    capsys.readouterr()
    rc = main(["msearch", "merge sort", "hash probe", "--input", inp,
               "--top-k", "1", "--index", idx, "--nprobe", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert lines[0].startswith("query [0]") and "[1]" in lines[1]
    assert lines[2].startswith("query [1]") and "[2]" in lines[3]

    # unrouted index: --nprobe is an argument error, not a crash
    idx2 = str(d / "wh2") + "/tok"
    assert main(["msearch", "merge", "--input", inp, "--dims", "16",
                 "--build-index", idx2]) == 0
    capsys.readouterr()
    rc = main(["msearch", "merge sort", "--input", inp,
               "--index", idx2, "--nprobe", "2"])
    assert rc == 2


def test_cli_layout_zorder(spark, tmp_path_factory, capsys):
    """The layout command re-clusters a parquet table by the Morton
    key; row set is preserved and bad columns are refused."""
    d = tmp_path_factory.mktemp("cli_layout")
    inp, outp = str(d / "in"), str(d / "out")
    spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a int, b int"
    ).write.parquet(inp)
    rc = main(["layout", "--input", inp, "--output", outp,
               "--by", "a", "b", "--bits", "4", "--files", "4"])
    assert rc == 0
    assert "z-ordered 256 rows" in capsys.readouterr().out
    got = sorted(
        (r["a"], r["b"]) for r in spark.read.parquet(outp).collect()
    )
    assert got == [(a, b) for a in range(16) for b in range(16)]
    assert main(["layout", "--input", inp, "--output", outp,
                 "--by", "nope"]) == 2


def test_cli_stats(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_stats")
    inp = str(d / "in")
    spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 2.0)], "id long, v double"
    ).write.parquet(inp)
    rc = main(["stats", "--input", inp, "--cols", "id", "v"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "id: n=3 nulls=0 ndv=3" in out
    assert "v: n=2 nulls=1 ndv=1 min=2.0 max=2.0" in out
    assert main(["stats", "--input", inp, "--cols", "nope"]) == 2


def test_cli_sigs_build_append_query_compact(spark, tmp_path_factory, capsys):
    """End-to-end lifecycle of the persisted MinHash signature
    artifact through the CLI: build on half the corpus, append the
    rest, query an ingest batch against it, compact the layout —
    query results unchanged across compact."""
    import duckdb  # noqa: F401  (env sanity only)

    wh = str(tmp_path_factory.mktemp("cli_sigs_wh"))
    corpus = f"{SF_SMOKE}/documents.parquet"
    half = str(tmp_path_factory.mktemp("cli_sigs_in") / "half.parquet")
    rest = half.replace("half", "rest")
    batch = half.replace("half", "batch")
    docs = spark.read.parquet(corpus)
    docs.filter("doc_id % 2 = 0").write.parquet(half)
    docs.filter("doc_id % 2 = 1").write.parquet(rest)
    # ingest batch: two planted near-dups of corpus docs, fresh ids
    from pyspark.sql import functions as F

    docs.filter("doc_id < 2").select(
        (F.col("doc_id") + 90000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    ).write.parquet(batch)

    assert main(["sigs", "s", "--warehouse", wh, "--input", half]) == 0
    assert main(
        ["sigs", "s", "--warehouse", wh, "--input", rest, "--append"]
    ) == 0
    capsys.readouterr()
    assert main(
        ["sigs", "s", "--warehouse", wh, "--query", batch,
         "--corpus", corpus, "--threshold", "0.5"]
    ) == 0
    before = capsys.readouterr().out.strip().splitlines()
    assert before  # the planted dups must surface

    assert main(["compact", "s", "--warehouse", wh, "--what", "sigs"]) == 0
    capsys.readouterr()
    assert main(
        ["sigs", "s", "--warehouse", wh, "--query", batch,
         "--corpus", corpus, "--threshold", "0.5"]
    ) == 0
    after = capsys.readouterr().out.strip().splitlines()
    assert after == before

    # bad invocations fail cleanly
    assert main(["sigs", "s", "--warehouse", wh, "--query", batch]) == 2
    assert main(["sigs", "s", "--warehouse", wh]) == 2


def test_cli_tune_li_probe_curve(spark, tmp_path_factory, capsys):
    """`tune --li-query`: the PLAID knob-picking flow over a persisted
    centroid-routed token index — geometric nprobe sweep up to C, each
    point reporting candidates + recall vs exact; the covering point
    (nprobe = C) must be recall 1.0 by construction."""
    wh = str(tmp_path_factory.mktemp("cli_tuneli_wh"))
    rc = main([
        "msearch", "external merge sort", "--input",
        f"{SF_SMOKE}/documents.parquet", "--dims", "16",
        "--build-index", f"{wh}/tok", "--centroids", "4", "--top-k", "3",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "tune", "tok", "--warehouse", wh,
        "--li-query", "external merge sort",
        "--li-query", "window aggregate", "--top-k", "3",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["backend"] == "token" and report["n_centroids"] == 4
    curve = report["probe_curve"]
    assert set(curve) == {"1", "2", "4"}
    assert curve["4"]["recall"] == 1.0  # covering probe ≡ exact
    assert curve["1"]["n_candidates"] <= curve["4"]["n_candidates"]

    # an unrouted token index refuses clearly
    rc = main([
        "msearch", "anything", "--input", f"{SF_SMOKE}/documents.parquet",
        "--dims", "16", "--build-index", f"{wh}/flat",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main(["tune", "flat", "--warehouse", wh, "--li-query", "anything"])
    assert rc == 1


def test_cli_curate_sigs_served_matches_inline(spark, tmp_path_factory, capsys):
    """`curate --sigs-warehouse`: the MinHash stage served from the
    persisted signature artifact produces the SAME curated output as
    the inline run (fixed derived-hash family ⇒ bit-identical)."""
    wh = str(tmp_path_factory.mktemp("curate_sigs_wh"))
    corpus = f"{SF_SMOKE}/documents.parquet"
    assert main(["sigs", "s", "--warehouse", wh, "--input", corpus]) == 0

    out_inline = str(tmp_path_factory.mktemp("cur_inline") / "out")
    out_sigs = str(tmp_path_factory.mktemp("cur_sigs") / "out")
    base = ["curate", "--input", corpus,
            "--min-words", "20", "--min-stopword-hits", "1"]
    assert main(base + ["--output", out_inline]) == 0
    assert main(base + ["--output", out_sigs,
                        "--sigs-warehouse", wh, "--sigs-name", "s"]) == 0
    key = lambda p: sorted(
        (r["doc_id"], r["split"]) for r in spark.read.parquet(p).collect()
    )
    assert key(out_sigs) == key(out_inline)


def test_cli_sigs_bands_config_validated(spark, tmp_path_factory, capsys):
    """ADVICE r8: banding config is persisted and validated — a build
    with num-hashes not divisible by bands is rejected, a query whose
    bands don't divide the artifact's num_hashes is rejected, and a
    non-default recorded bands value is honored on the query path."""
    wh = str(tmp_path_factory.mktemp("sigs_bands_wh"))
    corpus = f"{SF_SMOKE}/documents.parquet"
    # build rejects non-tiling config (18 % 4 != 0)
    assert main(["sigs", "s", "--warehouse", wh, "--input", corpus,
                 "--num-hashes", "18"]) != 0
    # build with an explicit tiling config records bands in meta
    assert main(["sigs", "s", "--warehouse", wh, "--input", corpus,
                 "--num-hashes", "18", "--bands", "6"]) == 0
    from leann_rs_spark.catalog import load_minhash_index

    _, info = load_minhash_index(spark, wh, "s")
    assert info["bands"] == 6 and info["num_hashes"] == 18
    # query: recorded bands=6 is used (runs clean); --bands 4 rejected
    from pyspark.sql import functions as F

    batch = str(tmp_path_factory.mktemp("sigs_bands_in") / "batch.parquet")
    spark.read.parquet(corpus).filter("doc_id < 2").select(
        (F.col("doc_id") + 91000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    ).write.parquet(batch)
    assert main(["sigs", "s", "--warehouse", wh, "--query", batch,
                 "--corpus", corpus]) == 0
    assert main(["sigs", "s", "--warehouse", wh, "--query", batch,
                 "--corpus", corpus, "--bands", "4"]) == 2


def test_cli_curate_max_bucket_matches_default_on_small_corpus(
    spark, tmp_path_factory, capsys
):
    """--minhash-max-bucket with a cap above every real bucket size is
    a pure no-op on the curated output."""
    corpus = f"{SF_SMOKE}/documents.parquet"
    out_a = str(tmp_path_factory.mktemp("cur_nocap") / "out")
    out_b = str(tmp_path_factory.mktemp("cur_cap") / "out")
    base = ["curate", "--input", corpus,
            "--min-words", "20", "--min-stopword-hits", "1"]
    assert main(base + ["--output", out_a]) == 0
    assert main(base + ["--output", out_b, "--minhash-max-bucket", "64"]) == 0
    key = lambda p: sorted(
        (r["doc_id"], r["split"]) for r in spark.read.parquet(p).collect()
    )
    assert key(out_b) == key(out_a)
