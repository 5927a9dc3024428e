"""CLI surface (reference main.go command parity): dispatch + output
format, driven through main(argv, spark=...) so the suite's session is
reused — no subprocess JVM startups."""

from __future__ import annotations

import os

import pytest

from distributed_computing_projects_spark.cli import main

LOGS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures", "logs")


_FNS_SRC = '''
def tokenize_for_cli(line):
    return [(w, "1") for w in line.split()]


def sum_for_cli(key, values):
    return sum(int(v) for v in values)
'''


def test_grep_prints_provenance_lines(spark, capsys):
    rc = main(["grep", "GET", LOGS_DIR], spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) > 0
    machine, line_no, rest = out[0].split(":", 2)
    assert machine.endswith(".log") and line_no.isdigit()


def test_grep_count_matches_line_count(spark, capsys):
    main(["grep", "GET", LOGS_DIR], spark=spark)
    n_lines = len(capsys.readouterr().out.strip().splitlines())
    main(["grep", "--count", "GET", LOGS_DIR], spark=spark)
    assert int(capsys.readouterr().out.strip()) == n_lines


def test_catalog_roundtrip(spark, sf_dir, tmp_path, capsys):
    root = str(tmp_path / "cat")
    src = f"{sf_dir}/nation.parquet"
    assert main(["--root", root, "put", src, "nation"], spark=spark) == 0
    main(["--root", root, "store"], spark=spark)
    assert capsys.readouterr().out.strip() == "nation"
    main(["--root", root, "ls", "nation"], spark=spark)
    assert len(capsys.readouterr().out.strip().splitlines()) >= 1
    out_dir = str(tmp_path / "out.parquet")
    assert main(["--root", root, "get", "nation", out_dir], spark=spark) == 0
    # get re-encodes (new files, same rows): assert full row equality,
    # not just cardinality
    got = spark.read.parquet(out_dir)
    orig = spark.read.parquet(src)
    assert got.count() == 25
    assert got.exceptAll(orig).isEmpty() and orig.exceptAll(got).isEmpty()
    assert main(["--root", root, "delete", "nation"], spark=spark) == 0
    main(["--root", root, "store"], spark=spark)
    assert capsys.readouterr().out.strip() == ""


def test_maple_juice_pipeline_via_cli(spark, sf_dir, tmp_path, capsys):
    """maple over a tiny text file -> parquet -> juice sums per key.
    The UDF module is shipped like a real CLI user would (--py-files ≅
    addPyFile) so executors can import it — a module-level function in
    tests/ pickles by reference and fails on workers."""
    import sys

    mod = tmp_path / "cli_udfs.py"
    mod.write_text(_FNS_SRC)
    sys.path.insert(0, str(tmp_path))
    spark.sparkContext.addPyFile(str(mod))
    try:
        txt_dir = tmp_path / "txt"
        txt_dir.mkdir()
        (txt_dir / "a.txt").write_text("x y x\nz x\n")
        assert main(
            ["maple", "cli_udfs:tokenize_for_cli", str(txt_dir)], spark=spark
        ) == 0
        kv_lines = [l.split("\t") for l in
                    capsys.readouterr().out.strip().splitlines()]
        assert sorted(kv_lines) == [["x", "1"], ["x", "1"], ["x", "1"],
                                    ["y", "1"], ["z", "1"]]
        kv_path = str(tmp_path / "kv.parquet")
        spark.createDataFrame([(k, v) for k, v in kv_lines],
                              "key string, value string").write.parquet(kv_path)
        assert main([
            "juice", "cli_udfs:sum_for_cli", kv_path
        ], spark=spark) == 0
        out = dict(l.split("\t") for l in
                   capsys.readouterr().out.strip().splitlines())
        assert out == {"x": "3", "y": "1", "z": "1"}
    finally:
        sys.path.remove(str(tmp_path))


def test_query_list_and_run(spark, sf_dir, capsys):
    assert main(["query"], spark=spark) == 0
    listing = capsys.readouterr().out
    assert "wordcount\toracle" in listing
    assert main(["query", "grep_count", "--sf-dir", sf_dir], spark=spark) == 0
    assert capsys.readouterr().out.strip().isdigit()


def test_query_unknown_name_exits(spark):
    with pytest.raises(SystemExit):
        main(["query", "no_such_query"], spark=spark)


def test_query_explain_prints_plan(spark, sf_dir, capsys):
    assert main(["query", "q1_pricing_summary", "--sf-dir", sf_dir,
                 "--explain"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out or "HashAggregate" in out
    assert "PushedFilters" in out


def test_cli_bandstore_write_probe_append(spark, sf_dir, tmp_path, capsys):
    """End-to-end ingest workflow through the CLI: write corpus store,
    probe a duplicate batch, append, probe the next epoch."""
    from distributed_computing_projects_spark.cli import main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_p = str(tmp_path / "corpus.parquet")
    batch_p = str(tmp_path / "batch.parquet")
    docs.filter("source <> 'src0'").select("doc_id", "text") \
        .write.parquet(corpus_p)
    docs.filter("source = 'src0'").select("doc_id", "text") \
        .write.parquet(batch_p)
    store = str(tmp_path / "store")

    assert main(["bandstore-write", corpus_p, store], spark=spark) == 0
    assert main(["bandstore-probe", store, batch_p, "--threshold", "0.25",
                 "--append"], spark=spark) == 0
    out1 = capsys.readouterr().out.strip().splitlines()
    # pairs match the batch operator directly
    from distributed_computing_projects_spark.operators import dedup as D

    direct = D.lsh_incremental_pairs(
        spark.read.parquet(batch_p), spark.read.parquet(corpus_p),
        "doc_id", "text", threshold=0.25,
    ).count()
    assert len(out1) == direct
    # after --append, probing the SAME batch again must now self-hit
    assert main(["bandstore-probe", store, batch_p, "--threshold", "0.99"],
                spark=spark) == 0
    out2 = capsys.readouterr().out.strip().splitlines()
    n_batch = spark.read.parquet(batch_p).count()
    assert len(out2) >= n_batch  # every appended doc collides with itself


def test_verify_subcommand_runs_registry_subset(spark, sf_dir, capsys):
    """`verify` = the driver's CORRECTNESS gate as one local command:
    a 5-query subset against DuckDB. Since round 10 every registry
    query carries a value oracle (streaming_user_running_totals was
    the last rows-only row — its final state now checks against the
    batch-aggregate SQL), so all five rows must be hash-checked."""
    names = ["q1_pricing_summary", "wordcount", "dedup_exact",
             "multimodal_jpeg_coeffs", "streaming_user_running_totals"]
    rc = main(["verify", "--sf-dir", sf_dir, *names], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "ALL OK" in out
    assert "rows-only, no oracle" not in out  # zero oracle-less rows left
    for n in names:
        assert n in out


def test_registry_has_no_oracleless_queries():
    """The correctness gate's strongest form: EVERY registry query is
    value-checked against SQL — zero rows-only entries (the weaker
    rows-only path still exists in verify.run for ad-hoc specs, but
    no shipped query uses it)."""
    from distributed_computing_projects_spark.queries import load_registry

    assert [n for n, s in load_registry().items() if s.oracle is None] == []


def test_verify_subcommand_unknown_query_errors(spark):
    with pytest.raises(SystemExit):
        main(["verify", "no_such_query"], spark=spark)


def test_bandstore_compact_subcommand(spark, tmp_path, capsys):
    from pyspark.sql import Row

    corpus_p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(doc_id=i, text=f"some words here number {i} extra tail")
         for i in range(20)]
    ).write.parquet(corpus_p)
    store = str(tmp_path / "store")
    assert main(["bandstore-write", corpus_p, store], spark=spark) == 0
    # double-append to create duplicate rows, then compact
    assert main(["bandstore-probe", store, corpus_p, "--append"],
                spark=spark) == 0
    capsys.readouterr()
    assert main(["bandstore-compact", store], spark=spark) == 0
    before, after = map(int, capsys.readouterr().out.strip().split("\t"))
    assert before > after > 0


def test_store_recover_subcommand(spark, tmp_path, capsys):
    import os

    from pyspark.sql import Row

    corpus_p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(doc_id=i, text=f"some words here number {i} extra tail")
         for i in range(5)]
    ).write.parquet(corpus_p)
    store = str(tmp_path / "store")
    assert main(["bandstore-write", corpus_p, store], spark=spark) == 0
    # simulate a crash between commit_swap's renames: live path gone,
    # verified rewrite (it has a sidecar) parked at __compact__
    os.rename(store, store + ".__compact__")
    capsys.readouterr()
    assert main(["store-recover", store], spark=spark) == 0
    assert capsys.readouterr().out.strip() == "completed"
    assert main(["bandstore-probe", store, corpus_p], spark=spark) == 0
    capsys.readouterr()
    assert main(["store-recover", store], spark=spark) == 0
    assert capsys.readouterr().out.strip() == "noop"


def test_ivfpq_subcommands(spark, tmp_path, capsys):
    corpus_p = str(tmp_path / "emb")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding").write.parquet(corpus_p)
    store = str(tmp_path / "store")
    assert main(["ivfpq-write", corpus_p, store], spark=spark) == 0
    q = ",".join(["0.1"] * 64)
    capsys.readouterr()
    assert main(["ivfpq-probe", store, q, "--k", "5",
                 "--append", corpus_p], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5  # k rows of (id, adc_dist)
    # the append doubled every row; compact reclaims it
    capsys.readouterr()
    assert main(["ivfpq-compact", store], spark=spark) == 0
    before, after = map(int, capsys.readouterr().out.strip().split("\t"))
    assert before == 2 * after > 0


def test_bpe_subcommands(spark, tmp_path, capsys):
    import pandas as pd

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the theme there the", "other brother the"],
    })).write.parquet(corpus)

    merges = str(tmp_path / "merges")
    rc = main(["bpe-train", corpus, "--n-merges", "3",
               "--out", merges], spark=spark)
    assert rc == 0
    lines = [ln.split("\t") for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert [ln[0] for ln in lines] == ["0", "1", "2"]
    assert lines[0][1:3] == ["h", "e"]  # 'he' is the top pair

    rc = main(["bpe-encode", corpus, merges], spark=spark)
    assert rc == 0
    enc = [ln.split("\t") for ln in
           capsys.readouterr().out.strip().splitlines()]
    assert [ln[0] for ln in enc] == ["1", "2"]
    assert all(int(ln[2]) >= int(ln[1]) for ln in enc)


def test_classifier_train_score_roundtrip(spark, sf_dir, tmp_path, capsys):
    """classifier-train --out persists the full weight table;
    classifier-score applies it to a corpus and every doc gets a
    (id, score, pred) row with an integer score."""
    wpath = str(tmp_path / "weights")
    assert main(["classifier-train", f"{sf_dir}/documents.parquet",
                 "--out", wpath], spark=spark) == 0
    head = capsys.readouterr().out.strip().splitlines()
    # first line: the calibrated threshold persisted in the sidecar;
    # then the top-weight rows
    assert head[0].startswith("threshold\t")
    t = int(head[0].split("\t")[1])
    from distributed_computing_projects_spark.operators import (
        quality_classifier as qc,
    )

    assert qc.load_threshold(wpath) == t
    assert head[1:] and all(len(l.split("\t")) == 4 for l in head[1:])
    assert main(["classifier-score", f"{sf_dir}/documents.parquet",
                 wpath], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs
    for line in out:
        _id, score, pred = line.split("\t")
        int(score)  # exact BIGINT, never a float repr
        # pred honors the sidecar threshold, not the raw >0 cut
        assert pred == str(int(int(score) > t))


def test_kmv_subcommand_prints_group_sketches(spark, sf_dir, capsys):
    assert main(["kmv", f"{sf_dir}/documents.parquet"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    langs = {r["lang"] for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet").select("lang").distinct().collect()}
    assert len(out) == len(langs)
    for line in out:
        grp, n_kept, kth, est = line.split("\t")
        assert int(n_kept) <= 256
        float(est)


def test_zorder_write_subcommand(spark, sf_dir, tmp_path, capsys):
    out_p = str(tmp_path / "zli")
    li = f"{sf_dir}/lineitem.parquet"
    # two bounded non-negative int columns derived on the fly are not
    # CLI-expressible; cluster on the raw keys instead (both ints)
    assert main(["zorder-write", li, out_p, "l_partkey", "l_suppkey",
                 "--files", "4"], spark=spark) == 0
    n = int(capsys.readouterr().out.strip().splitlines()[-1])
    assert n == spark.read.parquet(li).count()
    assert "zkey" in spark.read.parquet(out_p).columns


def test_lm_score_subcommand(spark, sf_dir, capsys):
    docs = f"{sf_dir}/documents.parquet"
    assert main(["lm-score", docs], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == spark.read.parquet(docs).count()
    first = lines[0].split("\t")
    assert len(first) == 6  # id, 4 tier counts, avg_lp
    assert int(first[1]) == sum(int(x) for x in first[2:5])


def test_semdedup_subcommand_sized_quantizer(spark, sf_dir, capsys):
    emb = f"{sf_dir}/embeddings.parquet"
    assert main(["semdedup", emb, "--cells", "32"], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == spark.read.parquet(emb).count()
    cells = {int(l.split("\t")[1]) for l in lines}
    assert max(cells) >= 16  # the sized quantizer actually has >16 cells
    assert {l.split("\t")[2] for l in lines} <= {"True", "False"}


def test_pagerank_subcommand(spark, sf_dir, capsys):
    ev = f"{sf_dir}/events.parquet"
    assert main(["pagerank", ev, "--iters", "2"], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) > 100
    ranks = [int(l.split("\t")[2]) for l in lines]
    assert all(r > 0 for r in ranks)


def test_bloom_build_probe_subcommands(spark, sf_dir, tmp_path, capsys):
    docs = f"{sf_dir}/documents.parquet"
    store = str(tmp_path / "bloomstore")
    assert main(["bloom-build", docs, store], spark=spark) == 0
    n_words = int(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < n_words <= 1024  # fixed-size filter
    assert main(["bloom-probe", docs, store], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) > 0
    # the corpus probed against its own filter: every gram hits
    for l in lines:
        _, n_grams, n_hits = l.split("\t")
        assert n_grams == n_hits


def test_gopher_subcommand(spark, sf_dir, capsys):
    docs = f"{sf_dir}/documents.parquet"
    assert main(["gopher", docs], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == spark.read.parquet(docs).count()
    flags = {l.split("\t")[-1] for l in lines}
    assert flags <= {"True", "False"}
    assert main(["gopher", docs, "--dropped-only"], spark=spark) == 0
    dropped = capsys.readouterr().out.strip().splitlines()
    assert 0 < len(dropped) < len(lines)
    assert all(l.split("\t")[-1] == "False" for l in dropped)


def test_line_dedup_subcommand(spark, sf_dir, capsys):
    docs = f"{sf_dir}/documents.parquet"
    assert main(["line-dedup", docs], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == spark.read.parquet(docs).count()
    for l in lines[:5]:
        parts = l.split("\t")
        assert int(parts[2]) <= int(parts[1])  # n_kept <= n_lines


def test_warc_extract_subcommand(spark, sf_dir, tmp_path, capsys):
    import gzip

    from pyspark.sql import Row

    from distributed_computing_projects_spark.sources import warc as W

    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: fixture\r\n")
    resp = W.build_response_record("https://x.example.com/1", b"hi" * 30)
    gz = (gzip.compress(info, mtime=0) + gzip.compress(resp, mtime=0))
    path = str(tmp_path / "payloads")
    spark.createDataFrame([
        Row(id=1, payload=bytearray(info + resp)),   # plain WARC
        Row(id=2, payload=bytearray(gz)),            # .warc.gz
        Row(id=3, payload=bytearray(b"not a warc")),
    ]).write.parquet(path)
    assert main(["warc-extract", path], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2  # ids 1 and 2; id 3 dropped
    assert all("https://x.example.com/1" in l for l in lines)


def test_pdf_and_wiki_extract_subcommands(spark, tmp_path, capsys):
    from pyspark.sql import Row

    from distributed_computing_projects_spark.sources import (
        pdf as P,
        wikidump as WD,
    )

    pdfs = str(tmp_path / "pdfs")
    spark.createDataFrame([
        Row(id=1, payload=bytearray(P.build_pdf(bytes(range(33, 97)),
                                                flate=True))),
        Row(id=2, payload=bytearray(b"not a pdf")),
    ]).write.parquet(pdfs)
    assert main(["pdf-extract", pdfs], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1 and lines[0].startswith("1\t2\t2\t5\t64\t")

    wikis = str(tmp_path / "wikis")
    dump = WD.build_dump([(0, "Doc 0", 0, "article"),
                          (1, "Talk:Doc 0", 1, "talk")])
    spark.createDataFrame([
        Row(id=1, payload=bytearray(dump)),
    ]).write.parquet(wikis)
    assert main(["wiki-extract", wikis], spark=spark) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 2
    assert main(["wiki-extract", wikis, "--articles-only"],
                spark=spark) == 0
    arts = capsys.readouterr().out.strip().splitlines()
    assert len(arts) == 1 and "Doc 0" in arts[0]


def test_pdf_object_model_wet_and_wikitext_subcommands(
        spark, tmp_path, capsys):
    import gzip

    from pyspark.sql import Row

    from distributed_computing_projects_spark.sources import (
        pdfobj as PO,
        warc as W,
    )

    raw = bytes(range(33, 97))
    pdfs = str(tmp_path / "pdfs15")
    spark.createDataFrame([
        Row(id=1, payload=bytearray(PO.build_pdf_objstm(raw, True))),
        Row(id=2, payload=bytearray(PO.build_pdf_tounicode(raw, True))),
        Row(id=3, payload=bytearray(b"not a pdf")),
    ]).write.parquet(pdfs)
    assert main(["pdf-extract", pdfs, "--object-model"], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    # id 1: 1 page, 1 objstm, 6 compressed objs, predictor 12
    assert lines[0].startswith("1\t1\t1\t6\t12\t")
    # id 2: classic xref (0 objstm), 2 fonts, 4 hex strings
    assert lines[1].startswith("2\t1\t0\t0\t1\t2\t4\t4\t")

    wets = str(tmp_path / "wets")
    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: fixture\r\n")
    conv = W.build_conversion_record("https://x.example.com/1", b"hi" * 8)
    spark.createDataFrame([
        Row(id=1, payload=bytearray(
            gzip.compress(info, mtime=0) + gzip.compress(conv, mtime=0))),
        Row(id=2, payload=bytearray(b"junk")),
    ]).write.parquet(wets)
    assert main(["wet-extract", wets], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1 and "https://x.example.com/1" in lines[0]

    corpus = str(tmp_path / "wikicorpus")
    spark.createDataFrame([
        Row(doc_id=1, text="'''Bold''' {{tmpl}} [[A|label]] rest"),
    ]).write.parquet(corpus)
    assert main(["wikitext-strip", corpus], spark=spark) == 0
    out = capsys.readouterr().out.strip()
    assert out == "1\tBold label rest"


def test_cli_jsonl_scan_compressed(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.functions import zstdlib as Z

    if not Z.available():
        import pytest

        pytest.skip("libzstd missing")
    (tmp_path / "d.jsonl.zst").write_bytes(
        Z.compress(b'{"a": 3, "b": "x"}\nBAD\n{"a": 1, "b": "y"}\n'))
    assert main(["jsonl-scan", str(tmp_path / "d.jsonl.zst"),
                 "a bigint, b string"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert sorted(out) == ["1\ty", "3\tx"]


def test_cli_avro_scan_with_inference(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.sources import avro as AV

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    (tmp_path / "p.avro").write_bytes(AV.write_ocf(
        [{"a": 5, "b": "q"}, {"a": 6, "b": "r"}], schema,
        codec="deflate"))
    assert main(["avro-scan", str(tmp_path)], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert sorted(out) == ["5\tq", "6\tr"]


def test_cli_wds_and_zip_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.sources import (
        webdataset as WDS,
        ziparchive as ZA,
    )

    (tmp_path / "s.tar").write_bytes(WDS.build_shard(
        [("k1", {"txt": b"abc", "cls": b"7"})]))
    assert main(["wds-scan", str(tmp_path / "s.tar")],
                spark=spark) == 0
    assert capsys.readouterr().out.strip() == "k1\tcls,txt\t4"
    (tmp_path / "a.zip").write_bytes(ZA.build_zip(
        [("x.txt", b"hello")]))
    assert main(["zip-scan", str(tmp_path / "a.zip")],
                spark=spark) == 0
    assert capsys.readouterr().out.strip() == "x.txt\t5"


def test_cli_docx_epub_text_and_wat_links(spark, tmp_path, capsys):
    import gzip

    from distributed_computing_projects_spark.sources import (
        docx as DX,
        epub as EP,
        wat as WAT,
    )

    (tmp_path / "a.docx").write_bytes(DX.build_docx(["hello", "world"]))
    assert main(["docx-text", str(tmp_path / "a.docx")],
                spark=spark) == 0
    assert capsys.readouterr().out.strip().endswith("hello\\nworld")

    (tmp_path / "b.epub").write_bytes(EP.build_epub([["ch one"],
                                                     ["ch two"]]))
    assert main(["epub-text", str(tmp_path / "b.epub")],
                spark=spark) == 0
    assert capsys.readouterr().out.strip().endswith("ch one\\nch two")

    url = "https://corpus.example.com/doc/3"
    rec = WAT.build_metadata_record(
        url, WAT.build_envelope(
            url, ["https://corpus.example.com/doc/8"], "t"))
    (tmp_path / "c.wat.gz").write_bytes(gzip.compress(rec, mtime=0))
    assert main(["wat-links", str(tmp_path / "c.wat.gz")],
                spark=spark) == 0
    assert capsys.readouterr().out.strip() == "3\t8\tA@/href"


def test_cli_arrow_scan_infers_schema(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.sources import (
        arrowipc as AI,
    )

    (tmp_path / "t.arrow").write_bytes(AI.build_ipc(
        {"a": [1, 2], "b": ["x", "y"]}, "file"))
    assert main(["arrow-scan", str(tmp_path / "t.arrow")],
                spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert sorted(out) == ["1\tx", "2\ty"]


def test_cli_odt_text(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.sources import odt as OD

    (tmp_path / "d.odt").write_bytes(OD.build_odt(["alpha", "beta"]))
    assert main(["odt-text", str(tmp_path / "d.odt")],
                spark=spark) == 0
    assert capsys.readouterr().out.strip().endswith("alpha\\nbeta")


def test_cli_xlsx_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.sources import xlsx as XS

    (tmp_path / "t.xlsx").write_bytes(XS.build_xlsx(
        ["a", "b"], [[1, "x"], [2, "y"]]))
    assert main(["xlsx-scan", str(tmp_path / "t.xlsx"),
                 "--ddl", "a bigint, b string"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert sorted(out) == ["1\tx", "2\ty"]


def test_cli_mbox_extract(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.sources import mbox as MBX

    msg = MBX.build_email("<5@corpus.example.com>", "Doc 5",
                          "a@example.com", "hello body")
    (tmp_path / "m.mbox").write_bytes(MBX.build_mbox([msg]))
    assert main(["mbox-extract", str(tmp_path / "m.mbox")],
                spark=spark) == 0
    out = capsys.readouterr().out.strip()
    assert out == "5\tDoc 5\ta@example.com\thello body\\n"
