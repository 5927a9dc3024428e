import re

from distributed_computing_projects_spark.operators import grep, grep_count, tail_n
from distributed_computing_projects_spark.sources import load_table, read_lines


def test_grep_matches_python_re(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pat = r"key.*join"
    got = {r["doc_id"] for r in grep(docs, pat, text_col="text",
                                     provenance_cols=["doc_id"]).collect()}
    want = {
        r["doc_id"]
        for r in docs.select("doc_id", "text").collect()
        if re.search(pat, r["text"])
    }
    assert got == want and got


def test_grep_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert grep_count(docs, r"spark", text_col="text") == docs.filter(
        docs.text.rlike("spark")
    ).count()


def test_tail_n(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    rows = tail_n(docs.select("doc_id"), 5, "doc_id").collect()
    assert [r["doc_id"] for r in rows] == list(range(n_total - 5, n_total))


def test_read_lines_provenance(spark, tmp_path):
    p1 = tmp_path / "m1.log"
    p2 = tmp_path / "m2.log"
    p1.write_text("alpha\nbeta\ngamma\n")
    p2.write_text("delta\nbeta\n")
    df = read_lines(spark, str(tmp_path))
    rows = {(r["machine"], r["line_no"]): r["line"] for r in df.collect()}
    assert rows[("m1.log", 0)] == "alpha"
    assert rows[("m1.log", 2)] == "gamma"
    assert rows[("m2.log", 1)] == "beta"
    assert len(rows) == 5


def test_grep_reads_gzip_logs_transparently(spark, tmp_path):
    """Compressed landing zones come free with the text datasource:
    the same read_lines + grep path works on .gz files (one whole-file
    split per gzip member — fine for log-sized files; a 100 TB zone
    would use a splittable codec, same code)."""
    import gzip
    import shutil

    src = "fixtures/logs/machine.1.log"
    gz = tmp_path / "machine.1.log.gz"
    with open(src, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)

    from distributed_computing_projects_spark.operators.grep import grep
    from distributed_computing_projects_spark.sources.text import read_lines

    plain = grep(read_lines(spark, src), "GET", text_col="line",
                 provenance_cols=["line_no"]).select("line_no", "line")
    gzed = grep(read_lines(spark, str(tmp_path)), "GET", text_col="line",
                provenance_cols=["line_no"]).select("line_no", "line")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, gzed.collect()))
    assert plain.count() > 0
