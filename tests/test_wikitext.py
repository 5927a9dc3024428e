"""Wikitext -> plain text: per-rule markup matrix, dual-dialect
agreement (Java regex vs RE2 on the exact emitted patterns), and the
end-to-end dump -> extract -> strip path (functions/wikitext.py,
sources/wikidump.py)."""

from __future__ import annotations

import duckdb
import pytest

from distributed_computing_projects_spark.functions import wikitext as WT
from distributed_computing_projects_spark.sources import wikidump as WD


def strip_duck(src: str) -> str:
    q = f"SELECT {WT.strip_wikitext(WT.sql_literal(src, 'duck'), 'duck')}"
    return duckdb.sql(q).fetchone()[0]


MATRIX = [
    # (rule, wikitext, expected plain text)
    ("template", "a {{cite web|url=x}} b", "a b"),
    ("template-nested-depth3",
     "a {{one|{{two|{{three}}}}}} b", "a b"),
    ("template-multiline", "a {{box\n|k=v\n}} b", "a b"),
    ("ref", 'x<ref name="n">Some cite</ref> y', "x y"),
    ("ref-selfclosing", "x<ref name=a/> y", "x y"),
    ("comment", "x<!-- hidden\nnote --> y", "x y"),
    ("tag", "x<br/><div class=a>y</div>", "x y"),
    ("piped-link", "see [[Article Name|the label]].", "see the label."),
    ("plain-link", "see [[Article Name]].", "see Article Name."),
    ("category", "tail[[Category:Things]] end", "tail end"),
    ("file", "a [[File:pic.png|thumb|cap]] b", "a b"),
    ("ext-labeled", "go [http://e.com/p?q=1 here] now", "go here now"),
    ("ext-bare", "go [http://e.com/p] now", "go now"),
    ("bold-italic", "'''b''' and ''i'' mix '''''bi'''''", "b and i mix bi"),
    ("heading", "== Head ==\nbody", "Head body"),
    ("heading-deep", "  ==== H4 ====  \nbody", "H4 body"),
    ("list", "* one\n# two\n:; three", "one two three"),
    ("entities", "Tom &amp; Jerry &lt;3&nbsp;&quot;q&quot;",
     'Tom & Jerry <3 "q"'),
    ("table", "pre\n{| class=\"wikitable\"\n|-\n! h\n|-\n| c\n|}\npost",
     "pre post"),
    ("ws-collapse", "a\n\n\n  b\t\tc", "a b c"),
]


@pytest.mark.parametrize("rule,src,expected",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_rule_matrix_duck(rule, src, expected):
    assert strip_duck(src) == expected


def test_rule_matrix_spark_agrees(spark):
    """Every matrix row through the SPARK dialect chain — Java regex
    must produce byte-identical output to RE2."""
    rows = spark.createDataFrame(
        [(i, m[1]) for i, m in enumerate(MATRIX)], "i int, w string"
    ).selectExpr("i", WT.strip_wikitext("w", "spark") + " AS x").collect()
    got = {r["i"]: r["x"] for r in rows}
    for i, (rule, _, expected) in enumerate(MATRIX):
        assert got[i] == expected, rule


def test_template_depth_bound_is_symmetric():
    """Depth > TEMPLATE_DEPTH leaves residue — but the SAME residue in
    both dialects (the oracle contract), never an engine split."""
    src = "a {{1|{{2|{{3|{{4}}}}}}}} b"
    out = strip_duck(src)
    assert out != "a b"  # depth 4 exceeds the bound, residue remains


def test_text_with_markup_chars_survives():
    """Doc text containing stray markup characters (unbalanced braces,
    pipes, apostrophes) must not error — output is whatever the rules
    say, identically in both engines (checked by the query's oracle);
    here: no exception and whitespace discipline holds."""
    out = strip_duck("weird { text | with }} strays '' here")
    assert "  " not in out and out == out.strip()


def test_end_to_end_dump_strip(spark):
    """documents -> wikitext wrap -> bz2 dump -> extract_page_text ->
    strip chain recovers the doc text embedded in the markup."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma & <delta>")], "doc_id long, text string"
    )
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("== T ==\n'''lead''' {{tmpl|x}} "),
            F.col("text"),
            F.lit(" [[A|tail]]\n"),
        ).alias("wiki"),
    )
    pages = WD.extract_page_text(
        WD.wikidump_payloads(wrapped, "doc_id", "wiki"))
    out = pages.filter(F.col("ns") == 0).selectExpr(
        "id", WT.strip_wikitext("wikitext", "spark") + " AS x").collect()
    got = {r["id"]: r["x"] for r in out}
    assert got[1] == "T lead alpha beta tail"
    # '&' and '<delta>' rode through XML escaping losslessly; the
    # strip chain then eats '<delta>' as a tag — by rule, not by XML
    assert got[2] == "T lead gamma & tail"
