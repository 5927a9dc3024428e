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
    ("table-nested", "pre\n{| outer\n{| inner\n| c\n|}\n|}\npost",
     "pre post"),
    ("template-depth5",
     "a {{1|{{2|{{3|{{4|{{5}}}}}}}}}} b", "a b"),
    ("magic-word", "a __NOTOC__ b __FORCETOC__ c", "a b c"),
    ("hr", "a\n----\nb", "a b"),
    ("hr-long", "a\n--------\nb", "a b"),
    ("hr-midline-is-text", "a ---- b", "a ---- b"),
    ("parser-function-drops", "a {{#if:x|then|else}} b", "a b"),
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
    within = "a {{1|{{2|{{3|{{4|{{5}}}}}}}}}} b"  # depth 5: handled
    assert strip_duck(within) == "a b"
    beyond = "a {{1|{{2|{{3|{{4|{{5|{{6}}}}}}}}}}}} b"  # depth 6
    out = strip_duck(beyond)
    assert out != "a b"  # exceeds the bound, residue remains


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


# -- r13 widening: seeded markup-mutation survivor survey --------------------
# Measured before widening (round 13): 53.1% of 2000 seeded docs kept
# residual markup — {{/}} 359 (depth-4+ templates), ---- 335, |} 317
# (nested tables), __ 313 (magic words). The chain widened with
# TEMPLATE_DEPTH 3->5, innermost-table iteration, __MAGICWORD__ and
# horizontal-rule rules; this test regenerates the same corpus and
# pins the survivor rate low so the widening cannot silently regress.


def _mutation_corpus(n=400):
    import random

    rnd = random.Random(1313)
    words_ = ["alpha", "beta", "gamma", "delta", "rho", "sigma",
              "data", "wiki", "text", "corpus"]

    def words(k):
        return " ".join(rnd.choice(words_) for _ in range(k))

    def construct(depth=0):
        k = rnd.randrange(17)
        w = words(3)
        if k == 0:
            return "{{cite web|url=http://x|title=%s}}" % w
        if k == 1:
            return "{{t|%s}}" % (construct(depth + 1) if depth < 3 else w)
        if k == 2:
            return "{{#if:%s|%s|%s}}" % (words(1), words(2), words(2))
        if k == 3:
            return "{{#expr: 1 + 2}}"
        if k == 4:
            return "__NOTOC__"
        if k == 5:
            return "\n----\n"  # hr is line-oriented markup
        if k == 6:
            return "\n{| class=x\n|-\n| %s\n|}\n" % w
        if k == 7:
            return "\n{| outer\n{| inner\n| %s\n|}\n|}\n" % w
        if k == 8:
            return "[[%s|%s]]" % (words(1), w)
        if k == 9:
            return "<ref>%s</ref>" % w
        if k == 10:
            return "<gallery>\nFile:a.png|%s\n</gallery>" % w
        if k == 11:
            return "<math>x^2 + y^2</math>"
        if k == 12:
            return "{{DISPLAYTITLE:%s}}" % w
        if k == 13:
            return "&ndash; %s &hellip;" % w
        if k == 14:
            return "{{a|{{b|{{c|{{d|%s}}}}}}}}" % w  # depth 4
        if k == 15:
            return "<blockquote>%s</blockquote>" % w
        return "{{lc:%s}}" % w

    docs = []
    for _ in range(n):
        parts = [words(4)]
        for _ in range(rnd.randrange(1, 6)):
            parts.append(construct())
            parts.append(words(3))
        docs.append(" ".join(parts))
    return docs


def test_mutation_survivor_rate_stays_low():
    tokens = ["{{", "}}", "{|", "|}", "[[", "]]", "__", "----", "''",
              "<", ">"]
    docs = _mutation_corpus()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {WT.sql_literal(t, 'duck')})"
                   for i, t in enumerate(docs))
        + ") t(i, w)"
    )
    rows = con.execute(
        f"SELECT i, {WT.strip_wikitext('w', 'duck')} FROM d"
    ).fetchall()
    survivors = [i for i, out in rows if any(t in out for t in tokens)]
    # pre-widening this corpus shape measured ~50%+; the bounded
    # template depth still loses >5-deep nests, hence > 0 allowed
    assert len(survivors) / len(rows) < 0.02, survivors[:10]


# -- <nowiki> protect/restore (functions/nowiki.py) ---------------------------


def test_nowiki_protect_restore_roundtrip_pure():
    from distributed_computing_projects_spark.functions import nowiki as NW

    text = ("keep <nowiki>{{literal}} [[x|y]] ''q''</nowiki> mid "
            "A<nowiki/>B <nowiki>second |}</nowiki> end")
    protected, spans = NW._protect_one(text)
    assert spans == ["{{literal}} [[x|y]] ''q''", "second |}"]
    assert "<nowiki" not in protected and "{{" not in protected
    assert "AB" in protected  # the null tag joins its neighbors
    assert NW._restore_one(protected, spans) == (
        "keep {{literal}} [[x|y]] ''q'' mid AB second |} end")


def test_nowiki_torn_tag_strips_like_any_tag():
    from distributed_computing_projects_spark.functions import nowiki as NW

    protected, spans = NW._protect_one("a <nowiki>no closing tag here")
    assert spans == [] and "<nowiki>" in protected  # left for _TAG_RE
    assert strip_duck(protected) == "a no closing tag here"


def test_nowiki_through_chain_spark(spark):
    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.functions import nowiki as NW

    df = spark.createDataFrame(
        [(1, "x <nowiki>{{lit|a}}</nowiki> y {{drop|b}} z")],
        "id int, w string")
    protected = NW.protect(df, "w")
    stripped = protected.select(
        "id", "nowiki_spans",
        F.expr(WT.strip_wikitext("w", "spark")).alias("w"))
    out = NW.restore(stripped, "w").collect()
    assert out[0]["w"] == "x {{lit|a}} y z"
    assert [f.name for f in NW.restore(stripped, "w").schema.fields] == [
        "id", "w"]


def test_nowiki_preexisting_sentinels_sanitize_not_crash():
    """A corpus document containing PUA sentinel-shaped sequences
    must neither crash restore nor duplicate span content into
    unrelated positions (review finding)."""
    from distributed_computing_projects_spark.functions import nowiki as NW

    # sentinel-shaped sequence, no nowiki tags: must not crash
    out, spans = NW._protect_one("x 5 y")
    assert spans == [] and NW._restore_one(out, spans) == "x 5 y"
    # a real span plus a fake sentinel: no duplication
    out, spans = NW._protect_one(
        "<nowiki>SECRET</nowiki> and fake 0")
    assert NW._restore_one(out, spans) == "SECRET and fake 0"


def test_nowiki_null_tag_inside_span_is_literal():
    """MediaWiki ends the extension tag at the first </nowiki>, so a
    '<nowiki/>' inside a span is span TEXT (review finding)."""
    from distributed_computing_projects_spark.functions import nowiki as NW

    out, spans = NW._protect_one("a<nowiki>b<nowiki/>c</nowiki>d")
    assert spans == ["b<nowiki/>c"]
    assert NW._restore_one(out, spans) == "ab<nowiki/>cd"
    # null tags OUTSIDE spans still render as nothing
    out, spans = NW._protect_one("x<nowiki/>y")
    assert (out, spans) == ("xy", [])
