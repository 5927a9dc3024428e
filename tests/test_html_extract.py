"""HTML extraction edge semantics pinned independently of the corpus
differential (which exact-compares 500 extracted strings per round)."""

from __future__ import annotations

from distributed_computing_projects_spark.functions.html import strip_html


def _extract(spark, html: str) -> str:
    lit = html.replace("'", "\\'")
    return spark.sql(
        f"SELECT {strip_html(repr(html)[0] + lit + repr(html)[0], 'spark')} AS t"
    ).collect()[0]["t"]


def test_entity_decode_order_is_single_pass(spark):
    # '&amp;lt;' must decode to the literal '&lt;', never twice to '<'
    assert _extract(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_script_stripped_before_tag_regex(spark):
    # a bare '<' inside a script body would break the tag regex if
    # scripts were not removed first
    out = _extract(spark, '<script>if (a < b) { x("y"); }</script><p>ok</p>')
    assert out == "ok"


def test_style_and_whitespace(spark):
    out = _extract(spark, "<style>p { color: red }</style><b>a</b>\n\n<i>b</i>")
    assert out == "a b"
