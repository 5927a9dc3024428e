"""Wikitext -> plain text fragments, dual-dialect (Spark / DuckDB).

The pipeline stage between ``wikidump_extract_pages`` (raw MediaWiki
markup out of the dump) and the quality/dedup tiers — what every
Wikipedia-corpus pipeline applies next: drop ``{{templates}}``
(nested, bounded depth), ``<ref>`` citations, comments and stray
tags, tables ``{| .. |}``, turn ``[[link|label]]`` into the label,
keep heading text, strip bold/italic quote runs and list markers,
decode entities, collapse whitespace. Everything is a chain of
``regexp_replace``/``replace`` — whole-stage codegen in Spark, and
emitted for DuckDB too so the two-engine gate exact-compares the
EXTRACTED STRING (the functions/html.py discipline): the query is a
differential test of Java-regex vs RE2 semantics on the exact
patterns used.

Dialect constraints honored (same list as functions/html.py):
  * RE2 has no backreferences — every pattern here is backref-free;
    nested templates are handled by iterating the INNERMOST-template
    pattern a bounded number of times instead of recursion.
  * Replacement group references differ: Java ``$1`` vs RE2 ``\\1``.
  * Spark single-quoted SQL literals process backslash escapes
    (pattern backslashes double); DuckDB literals are ANSI.
  * Spark regexp_replace is global by default; DuckDB needs 'g'.

A baseline extractor by design: template TRANSCLUSION (expanding
{{template}} bodies), parser functions, and Lua modules need the wiki
database and are the documented external seam — corpus pipelines
(and the reference extractors this models) drop unexpanded templates
exactly as done here. ``<nowiki>`` escaping (markup inside the tag is
LITERAL per MediaWiki) is also outside the subset: honoring it needs
extract-protect-restore, which a backref-free single-pass
regexp_replace chain cannot express — the tag strips like any tag and
its contents then flow through the rules. Both engines apply the same
order, so the oracle stays exact; the deviation is from MediaWiki,
not between engines.
"""

from __future__ import annotations

from distributed_computing_projects_spark.functions.html import _ENTITIES
from distributed_computing_projects_spark.functions.text import _check

TEMPLATE_DEPTH = 5  # innermost-pattern iterations = max nesting handled
TABLE_DEPTH = 3  # innermost-table iterations = max table nesting

# order matters; comments/refs before the generic tag strip, templates
# before tables (both leave single braces alone), link rules after
# category/file removal so namespace links never surface as labels
_COMMENT_RE = r"(?s)<!--.*?-->"
_REF_RE = r"(?is)<ref[^>/]*>.*?</ref\s*>"
_REF_SELF_RE = r"(?is)<ref[^>]*/>"
_TAG_RE = "<[^>]*>"
_TEMPLATE_RE = r"\{\{[^{}]*\}\}"
# innermost table (body brace-free, like the template trick) iterated
# TABLE_DEPTH times handles NESTED tables; the legacy non-greedy
# catch-all then sweeps stray unbalanced spans exactly as before
_TABLE_INNER_RE = r"(?s)\{\|[^{}]*\|\}"
_TABLE_RE = r"(?s)\{\|.*?\|\}"
_HR_RE = r"(?m)^-{4,}[ \t]*$"  # horizontal rule lines
_MAGIC_RE = r"__[A-Z]+__"  # behavior switches: __NOTOC__ etc.
_NSLINK_RE = r"(?is)\[\[(?:category|file|image)\s*:[^\[\]]*\]\]"
_PIPED_LINK_RE = r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]"
_PLAIN_LINK_RE = r"\[\[([^\[\]|]*)\]\]"
_EXT_LABELED_RE = r"\[https?://[^\s\]]*\s+([^\]]*)\]"
_EXT_BARE_RE = r"\[https?://[^\s\]]*\]"
_HEADING_RE = r"(?m)^\s*=+\s*(.*?)\s*=+\s*$"
_LIST_RE = r"(?m)^[*#:;]+[ \t]*"
_WS_RE = r"\s+"


def strip_wikitext(expr: str, dialect: str) -> str:
    """Expression: plain text of the wikitext in ``expr``."""
    _check(dialect)

    def rr(e: str, pat: str, rep: str) -> str:
        if dialect == "spark":
            pat = pat.replace("\\", "\\\\")
            rep = rep.replace("\\", "\\\\")
            return f"regexp_replace({e}, '{pat}', '{rep}')"
        return f"regexp_replace({e}, '{pat}', '{rep}', 'g')"

    g1 = "$1" if dialect == "spark" else "\\1"
    e = rr(expr, _COMMENT_RE, " ")
    e = rr(e, _REF_RE, " ")
    e = rr(e, _REF_SELF_RE, " ")
    e = rr(e, _TAG_RE, " ")
    for _ in range(TEMPLATE_DEPTH):
        e = rr(e, _TEMPLATE_RE, " ")
    for _ in range(TABLE_DEPTH):
        e = rr(e, _TABLE_INNER_RE, " ")
    e = rr(e, _TABLE_RE, " ")
    e = rr(e, _MAGIC_RE, " ")
    e = rr(e, _HR_RE, " ")
    e = rr(e, _NSLINK_RE, " ")
    e = rr(e, _PIPED_LINK_RE, g1)
    e = rr(e, _PLAIN_LINK_RE, g1)
    e = rr(e, _EXT_LABELED_RE, g1)
    e = rr(e, _EXT_BARE_RE, " ")
    e = f"replace({e}, '\\'\\'\\'', '')" if dialect == "spark" \
        else f"replace({e}, '''''''', '')"
    e = f"replace({e}, '\\'\\'', '')" if dialect == "spark" \
        else f"replace({e}, '''''', '')"
    e = rr(e, _HEADING_RE, g1)
    e = rr(e, _LIST_RE, "")
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        e = f"replace({e}, '{ent}', '{rep_sql}')"
    e = rr(e, _WS_RE, " ")
    return f"trim({e})"


def sql_literal(s: str, dialect: str) -> str:
    """One string constant quoted for ``dialect`` (Spark literals
    process backslash escapes; DuckDB's are ANSI)."""
    _check(dialect)
    if dialect == "spark":
        body = s.replace("\\", "\\\\").replace("'", "\\'")
    else:
        body = s.replace("'", "''")
    return f"'{body}'"
