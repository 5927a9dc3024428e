"""HTML -> text extraction fragments, dual-dialect (Spark / DuckDB).

The pipeline stage between a WARC response body and quality filtering
(what Common Crawl processors run before anything else): drop
script/style blocks, strip tags, decode the common entities, collapse
whitespace. Everything is a chain of regexp_replace/replace — pure
whole-stage codegen in Spark, and emitted for DuckDB too so the
two-engine gate exact-compares the EXTRACTED TEXT itself, making the
query a differential test of the regex semantics across Java regex
and RE2.

Dialect constraints honored here:
  * RE2 (DuckDB) has no backreferences -> script and style blocks are
    stripped by two separate patterns instead of <(script|style)>...\\1.
  * Both engines support inline (?is) flags and lazy quantifiers.
  * Spark regexp_replace is global by default; DuckDB needs the 'g'
    flag argument.
  * Entity decoding is plain replace() chains (no regex), &amp; LAST
    so '&amp;lt;' decodes to '&lt;' not '<'.

A baseline extractor by design (tag-blind like the reference corpus
tooling's text path, not a DOM parser — jusText/trafilatura-class
boilerplate removal is the documented external seam; the in-engine
boilerplate_ngrams operator covers the cross-document case).
"""

from __future__ import annotations

from distributed_computing_projects_spark.functions.text import _check

# (entity, replacement), &amp; deliberately last
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]

_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style\s*>"
_TAG_RE = "<[^>]*>"
_WS_RE = r"\s+"


def strip_html(expr: str, dialect: str) -> str:
    """Expression: extracted plain text of the HTML in ``expr`` —
    script/style dropped, tags to spaces, entities decoded,
    whitespace collapsed, trimmed.

    Patterns are stored raw; Spark's single-quoted SQL literals
    process backslash escapes (so backslashes double), DuckDB's are
    ANSI (backslashes pass through verbatim) — emitting one escaping
    for both silently breaks the OTHER engine's pattern, which is
    exactly the class of bug the string-compared oracle catches."""
    _check(dialect)

    def rr(e: str, pat: str, rep: str) -> str:
        if dialect == "spark":
            pat = pat.replace("\\", "\\\\")
            return f"regexp_replace({e}, '{pat}', '{rep}')"
        return f"regexp_replace({e}, '{pat}', '{rep}', 'g')"

    e = rr(expr, _SCRIPT_RE, " ")
    e = rr(e, _STYLE_RE, " ")
    e = rr(e, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        e = f"replace({e}, '{ent}', '{rep_sql}')"
    e = rr(e, _WS_RE, " ")
    return f"trim({e})"
