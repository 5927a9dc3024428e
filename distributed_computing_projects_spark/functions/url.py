"""URL canonicalization — the dedup key of crawl ingest. Web corpora
reach the same page through case-variant hosts, tracking parameters,
reordered query strings, and fragments; URL-level dedup runs BEFORE
content fetch/dedup and removes the bulk of crawl duplication for the
cost of a projection (no shuffle until the final group-by).

Built entirely from JVM-side expression primitives (regexp + array
higher-order functions — stays inside codegen, no UDF):

1. strip the ``#fragment`` (never sent to the server);
2. lowercase scheme and host (DNS is case-insensitive; paths are NOT
   lowercased — they are case-sensitive on most servers);
3. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid`` — the
   standard strip list);
4. sort surviving query parameters (order is almost never
   significant; sorting canonicalizes reorderings);
5. drop the ``?`` when no parameters survive.

The same five steps are expressible verbatim in ANSI-ish SQL
(regexp_extract/replace + list filter/sort/join), which is what the
``url_dedup_groups`` oracle does — two independent implementations,
differentially checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = "^(utm_[a-z]+|fbclid|gclid)="
_SCHEME_HOST = "^([^:]+://[^/?#]+)"


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL column per the module-doc rules. Pure
    expression tree — usable in any projection."""
    no_frag = F.regexp_replace(url, "#.*", "")
    scheme_host = F.lower(F.regexp_extract(no_frag, _SCHEME_HOST, 1))
    rest = F.regexp_replace(no_frag, _SCHEME_HOST, "")
    path = F.regexp_replace(rest, r"\?.*", "")
    query = F.when(rest.contains("?"),
                   F.regexp_replace(rest, r"^[^?]*\?", "")
                   ).otherwise(F.lit(""))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(_TRACKING) & (p != F.lit("")),
    ))
    qtail = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))
                   ).otherwise(F.lit(""))
    return F.concat(scheme_host, path, qtail)
