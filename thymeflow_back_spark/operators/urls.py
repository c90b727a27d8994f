"""URL canonicalization for web-corpus pipelines.

URL-level dedup is the first pass of every web-scale training pipeline
(before any content hashing): the same page arrives as
``https://WWW.Site.com/p/3/?utm_source=feed&id=4#frag`` and
``https://site.com/p/3?id=4``, and a corpus that treats those as distinct
double-counts the page. Canonicalization maps both to one key with
JVM-side expressions only (``parse_url`` + array ops — codegen'd, zero
Python, zero shuffle), so it composes with the exact-dedup groupBy at
any scale.

Rules (the common subset of web-crawl dedup pipelines):
- scheme and host lowercased; a leading ``www.`` stripped;
- userinfo dropped (credentials never belong in a dedup key); DEFAULT
  ports stripped (http:80, https:443) but non-default ports preserved —
  example.com:8080 is a different origin than example.com;
- fragment dropped;
- tracking parameters (``utm_*``) dropped, remaining query parameters
  sorted so parameter order doesn't split keys;
- trailing slash stripped from a non-root path, empty path -> ``/``.

``registered_domain`` extracts the ICANN-ish registrable domain (last two
host labels, or three when the two-label suffix is a known multi-label
public suffix) — the key for per-domain quotas, domain mixing weights,
and crawl politeness stats. The tiny suffix table here stands in for the
full public-suffix list; swapping it for the real one is a data change,
not a plan change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes recognized by registered_domain (subset of
# the Mozilla public-suffix list; extend by appending, the plan is
# identical at any list size once broadcast as a literal array)
MULTI_LABEL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br")


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` as a single string column.

    Unparseable URLs (no host — scheme-less strings, mailto:, junk) fall
    back to the RAW url rather than NULL: a NULL canonical would collapse
    every malformed URL into ONE dedup key downstream and silently drop
    all but one of those distinct documents."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.regexp_replace(F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", "")
    # AUTHORITY is userinfo@host:port — extract the port, keep it unless it
    # is the scheme default (HOST alone would silently merge distinct
    # origins like example.com:8080 and example.com)
    port = F.regexp_extract(
        F.coalesce(F.parse_url(url, F.lit("AUTHORITY")), F.lit("")), r":(\d+)$", 1
    )
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    pport = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.coalesce(F.concat(scheme, F.lit("://"), host, pport, path, qpart), url)


def registered_domain(url: Column) -> Column:
    """Registrable domain of ``url``'s host (suffix-list-aware)."""
    host = F.regexp_replace(F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", "")
    labels = F.split(host, r"\.")
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    suffixes = F.array(*[F.lit(s) for s in MULTI_LABEL_SUFFIXES])
    return F.when(F.array_contains(suffixes, last2), last3).otherwise(last2)


def canonicalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Append ``canonical`` and ``domain`` columns — the dedup/quota keys."""
    u = F.col(url_col)
    return df.withColumn("canonical", canonical_url(u)).withColumn(
        "domain", registered_domain(u)
    )
