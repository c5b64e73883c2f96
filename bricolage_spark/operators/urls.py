"""URL/host canonicalization: the keying step of URL-level dedup and
domain accounting in a crawl-curation pipeline (feeds q62-style domain
caps and q72-style snapshot diffs).

Everything is pure Catalyst expressions — regexp_extract/replace, array
filter/sort — so canonicalization is row-local, whole-stage-codegen'd
(the tiny higher-order filter/sort run over a handful of query params,
not over corpus text), and shuffles only the canonical keys. The same
rules are expressible in ANSI/DuckDB SQL for the oracle, and both
engines produce byte-identical canonical forms.

Rules (the common subset of public canonicalizers — browsers, crawlers,
the SURT convention — without any site-specific rewrite tables):

1. scheme and host lowercased (RFC 3986 §6.2.2.1); path/query untouched
   (case-significant).
2. leading ``www.`` stripped from the host.
3. default ports stripped (``:443`` for https, ``:80`` for http).
4. ``/index.html`` (or ``.htm``) tail collapsed to ``/``; trailing
   slashes dropped.
5. tracking query params removed (``utm_*``, ``ref``, ``fbclid``,
   ``gclid``), remaining params sorted bytewise so param order is
   canonical.
6. fragment dropped (never sent to the server).

A redirect-resolution rule table (trivial host aliases) can be joined in
upstream of this keying; that is deliberately a data concern, not code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# group 1 scheme, 2 host[:port], 3 path, 4 ?query, 5 #fragment
URL_PARTS_RE = r"^([^:]+)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

# params dropped entirely (anchored; both RE2 and java.util.regex
# subset). (=|$) so the bare valueless form ("?ref", "?fbclid") is
# dropped too — trackers emit both, and keeping one would split the
# same resource across two canonical keys.
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)(=|$)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, URL_PARTS_RE, 1))


def canonical_host(url: Column) -> Column:
    """Lowercased host, ``www.`` prefix and default port stripped."""
    scheme = url_scheme(url)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, URL_PARTS_RE, 2)), r"^www\.", ""
    )
    return (
        F.when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .otherwise(host)
    )


def _canonical_path(url: Column) -> Column:
    path = F.regexp_extract(url, URL_PARTS_RE, 3)
    path = F.regexp_replace(path, r"/index\.html?$", "/")
    return F.regexp_replace(path, r"/+$", "")


def _canonical_query(url: Column) -> Column:
    qs = F.substring(F.regexp_extract(url, URL_PARTS_RE, 4), 2, 1 << 30)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.sort_array(params), "&"))
    ).otherwise(F.lit(""))


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL per the module rules.

    Deterministic, engine-independent (mirrored 1:1 by the DuckDB oracle
    SQL in queries/llm_ops.q76): equal canonical strings <=> same
    resource under the rules above.

    Inputs that don't parse as ``scheme://...`` (relative paths,
    mailto:, bare hosts, garbage — routine in real crawls) pass through
    UNCHANGED: regexp_extract returns '' for every group on a non-match,
    and concatenating those would collapse all malformed URLs onto the
    single key '://', silently merging unrelated documents in any
    canonical-key dedup.
    """
    return F.when(
        F.regexp_extract(url, URL_PARTS_RE, 1) == "", url
    ).otherwise(
        F.concat(
            url_scheme(url),
            F.lit("://"),
            canonical_host(url),
            _canonical_path(url),
            _canonical_query(url),
        )
    )
