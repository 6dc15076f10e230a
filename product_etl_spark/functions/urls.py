"""URL canonicalization and domain extraction — pure Catalyst
expressions, no UDFs.

Training-data curation filters and deduplicates web documents by URL:
C4 deduplicated pages by URL, CCNet groups quality statistics by
domain, RefinedWeb applies domain blocklists before content is even
fetched. All of those need a canonical form first — raw crawl URLs
differ in scheme/host case, default ports, fragments, tracking
parameters, userinfo, and trailing slashes while naming the same
resource.

Reference parity: the reference ETL handles scraped product-page and
image URLs (`utils/details_translator/1_image_extractor_from_html.py`,
`db_orchestrator.py` download paths) but never canonicalizes them —
duplicate downloads under differently-tracked URLs are a real failure
mode there. This module is the scale-side fix.

Scale shape: every function is a map-only column expression
(regexp / split / array ops) that stays inside whole-stage codegen —
cost is bounded by the scan, no shuffle, no Python. ``domain_filter``
with an iterable blocklist compiles to an IN-set predicate pushed at
the scan; with a DataFrame blocklist it is a broadcast left_anti join.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that track the click, not the resource. utm_* is
# Google Analytics; gclid/msclkid ad-click ids; fbclid/igshid Meta;
# mc_* Mailchimp; spm/scm are Alibaba-ecosystem tracking params (the
# reference scrapes Taobao pages, which carry spm on every link).
TRACKING_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|"
    r"spm|scm|ref|ref_src)(=.*)?$"
)

# Common multi-label public suffixes. A full deployment would broadcast
# the complete Mozilla Public Suffix List; this built-in subset covers
# the frequent ccTLD second-level registries and keeps the function a
# pure expression (the list compiles to an IN-set literal).
MULTI_PART_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk co.jp ne.jp or.jp ac.jp com.cn net.cn "
    "org.cn gov.cn com.au net.au org.au co.nz co.in net.in org.in "
    "co.za com.br net.br com.mx com.ar com.tr com.sg com.hk com.tw "
    "co.kr co.th com.my com.ph com.vn co.id"
).split()


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _no_fragment(col: Column | str) -> Column:
    """Trimmed URL with the #fragment removed (fragments are
    client-side only and never name a distinct resource)."""
    return F.regexp_replace(F.trim(_c(col)), r"#.*$", "")


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme ('' when the string is not a scheme://
    URL)."""
    return F.lower(
        F.regexp_extract(F.trim(_c(col)), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )


def url_host(col: Column | str) -> Column:
    """Lowercased host: authority minus userinfo and minus any
    :port suffix."""
    auth = F.regexp_extract(
        F.trim(_c(col)), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d+$", ""))


def _host_with_port(col: Column | str) -> Column:
    """Lowercased host[:port], userinfo stripped, DEFAULT ports
    (http:80 / https:443) removed, explicit non-default ports kept —
    :8443 names a different listener; :443 on https does not."""
    auth = F.regexp_extract(
        F.trim(_c(col)), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    hp = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    scheme = url_scheme(col)
    return (
        F.when(scheme == "http", F.regexp_replace(hp, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hp, r":443$", ""))
        .otherwise(hp)
    )


def url_path(col: Column | str) -> Column:
    """Path component (may be '')."""
    return F.regexp_extract(
        _no_fragment(col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )


def url_query(col: Column | str) -> Column:
    """Raw query string after '?' (fragment excluded; '' when
    absent)."""
    return F.regexp_extract(_no_fragment(col), r"\?(.*)$", 1)


def canonical_query(col: Column | str) -> Column:
    """Query string with tracking params dropped, remaining k=v pairs
    sorted — C4-style URL canonicalization ('?b=2&a=1&utm_source=x'
    and '?a=1&b=2' are the same resource)."""
    parts = F.split(url_query(col), "&")
    kept = F.filter(
        parts, lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)
    )
    return F.array_join(F.sort_array(kept), "&")


def normalize_url(col: Column | str) -> Column:
    """Canonical URL: lowercased scheme+host, userinfo and default
    port stripped, fragment dropped, tracking params removed and the
    rest sorted, trailing path slash trimmed. NULL when the input is
    not a scheme:// URL (no scheme or no host) — callers filter or
    coalesce explicitly rather than receive garbage."""
    scheme = url_scheme(col)
    hp = _host_with_port(col)
    path = F.regexp_replace(url_path(col), r"/+$", "")
    cq = canonical_query(col)
    out = F.concat(
        scheme,
        F.lit("://"),
        hp,
        path,
        F.when(cq != "", F.concat(F.lit("?"), cq)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (hp != ""), out)


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a HOST column: last two labels, or last
    three when the 2-label tail is a known multi-part public suffix
    ('www.shop.example.com' -> 'example.com', 'blog.example.co.uk' ->
    'example.co.uk'). Hosts with <= 2 labels (incl. bare IPs-as-names
    and localhost) pass through unchanged."""
    h = F.lower(_c(host))
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    return (
        F.when(n <= 2, h)
        .when(last2.isin(*MULTI_PART_SUFFIXES), last3)
        .otherwise(last2)
    )


def url_registered_domain(col: Column | str) -> Column:
    """registered_domain of a full URL column."""
    return registered_domain(url_host(col))


def domain_filter(
    df: DataFrame,
    url_col: str,
    blocked: Iterable[str] | DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose URL's registered domain is blocklisted.

    An iterable blocklist becomes an IN-set predicate (map-only,
    evaluated at the scan); a DataFrame blocklist (column
    ``domain_col``) becomes a broadcast left_anti join — the right
    shape when the list is curated at data scale (RefinedWeb's is
    ~4.6M domains: still megabytes, still broadcastable)."""
    dom = url_registered_domain(url_col)
    if isinstance(blocked, DataFrame):
        right = blocked.select(F.lower(F.col(domain_col)).alias("__blocked"))
        return (
            df.withColumn("__dom", dom)
            .join(
                F.broadcast(right),
                F.col("__dom") == F.col("__blocked"),
                "left_anti",
            )
            .drop("__dom")
        )
    vals = sorted({d.lower() for d in blocked})
    if not vals:
        return df
    return df.filter(~dom.isin(*vals))
