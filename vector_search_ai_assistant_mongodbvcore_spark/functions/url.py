"""URL canonicalization + domain extraction — pure Catalyst expressions
(parse_url / split / filter / sort_array: whole-stage codegen, no
Python in the hot path), the dedup-and-capping keys of a crawl corpus.

Why an engine function: CCNet-style pipelines dedup by NORMALIZED URL
before any content hashing (the same page is crawled under
utm-decorated, fragment-bearing, default-port variants), and
domain-level capping/audits key on the REGISTRABLE domain, not the raw
host (a million *.blogspot.com subdomains are one content source).
Both compose with the existing operators: exact_dedup on
normalized_url(), cap_per_group / domain_audit on registrable_domain().

`registrable_domain` is the PSL idea with a documented approximation:
a builtin set of common second-level public suffixes (co.uk-style)
instead of the full Public Suffix List — the full list is a data file,
not an algorithm; swap `_SECOND_LEVEL` for a broadcast PSL lookup when
exactness matters. Everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_host", "normalize_url", "registrable_domain"]

# query params that never identify content: tracking/click decorations
_TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="

# common second-level public suffixes: "<label>.<cc>" where the
# registrable domain is one label deeper (approximation of the PSL)
_SECOND_LEVEL = (
    "co", "com", "org", "net", "ac", "gov", "edu", "mil", "or", "ne", "go",
)


def _part(u: Column, part: str) -> Column:
    # try_parse_url: invalid URLs yield NULL (ANSI mode ON — plain
    # parse_url RAISES on junk input, and a crawl corpus has junk)
    return F.try_parse_url(u, F.lit(part))


def url_host(url: "Column | str") -> Column:
    """Lowercased host[:port] of `url` — userinfo dropped, default ports
    (':80'/':443') stripped (transport detail, not identity), NON-default
    ports kept (a different port IS a different origin). NULL for
    unparseable input. Built on AUTHORITY: Spark's HOST component drops
    the port entirely, which would conflate :8080 with :80."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.lower(_part(u, "AUTHORITY"))
    host = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(host, ":(80|443)$", "")


def normalize_url(url: "Column | str") -> Column:
    """Canonical form for URL-level dedup: lowercased scheme and host,
    default port and fragment dropped, tracking query params removed,
    surviving params sorted (param ORDER is presentation, not identity),
    empty path -> '/'. Falls back to the trimmed input when the URL does
    not parse (an unparseable key still dedups against itself)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    proto = F.lower(_part(u, "PROTOCOL"))
    host = url_host(u)
    path = _part(u, "PATH")
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = _part(u, "QUERY")
    kept = F.array_join(
        F.sort_array(
            F.filter(
                F.split(F.coalesce(query, F.lit("")), "&"),
                lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    rebuilt = F.concat(
        proto,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return F.when(proto.isNull() | host.isNull(), u).otherwise(rebuilt)


def registrable_domain(url_or_host: "Column | str") -> Column:
    """The registrable domain of a URL or bare host: 'sub.x.co.uk' ->
    'x.co.uk', 'a.b.example.com' -> 'example.com'. Hosts already at or
    below two labels (or IPs — any all-numeric last label) pass through.
    Approximate second-level suffix handling — see module docstring."""
    c = F.col(url_or_host) if isinstance(url_or_host, str) else url_or_host
    host = F.coalesce(url_host(c), F.lower(F.trim(c)))
    # ports are origin detail, never domain detail
    host = F.regexp_replace(host, ":[0-9]+$", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last = F.element_at(parts, -1)
    second = F.element_at(parts, -2)
    is_ip = last.rlike("^[0-9]+$")
    second_level = second.isin(*_SECOND_LEVEL) & (F.length(last) <= 3)
    take3 = (n >= 3) & second_level & ~is_ip
    return (
        F.when(is_ip | (n <= 2), host)
        .when(take3, F.array_join(F.slice(parts, n - 2, 3), "."))
        .otherwise(F.array_join(F.slice(parts, n - 1, 2), "."))
    )
