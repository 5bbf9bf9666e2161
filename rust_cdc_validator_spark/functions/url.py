"""URL canonicalization for web-corpus deduplication.

Crawl-derived training corpora key dedup, frontier scheduling, and
per-domain quotas on URLs — but the same page arrives under many spellings
(scheme/host case, default ports, `www.`, tracking params, param order,
fragments, trailing slashes). Canonicalizing BEFORE hashing is the
standard first stage of every web pipeline (RFC 3986 §6 "Normalization
and Comparison" defines the safe subset; CommonCrawl/Heritrix ship the
same rule set as "SURT"-style canonicalizers).

Everything here is pure JVM column expressions — `regexp_replace`,
`split`, `filter`, `array_sort`, `array_join` — so canonicalization is
map-side, whole-stage-codegen'd, zero shuffle, and a DuckDB oracle can
replay it with the same regexes (no `parse_url`, which DuckDB lacks).

Rules applied (each individually RFC-safe for http/https):
  1. strip the fragment (`#...` never reaches the server);
  2. lowercase scheme and authority (case-insensitive per RFC 3986 §3.1,
     §3.2.2) — path/query case is preserved (significant);
  3. drop default ports (`:80` http, `:443` https);
  4. drop a leading `www.` (site-equivalence convention, optional);
  5. drop tracking query params (`utm_*`, `fbclid`, `gclid`, `msclkid`,
     `mc_eid`, `ref`) and sort the survivors byte-wise — param order is
     almost never significant, and sorting makes equal param SETS compare
     equal; an all-tracking query string drops its `?` entirely;
  6. trim a trailing `/` from non-root paths (`/a/` ≡ `/a` by the
     dominant server convention; the root `/` alone is kept).

Scale shape at 100 TB: a pure narrow projection — canonicalize inside the
scan stage, feed `xxhash64(canonical)` straight into exact dedup
(operators/dedup.py) without materializing the raw URL anywhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "TRACKING_PARAMS_RE"]

#: query-param names dropped as analytics/tracking noise (anchored regex)
TRACKING_PARAMS_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref)$"


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical form of an http(s) URL column (see module docstring).

    Non-URL strings pass through mostly untouched (no scheme → rules 2-6
    find nothing to rewrite beyond fragment stripping), so the function is
    safe on dirty columns.
    """
    # 1. fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host[:port] (everything before the first / or ?
    #    after the authority) — path and query keep their case
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    tail = F.substring(u, F.length(head) + 1, F.lit(2**31 - 1))
    u = F.concat(F.lower(head), tail)
    # 3. default ports
    # (no lookahead: the DuckDB oracle replays these in RE2 syntax, which
    # has none — capture the optional rest instead)
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443([/?].*)?$", r"$1$2")
    # 4. www.
    if strip_www:
        u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    # 5. query params: split off, filter tracking, sort, rejoin
    base = F.regexp_replace(u, r"\?.*$", "")
    qs = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "")
            & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(TRACKING_PARAMS_RE),
        )
    )
    u = F.when(F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))).otherwise(base)
    # 6. trailing slash on non-root paths (only when a path exists after
    #    an authority; query already split off into `u`'s base part)
    return F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?]+/.+?)/+(\?|$)", r"$1$2")
