"""Web-corpus operators: URL canonicalization and canonical-URL dedup.

Crawl corpora carry the same page under many URL spellings (scheme/host
case, default ports, tracking parameters, fragments, trailing slashes);
canonicalizing before dedup is the standard Common-Crawl-style prep step.

Scale posture: canonicalization is a pure codegen string/``regexp_replace``
chain — map-only, zero shuffle; the scan is the only cost at 100 TB.  Dedup
then groups on the canonical string (or its digest), so the shuffle carries
one short key per row, never page content.

Regex patterns are RE2-compatible (no lookarounds) so the same pattern text
runs on Spark (java.util.regex) and RE2-based engines; only the
group-reference spelling differs per engine ($1 vs \\1), which each caller
owns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Query parameters that never identify content — ad/campaign trackers.
TRACKING_PARAMS = r"(utm_[^=&]*|gclid|fbclid|msclkid)"


def canonicalize_url(url: Column) -> Column:
    """Normalize a URL string for identity comparison.

    Rules, in order (each a codegen string op):
    1. trim; drop the ``#fragment``;
    2. lowercase the ``scheme://authority`` prefix (path/query keep case);
    3. drop ``www.`` and the scheme's default port (:80 http, :443 https);
    4. remove tracking query parameters (TRACKING_PARAMS), then repair the
       separators they leave (``&&`` runs, ``?&``, trailing ``?``/``&``);
    5. drop a trailing slash, including one directly before the query
       (``http://a.com/x/`` == ``http://a.com/x``; ``/x/?q`` == ``/x?q``).

    URLs with no recognizable scheme prefix pass through rules 1/4/5 only
    (the empty extracted prefix makes rules 2-3 no-ops).  Null in, null out.
    """
    u = F.trim(url)
    u = F.regexp_replace(u, r"#.*$", "")
    prefix = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.length(u)))
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#])", "$1$2")
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80$", "$1")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#])", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443$", "$1")
    u = F.regexp_replace(u, r"([?&])" + TRACKING_PARAMS + r"=[^&#]*", "$1")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?]&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"([^/])/$", "$1")
    u = F.regexp_replace(u, r"([^/])/[?]", "$1?")
    return u


def url_dedup_keys(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """One row per canonical URL: (canonical_url, keep_id=min id, n_copies).

    groupBy on the canonical string with map-side partial aggregation — the
    same digest-shuffle shape as exact content dedup (dedup.exact_dedup_keys).
    """
    return (
        df.select(canonicalize_url(F.col(url_col)).alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Drop rows whose canonical URL was already seen (keep the smallest id)."""
    keys = url_dedup_keys(df, url_col, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keys, id_col, "left_semi")
