"""String expression kit (SURVEY.md §2.8: `fn_string_split`,
`fn_trim`, `fn_format_pad`, `fn_cast`)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def zero_pad(col: str | Column, width: int = 2) -> Column:
    """f'{x:02d}'-style label (/root/reference/transformation.py:123)."""
    return F.lpad(_c(col).cast("string"), width, "0")


def trimmed(col: str | Column) -> Column:
    """str.strip() (/root/reference/transformation.py:260)."""
    return F.trim(_c(col))


def split_get_int(col: str | Column, sep: str, index: int) -> Column:
    """split + positional get + int cast, null on malformed input
    (the hour-parse shape, /root/reference/transformation.py:207-210).
    try_cast: ANSI mode would otherwise abort on garbage."""
    return F.split(_c(col), sep).getItem(index).try_cast("int")


#: tracking query parameters a URL canonicalizer strips (the standard
#: crawler/dedup list: UTM campaign tags + click identifiers)
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=")


def canonicalize_url(col: str | Column) -> Column:
    """Canonical form of a URL for dedup/grouping — the normalization
    every web-corpus pipeline runs before exact URL dedup:

    - scheme and host lowercased (path/query case is SIGNIFICANT per
      RFC 3986 and preserved);
    - default ports dropped (http:80, https:443); explicit non-default
      ports kept;
    - trailing slashes stripped from the path;
    - query parameters: tracking params removed
      (TRACKING_PARAM_PREFIXES), the rest SORTED so param order
      doesn't split a URL into variants;
    - fragment dropped (never sent to the server).

    Built on explicit regexes + higher-order array ops (not
    java.net.URL semantics) so an external oracle can replicate the
    result exactly; malformed URLs (no scheme) canonicalize to
    '://'-prefixed husks rather than nulls — callers filter upstream.
    """
    url = _c(col)
    proto = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((proto == F.lit("http")) & (port == F.lit("80")))
        & ~((proto == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    def _is_tracking(p: Column) -> Column:
        import functools

        return functools.reduce(
            lambda a, b: a | b,
            [p.startswith(pref) for pref in TRACKING_PARAM_PREFIXES],
        )

    keep = F.filter(F.split(q, "&"), lambda p: (p != "") & ~_is_tracking(p))
    qs = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
