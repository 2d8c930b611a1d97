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

#: scheme -> default port, dropped when explicit (RFC 3986 §6.2.3)
DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}


def percent_normalize(col: str | Column) -> Column:
    """RFC 3986 §6.2.2.1 percent-encoding case normalization: the hex
    digits of every valid %XX escape are uppercased ('%2f' -> '%2F' —
    equivalent by spec, and a dedup that misses this splits one URL
    into variants). Malformed escapes ('%ZZ', trailing '%') pass
    through untouched — this normalizes, it doesn't validate. Pure
    higher-order array ops (split on '%', fix each tail's first two
    chars, rejoin) so an oracle can restate it with list functions."""
    s = _c(col)
    parts = F.split(s, "%", -1)
    tail = F.slice(parts, 2, 1_000_000)
    fixed = F.transform(
        tail,
        lambda x: F.concat(
            F.lit("%"),
            F.when(
                x.rlike("^[0-9a-fA-F]{2}"),
                F.concat(
                    F.upper(F.substring(x, 1, 2)), F.substring(x, 3, 1_000_000)
                ),
            ).otherwise(x),
        ),
    )
    return F.concat(F.element_at(parts, 1), F.array_join(fixed, ""))


def canonicalize_url(col: str | Column) -> Column:
    """Canonical form of a URL for dedup/grouping — the normalization
    every web-corpus pipeline runs before exact URL dedup:

    - scheme and host lowercased (path/query case is SIGNIFICANT per
      RFC 3986 and preserved);
    - userinfo stripped ('user:pw@host' — never part of resource
      identity; leaving it in would both split dups AND leak
      credentials into the dedup key);
    - bracketed IPv6 hosts ('[2001:DB8::1]:8080') parsed as a unit:
      the bracket body lowercases, the port is what follows ']:';
    - default ports dropped per scheme (DEFAULT_PORTS — http:80,
      https:443, ws:80, wss:443, ftp:21); explicit non-default ports
      kept;
    - trailing slashes stripped from the path;
    - percent-escapes case-normalized to %XX uppercase in path and
      query (RFC 3986 §6.2.2.1 — '%2f' and '%2F' are the same octet);
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
    # userinfo ends at the FIRST '@' (an unencoded '@' later in the
    # authority is invalid per RFC 3986 — treated as part of the host)
    hostport = F.regexp_replace(hostport, r"^[^@]*@", "")
    is_v6 = hostport.startswith("[")
    host = F.when(
        is_v6, F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1))
    ).otherwise(F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)))
    port = F.when(
        is_v6, F.regexp_extract(hostport, r"\]:(\d+)$", 1)
    ).otherwise(F.regexp_extract(hostport, r":(\d+)$", 1))
    keep_port = port != ""
    for scheme, dport in DEFAULT_PORTS.items():
        keep_port = keep_port & ~((proto == F.lit(scheme)) & (port == F.lit(dport)))
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = percent_normalize(F.regexp_replace(path, r"/+$", ""))
    q = percent_normalize(F.regexp_extract(url, r"\?([^#]*)", 1))
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
