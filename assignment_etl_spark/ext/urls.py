"""URL operators for corpus curation: parse, normalize, registered
domain, domain blocklist.

Web-scale training pipelines key dedup, blocklists, and per-site quotas
on URLs, so the parse/normalize step must be deterministic and cheap:
everything here is native regexp/array expressions (one projection, no
Python, RE2-safe patterns with no backreferences so Spark's Java regex
and DuckDB's RE2 agree — that's what makes the oracle replay possible).

- :func:`url_parts` — struct(scheme, host, port, path, query, fragment).
  Missing pieces are empty strings (both engines' regexp_extract
  convention), not NULLs, so downstream concat never null-propagates.
- :func:`normalize_url` — canonical form: scheme/host lowercased,
  userinfo dropped, default ports stripped (http:80, https:443),
  tracking parameters removed (utm_*, gclid, fbclid, ref, mc_cid,
  mc_eid, igshid) preserving the order of the rest, fragment dropped.
  Path and non-tracking query values are untouched (case is semantic
  there).
- :func:`registered_domain` — eTLD+1 via a small embedded two-level
  suffix list (co.uk-style). A full public-suffix list is a data file,
  not a code change: swap SECOND_LEVEL_SUFFIXES for the published list
  at deploy time; the expression shape (last-2 vs last-3 labels) stays.
- :func:`drop_blocked_domains` — broadcast anti-join of the corpus
  against a blocklist keyed on registered domain; rows with unparseable
  hosts survive (a blocklist drops what it names, nothing else).

Each sql_* twin emits the DuckDB expression for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^\s*([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_FRAGMENT_RE = r"#(.*)$"

TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid|igshid)="

SECOND_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "co.nz", "co.in", "co.za", "co.kr",
    "com.br", "com.cn", "com.mx", "com.sg", "com.tr",
)


def url_parts(col: Column) -> Column:
    """struct(scheme, host, port, path, query, fragment); host is
    lowercased with userinfo stripped, everything else verbatim."""
    auth = F.regexp_extract(col, _AUTH_RE, 1)
    host_port = F.regexp_replace(auth, r"^.*@", "")
    return F.struct(
        F.lower(F.regexp_extract(col, _SCHEME_RE, 1)).alias("scheme"),
        F.lower(F.regexp_replace(host_port, r":[0-9]+$", "")).alias("host"),
        F.regexp_extract(host_port, r":([0-9]+)$", 1).alias("port"),
        F.regexp_extract(col, _PATH_RE, 1).alias("path"),
        F.regexp_extract(col, _QUERY_RE, 1).alias("query"),
        F.regexp_extract(col, _FRAGMENT_RE, 1).alias("fragment"),
    )


def normalize_url(col: Column) -> Column:
    """Canonical URL (empty string if the input has no scheme://host)."""
    p = url_parts(col)
    port = F.when(
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    kept = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (F.length(kv) > 0) & ~kv.rlike(TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        (p["scheme"] != "") & (p["host"] != ""),
        F.concat(p["scheme"], F.lit("://"), p["host"], port, p["path"], query),
    ).otherwise(F.lit(""))


def registered_domain(host: Column) -> Column:
    """eTLD+1: last two labels, or last three when the last two form a
    known second-level suffix. Single-label hosts pass through."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    return F.when(n <= 2, F.lower(host)).otherwise(
        F.when(
            last2.isin(*SECOND_LEVEL_SUFFIXES) & (n >= 3), last3
        ).otherwise(last2)
    )


def drop_blocked_domains(
    df: DataFrame, blocked: DataFrame | list[str], *, url_col: str = "url"
) -> DataFrame:
    """Anti-join on registered domain. ``blocked`` is a one-column frame
    (or list) of registered domains; it broadcasts — blocklists are
    small relative to any corpus worth filtering."""
    if isinstance(blocked, list):
        blocked = df.sparkSession.createDataFrame(
            [(d,) for d in sorted(set(blocked))], "_blocked_domain string"
        )
    else:
        blocked = blocked.toDF("_blocked_domain")
    dom = registered_domain(url_parts(F.col(url_col))["host"])
    return (
        df.withColumn("_dom", dom)
        .join(
            F.broadcast(blocked),
            F.col("_dom") == F.col("_blocked_domain"),
            "left_anti",
        )
        .drop("_dom")
    )


# --------------------------------------------------------------------------
# DuckDB replicas (oracle side). Each takes a SQL expression string and
# returns a SQL expression string; patterns are literally the same.


def sql_url_parts(url: str) -> dict[str, str]:
    auth = f"regexp_extract({url}, '{_AUTH_RE}', 1)"
    host_port = f"regexp_replace({auth}, '^.*@', '')"
    return {
        "scheme": f"lower(regexp_extract({url}, '{_SCHEME_RE}', 1))",
        "host": f"lower(regexp_replace({host_port}, ':[0-9]+$', ''))",
        "port": f"regexp_extract({host_port}, ':([0-9]+)$', 1)",
        "path": f"regexp_extract({url}, '{_PATH_RE}', 1)",
        "query": f"regexp_extract({url}, '\\?([^#]*)', 1)",
        "fragment": f"regexp_extract({url}, '#(.*)$', 1)",
    }


def sql_normalize_url(scheme: str, host: str, port: str, path: str, query: str) -> str:
    """Compose the canonical URL from part expressions (use
    :func:`sql_url_parts` column aliases, one CTE level up, so each regex
    runs once)."""
    port_part = (
        f"CASE WHEN ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" OR {port} = '' THEN '' ELSE ':' || {port} END"
    )
    kept = (
        f"list_filter(string_split({query}, '&'), "
        f"kv -> length(kv) > 0 AND NOT regexp_matches(kv, '{TRACKING_PARAM_RE}'))"
    )
    query_part = (
        f"CASE WHEN len({kept}) > 0"
        f" THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    return (
        f"CASE WHEN {scheme} <> '' AND {host} <> ''"
        f" THEN {scheme} || '://' || {host} || {port_part} || {path} || {query_part}"
        f" ELSE '' END"
    )


def sql_registered_domain(host: str) -> str:
    suffixes = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)
    labels = f"string_split(lower({host}), '.')"
    n = f"len({labels})"
    last2 = f"array_to_string({labels}[{n} - 1 : {n}], '.')"
    last3 = f"array_to_string({labels}[{n} - 2 : {n}], '.')"
    return (
        f"CASE WHEN {n} <= 2 THEN lower({host})"
        f" WHEN {last2} IN ({suffixes}) AND {n} >= 3 THEN {last3}"
        f" ELSE {last2} END"
    )
