"""URL canonicalization + registered-domain extraction.

The first grouping key of every web-corpus training pipeline is the
registered domain: per-domain caps, per-domain dedup, per-domain quality
stats all key on it (CCNet/RefinedWeb's URL filtering stage — the
reference repo has no web surface, this is part of the additive
LLM-pipeline layer). Everything here is a ROW-LOCAL expression — no
joins, no shuffles, pure whole-stage codegen at any corpus size; the
downstream per-domain window/agg is the only exchange, keyed by the
(short string) domain.

Canonicalization rules (deterministic, identical Spark/DuckDB):
  1. strip the fragment (``#...``);
  2. lowercase scheme and host (path/query case preserved);
  3. strip a leading ``www.`` from the host;
  4. drop the port when absent or scheme-default (http:80 / https:443);
  5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
     preserving the order of the rest; an emptied query drops its
     ``?``;
  6. an empty path becomes ``/``.

Registered domain: a PUBLIC-SUFFIX HEURISTIC — hosts ending in a known
multi-part suffix (:data:`MULTI_SUFFIXES`) keep their last three
labels, every other dotted host its last two, dotless hosts pass
through. A production system swaps the heuristic list for the full
Mozilla public-suffix list (a few thousand entries — still a row-local
broadcast lookup); the plan shape is identical.

Both engines run the same regexes (Java regex vs RE2 — the patterns
below use neither backreferences nor lookaround, the shared subset) and
the same LIKE/starts_with/ends_with prefix logic, so canonical strings
are byte-identical — which is what the t01 'url' arm's fingerprint gate
checks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")
MULTI_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "github.io")

# reserved prefix for bound intermediate columns (dropped before return)
_TMP = "_wfc3url"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def with_url_columns(
    df: DataFrame,
    url_col: str | Column,
    out_canon: str = "canon_url",
    out_domain: str = "reg_domain",
) -> DataFrame:
    """Add ``canon_url`` and ``reg_domain`` columns derived from
    ``url_col``. Intermediates are BOUND via withColumn before reuse
    (the CollapseProject lesson from the t02 trigram columns: a lambda
    or multi-reference over a raw expression re-evaluates it per use).
    Intermediate names carry a collision-safe prefix and are asserted
    absent from the input (r8 ADVICE: the old bare ``_u``/``_host``…
    names silently overwrote-then-dropped caller columns)."""
    clash = [c for c in df.columns if c.startswith(_TMP)]
    if clash:
        raise ValueError(
            f"with_url_columns: input already has reserved intermediate "
            f"column(s) {clash} (prefix {_TMP!r})"
        )
    parts = df.withColumn(_TMP + "_u", F.regexp_replace(_c(url_col), r"#.*$", ""))
    parts = (
        parts.withColumn(_TMP + "_scheme", F.lower(F.regexp_extract(_TMP + "_u", _SCHEME_RE, 1)))
        .withColumn(_TMP + "_hp", F.lower(F.regexp_extract(_TMP + "_u", _HOSTPORT_RE, 1)))
        .withColumn(_TMP + "_path", F.regexp_extract(_TMP + "_u", _PATH_RE, 1))
        .withColumn(_TMP + "_q", F.regexp_extract(_TMP + "_u", _QUERY_RE, 1))
    )
    parts = parts.withColumn(
        _TMP + "_host",
        F.regexp_replace(
            F.regexp_replace(_TMP + "_hp", r":[0-9]+$", ""), r"^www\.", ""
        ),
    ).withColumn(_TMP + "_port", F.regexp_extract(_TMP + "_hp", r":([0-9]+)$", 1))
    parts = parts.withColumn(
        _TMP + "_cq",
        F.array_join(
            F.filter(
                F.split(_TMP + "_q", "&"),
                lambda x: ~reduce(
                    Column.__or__, [x.startswith(p) for p in TRACKING_PREFIXES]
                ),
            ),
            "&",
        ),
    )
    default_port = (
        (F.col(_TMP + "_port") == "")
        | ((F.col(_TMP + "_scheme") == "http") & (F.col(_TMP + "_port") == "80"))
        | ((F.col(_TMP + "_scheme") == "https") & (F.col(_TMP + "_port") == "443"))
    )
    canon = F.concat(
        F.col(_TMP + "_scheme"),
        F.lit("://"),
        F.col(_TMP + "_host"),
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), F.col(_TMP + "_port"))),
        F.when(F.col(_TMP + "_path") == "", F.lit("/")).otherwise(F.col(_TMP + "_path")),
        F.when(F.col(_TMP + "_cq") == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), F.col(_TMP + "_cq"))
        ),
    )
    is_multi = reduce(
        Column.__or__, [F.col(_TMP + "_host").endswith("." + s) for s in MULTI_SUFFIXES]
    )
    dom = (
        F.when(~F.col(_TMP + "_host").contains("."), F.col(_TMP + "_host"))
        .when(is_multi, F.regexp_extract(_TMP + "_host", r"([^.]+\.[^.]+\.[^.]+)$", 1))
        .otherwise(F.regexp_extract(_TMP + "_host", r"([^.]+\.[^.]+)$", 1))
    )
    return (
        parts.withColumn(out_canon, canon)
        .withColumn(out_domain, dom)
        .drop(_TMP + "_u", _TMP + "_scheme", _TMP + "_hp", _TMP + "_host", _TMP + "_port", _TMP + "_path", _TMP + "_q", _TMP + "_cq")
    )


def url_table_sql(src: str, id_col: str, url_expr: str) -> str:
    """DuckDB twin of :func:`with_url_columns`: SELECT ``id_col``,
    canon_url, reg_domain FROM ``src`` with the same rules (identical
    regexes, prefix predicates, rebuild)."""
    not_tracking = " OR ".join(f"starts_with(x, '{p}')" for p in TRACKING_PREFIXES)
    multi = " OR ".join(f"ends_with(host, '.{s}')" for s in MULTI_SUFFIXES)
    return f"""
    SELECT {id_col},
           scheme || '://' || host || portpart || pathpart || qpart AS canon_url,
           CASE WHEN host NOT LIKE '%.%' THEN host
                WHEN {multi}
                     THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
                ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS reg_domain
    FROM (
        SELECT {id_col}, scheme, host,
               CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                    THEN '' ELSE ':' || port END AS portpart,
               CASE WHEN path = '' THEN '/' ELSE path END AS pathpart,
               CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS qpart
        FROM (
            SELECT {id_col}, scheme, path,
                   regexp_replace(regexp_replace(hp, ':[0-9]+$', ''),
                                  '^www\\.', '') AS host,
                   regexp_extract(hp, ':([0-9]+)$', 1) AS port,
                   -- coalesce: DuckDB's array_to_string([]) is NULL
                   -- where Spark's array_join([]) is ''
                   coalesce(array_to_string(list_filter(string_split(q, '&'),
                       x -> NOT ({not_tracking})), '&'), '') AS cq
            FROM (
                SELECT {id_col},
                       lower(regexp_extract(u, '{_SCHEME_RE}', 1)) AS scheme,
                       lower(regexp_extract(u, '{_HOSTPORT_RE}', 1)) AS hp,
                       regexp_extract(u, '{_PATH_RE}', 1) AS path,
                       regexp_extract(u, '{_QUERY_RE_SQL}', 1) AS q
                FROM (SELECT {id_col}, regexp_replace({url_expr}, '#.*$', '') AS u
                      FROM {src})
            )
        )
    )"""


# RE2 string for the query regex (the Python literal holds one
# backslash; SQL single-quoted strings pass it through verbatim)
_QUERY_RE_SQL = _QUERY_RE


def planted_url(doc_id: str | Column = "doc_id", source: str | Column = "source") -> Column:
    """Deterministic URL fixture per document (the corpus has no URL
    column — same plant pattern as t02's PII/boilerplate): doc_id
    residues drive mixed-case scheme/host, www prefixes, default and
    non-default ports, multi-part public suffixes, tracking params
    (including all-tracking queries), fragments, and empty paths — one
    of each canonicalization rule is exercised at every sf."""
    d, s = _c(doc_id), _c(source)
    ds = d.cast("string")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    suffix = F.when(d % 5 == 0, F.lit(".CO.UK")).otherwise(F.lit(".com"))
    port = (
        F.when((d % 4 == 0) & (d % 2 == 0), F.lit(":443"))
        .when(d % 4 == 0, F.lit(":80"))
        .when(d % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(d % 13 == 0, F.lit("")).otherwise(F.concat(F.lit("/D/"), ds))
    query = (
        F.when(d % 11 == 0, F.lit("gclid=zzz"))
        .when(
            d % 2 == 0,
            F.concat(F.lit("utm_source=feed&id="), ds, F.lit("&utm_campaign=x")),
        )
        .otherwise(F.concat(F.lit("id="), ds, F.lit("&ref=abc")))
    )
    frag = F.when(d % 7 == 0, F.lit("#sec-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), www, s, suffix, port, path, F.lit("?"), query, frag)


def planted_url_sql(doc_id: str = "doc_id", source: str = "source") -> str:
    return f"""(
        CASE WHEN {doc_id} % 2 = 0 THEN 'HTTPS' ELSE 'http' END
        || '://'
        || CASE WHEN {doc_id} % 3 = 0 THEN 'WWW.' ELSE '' END
        || {source}
        || CASE WHEN {doc_id} % 5 = 0 THEN '.CO.UK' ELSE '.com' END
        || CASE WHEN {doc_id} % 4 = 0 AND {doc_id} % 2 = 0 THEN ':443'
                WHEN {doc_id} % 4 = 0 THEN ':80'
                WHEN {doc_id} % 4 = 1 THEN ':8080' ELSE '' END
        || CASE WHEN {doc_id} % 13 = 0 THEN ''
                ELSE '/D/' || CAST({doc_id} AS VARCHAR) END
        || '?'
        || CASE WHEN {doc_id} % 11 = 0 THEN 'gclid=zzz'
                WHEN {doc_id} % 2 = 0
                     THEN 'utm_source=feed&id=' || CAST({doc_id} AS VARCHAR)
                          || '&utm_campaign=x'
                ELSE 'id=' || CAST({doc_id} AS VARCHAR) || '&ref=abc' END
        || CASE WHEN {doc_id} % 7 = 0 THEN '#sec-2' ELSE '' END
    )"""


def canonicalize_py(url: str) -> tuple[str, str]:
    """Pure-Python reference implementation of the SAME rules, used by
    the tests as the third, engine-independent witness. Returns
    (canon_url, reg_domain)."""
    import re

    u = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?", u)
    scheme = (m.group(1) or "").lower()
    hp = (m.group(2) or "").lower()
    path = m.group(3) or ""
    q = m.group(4) or ""
    pm = re.search(r":([0-9]+)$", hp)
    port = pm.group(1) if pm else ""
    host = re.sub(r"^www\.", "", re.sub(r":[0-9]+$", "", hp))
    keep = [
        x
        for x in q.split("&")
        if not any(x.startswith(p) for p in TRACKING_PREFIXES)
    ]
    cq = "&".join(keep)
    default = port == "" or (scheme, port) in (("http", "80"), ("https", "443"))
    canon = (
        scheme
        + "://"
        + host
        + ("" if default else ":" + port)
        + (path if path else "/")
        + (("?" + cq) if cq else "")
    )
    if "." not in host:
        dom = host
    elif any(host.endswith("." + s) for s in MULTI_SUFFIXES):
        dom = ".".join(host.split(".")[-3:])
    else:
        dom = ".".join(host.split(".")[-2:])
    return canon, dom
