"""URL operators for crawl-data curation.

The URL-level stages a web-scale training pipeline runs before any
text processing (the C4 / RefinedWeb / Dolma front door):

- ``url_parse_parts``: scheme/host/path/query extraction.
- ``url_canonicalize``: the dedup key for crawl URLs — lowercased
  host, tracking query and fragment stripped, trailing slash trimmed
  (two crawls of the same page almost never carry identical raw URLs).
- ``url_domain_blocklist``: registrable-domain extraction + broadcast
  anti-join against a blocklist — how domain-level filtering actually
  runs at scale (never a regex per blocked domain).

The fixture tables carry no URL column, so the registry keys run the
kernels over a DETERMINISTICALLY FABRICATED url column (doc_id/source
shaped into realistic URLs with varying scheme, host case, tracking
params and fragments) — an honest cross-engine parity harness, stated
here rather than hidden; ``api.parse_urls`` / ``api.canonicalize_urls``
/ ``api.filter_blocked_domains`` are the real user surface.

All extraction/normalization is map-side ``regexp_extract`` /
``regexp_replace`` — patterns stay in the RE2-compatible subset and
avoid replacement backreferences (Java uses $1, RE2 uses \\1; the
canonical form is COMPOSED from extracted parts instead, which both
engines evaluate identically). The blocklist is a broadcast anti-join:
the only non-map-side step, shuffling nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

_SCHEME_RE = "^([a-z]+)://"
_HOST_RE = "^[a-z]+://([^/?#]+)"
_PATH_RE = "^[a-z]+://[^/?#]+([^?#]*)"
_QUERY_RE = "\\?([^#]*)"
_REG_DOMAIN_RE = "([a-z0-9-]+\\.[a-z]+)$"

BLOCKED_DOMAINS = ("src1.example", "src7.example", "src13.example")


def _fabricated_urls(docs: DataFrame) -> DataFrame:
    """doc_id/source shaped into crawl-looking URLs: scheme varies by
    parity, host case varies (canonicalization must fix it), half the
    URLs carry a utm tracking param, a third carry a fragment. The
    same expression is inlined in the oracle SQL."""
    host = F.concat(
        F.lit("www."),
        F.when(F.col("doc_id") % 5 == 0, F.upper(F.col("source"))).otherwise(
            F.col("source")
        ),
        F.lit(".example"),
    )
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        host,
        F.lit("/docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed&page="), (F.col("doc_id") % 7).cast("string")
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", url.alias("url"))


_FABRICATE_URL_SQL = """
  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://www.'
  || (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END)
  || '.example/docs/' || CAST(doc_id AS VARCHAR)
  || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
  || (CASE WHEN doc_id % 2 = 0
      THEN '?utm_source=feed&page=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0 THEN '#section-2' ELSE '' END)
"""

_PARSE_SQL = f"""
WITH t AS (SELECT doc_id, {_FABRICATE_URL_SQL} AS url FROM documents)
SELECT doc_id, url,
       regexp_extract(url, '{_SCHEME_RE}', 1) AS scheme,
       lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
       regexp_extract(url, '{_PATH_RE}', 1) AS path,
       regexp_extract(url, '{_QUERY_RE}', 1) AS query
FROM t
ORDER BY doc_id
"""


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Parameterized URL parser shared by ``url_parse_parts`` and
    ``api.parse_urls``: adds scheme / host (lowercased) / path / query
    columns via anchored map-side regexp_extract — no UDF, no
    java.net.URL object per row; parsing 100 TB of URLs is one scan.
    Malformed rows yield empty strings (regexp_extract's no-match
    value in both engines), never an error."""
    return df.withColumns(
        {
            "scheme": F.regexp_extract(F.col(url_col), _SCHEME_RE, 1),
            "host": F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1)),
            "path": F.regexp_extract(F.col(url_col), _PATH_RE, 1),
            "query": F.regexp_extract(F.col(url_col), _QUERY_RE, 1),
        }
    )


@register("url_parse_parts", oracle=_PARSE_SQL, tags=("ext", "url"))
def url_parse_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition over the fabricated-parity column (see module
    docstring)."""
    d = tables.load(spark, sf_dir, "documents")
    return parse_urls(_fabricated_urls(d)).orderBy("doc_id")


_CANON_SQL = f"""
WITH t AS (SELECT doc_id, {_FABRICATE_URL_SQL} AS url FROM documents),
p AS (
  SELECT doc_id, url,
         regexp_extract(url, '{_SCHEME_RE}', 1) AS scheme,
         lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
         regexp_extract(url, '{_PATH_RE}', 1) AS path
  FROM t
)
SELECT doc_id,
       scheme || '://' || host ||
       (CASE WHEN path = '/' OR path = '' THEN ''
             ELSE rtrim(path, '/') END) AS canonical_url
FROM p
ORDER BY doc_id
"""


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Parameterized URL canonicalizer shared by ``url_canonicalize``
    and ``api.canonicalize_urls``: lowercased host, query string and
    fragment dropped, trailing slash trimmed (root path collapses to
    bare authority). The output is COMPOSED from extracted parts
    rather than regexp_replace backreferences — Java spells a group
    ``$1`` where RE2 spells it ``\\1``, so composition is the only
    form both engines evaluate identically. This canonical form is the
    crawl-dedup key: grouping on it collapses re-crawls that differ
    only by tracking params / fragment / host case."""
    scheme = F.regexp_extract(F.col(url_col), _SCHEME_RE, 1)
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    path = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    # trailing-slash trim via regexp (PySpark's rtrim is whitespace-only)
    norm_path = F.when(path.isin("/", ""), F.lit("")).otherwise(
        F.regexp_replace(path, "/+$", "")
    )
    return df.withColumn(
        "canonical_url", F.concat(scheme, F.lit("://"), host, norm_path)
    )


@register("url_canonicalize", oracle=_CANON_SQL, tags=("ext", "url"))
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonical form over the fabricated-parity column."""
    d = tables.load(spark, sf_dir, "documents")
    return canonicalize_urls(_fabricated_urls(d)).select(
        "doc_id", "canonical_url"
    ).orderBy("doc_id")


_BLOCKLIST_SQL = f"""
WITH t AS (SELECT doc_id, {_FABRICATE_URL_SQL} AS url FROM documents),
p AS (
  SELECT doc_id, url,
         regexp_extract(lower(regexp_extract(url, '{_HOST_RE}', 1)),
                        '{_REG_DOMAIN_RE}', 1) AS domain
  FROM t
)
SELECT doc_id, domain
FROM p
WHERE domain NOT IN {BLOCKED_DOMAINS}
ORDER BY doc_id
"""


def filter_blocked_domains(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Parameterized domain filter shared by ``url_domain_blocklist``
    and ``api.filter_blocked_domains``: extract the registrable domain
    (last two host labels) and anti-join against ``blocklist`` (one
    ``domain`` column). The blocklist broadcasts — even a million
    blocked domains is a few tens of MB — so the filter is map-side
    and the corpus never shuffles; this is why blocklists scale where
    per-domain regexes do not."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    domain = F.regexp_extract(host, _REG_DOMAIN_RE, 1)
    return (
        df.withColumn("domain", domain)
        .join(
            F.broadcast(blocklist.select(F.col("domain").alias("__blocked"))),
            F.col("domain") == F.col("__blocked"),
            "left_anti",
        )
    )


@register("url_domain_blocklist", oracle=_BLOCKLIST_SQL, tags=("ext", "url"))
def url_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist anti-join over the fabricated-parity column:
    drops the three blocked source domains."""
    d = tables.load(spark, sf_dir, "documents")
    bl = spark.createDataFrame([(b,) for b in BLOCKED_DOMAINS], "domain string")
    return (
        filter_blocked_domains(_fabricated_urls(d), bl)
        .select("doc_id", "domain")
        .orderBy("doc_id")
    )
