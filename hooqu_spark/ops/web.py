"""Web/URL operators for Common-Crawl-style corpora.

URL canonicalization + host extraction as pure Catalyst regex
expressions (no UDFs), and URL-keyed dedup built on them.  The
canonical form is the usual crawl-dedup key:

1. strip the fragment (``#...``);
2. lowercase the ``scheme://authority`` part (path/query keep case —
   paths are case-sensitive on most servers);
3. drop default ports (``https://h:443`` -> ``https://h``,
   ``http://h:80`` -> ``http://h``);
4. strip trailing slashes.

Every step is a single anchored regex with an exact DuckDB equivalent
(no lookaheads — RE2-compatible), so the driver contract verifies the
canonical form value-for-value cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup

_PREFIX_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"


def host_col(url_col: str = "url") -> Column:
    """Lowercased registrable host of a URL (userinfo and port
    stripped); empty string when the value does not parse as a URL."""
    return F.lower(
        F.regexp_extract(F.coalesce(F.col(url_col), F.lit("")), _HOST_RE, 1)
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Append ``out_col`` (canonical form) and ``host``."""
    u0 = F.coalesce(F.col(url_col), F.lit(""))
    step = df.withColumn("_cu", F.regexp_replace(u0, "#.*$", ""))
    prefix = F.regexp_extract(F.col("_cu"), _PREFIX_RE, 1)
    step = step.withColumn("_cp", prefix)
    lowered = F.concat(
        F.lower(F.col("_cp")),
        F.col("_cu").substr(
            F.length("_cp") + F.lit(1), F.length("_cu")
        ),
    )
    step = step.withColumn("_cu", lowered)
    step = step.withColumn(
        "_cu",
        F.regexp_replace(
            F.col("_cu"), r"^(https://[^/:?#]*):443($|[/?#])", r"$1$2"
        ),
    )
    step = step.withColumn(
        "_cu",
        F.regexp_replace(
            F.col("_cu"), r"^(http://[^/:?#]*):80($|[/?#])", r"$1$2"
        ),
    )
    step = step.withColumn("_cu", F.regexp_replace(F.col("_cu"), "/+$", ""))
    return (
        step.withColumn(out_col, F.col("_cu"))
        .withColumn("host", host_col(url_col))
        .drop("_cu", "_cp")
    )


def url_dedup(
    df: DataFrame, id_col: str, url_col: str = "url"
) -> DataFrame:
    """Keep the smallest-id row per CANONICAL url — the first-stage
    crawl dedup (same page fetched under fragment/port/case/trailing-
    slash variants).  One key-only shuffle, like :func:`exact_dedup`."""
    canon = canonicalize_urls(df, url_col)
    return exact_dedup(canon, ["canonical_url"], id_col).drop(
        "canonical_url", "host"
    )


def host_counts(
    df: DataFrame, url_col: str = "url", n_salts: int = 16
) -> DataFrame:
    """Documents per host, computed skew-safely (hot hosts are the
    canonical skewed key in web corpora): two-phase salted counts."""
    from .skew import salted_counts

    hosts = df.select(host_col(url_col).alias("host"))
    return salted_counts(hosts, ["host"], n_salts=n_salts)
