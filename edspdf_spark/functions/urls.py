"""URL canonicalization — the url-level dedup key for crawl corpora.

A crawl sees the same page under many spellings (case-shifted hosts,
default ports, fragments, tracking parameters, parameter order, trailing
slashes); collapsing them is the first dedup pass of every web-corpus
pipeline (the SURT-style canonicalization Common Crawl applies before
content dedup). Everything here is pure Catalyst string/array expressions
— JVM-side, zero shuffle, usable inside the parquet scan stage — so the
canonical key costs a projection, not a UDF.

Rules (each independently testable):

* scheme and host lowercased; userinfo stripped; ``www.`` prefix stripped
  (optional); default ports dropped (``:80`` http, ``:443`` https);
* fragment dropped;
* tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``, …,
  extensible), remaining parameters sorted so order never splits a group;
* trailing path slashes folded (root stays ``/``; empty path becomes it);
* a string with no ``scheme://`` is not a fetchable url — returned
  trimmed, untouched (never silently rewritten).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never change page identity
TRACKING_PARAMS: tuple = (
    "utm_[^=&]*",
    "fbclid",
    "gclid",
    "msclkid",
    "dclid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
)


def canonicalize_url(
    url: Column,
    strip_www: bool = True,
    tracking_params: Sequence = TRACKING_PARAMS,
) -> Column:
    """url string column → canonical form (see module docstring)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)

    host = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^[^@]*@", "")  # userinfo
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")

    rest = F.regexp_replace(  # drop fragment first — it may contain ? or /
        F.regexp_extract(after, r"^[^/?#]*(.*)$", 1), r"#.*$", ""
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(F.length(path) > 1, F.regexp_replace(path, r"/+$", "")).otherwise(
        F.lit("/")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)

    tracking_re = "^(" + "|".join(tracking_params) + ")(=|$)"
    params = F.filter(
        F.split(F.regexp_extract(rest, r"\?(.*)$", 1), "&"),
        lambda p: (p != "") & ~p.rlike(tracking_re),
    )
    query = F.array_join(F.array_sort(params), "&")

    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canonical)


def dedup_url_groups(
    pages: DataFrame,
    url_col: str = "url",
    strip_www: bool = True,
) -> DataFrame:
    """Group a pages table by canonical url → one row per canonical group
    ``(canonical_url, keep_url, n_dups)``, keeping the lexicographically
    first spelling (deterministic under any partitioning). One md5-free
    string-keyed aggregation with map-side partials — the same shape as
    :func:`edspdf_spark.functions.dedup.dedup_exact` at any scale."""
    return (
        pages.select(
            canonicalize_url(F.col(url_col), strip_www=strip_www).alias(
                "canonical_url"
            ),
            F.col(url_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(url_col).alias("keep_url"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
