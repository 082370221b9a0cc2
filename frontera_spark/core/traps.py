"""Crawler-trap detection: per-host URL-aliasing statistics as DataFrame ops.

frontera has no trap detector (its strategies assume the link filter hook,
frontera/strategy/__init__.py:~filter_extracted_links, is where a user would
bolt one on); at the 10^10-URL design point a trap host — calendar pages,
session-id query params, faceted search — floods the frontier with unbounded
distinct URLs that all resolve to a bounded set of contents. The classic
budget-saving detector (Heritrix's path-repetition rules, IRLbot's spam/
budget work) reduces to two per-host ratios computable from the frontier
itself, no fetches needed:

- **alias ratio** ``n_urls / n_content``: how many distinct URLs map to one
  fetched-content identity (content hash, or canonical doc id). Ratio >> 1
  means URL aliasing — the crawl is re-buying the same bytes.
- **template fan-out** ``n_urls / n_templates``: distinct URLs per URL
  *template* (query/fragment stripped, digit runs folded to ``N``). A
  calendar trap has one template and millions of URLs.

Both are one hash aggregation keyed on host (map-side partial agg; the
multi-countDistinct expands the input 3x but still shuffles only
(host, key) pairs). At 100 TB the exact countDistinct swaps for
``approx_count_distinct`` (HLL) without changing the plan shape — exactness
only matters here because the driver's DuckDB oracle checks values.

``url_template`` stays a pure JVM expression chain (two regexp_replace) so
the whole detector lives inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_template(url: Column) -> Column:
    """Fold a URL to its trap template: strip ``?query``/``#fragment``, then
    collapse every digit run to ``N`` (``/d/123?sid=9`` → ``/d/N``)."""
    path = F.regexp_replace(url, r"[?#].*$", "")
    return F.regexp_replace(path, r"[0-9]+", "N")


def url_alias_stats(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    content_col: str = "content_key",
    ratio_threshold: float = 2.0,
) -> DataFrame:
    """Per-host trap statistics over (host, url, content_key) rows.

    Returns one row per host: ``n_urls``, ``n_content``, ``n_templates``
    (all distinct counts, bigint), ``alias_ratio`` (n_urls/n_content, 4dp),
    ``template_fanout`` (n_urls/n_templates, 4dp), and ``is_trap`` —
    alias_ratio >= ratio_threshold. One shuffle; no window, no join."""

    def _r4(c: Column) -> Column:
        return F.floor(c * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)

    agg = urls.groupBy(host_col).agg(
        F.countDistinct(url_col).alias("n_urls"),
        F.countDistinct(content_col).alias("n_content"),
        F.countDistinct(url_template(F.col(url_col))).alias("n_templates"),
    )
    n_urls = F.col("n_urls").cast("double")
    return agg.select(
        F.col(host_col),
        "n_urls",
        "n_content",
        "n_templates",
        _r4(n_urls / F.col("n_content")).alias("alias_ratio"),
        _r4(n_urls / F.col("n_templates")).alias("template_fanout"),
        (n_urls / F.col("n_content") >= F.lit(ratio_threshold)).alias("is_trap"),
    )
