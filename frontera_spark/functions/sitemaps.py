"""Sitemap (sitemaps.org XML) URL extraction as JVM expression chains.

frontera seeds come from a flat URL list (frontera/utils/add_seeds.py); real
crawls bootstrap from per-host sitemap.xml documents, and at 10^10-URL scale
the extraction must be a distributed projection, not a driver-side XML
parser. The sitemaps.org payload that matters for seeding is the ``<loc>``
URL set (optionally ``<lastmod>``); both are line-free element bodies, so a
single ``regexp_extract_all`` per document extracts them without an XML
library — the same subset Scrapy's SitemapSpider regex fallback handles.

Scale shape: ``extract_locs`` is a pure projection (regexp + explode) — no
shuffle, no Python; a million sitemap docs fan out to their URL sets
entirely inside whole-stage codegen. Nested sitemap *indexes* (<sitemap>
entries pointing at more sitemaps) are one extra iteration of the same
projection, driven by the crawl loop like any other link-following step.

Extracted URLs are XML-entity-decoded (the five predefined entities —
sitemaps.org REQUIRES '&' in query strings be escaped as '&amp;', so a raw
regexp body would schedule literal '&amp;' URLs). Known limitation, by
design: ``<loc><![CDATA[...]]></loc>`` bodies are DROPPED (the first-char
class excludes '<') — CDATA is absent from the sitemaps.org examples and
from Scrapy's SitemapSpider regex fallback alike; a corpus that needs it
should pre-strip CDATA markers before ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"

# decode order matters only for '&amp;': it must run LAST so '&amp;lt;'
# decodes to the literal text '&lt;' (single-pass XML semantics), not '<'
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def _unescape(url: Column) -> Column:
    for ent, ch in _ENTITIES:
        url = F.replace(url, F.lit(ent), F.lit(ch))
    return url


def loc_urls(xml: Column) -> Column:
    """Array of ``<loc>`` URL bodies in document order (whitespace-trimmed,
    XML-entity-decoded)."""
    return F.transform(F.regexp_extract_all(xml, F.lit(_LOC_RE), F.lit(1)), _unescape)


def resolve_index(
    indexes: DataFrame,
    documents: DataFrame,
    xml_col: str = "sitemap_xml",
    url_col: str = "url",
) -> DataFrame:
    """Resolve ONE level of sitemaps.org index files: each ``<sitemap><loc>``
    entry is joined against the fetched sitemap-document table
    ``documents(url_col, xml_col)`` and every resolved child's ``<loc>`` URL
    set fans out. Children without a document row are skipped (their fetch
    failed). One level is spec-complete — sitemaps.org forbids index files
    from listing other index files; for out-of-spec nesting the same call
    composes on the resolved frame.

    Output: (url, _o1, _o2) — _o1 = child position in the index, _o2 = loc
    position within the child, the deterministic discovery order the seed
    path sorts on. Scale shape: the child-URL set is tiny relative to the
    document table (a sitemaps.org index caps at 50k entries) so it
    broadcasts into the join; the loc fan-out is the same pure codegen
    projection as ``extract_locs``."""
    kids = indexes.select(
        F.posexplode(loc_urls(F.col(xml_col))).alias("_sm_pos", "_sm_url")
    )
    resolved = documents.join(
        F.broadcast(kids), documents[url_col] == kids["_sm_url"], "inner"
    )
    return resolved.select(
        F.col("_sm_pos").alias("_o1"),
        F.posexplode(loc_urls(documents[xml_col])).alias("_o2", "url"),
    ).select("url", "_o1", "_o2")


def extract_locs(docs: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Explode each sitemap document into one row per ``<loc>`` URL.

    Output: the input columns (minus the XML body) + ``url`` (string) +
    ``n_locs`` (bigint, the document's URL count — kept so callers can gate
    oversized sitemaps against the 50k-URL sitemaps.org cap without a
    second pass)."""
    urls = loc_urls(F.col(xml_col))
    keep = [c for c in docs.columns if c != xml_col]
    return docs.select(
        *keep,
        F.size(urls).cast("bigint").alias("n_locs"),
        F.explode(urls).alias("url"),
    )
