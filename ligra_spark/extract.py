"""JVM-side HTML text/link extraction over the pages table.

The extractor SPEC (what "text" means) is
``ligra_spark.fixtures.extract_text_py``: title, then each <p> body,
then each <a> anchor text, newline-joined.  The per-row invariant from
BASELINE.json input_hint is byte-identical extracted text per url —
tests/test_ingest.py asserts column equality (and sha256 equality)
between this Spark implementation and the single-node spec.

Everything here is built-in Catalyst expressions (regexp_extract_all /
array_join) — whole-stage codegen, no Python in the per-row path.  At
100 TB the extraction is a single scan-project over the Iceberg pages
table with ``html`` the only wide column read (column pruning drops
text/lang when not selected).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_str",
    "extract_text_col",
    "extract_links_col",
    "extracted_pages",
    "anchor_pairs",
    "anchor_text_summary",
    "normalize_url",
]

_TITLE_RE = r"<title>(.*?)</title>"
_PARA_RE = r"<p>(.*?)</p>"
_ANCHOR_TEXT_RE = '<a href="[^"]*">(.*?)</a>'
_HREF_RE = '<a href="([^"]*)">'


def html_str(col: str = "html") -> Column:
    """Decode the binary html column as UTF-8 (input_hint: html is binary)."""
    return F.decode(F.col(col), "UTF-8")


def extract_text_col(html: Column) -> Column:
    """Byte-identical twin of ``fixtures.extract_text_py``."""
    parts = F.concat(
        F.regexp_extract_all(html, F.lit(_TITLE_RE), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_PARA_RE), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_ANCHOR_TEXT_RE), F.lit(1)),
    )
    return F.array_join(parts, "\n")


def extract_links_col(html: Column) -> Column:
    """Array of href targets, document order, duplicates preserved
    (a page linking twice contributes two edges — matches the rMat
    fixture's duplicate-keeping semantics, ``graphIO.h:343-353``)."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1))


def extracted_pages(pages: DataFrame) -> DataFrame:
    """pages + (extracted_text, links) in one JVM scan-project."""
    h = html_str("html")
    return pages.withColumns(
        {
            "extracted_text": extract_text_col(h),
            "links": extract_links_col(h),
        }
    )


_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)"
_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/:?#]+:([0-9]+)"
_REST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([/?][^#]*)?"


def normalize_url(url: Column) -> Column:
    """RFC 3986 §6.2 syntax-based normalization of an absolute url —
    the canonicalization step before link-graph construction and url
    dedup on a crawl (two spellings of one page must collide to one
    vertex):

      - strip the fragment (never sent to the server),
      - lowercase scheme and host (case-insensitive per §3.1/§3.2.2),
      - drop the default port (:80 for http, :443 for https),
      - empty path → "/" (§6.2.3).

    Query strings, non-default ports and path case are preserved (they
    are semantically significant).  A string with no scheme://host
    prefix (relative reference) is returned fragment-stripped but
    otherwise untouched.  Pure Catalyst regexp/case expressions —
    codegen scan-project, no UDF.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    port = F.regexp_extract(u, _PORT_RE, 1)
    rest = F.regexp_extract(u, _REST_RE, 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    restpart = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, portpart, restpart)
    )


def anchor_pairs(pages: DataFrame) -> DataFrame:
    """One row per <a> tag: (url, pos, href, anchor_text), document
    order, duplicates preserved.

    The two regexp passes match the same ``<a href="...">...</a>``
    instances, so the href and anchor-text arrays align positionally;
    ``arrays_zip`` pairs them without re-parsing (a tag that matches
    only one pattern — truncated html — null-fills, same as DuckDB's
    parallel unnest).  All codegen scan-project until the explode; at
    100 TB this reads only (url, html) from the pages table.
    """
    h = html_str("html")
    zipped = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(h, F.lit(_ANCHOR_TEXT_RE), F.lit(1)).alias(
            "anchor_text"
        ),
    )
    return pages.select(
        "url", F.posexplode(zipped).alias("pos", "a")
    ).select("url", "pos", F.col("a.href").alias("href"), F.col("a.anchor_text").alias("anchor_text"))


def anchor_text_summary(pages: DataFrame) -> DataFrame:
    """Inbound anchor-text aggregation per link target — the classic
    web-corpus op (inbound anchors describe the target page; used as a
    ranking/labeling signal for pages never crawled themselves).

    Returns (url, inlinks, distinct_anchors, top_anchor) where ``url``
    is the link TARGET, ``inlinks`` counts all <a> tags pointing at it,
    and ``top_anchor`` is the most frequent anchor text (ties broken by
    lexicographically smallest — deterministic, engine-independent).

    Two shuffles, both with map-side partial aggregation: one on
    (href, anchor_text) to count, one on href to fold counts; the
    tie-break rides the second agg as min(struct(-cnt, text)) — no
    window, no second scan of the pages table.  Anchor-text skew
    (billions of tags saying "home") is absorbed by the partial aggs.
    """
    cnt = (
        anchor_pairs(pages)
        .groupBy("href", "anchor_text")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("anchor_text")))
    return (
        cnt.groupBy(F.col("href").alias("url"))
        .agg(
            F.sum("cnt").alias("inlinks"),
            F.count(F.lit(1)).alias("distinct_anchors"),
            best.getField("anchor_text").alias("top_anchor"),
        )
    )
