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

__all__ = ["html_str", "extract_text_col", "extract_links_col", "extracted_pages"]

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
