"""HTML -> text extraction.

The north-star spec calls for "trafilatura-style" main-content extraction
with the per-row invariant: **byte-identical extracted text per url** between
the single-node oracle and the Spark pipeline. trafilatura itself is not
installed in this environment, so the extractor is a deterministic pure
Python function (`extract_text`) that plays both roles — it runs unchanged
on the driver (oracle) and inside an Arrow-batched pandas UDF on executors,
so byte-parity holds by construction and is verified by tests
(tests/test_extract.py) via collect-and-compare.

Behavior (trafilatura-style, regex-based — no HTML parser libs available):
- decode UTF-8 (invalid bytes replaced),
- drop non-content blocks entirely: comments, <script> <style> <noscript>
  <template> and boilerplate containers <nav> <header> <footer> <aside>,
- scope to <body> when present,
- block-level closers/<br> become newlines, remaining tags are removed,
- entities are unescaped, intra-line whitespace is preserved,
- lines are stripped, empty lines dropped, joined with "\n".
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
import pyarrow  # noqa: F401  (ensures Arrow transport available)
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# blocks removed wholesale (content AND markup)
_DROP_BLOCK_RE = re.compile(
    r'<!--.*?-->'
    r'|<(script|style|noscript|template|nav|header|footer|aside)\b.*?</\1\s*>',
    re.IGNORECASE | re.DOTALL,
)
# self-closing forms of the same tags: removed BEFORE the paired-block
# pass — otherwise '<script src=x/>' has no own closer and the lazy
# paired match swallows every legitimate byte up to the NEXT </script>
_DROP_SELFCLOSE_RE = re.compile(
    r'<(?:script|style|noscript|template|nav|header|footer|aside)\b[^>]*/>',
    re.IGNORECASE,
)
# an UNCLOSED code-bearing opener (no </script> anywhere after): drop to
# end of document — stripping only the tag would leak raw JS/CSS source
# into the extracted training text
_DROP_UNCLOSED_RE = re.compile(
    r'<(?:script|style|noscript|template)\b[^>]*>.*\Z',
    re.IGNORECASE | re.DOTALL,
)
_BODY_RE = re.compile(r'<body\b[^>]*>(.*?)</body\s*>', re.IGNORECASE | re.DOTALL)
# closing block tags / <br> / <hr> that imply a line break
_BLOCK_BREAK_RE = re.compile(
    r'</(?:p|div|h[1-6]|li|ul|ol|table|tr|th|td|blockquote|pre|section|article'
    r'|figure|figcaption|dl|dt|dd|form|fieldset|main)\s*>'
    r'|<(?:br|hr)\s*/?>',
    re.IGNORECASE,
)
_TAG_RE = re.compile(r'<[^>]*>')


def extract_text(html_bytes: bytes | None) -> str | None:
    """Deterministic main-content text extraction; None for null/empty input."""
    if html_bytes is None:
        return None
    if isinstance(html_bytes, (bytearray, memoryview)):
        html_bytes = bytes(html_bytes)
    raw = html_bytes.decode("utf-8", errors="replace")
    if not raw:
        return ""
    doc = _DROP_SELFCLOSE_RE.sub("", raw)
    doc = _DROP_BLOCK_RE.sub("", doc)
    doc = _DROP_UNCLOSED_RE.sub("", doc)
    m = _BODY_RE.search(doc)
    if m:
        doc = m.group(1)
    doc = _BLOCK_BREAK_RE.sub("\n", doc)
    doc = _TAG_RE.sub("", doc)
    doc = _html.unescape(doc)
    lines = [ln.strip() for ln in doc.split("\n")]
    return "\n".join(ln for ln in lines if ln)


@F.pandas_udf(StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched wrapper over `extract_text` (html BINARY -> text STRING)."""
    for series in batches:
        yield series.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """corpus(url, warc_ts, html, ...) -> + extracted text column.

    When the corpus already carries a ground-truth `text` column (the
    input_hint schema does), callers can extract into a separate column and
    byte-compare — see pipeline stage `extract`.
    """
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
