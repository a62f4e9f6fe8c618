"""Deterministic HTML → text extraction (the byte-identical contract).

BASELINE.json input_hint: "per-row invariant vs the reference: byte-identical
extracted text per url". The reference has no extractor (its page content is
pre-extracted upstream, README.md:4-7 points at a separate preprocessing
repo), so the contract here is *self-referential determinism*: the engine's
extractor is the definition, pinned by golden tests (tests/test_extract.py)
and reproduced exactly by the datagen ground truth.

Extraction rule (fixed, versioned by EXTRACTOR_VERSION):
1. drop <script>...</script>, <style>...</style>, <nav>...</nav>,
   <footer>...</footer> (boilerplate),
2. capture <title> text and every <p> text, in document order,
3. strip remaining tags inside captures, unescape the five XML entities
   plus numeric references,
4. join captures with '\\n'. No trimming beyond the tags themselves.

Implemented as an Arrow-batched pandas UDF over the binary ``html`` column
(never per-row Python per BASELINE.json input_hint) — regex-based, zero
dependencies, so the same bytes in produce the same bytes out on any
executor.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = 1

_DROP_RE = re.compile(
    r"<(script|style|nav|footer)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_str(html_s: str) -> str:
    """Pure-python extraction (golden-testable without Spark)."""
    cleaned = _DROP_RE.sub("", html_s)
    parts: list[str] = []
    m = _TITLE_RE.search(cleaned)
    if m:
        parts.append(m.group(1))
    parts.extend(_P_RE.findall(cleaned))
    out = [_TAG_RE.sub("", p) for p in parts]
    return "\n".join(html_mod.unescape(p) for p in out)


@F.pandas_udf(T.StringType())
def extract_text(html_bin: pd.Series) -> pd.Series:
    def one(b) -> str:
        if b is None:
            return ""
        s = bytes(b).decode("utf-8", errors="replace")
        return extract_text_str(s)

    return html_bin.map(one)


def with_extracted_text(pages_df, html_col: str = "html", out_col: str = "text"):
    """pages(url, warc_ts, html, ...) → + extracted text column."""
    return pages_df.withColumn(out_col, extract_text(F.col(html_col)))
