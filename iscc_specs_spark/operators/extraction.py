"""Deterministic HTML → text extraction.

The north-rule input is an Iceberg-shaped pages table ``(url, warc_ts,
html, text, lang)`` whose per-row invariant is **byte-identical extracted
text per url** (BASELINE.json input_hint). This operator IS that
extraction, defined so the invariant is checkable rather than assumed:

    extract_text(html) := the contents of every ``<p>…</p>`` element
    (non-greedy, dot-matches-newline), joined with a single ``\\n``.

A fixed, order-preserving rule — not a best-effort readability heuristic —
because byte-identity requires the extraction to be a *function*. Runs
fully JVM-side (``decode`` + ``regexp_extract_all`` + ``array_join``, all
inside whole-stage codegen): no UDF, narrow, zero shuffle, scales as a
pure map over the scan.

The round-trip property ``extract_text(render(text)) == text`` is asserted
per-row in the ``extracted_text`` driver query (and its DuckDB twin
recomputes the extraction independently from a rebuilt html column).

Malformed input: a 100 TB crawl contains invalid-UTF-8 pages, and under
ANSI mode (Spark 4 default) ``decode(html, 'utf-8')`` raises
MALFORMED_CHARACTER_CODING — one bad page would fail the whole job.  The
decode here is therefore ``make_valid_utf8(cast(html AS string))``: the
binary→string cast reinterprets bytes without validation and
make_valid_utf8 replaces every invalid sequence with U+FFFD (the Unicode
replacement character) — byte-identical to a plain decode for valid UTF-8
(the per-url invariant is unaffected), total and deterministic for
invalid bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s): '.' crosses newlines — paragraph bodies may contain any byte except
# the literal close tag; non-greedy keeps adjacent paragraphs separate.
_PARA_RE = r"(?s)<p>(.*?)</p>"


def extract_text_col(html_col: str = "html") -> Column:
    """Column expression: total UTF-8 decode (invalid bytes → U+FFFD, never
    a job failure) → all ``<p>`` bodies → ``\\n`` join."""
    return F.array_join(
        F.expr(
            "regexp_extract_all("
            f"make_valid_utf8(cast({html_col} AS string)), '{_PARA_RE}', 1)"
        ),
        "\n",
    )


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    return pages.withColumn(out_col, extract_text_col(html_col))
