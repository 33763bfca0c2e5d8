"""ISCC text normalization (spec §content normalization; parity with
/root/reference/src/iscc/iscc.py:172-211).

Pipeline: decode utf-8 → strip → lower → NFD → drop chars whose Unicode
category is in UNICODE_FILTER unless they are TAB/LF/CR → collapse (keep_ws)
or delete (not keep_ws) whitespace → NFKC.

The category filter is precomputed once per process as a ``str.translate``
deletion table over the full codepoint range, so the per-document work is
C-speed.  Unicode-version note: category assignments and NFD/NFKC tables come
from the running CPython's unicodedata; golden vectors pass on CPython 3.11
(verified by tests/test_conformance.py).
"""

from __future__ import annotations

import unicodedata

from iscc_specs_spark.kernel.constants import CC_WHITESPACE, INPUT_TRIM, UNICODE_FILTER

_DELETE_TABLE: dict[int, None] | None = None


def _delete_table() -> dict[int, None]:
    global _DELETE_TABLE
    if _DELETE_TABLE is None:
        keep = set(CC_WHITESPACE)
        _DELETE_TABLE = {
            cp: None
            for cp in range(0x110000)
            if unicodedata.category(chr(cp)) in UNICODE_FILTER
            and chr(cp) not in keep
        }
    return _DELETE_TABLE


def text_normalize(text: str | bytes, keep_ws: bool = False) -> str:
    if isinstance(text, bytes):
        text = text.decode("utf-8")  # decode errors must raise (spec §143)
    decomposed = unicodedata.normalize("NFD", text.strip().lower())
    filtered = decomposed.translate(_delete_table())
    parts = filtered.split()
    ws_processed = " ".join(parts) if keep_ws else "".join(parts)
    return unicodedata.normalize("NFKC", ws_processed)


def text_trim(text: str) -> str:
    """Trim to ≤INPUT_TRIM UTF-8 bytes without splitting multi-byte chars."""
    return text.encode("utf-8")[:INPUT_TRIM].decode("utf-8", "ignore").strip()
