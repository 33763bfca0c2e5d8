"""ISCC v1.0 algorithm constants.

All values are normative spec data (ISCC v1.0, /root/reference/docs/
specification.md and /root/reference/src/iscc/const.py).  The two large
tables (MinHash permutation pairs, CDC gear table) are loaded from
``spec_tables.json`` which was extracted verbatim from the spec — they are
data, not code.
"""

from __future__ import annotations

import json
from importlib import resources

# --- component header bytes (spec §ISCC-HEADER, const.py:5-17) -------------
HEAD_MID = b"\x00"
HEAD_CID_T = b"\x10"
HEAD_CID_T_PCF = b"\x11"
HEAD_CID_I = b"\x12"
HEAD_CID_I_PCF = b"\x13"
HEAD_CID_A = b"\x14"
HEAD_CID_A_PCF = b"\x15"
HEAD_CID_V = b"\x16"
HEAD_CID_V_PCF = b"\x17"
HEAD_CID_M = b"\x18"
HEAD_CID_M_PCF = b"\x19"
HEAD_DID = b"\x20"
HEAD_IID = b"\x30"

# --- text normalization (spec §normalization, const.py:22-47) ---------------
# Unicode categories removed during normalization (except the 3 whitespace
# control chars below, which survive the filter).
UNICODE_FILTER = frozenset(
    ("Cc", "Cf", "Cn", "Co", "Cs", "Mc", "Me", "Mn",
     "Pc", "Pd", "Pe", "Pf", "Pi", "Po", "Ps")
)
CC_WHITESPACE = ("\u0009", "\u000a", "\u000d")  # TAB, LF, CR

# --- base58-iscc alphabet (spec §base58-iscc, const.py:49) ------------------
SYMBOLS = "C23456789rB1ZEFGTtYiAaVvMmHUPWXKDNbcdefghLjkSnopRqsJuQwxyz"

INPUT_TRIM = 128          # Meta-ID title/extra trim, UTF-8 bytes
WINDOW_SIZE_MID = 4       # Meta-ID character n-gram width
WINDOW_SIZE_CID_T = 13    # Content-ID-Text character n-gram width

MAX_INT64 = (1 << 64) - 1

# --- content-defined chunking, two-phase gear CDC (const.py:57-68) ----------
GEAR1_NORM = 40
GEAR1_MIN = 20
GEAR1_MAX = 640
GEAR1_MASK1 = 0x016118
GEAR1_MASK2 = 0x00A0B1

GEAR2_NORM = 4096
GEAR2_MIN = 2048
GEAR2_MAX = 65536
GEAR2_MASK1 = 0x0003590703530000
GEAR2_MASK2 = 0x0000D90003530000

# --- large spec tables -------------------------------------------------------
# importlib.resources (not a filesystem path) so the package also loads from
# a spark-submit --py-files zip on executors (scripts/make_pyfiles.py)
_TABLES = json.loads(
    resources.files("iscc_specs_spark.kernel")
    .joinpath("spec_tables.json")
    .read_text()
)

# 256 (a, b) pairs; only the first 64 are used for 64-bit codes
MINHASH_PERMUTATIONS: list[tuple[int, int]] = [
    (int(a), int(b)) for a, b in _TABLES["minhash_permutations"]
]
# 256-entry random gear table for the CDC rolling hash
CHUNKING_GEAR: list[int] = [int(v) for v in _TABLES["chunking_gear"]]

del _TABLES
