"""Text-analysis building blocks shared between the Spark engine and the
DuckDB oracle.

The cross-engine trick: every hash-dependent formula is emitted as ONE SQL
fragment string consumed both by Spark (`F.expr(fragment)`) and by the
oracle SQL verbatim. md5/substr/instr/length behave identically in both
engines, so MinHash signatures, SimHash bits and fingerprints agree exactly
— which makes approximate dedup oracle-checkable, not just rows-only.

Engine-native fast paths (xxhash64 etc.) live in operators/dedup.py; these
md5 fragments are the portable/verifiable variant.
"""

from __future__ import annotations

HEX = "0123456789abcdef"


def h16_sql(expr: str) -> str:
    """16-bit deterministic hash of a string expression via md5 hex chars.
    Identical evaluation in Spark SQL and DuckDB."""
    parts = []
    for i, mul in ((1, 4096), (2, 256), (3, 16), (4, 1)):
        parts.append(f"(instr('{HEX}', substr(md5({expr}), {i}, 1)) - 1) * {mul}")
    return "(" + " + ".join(parts) + ")"


def minhash_sql(shingle_expr: str, seed: int) -> str:
    """Seeded string minhash input: md5('<seed>|' || shingle). The MIN
    aggregate over these hex strings is the signature component (lexicographic
    min of md5 hex == min of the 128-bit hash value)."""
    return f"md5('{seed}|' || {shingle_expr})"


STOPWORDS = ("the", "a")

# three synthetic "languages" for the n-gram/marker language-ID heuristic —
# disjoint marker sets over the synthetic vocabulary
LANG_MARKERS = {
    "sqlish": ("join", "table", "query", "scan"),
    "sparkish": ("spark", "batch", "stream", "vector"),
    "rowish": ("row", "column", "key", "value"),
}


def marker_count_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"size(filter(split(text, ' '), w -> w IN ({in_list})))"


def marker_count_duck(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({in_list})))"
