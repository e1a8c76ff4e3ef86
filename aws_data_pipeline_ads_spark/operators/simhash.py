"""SimHash document fingerprinting, generated from one SQL template.

SimHash: per distinct token, hash to B bits; per doc, sum (+1/-1) per
bit over tokens; fingerprint bit = sign of the sum. Near-dup docs have
fingerprints within small Hamming distance.

The bit source is md5 hex digits (available in both Spark SQL and ANSI
engines such as the DuckDB oracle), so the SAME template renders both
the Spark query and the oracle SQL — the implementation is the spec.

Scale: explode→distinct, then one grouped aggregation with B sum
columns (partial map-side). Shuffle payload: B ints per doc.
"""

from __future__ import annotations

N_BITS = 32  # 8 md5 hex digits


def _bit_expr(j: int, idiv: str) -> str:
    """Bit j of the first 32 bits of md5(tok): hex digit j//4, shift 3-j%4."""
    d = j // 4 + 1  # 1-based hex digit index
    s = 3 - (j % 4)
    digit = f"(instr('0123456789abcdef', substr(md5(tok), {d}, 1)) - 1)"
    return f"(({digit} {idiv} {1 << s}) % 2)"


def simhash_sql(dialect: str, table: str = "documents") -> str:
    """Render the simhash query for 'spark' or 'duckdb'."""
    if dialect == "spark":
        idiv = "DIV"
        toks = (
            f"SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, "
            f"explode(split(trim(text), '\\\\s+')) AS tok FROM {table})"
        )
    elif dialect == "duckdb":
        idiv = "//"
        toks = (
            f"SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), "
            f"'\\s+')) AS tok FROM {table}"
        )
    else:
        raise ValueError(dialect)
    sums = ",\n    ".join(
        f"SUM(2 * {_bit_expr(j, idiv)} - 1) AS s_{j}" for j in range(N_BITS)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_BITS)
    )
    return (
        f"WITH toks AS ({toks}),\n"
        f"bits AS (SELECT doc_id,\n    {sums}\n  FROM toks GROUP BY doc_id)\n"
        f"SELECT doc_id, CAST({fingerprint} AS BIGINT) AS simhash FROM bits"
    )
