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


N_BANDS = 4  # 4 bands × 8 bits over the 32-bit fingerprint


def simhash_pairs_sql(dialect: str, table: str = "documents",
                      max_hamming: int = 3) -> str:
    """Banded-LSH near-dup pairs over the simhash fingerprints.

    With 4 bands over 32 bits, any pair at Hamming distance ≤ 3 has at
    most 3 corrupted bands, so ≥ 1 band matches (pigeonhole): candidate
    recall is COMPLETE for max_hamming ≤ 3, and the Hamming filter makes
    the result exact — which is why this LSH query can be oracle-checked
    while MinHash-LSH (hash-family-specific) cannot.

    Scale: the per-band self-join exchanges (band_no, 8-bit band) keys —
    candidates are generated per bucket, never all-pairs. The band rows
    come from ONE pass over fp: the 4 (band_no, band) structs are built
    as an array and exploded (Spark) / unnest-ed (DuckDB). A per-band
    UNION ALL would re-run the whole explode→distinct→32-sum fingerprint
    pipeline once per band — Spark does not materialize shared CTE
    subplans (same single-pass rule as minhash_lsh_pairs).
    """
    if dialect == "spark":
        idiv, xor = "DIV", "bit_count(a.simhash ^ b.simhash)"
        structs = ", ".join(
            f"named_struct('band_no', {i}, 'band', "
            f"(simhash {idiv} {1 << (8 * i)}) % 256)"
            for i in range(N_BANDS)
        )
        bands = (
            f"SELECT doc_id, simhash, b.band_no AS band_no, b.band AS band "
            f"FROM fp LATERAL VIEW explode(array({structs})) t AS b"
        )
    elif dialect == "duckdb":
        idiv, xor = "//", "bit_count(xor(a.simhash, b.simhash))"
        structs = ", ".join(
            f"struct_pack(band_no := {i}, band := "
            f"(simhash {idiv} {1 << (8 * i)}) % 256)"
            for i in range(N_BANDS)
        )
        bands = (
            f"SELECT doc_id, simhash, "
            f"unnest([{structs}], recursive := true) FROM fp"
        )
    else:
        raise ValueError(dialect)
    fp = simhash_sql(dialect, table)
    return (
        f"WITH fp AS ({fp}),\n"
        f"bands AS ({bands}),\n"
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
        f"    CAST({xor} AS INT) AS hamming\n"
        "  FROM bands a JOIN bands b ON a.band_no = b.band_no "
        "AND a.band = b.band AND a.doc_id < b.doc_id)\n"
        f"SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}"
    )
