"""SimHash document fingerprinting, generated from one SQL template.

SimHash: per distinct token, hash to B bits; per doc, sum (+1/-1) per
bit over tokens; fingerprint bit = sign of the sum. Near-dup docs have
fingerprints within small Hamming distance.

The bit source is md5 hex digits (available in both Spark SQL and ANSI
engines such as the DuckDB oracle), so the SAME template renders both
the Spark query and the oracle SQL — the implementation is the spec.

64-bit fingerprints (the Manku/Google web-dedup width) with 16-bit
bands: an 8-bit band has only 256 buckets, and on a homogeneous corpus
(similar vocabulary → correlated majority signs) band values collapse
into few buckets — measured 9.5M band-join candidates from 5k docs at
sf0.1, i.e. the LSH had degenerated to ~all-pairs. 65536 buckets per
band keeps candidates at the near-dup clusters themselves. Bit 63 is
folded in as two's complement so the fingerprint stays a signed BIGINT
both engines share.

Scale: explode→distinct, then one grouped aggregation with B sum
columns (partial map-side). Shuffle payload: B ints per doc.
"""

from __future__ import annotations

N_BITS = 64  # 16 md5 hex digits


def _hex_acc(first_digit: int, n_digits: int = 8) -> str:
    """Integer value of md5(tok) hex digits [first_digit, first_digit +
    n_digits), 1-based — the one string parse per token row."""
    acc = "CAST(0 AS BIGINT)"
    for i in range(first_digit, first_digit + n_digits):
        d = f"(instr('0123456789abcdef', substr(md5(tok), {i}, 1)) - 1)"
        acc = f"({acc} * 16 + {d})"
    return acc


def simhash_sql(dialect: str, table: str = "documents") -> str:
    """Render the simhash query for 'spark' or 'duckdb'.

    The per-token hash is parsed from the md5 hex ONCE into two 32-bit
    halves (`hi`, `lo`) in a projection below the aggregate; each of the
    64 bit sums is then a shift-and-mask on an integer. The naive form
    (one instr/substr string parse per BIT) costs 64 string ops per
    token row — measured ~2× the whole aggregation.
    """
    # Per-doc distinct via array_distinct BELOW the explode: the bit
    # sums group by doc_id, so only WITHIN-doc uniqueness matters — a
    # corpus-wide SELECT DISTINCT shuffles the entire token stream for
    # nothing (removing it cuts one full exchange from the pipeline).
    if dialect == "spark":
        shift = "shiftright({col}, {n})"
        toks = (
            f"SELECT doc_id, "
            f"explode(array_distinct(split(trim(text), '\\\\s+'))) AS tok "
            f"FROM {table}"
        )
    elif dialect == "duckdb":
        shift = "({col} >> {n})"
        toks = (
            f"SELECT doc_id, "
            f"unnest(list_distinct(regexp_split_to_array(trim(text), "
            f"'\\s+'))) AS tok FROM {table}"
        )
    else:
        raise ValueError(dialect)
    hashed = (
        f"SELECT doc_id, {_hex_acc(1)} AS hi, {_hex_acc(9)} AS lo FROM toks"
    )

    def bit(j: int) -> str:
        col, n = ("lo", j) if j < 32 else ("hi", j - 32)
        return "(" + shift.format(col=col, n=n) + " & 1)"

    sums = ",\n    ".join(
        f"SUM(2 * {bit(j)} - 1) AS s_{j}" for j in range(N_BITS)
    )
    # Bit 63 is the BIGINT sign bit: 1<<63 overflows signed 64-bit, so
    # fold it in as two's complement (adding MIN_LONG sets the sign bit;
    # identical representation in both engines).
    fingerprint = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_BITS - 1)
    )
    fingerprint += (
        f" + (CASE WHEN s_{N_BITS - 1} > 0 "
        "THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE 0 END)"
    )
    return (
        f"WITH toks AS ({toks}),\n"
        f"hashed AS ({hashed}),\n"
        f"bits AS (SELECT doc_id,\n    {sums}\n  FROM hashed GROUP BY doc_id)\n"
        f"SELECT doc_id, CAST({fingerprint} AS BIGINT) AS simhash FROM bits"
    )


def simhash_write(spark, documents, path: str) -> None:
    """Materialize the SimHash fingerprint table as parquet — the
    minhash_write/bm25_write serving pattern. Fingerprints are pure
    functions of the text (md5-derived), so the served pairs query is
    bit-identical to the inline one; the explode→distinct→64-sum
    pipeline is paid once per corpus, write-side."""
    documents.createOrReplaceTempView("__simhash_write_src")
    spark.sql(simhash_sql("spark", table="__simhash_write_src")).write.mode(
        "overwrite"
    ).parquet(path)


def simhash_pairs_served(spark, path: str, max_hamming: int = 3):
    """simhash_pairs answered from a simhash_write index: the band
    self-join reads the materialized (doc_id, simhash) parquet on both
    sides — no tokenize/hash at query time, no in-session persist (the
    parquet IS the shared materialization)."""
    spark.read.parquet(path).createOrReplaceTempView("__simhash_fp")
    return spark.sql(
        simhash_pairs_sql("spark", max_hamming=max_hamming,
                          fp_table="__simhash_fp")
    )


N_BANDS = 4  # 4 bands × 16 bits over the 64-bit fingerprint


def simhash_pairs_sql(dialect: str, table: str = "documents",
                      max_hamming: int = 3,
                      fp_table: str | None = None) -> str:
    """Banded-LSH near-dup pairs over the simhash fingerprints.

    With 4 bands over 64 bits, any pair at Hamming distance ≤ 3 has at
    most 3 corrupted bands, so ≥ 1 band matches (pigeonhole): candidate
    recall is COMPLETE for max_hamming ≤ 3, and the Hamming filter makes
    the result exact. Bands extract via arithmetic-shift-then-mask —
    after `& 0xFFFF` the sign-fill bits are gone, so the band value is
    the true 16-bit field even on negative fingerprints, identically in
    both engines.

    Scale: the per-band self-join exchanges (band_no, 8-bit band) keys —
    candidates are generated per bucket, never all-pairs. The band rows
    come from ONE pass over fp: the 4 (band_no, band) structs are built
    as an array and exploded (Spark) / unnest-ed (DuckDB). A per-band
    UNION ALL would re-run the whole explode→distinct→32-sum fingerprint
    pipeline once per band — Spark does not materialize shared CTE
    subplans (same single-pass rule as minhash_lsh_pairs).

    `fp_table` names a pre-materialized fingerprint table to read
    instead of inlining the fp CTE: the band self-join otherwise
    computes the fingerprint pipeline on BOTH sides (a broadcast build
    side cannot be exchange-reused) — callers persist simhash_sql's
    result and pass its view name (q_simhash_pairs does).
    """
    if dialect == "spark":
        xor = "bit_count(a.simhash ^ b.simhash)"
        structs = ", ".join(
            f"named_struct('band_no', {i}, 'band', "
            f"shiftright(simhash, {16 * i}) & 65535)"
            for i in range(N_BANDS)
        )
        bands = (
            f"SELECT doc_id, simhash, b.band_no AS band_no, b.band AS band "
            f"FROM fp LATERAL VIEW explode(array({structs})) t AS b"
        )
    elif dialect == "duckdb":
        xor = "bit_count(xor(a.simhash, b.simhash))"
        structs = ", ".join(
            f"struct_pack(band_no := {i}, band := "
            f"(simhash >> {16 * i}) & 65535)"
            for i in range(N_BANDS)
        )
        bands = (
            f"SELECT doc_id, simhash, "
            f"unnest([{structs}], recursive := true) FROM fp"
        )
    else:
        raise ValueError(dialect)
    if fp_table is None:
        prefix = f"WITH fp AS ({simhash_sql(dialect, table)}),\n"
    else:
        prefix = f"WITH fp AS (SELECT doc_id, simhash FROM {fp_table}),\n"
    return (
        prefix
        + f"bands AS ({bands}),\n"
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
        f"    CAST({xor} AS INT) AS hamming\n"
        "  FROM bands a JOIN bands b ON a.band_no = b.band_no "
        "AND a.band = b.band AND a.doc_id < b.doc_id)\n"
        f"SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}"
    )
