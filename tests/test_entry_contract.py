"""Driver-contract smoke tests (SURVEY.md §5.2.4)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_every_oracle_key_has_query():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40


def test_oracle_sql_covers_most_queries():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    # Only genuinely non-SQL-expressible ops (approx sketches, hash-
    # family-specific LSH, approximate ANN) may omit the oracle: ≥90%
    # of declared queries must carry a DuckDB twin.
    assert len(osql) >= 0.9 * len(qs)
    rows_only = sorted(set(qs) - set(osql))
    assert all(
        n in {
            "q_approx_distinct", "q_percentile_approx", "q_minhash_lsh",
            "q_embedding_ann", "q_embedding_ivf", "q_neardup_verified",
        }
        for n in rows_only
    ), f"unexpected rows-only queries: {rows_only}"
