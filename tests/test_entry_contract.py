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
    # Only genuinely non-SQL-expressible ops may omit the oracle.
    assert len(osql) >= len(qs) - 5
