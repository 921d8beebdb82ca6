from __future__ import annotations

import __spark_entry__ as e


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"o_orderkey", "genre", "n_items", "revenue"}


def test_contract_shapes():
    qs = e.queries()
    oracles = e.oracle_sql()
    assert "flagship" in qs
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_run_smoke(spark):
    """Every registered query executes and returns a DataFrame at sf0.001."""
    for name, fn in e.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
