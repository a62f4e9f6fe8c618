"""Smoke test of the driver contract (mirrors the driver's t1 check)."""

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"id", "cluster_id", "url"}
    # every clustered id belongs to exactly one cluster
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_contract_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key corresponds to a query
    assert set(oracles) <= set(qs)
