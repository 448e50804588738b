"""Every registered oracle must be valid DuckDB SQL over the real schema.

The driver only value-checks ~50 queries per round, so an oracle typo
in the back of the catalog could hide for rounds. This runs DuckDB
EXPLAIN (bind + plan, no execution) for all 225 oracles against views
over the smoke-scale parquet — pure DuckDB, no Spark session, ~seconds
for the whole catalog."""

from __future__ import annotations

import duckdb
import pytest

from mapreducegcp_spark.registry import oracle_sqls
from mapreducegcp_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(oracle_sqls()))
def test_oracle_binds(con, name):
    sql = oracle_sqls()[name]
    try:
        con.execute(f"EXPLAIN {sql}")
    except Exception as e:  # noqa: BLE001 — surface the binder error verbatim
        pytest.fail(f"oracle for {name!r} failed to bind: {e}")
