"""Every catalog oracle must be valid DuckDB SQL over the standard views.

The full value comparison lives in tools/check.py (and the driver's
correctness gate); this net is the fast syntactic half — a typo'd oracle
otherwise surfaces only when the 20-minute full check or the driver runs.
EXPLAIN parses, binds names, and type-checks without executing, so the
whole catalog validates in seconds with no Spark session.
"""

from __future__ import annotations

import duckdb
import pytest

from thymeflow_back_spark.queries import catalog
from thymeflow_back_spark.tables import TABLE_NAMES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize(
    "name", [n for n, q in catalog.QUERIES.items() if q.oracle is not None]
)
def test_oracle_explains(con, name):
    con.execute("EXPLAIN " + catalog.QUERIES[name].oracle)
