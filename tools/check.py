"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB at the given
scale factor, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted by all columns). Exact equality
is required for non-float columns; floats are compared bit-exactly too —
the query conventions (decimal-exact aggregation, integer microsecond
timestamps) are supposed to guarantee it. Any mismatch prints a diff sample.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from thymeflow_back_spark import queries as catalog  # noqa: E402
from thymeflow_back_spark.operators.cachereg import release_pinned  # noqa: E402
from thymeflow_back_spark.session import get_spark  # noqa: E402
from thymeflow_back_spark.tables import TABLE_NAMES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"row count {len(spark_pd)} vs {len(oracle_pd)}")
    s_cols, o_cols = sorted(spark_pd.columns), sorted(oracle_pd.columns)
    if s_cols != o_cols:
        problems.append(f"columns {s_cols} vs {o_cols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pd), normalize(oracle_pd)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            eq = (sv == ov) | (np.isnan(sv.astype(float)) & np.isnan(ov.astype(float)))
        else:
            eq = sv == ov
        if not bool(np.all(eq)):
            bad = np.flatnonzero(~eq)[:5]
            problems.append(f"col {c}: {len(np.flatnonzero(~eq))} mismatches, e.g. rows {bad.tolist()}: "
                            f"spark={sv[bad].tolist()} oracle={ov[bad].tolist()}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, q in catalog.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pd = q.spark(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # operator-internal pins are per-query state: results are
            # materialized by now, so free them before the next query
            release_pinned()
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(spark_pd)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_pd = con.execute(q.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pd, oracle_pd)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spark_pd)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
