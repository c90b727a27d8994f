"""Dump .explain("formatted") for catalog queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py TAG SUFFIX [q_name ...]   (default: bench set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from thymeflow_back_spark.queries import catalog  # noqa: E402
from thymeflow_back_spark.operators.cachereg import release_pinned  # noqa: E402
from thymeflow_back_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [n for n, q in catalog.QUERIES.items() if q.bench]
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        df = catalog.QUERIES[name].spark(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_pinned()
        print(name, flush=True)


if __name__ == "__main__":
    main()
