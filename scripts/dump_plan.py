"""Dump `.explain("formatted")` for catalog queries to plans/r12/.

Usage: python scripts/dump_plan.py <suffix> [query ...]
  suffix: e.g. "before" / "after" -> plans/r12/<query>_<suffix>.txt

The plan is captured WITHOUT executing the query (the pre-AQE plan),
which is exactly what `.explain("formatted")` prints for a fresh
DataFrame. Queries whose construction runs jobs (index builds, pinned
counts) still run those; the dump reflects the returned frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reader_spark.cache import release_pins  # noqa: E402
from reader_spark.queries import CATALOG  # noqa: E402
from reader_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLAN_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan")
    for name in names:
        fn, _sql = CATALOG[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            release_pins()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
