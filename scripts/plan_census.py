"""Plan census over the headline set: for every bench query, capture
the formatted plan and summarize its structural markers (exchanges,
join strategies, Python nodes, cartesians, windows, scans) into one
TSV — the r12 "examined" evidence for queries left alone.

Usage: python scripts/plan_census.py [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reader_spark.cache import release_pins  # noqa: E402
from reader_spark.queries import CATALOG  # noqa: E402
from reader_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_census.tsv"
    import bench

    spark = get_spark("plan_census")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = []
    for name in bench.HEADLINE:
        fn, _sql = CATALOG[name]
        try:
            df = fn(spark, sf_dir)
            # capture the public explain("formatted") output instead
            # of calling JVM internals directly (ADVICE r12: the
            # PythonSQLUtils path breaks under Spark Connect / across
            # versions); DataFrame.explain prints via Python print,
            # so redirect_stdout captures it on both backends.
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # pragma: no cover
            # sanitize: a message containing tabs/newlines would
            # corrupt the one-row-per-query TSV
            msg = re.sub(r"\s+", " ", str(e))[:300]
            rows.append((name, f"ERROR {msg}"))
            release_pins()
            continue
        release_pins()
        # count operator NODES from the numbered detail section, not
        # tree indentation (each node appears once as "(n) OpName").
        ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M)
        from collections import Counter

        c = Counter(ops)
        marks = {
            "exch": c["Exchange"],
            "bexch": c["BroadcastExchange"],
            "smj": c["SortMergeJoin"],
            "shj": c["ShuffledHashJoin"],
            "bhj": c["BroadcastHashJoin"],
            "bnlj": c["BroadcastNestedLoopJoin"] + c["CartesianProduct"],
            "py": c["MapInPandas"] + c["ArrowEvalPython"]
            + c["BatchEvalPython"] + c["FlatMapGroupsInPandas"],
            "win": c["Window"] + c["WindowGroupLimit"],
            "scan": c["Scan"],
            "imr": c["InMemoryRelation"],
            "sort": c["Sort"],
        }
        rows.append(
            (name, " ".join(f"{k}={v}" for k, v in marks.items() if v))
        )
    with open(out_path, "w") as fh:
        for name, summary in rows:
            fh.write(f"{name}\t{summary}\n")
    print(f"wrote {out_path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
