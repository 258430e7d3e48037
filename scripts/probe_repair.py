"""Round-9 scale probe: anti-entropy repair is bounded by the damage.

Builds a 2M-row bucketed transfer table, corrupts a handful of keys,
and measures reconcile_repair: wall time, buckets rewritten, and the
comparison points (full-table rewrite; the audit alone). Run solo —
timings are meaningless under concurrent load.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reader_spark.operators import atomic_dir  # noqa: E402
from reader_spark.operators.transfer import (  # noqa: E402
    TransferWriter,
    reconcile,
    reconcile_repair,
)
from reader_spark.session import get_spark  # noqa: E402


def main() -> None:
    import tempfile

    spark = get_spark("probe-repair")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    n, n_buckets, n_bad = 2_000_000, 64, 10
    base = str(tempfile.mkdtemp(prefix="repairprobe"))
    source = spark.range(n).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("val"),
        F.pmod(F.col("id"), F.lit(97)).alias("grp"),
    )
    w = TransferWriter(spark, base)
    t0 = time.perf_counter()
    seed = source.select(
        "*", F.lit("c").alias("op"), F.lit(0).alias("seq")
    )
    w.upsert_bucketed("t", seed, ["id"], "seq", n_buckets=n_buckets)
    t_seed = time.perf_counter() - t0
    root = atomic_dir.resolve(os.path.join(base, "t"))

    # corrupt n_bad keys in place via a targeted upsert (known-bad val)
    bad_ids = [i * (n // n_bad) + 7 for i in range(n_bad)]
    corrupt = spark.createDataFrame(
        [(i, "CORRUPT", i % 97, "c", 1) for i in bad_ids],
        "id long, val string, grp long, op string, seq long",
    )
    w.upsert_bucketed("t", corrupt, ["id"], "seq", n_buckets=n_buckets)

    def mtimes():
        return {
            d: os.stat(os.path.join(root, d)).st_mtime
            for d in os.listdir(root)
            if d.startswith("bucket=")
        }

    before = mtimes()
    t0 = time.perf_counter()
    counts = reconcile_repair(w, "t", source, ["id"], n_buckets=n_buckets)
    t_repair = time.perf_counter() - t0
    after = mtimes()
    rewritten = [d for d in after if after[d] != before.get(d)]

    t0 = time.perf_counter()
    verdict = {
        r["status"]: r["n_keys"]
        for r in reconcile(source, w.read("t"), ["id"]).collect()
    }
    t_audit = time.perf_counter() - t0

    print(
        f"rows={n} buckets={n_buckets} damaged_keys={n_bad}\n"
        f"seed_write={t_seed:.1f}s (the full-rewrite comparison point)\n"
        f"repair={t_repair:.1f}s counts={counts} "
        f"buckets_rewritten={len(rewritten)}/{n_buckets}\n"
        f"post-repair audit={t_audit:.1f}s verdict={verdict}"
    )


if __name__ == "__main__":
    main()
