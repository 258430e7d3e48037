"""Capture the PER-ROUND physical plan of lpa_communities' label
update (the round-exit truncation means the catalog query's returned
frame shows only the tail — this probe rebuilds rounds the way the
operator does and dumps the ROUND-2 update plan, i.e. a round whose
label input came through the previous round's exit, which is exactly
where the r12 shape re-inserted the label-side exchange).

Usage: LPA_SHAPE={r12|r13} python scripts/lpa_probe.py <suffix>
Writes plans/r13/lpa_round_<suffix>.txt, then warm-times the catalog
query (bench protocol, best of 3).

Shapes (keep in sync with graph.lpa_communities):
  r12: round exit = localCheckpoint(eager=False); two aggregate
       exchanges per round (hash(d,lbl) then hash(d)).
  r13: round exit = pin(); one repartition(N, d) below both
       aggregates — the operator's current shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reader_spark.cache import pin, release_pins  # noqa: E402
from reader_spark.operators import dedup as DD  # noqa: E402
from reader_spark.queries import CATALOG  # noqa: E402
from reader_spark.session import get_spark, read_table  # noqa: E402

SHAPE = os.environ.get("LPA_SHAPE", "r13")


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lpa_probe")
    docs = read_table(spark, sf_dir, "documents")

    base = pin(DD.token_hashes(docs))
    sigs = pin(DD.minhash_signature(base, num_hashes=128, hashes_col="toks"))
    pairs = DD.lsh_candidate_pairs(sigs, num_hashes=128, band_size=8)
    verified = DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base).select(
        "doc_a", "doc_b"
    )

    n_part = spark.sparkContext.defaultParallelism
    sym = verified.select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
    ).union(
        verified.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    )
    edges = pin(
        sym.repartition(n_part, F.col("s")).dropDuplicates(["s", "d"])
    )
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )

    def one_round(labels):
        joined = edges.join(
            labels.withColumnRenamed("node", "s").hint("shuffle_hash"), "s"
        )
        if SHAPE == "r13":
            nb = (
                joined.select("d", "lbl")
                .repartition(n_part, F.col("d"))
                .groupBy("d", "lbl")
                .agg(F.count(F.lit(1)).alias("n"))
            )
        else:
            nb = joined.groupBy("d", "lbl").agg(F.count(F.lit(1)).alias("n"))
        return (
            nb.groupBy("d")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("nn"), F.col("lbl").alias("l"))
                ).alias("__m")
            )
            .select(F.col("d").alias("node"), F.col("__m.l").alias("lbl"))
        )

    if SHAPE == "r13":
        # mirror the operator: materialize each step so the next
        # round's plan compiles against the cache's real partitioning
        # (un-executed AQE cached plans report UnknownPartitioning)
        edges.count()
        labels1 = pin(one_round(labels))
        labels1.count()
    else:
        labels1 = one_round(labels).localCheckpoint(eager=False)
    upd = one_round(labels1)

    plan = upd._sc._jvm.PythonSQLUtils.explainString(
        upd._jdf.queryExecution(), "formatted"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"lpa_round_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path}")
    release_pins()

    # warm timing of the catalog query (bench protocol, best of 3)
    fn, _sql = CATALOG["lpa_communities"]
    times = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            release_pins()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"lpa_communities: best={min(times)} all={times}")


if __name__ == "__main__":
    main()
