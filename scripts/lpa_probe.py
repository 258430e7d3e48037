"""Capture the PER-ROUND physical plan of lpa_communities' label
update (the localCheckpoints truncate the returned frame's plan, so
plans/r12/lpa_communities_{before,after}.txt show only the final RDD
scan — this probe rebuilds one round the way the operator does and
prints the un-truncated round plan, plus a warm timing of the full
catalog query).

Usage: python scripts/lpa_probe.py <suffix>
Writes plans/r12/lpa_round_<suffix>.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reader_spark.cache import release_pins  # noqa: E402
from reader_spark.operators import dedup as DD  # noqa: E402
from reader_spark.queries import CATALOG  # noqa: E402
from reader_spark.session import get_spark, read_table  # noqa: E402

# mirror the operator's current edge construction (import-time code
# can't be reused because the operator builds edges inside the
# function); keep in sync with graph.lpa_communities.
USE_R12_SHAPE = os.environ.get("LPA_SHAPE", "r12") == "r12"


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lpa_probe")
    docs = read_table(spark, sf_dir, "documents")

    from reader_spark.cache import pin

    base = pin(DD.token_hashes(docs))
    sigs = pin(DD.minhash_signature(base, num_hashes=128, hashes_col="toks"))
    pairs = DD.lsh_candidate_pairs(sigs, num_hashes=128, band_size=8)
    verified = DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base).select(
        "doc_a", "doc_b"
    )

    sym = verified.select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
    ).union(
        verified.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    )
    if USE_R12_SHAPE:
        edges = pin(
            sym.repartition(
                spark.sparkContext.defaultParallelism, F.col("s")
            ).dropDuplicates(["s", "d"])
        )
        edges.count()  # materialize so the round plan reads the cache
    else:
        edges = sym.distinct().localCheckpoint()
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    nb = edges.join(
        labels.withColumnRenamed("node", "s").hint("shuffle_hash")
        if USE_R12_SHAPE
        else labels.withColumnRenamed("node", "s"),
        "s",
    ).groupBy("d", "lbl").agg(F.count(F.lit(1)).alias("n"))
    if USE_R12_SHAPE:
        upd = (
            nb.groupBy("d")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("nn"), F.col("lbl").alias("l"))
                ).alias("__m")
            )
            .select(F.col("d").alias("node"), F.col("__m.l").alias("lbl"))
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("d").orderBy(F.col("n").desc(), F.col("lbl").asc())
        upd = (
            nb.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select(F.col("d").alias("node"), "lbl")
        )
    plan = upd._sc._jvm.PythonSQLUtils.explainString(
        upd._jdf.queryExecution(), "formatted"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
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
