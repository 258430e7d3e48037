"""Interleaved A/B of the LPA round shape (old window+SMJ vs r12
s-partitioned edges + shuffled-hash + min-struct agg) — both variants
built in ONE warm session and run ALTERNATELY so the VM's noisy-host
stalls land on both sides. Usage: python scripts/lpa_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from reader_spark.cache import pin, release_pins  # noqa: E402
from reader_spark.operators import dedup as DD  # noqa: E402
from reader_spark.session import get_spark, read_table  # noqa: E402


def pipeline(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    base = pin(DD.token_hashes(docs))
    sigs = pin(DD.minhash_signature(base, num_hashes=128, hashes_col="toks"))
    pairs = DD.lsh_candidate_pairs(sigs, num_hashes=128, band_size=8)
    return DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base).select(
        "doc_a", "doc_b"
    )


def lpa_old(pairs, iterations=4):
    """The r12 shape: pinned edges + SHJ + two-exchange aggregate
    chain, round exit via localCheckpoint(eager=False) (which drops
    the round output's HashPartitioning, re-inserting the label-side
    join exchange every round)."""
    spark = pairs.sparkSession
    edges = pin(
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .repartition(spark.sparkContext.defaultParallelism, F.col("s"))
        .dropDuplicates(["s", "d"])
    )
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(iterations):
        nb = edges.join(
            labels.withColumnRenamed("node", "s").hint("shuffle_hash"), "s"
        ).groupBy("d", "lbl").agg(F.count(F.lit(1)).alias("n"))
        labels = (
            nb.groupBy("d")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("nn"), F.col("lbl").alias("l"))
                ).alias("__m")
            )
            .select(F.col("d").alias("node"), F.col("__m.l").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def lpa_new(pairs, iterations=4):
    """A-variant: keep the (d,lbl) partial-agg exchange (map-side
    reduction), add repartition(N, d) between the two aggregates
    (tiny, fully-reduced rows), pin the round exit so the next
    round's join is exchange-free on both sides."""
    spark = pairs.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    edges = pin(
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")))
        .repartition(n_part, F.col("s"))
        .dropDuplicates(["s", "d"])
    )
    edges.count()
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(iterations):
        nb = (
            edges.join(
                labels.withColumnRenamed("node", "s").hint("shuffle_hash"), "s"
            )
            .groupBy("d", "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
            .repartition(n_part, F.col("d"))
        )
        labels = pin(
            nb.groupBy("d")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("nn"), F.col("lbl").alias("l"))
                ).alias("__m")
            )
            .select(F.col("d").alias("node"), F.col("__m.l").alias("lbl"))
        )
        labels.count()
    return labels.select("node", F.col("lbl").alias("community"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lpa_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results = {"old": [], "new": []}
    for _ in range(reps):
        for name, lpa in (("old", lpa_old), ("new", lpa_new)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                lpa(pipeline(spark, sf_dir)).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                release_pins()
            results[name].append(round(time.perf_counter() - t0, 2))
            print(f"{name}: {results[name][-1]}", flush=True)
    for name, ts in results.items():
        print(f"{name}: best={min(ts)} med={sorted(ts)[len(ts)//2]} all={ts}")


if __name__ == "__main__":
    main()
