"""Physical-plan discipline tests — the 100 TB contract.

These assert properties of the PLAN, not the result: filters reach
the parquet scan, projections prune the read schema, small dims
broadcast, and nothing in the whole catalog degenerates into a
cartesian product.
"""

import pyspark.sql.functions as F

from reader_spark.queries import CATALOG
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.slow  # r13 tier: see pytest.ini
def test_no_cartesian_product_anywhere(spark):
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    for name, (fn, _sql) in CATALOG.items():
        df = fn(spark, SF_DIR)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        # driver-hash contract: no DECIMAL reaches a query edge (r1's
        # 16 hash-red rows were all decimal-edge canonicalization),
        # and no nested type either — the driver's pandas
        # canonicalizer sort_values over all columns raises
        # "unhashable type: 'list'" on array/map/struct cells (r2's
        # one red row, multimodal_features).
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DecimalType, ArrayType, MapType, StructType))
        ]
        assert not bad, f"{name} leaks non-scalar/decimal edge columns {bad}"


def test_projection_prunes_scan_schema(spark):
    fn, _ = CATALOG["p1_projection"]
    plan = _plan(fn(spark, SF_DIR))
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l][0]
    # ReadSchema carries only the projected columns, not the full table
    assert "ReadSchema" in plan
    assert "o_orderpriority" not in scan


def test_filter_pushdown_reaches_scan(spark):
    fn, _ = CATALOG["small_quantity_orders"]
    plan = _plan(fn(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert any(
        tok in plan for tok in ("LessThan", "GreaterThan", "EqualTo", "IsNotNull")
    )


def test_small_dims_broadcast_in_q5(spark):
    fn, _ = CATALOG["q5_local_supplier"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan  # nation/region never shuffle the fact side


def test_lsh_builds_broadcast_not_shuffle_join(spark):
    fn, _ = CATALOG["dedup_minhash_lsh"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_broadcasts_are_size_gated(spark):
    # Big-corpus regime: with the cap below the build side's estimate
    # the hint disappears — no forced BroadcastExchange of a
    # corpus-sized table anywhere in the initial plan (AQE may still
    # choose broadcast from ACTUAL sizes at runtime; the driver-OOM
    # risk is the unconditional hint, which must be gone).
    from reader_spark.operators import dedup as DD
    from reader_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents").limit(500)
    # Disable the planner's own size-based broadcast so the plan shows
    # exactly what the HINT forces.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sigs = DD.minhash_signature(docs)
        gated = DD.lsh_candidate_pairs(sigs, broadcast_cap=0)
        plan = gated._jdf.queryExecution().sparkPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan

        sh = DD.simhash(docs)
        gated = DD.simhash_candidate_pairs(sh, broadcast_cap=0)
        plan = gated._jdf.queryExecution().sparkPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan

        # Small regime (default cap): the hint forces the broadcast
        # even with auto-broadcast off.
        hinted = DD.lsh_candidate_pairs(sigs)
        plan = hinted._jdf.queryExecution().sparkPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_knn_bruteforce_broadcasts_queries(spark):
    fn, _ = CATALOG["knn_bruteforce"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q21_scans_fact_table_once(spark):
    # The exists/not-exists chain must collapse to one groupBy, not
    # semi/anti self-joins: lineitem appears in the plan exactly once.
    fn, _ = CATALOG["q21_waiting_supplier"]
    plan = _plan(fn(spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1


def test_q2_argmin_is_aggregate_not_window(spark):
    # Per-part argmin = min(struct(...)), map-side combinable; a
    # window rank would force a second full shuffle + sort.
    fn, _ = CATALOG["q2_min_supplier"]
    plan = _plan(fn(spark, SF_DIR))
    assert "Window" not in plan
    assert plan.count("lineitem.parquet") == 1


def test_q6_pushes_all_predicates_to_scan(spark):
    fn, _ = CATALOG["q6_forecast_revenue"]
    plan = _plan(fn(spark, SF_DIR))
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan, f"{col} predicate not pushed to parquet scan"


def test_clean_corpus_is_two_stage(spark):
    # gates + dedup must stay filter->hash-agg: one shuffle, no join.
    fn, _ = CATALOG["clean_corpus"]
    plan = _plan(fn(spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_shard_pack_has_no_single_partition_window(spark):
    # The prefix sum must be the two-phase form: per-bucket windows
    # (Exchange hashpartitioning) plus a broadcast of the tiny offset
    # table — never a global unpartitioned window, which would move
    # every row through ONE task ("Exchange SinglePartition" feeding a
    # Window with an empty partition spec).
    fn, _ = CATALOG["text_shard_pack"]
    plan = _plan(fn(spark, SF_DIR))
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_q18_preaggregates_below_join(spark):
    # The HAVING aggregate must shrink lineitem BEFORE any join: the
    # first (innermost) operator consuming the lineitem scan is an
    # aggregate, not a join build/probe.
    fn, _ = CATALOG["q18_large_volume"]
    plan = _plan(fn(spark, SF_DIR))
    li_scans = [l for l in plan.splitlines() if "lineitem.parquet" in l]
    assert len(li_scans) == 1
    assert "HashAggregate" in plan


def test_bm25_restricts_before_aggregating(spark):
    # The query-term table must broadcast (never shuffle the corpus
    # against a 9-row table), and the posting restriction happens in
    # the same stage as the explode — so at most the two intended
    # scans of `documents` (postings + corpus scalars) appear.
    fn, _ = CATALOG["text_bm25"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) <= 2, f"bm25 re-scans the corpus: {len(scans)} scans"


def test_contamination_single_conditional_aggregate(spark):
    # totals and hits come from ONE aggregate over the exploded
    # n-gram pass: exactly one left outer join, no second
    # corpus-sized aggregation feeding a doc_id join back.
    fn, _ = CATALOG["contamination_check"]
    plan = _plan(fn(spark, SF_DIR))
    assert plan.count("LeftOuter") == 1
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) <= 2  # corpus side + benchmark side


def test_knn_sq8_broadcasts_queries_only(spark):
    # The approx pass streams the coded corpus against BROADCAST
    # queries; the corpus itself must never sit on a broadcast
    # exchange's build side in the initial plan.
    fn, _ = CATALOG["knn_sq8"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan  # id != query_id, Q rows built
    # the one-row min/max stats frame broadcasts; that's the only
    # other exchange allowed to carry the full corpus' derivation
    assert "CartesianProduct" not in plan


def test_media_pipeline_stays_on_scan_partitioning(spark):
    # r12: synth -> resize -> stats run FUSED in ONE MapInPandas (one
    # Python boundary crossing; parity with the chained forms asserted
    # in test_multimodal.py); the only exchange is the
    # ensure_parallelism round-robin of the tiny id column — blobs
    # themselves never shuffle and never leave the Python worker
    # between steps.
    fn, _ = CATALOG["multimodal_resize"]
    plan = _plan(fn(spark, SF_DIR))
    assert plan.count("MapInPandas") == 1
    import re
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "RoundRobinPartitioning" for e in exchanges), exchanges


def test_passage_dedup_joins_on_uniform_hash(spark):
    # the occurrence-count join is keyed on the 60-bit passage hash —
    # a plain shuffled equi-join on uniform keys (broadcast-gated at
    # toy scale is fine); no cartesian, no corpus re-scan beyond the
    # two uses of the exploded frame.
    fn, _ = CATALOG["passage_dedup"]
    plan = _plan(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) <= 2


def test_containment_reuses_filtered_postings(spark):
    # both sides of the pair self-join read the SAME persisted
    # prefix-filtered postings (two InMemoryTableScans) — the df-count
    # aggregate runs once, not once per side; the denominator is an
    # array expression on the scan (no explode+aggregate); and the
    # pair join is an equi-join, never a cartesian.
    fn, _ = CATALOG["dedup_containment"]
    plan = _plan(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") == 2


def test_shard_concat_groups_on_shard_only(spark):
    # the ordered concatenation aggregates on shard_id (bounded
    # groups), with the two-phase prefix sum's bucket window upstream
    # — no global single-partition window (SinglePartition exchange)
    # anywhere.
    fn, _ = CATALOG["shard_pack_concat"]
    plan = _plan(fn(spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_doc_chunks_is_shuffle_free(spark):
    # chunking is scan-stage array arithmetic: no KEY shuffle anywhere
    # (the one RoundRobin exchange is ensure_parallelism's deliberate
    # single-file fan-out — it disappears on a properly-split corpus)
    fn, _ = CATALOG["doc_chunks"]
    plan = _plan(fn(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_epoch_shuffle_partitions_by_shard_only(spark):
    # exactly one hash exchange, keyed on the shard — never a global
    # (single-partition) sort or window
    fn, _ = CATALOG["epoch_shuffle"]
    plan = _plan(fn(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_knn_pq_lut_joins_are_broadcast(spark):
    # the ADC pass joins corpus codes against the tiny LUT / codebook
    # frames: those must be broadcast joins, never a sort-merge of the
    # corpus against a 128-row table
    fn, _ = CATALOG["knn_pq"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_report_fk_checks_broadcast_anti(spark):
    fn, _ = CATALOG["data_quality_report"]
    plan = _plan(fn(spark, SF_DIR))
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    ), plan
