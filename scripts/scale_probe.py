"""Scale probe: run the dedup pipeline on an N-fold enlarged corpus.

Generates .scale_tmp/documents.parquet by copying the sf0.1 corpus N
times with a per-copy token suffix (vocabularies stay disjoint, so
near-dup clusters do NOT merge across copies — pair volume grows
linearly, isolating the engine's scaling from the data's quadratic
cluster structure). Prints per-stage wall times.

Usage: python scripts/scale_probe.py [copies=10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_tmp")


def build(copies: int) -> str:
    out = os.path.join(TMP, f"documents_x{copies}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(TMP, exist_ok=True)
    sql = " UNION ALL ".join(
        f"""SELECT doc_id + {i * 1_000_000} AS doc_id,
                  array_to_string(list_transform(string_split(text, ' '),
                                                 t -> t || '_c{i}'), ' ') AS text,
                  lang, source, n_chars
           FROM read_parquet('{BASE}')"""
        for i in range(copies)
    )
    duckdb.sql(f"COPY ({sql}) TO '{out}' (FORMAT parquet)")
    return out


SF_BASE = "/root/testdata/sf0.1"
SCALED = ["lineitem", "orders", "events"]
KEYED = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 0},
    "events": {"event_id": 10_000_000, "user_id": 0},
}
SMALL = ["region", "nation", "customer", "supplier", "part", "documents", "embeddings"]


def build_dir(copies: int) -> str:
    """Materialize a 10x TPC-H-ish dir with SPLITTABLE row groups
    (64k rows) — production storage is many files/row groups; the
    driver fixtures' single-row-group layout caps scan parallelism
    at 1 task regardless of engine quality."""
    out_dir = os.path.join(TMP, f"sfx{copies}")
    if os.path.isdir(out_dir) and os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t in SMALL:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_BASE}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT parquet)"
        )
    for t in SCALED:
        cols = [r[0] for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{SF_BASE}/{t}.parquet')").fetchall()]
        parts = []
        for i in range(copies):
            def col_expr(c: str) -> str:
                off = KEYED[t].get(c)
                if off:
                    return f"{c} + {i * off} AS {c}"
                if t == "events" and c == "ts":
                    # Spark reads DuckDB's plain TIMESTAMP as NTZ; the
                    # engine path expects session-TZ timestamps.
                    return "ts::TIMESTAMPTZ AS ts"
                return c

            sel = ", ".join(col_expr(c) for c in cols)
            parts.append(f"SELECT {sel} FROM read_parquet('{SF_BASE}/{t}.parquet')")
        duckdb.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out_dir}/{t}.parquet' "
            f"(FORMAT parquet, ROW_GROUP_SIZE 65536)"
        )
    return out_dir


def tpch_mode(copies: int) -> None:
    d = build_dir(copies)
    from reader_spark import queries as Q
    from reader_spark.session import get_spark

    spark = get_spark("scale_tpch")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in ["q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
                 "events_hourly", "sessionization", "asof_join_orders",
                 "k3_transfer_dedupe"]:
        fn, _sql = Q.CATALOG[name]
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.perf_counter() - t0:.2f}s")


def build_emb(copies: int) -> str:
    """embeddings x copies: disjoint vec_ids, labels preserved —
    identical vectors per copy (timing probe, not a recall probe)."""
    out = os.path.join(TMP, f"embeddings_x{copies}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(TMP, exist_ok=True)
    sql = " UNION ALL ".join(
        f"""SELECT vec_id + {i * 1_000_000} AS vec_id, embedding, label
           FROM read_parquet('{SF_BASE}/embeddings.parquet')"""
        for i in range(copies)
    )
    duckdb.sql(f"COPY ({sql}) TO '{out}' (FORMAT parquet, ROW_GROUP_SIZE 65536)")
    return out


def r4_mode(copies: int) -> None:
    """Round-4 operators at Nx: chunking, epoch shuffle, PMI, funnel,
    composed IVFxSQ8 ANN, PageRank over the Nx near-dup graph."""
    docs_path = build(copies)
    emb_path = build_emb(copies)
    d = build_dir(copies)  # events x copies for the funnel

    from reader_spark import queries as Q
    from reader_spark.operators import curation as CU
    from reader_spark.operators import dedup as DD
    from reader_spark.operators import graph as GR
    from reader_spark.operators import joins as JO
    from reader_spark.operators import retrieval as RT
    from reader_spark.operators import similarity as SIM
    from reader_spark.session import get_spark, read_table

    import pyspark.sql.functions as F

    spark = get_spark("scale_r4")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)

    def timed(name, df):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.perf_counter() - t0:.2f}s")

    timed("chunk_documents", CU.chunk_documents(docs, width=24, overlap=8))
    timed("epoch_shuffle", CU.epoch_shuffle(docs, n_shards=64, epoch=0))
    timed("pmi_bigrams", RT.pmi_bigrams(docs, min_count=5))
    ev = read_table(spark, d, "events")
    timed(
        "funnel_steps",
        JO.funnel_steps(ev, ["view", "click", "purchase"], horizon_s=7200),
    )
    timed(
        "knn_ivf_sq8",
        SIM.knn_ivf_sq8(emb, list(range(10)), k=5, rerank=10, dim=64),
    )
    # PageRank over the Nx near-dup graph (pair volume grows
    # linearly with copies; 2 iterations bound the probe)
    base = DD.token_hashes(docs).persist()
    sigs = DD.minhash_signature(base, num_hashes=Q._MH_K, hashes_col="toks").persist()
    pairs = DD.lsh_candidate_pairs(sigs, num_hashes=Q._MH_K, band_size=Q._MH_BAND)
    verified = DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base).select(
        "doc_a", "doc_b"
    ).persist()
    t0 = time.perf_counter()
    nv = verified.count()
    print(f"verified-pair graph build: {time.perf_counter() - t0:.2f}s ({nv} pairs)")
    t0 = time.perf_counter()
    GR.pagerank(verified, iterations=2).write.format("noop").mode("overwrite").save()
    print(f"pagerank x2 iters: {time.perf_counter() - t0:.2f}s")


def r4c_mode(copies: int) -> None:
    """Round-4c operators at Nx: image dHash, overlapping-span
    dedup, materialized BM25 index build + search, native session
    windows, z-order write."""
    docs_path = build(copies)
    d = build_dir(copies)

    import pyspark.sql.functions as F

    from reader_spark.operators import curation as CU
    from reader_spark.operators import multimodal as MM
    from reader_spark.operators import partitioning as P
    from reader_spark.operators import retrieval as RT
    from reader_spark.session import get_spark, read_table

    spark = get_spark("scale_r4c")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(docs_path)

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        print(f"{name}: {time.perf_counter() - t0:.2f}s")

    ids = docs.select(F.col("doc_id").alias("media_id"))
    timed(
        "image_dhash (synthesize+decode+hash)",
        lambda: MM.image_dhash(MM.synthesize_images(ids))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    timed(
        "duplicate_spans",
        lambda: CU.duplicate_spans(docs, width=8)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    idx = os.path.join(TMP, f"bm25_idx_x{copies}")
    timed("bm25_index_write", lambda: RT.bm25_index_write(docs, idx, n_buckets=64))
    qs = [(0, "table scan filter"), (1, "spark join shuffle")]
    timed(
        "bm25_topk_indexed",
        lambda: RT.bm25_topk_indexed(spark, idx, qs, k=10, n_buckets=64)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    ev = read_table(spark, d, "events")
    timed(
        "session_window_native",
        lambda: ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    li = read_table(spark, d, "lineitem")
    zpath = os.path.join(TMP, f"zorder_x{copies}")
    timed(
        "zorder_write lineitem (partkey x suppkey)",
        lambda: P.zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=64),
    )


def r4d_mode(copies: int) -> None:
    """Round-4d operators at Nx: trigram search, incremental BM25
    update, audio/video fingerprints, duplicate-span dedup tail."""
    docs_path = build(copies)

    import pyspark.sql.functions as F

    from reader_spark.operators import multimodal as MM
    from reader_spark.operators import retrieval as RT
    from reader_spark.session import get_spark

    spark = get_spark("scale_r4d")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(docs_path)

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        print(f"{name}: {time.perf_counter() - t0:.2f}s")

    timed(
        "trigram_search (3 patterns)",
        lambda: RT.trigram_search(
            docs, [(0, "table"), (1, "fast merge"), (2, "row scan")]
        ).write.format("noop").mode("overwrite").save(),
    )
    idx = os.path.join(TMP, f"bm25_inc_x{copies}")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    timed(
        "bm25_index_write (90% corpus)",
        lambda: RT.bm25_index_write(base, idx, n_buckets=64),
    )
    timed(
        "bm25_index_update (10% delta)",
        lambda: RT.bm25_index_update(spark, idx, delta, n_buckets=64),
    )
    ids = docs.select(F.col("doc_id").alias("media_id"))
    timed(
        "audio_fingerprint (synthesize+decode+fft)",
        lambda: MM.audio_fingerprint(MM.synthesize_wavs(ids, n_samples=256))
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "video_dhash (synthesize+parse+hash)",
        lambda: MM.video_dhash(MM.synthesize_videos(ids))
        .write.format("noop").mode("overwrite").save(),
    )


def _shuffle_bytes(spark) -> int:
    """Total shuffle-write bytes of completed stages, via the UI REST
    API (the probe session enables spark.ui). -1 if unavailable."""
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = _json.load(r)
        return sum(int(s.get("shuffleWriteBytes", 0)) for s in stages)
    except Exception:
        return -1


def r7_mode(copies: int) -> None:
    """Round-7 100x probes (brief target; earlier rounds stopped at
    10x/20x): the near-dup pipeline end-to-end, IVFxSQ8 search over a
    MATERIALIZED index (build timed separately — it is the one-time
    ingest cost), and BM25 search-only over a materialized index.
    Prints wall time + shuffle-write bytes per stage so the 'plans
    stay bounded' claim is evidenced, not asserted."""
    docs_path = build(copies)
    emb_path = build_emb(copies)

    import pyspark.sql.functions as F

    from reader_spark import queries as Q
    from reader_spark.operators import dedup as DD
    from reader_spark.operators import retrieval as RT
    from reader_spark.operators import similarity as SIM
    from reader_spark.session import get_spark

    spark = get_spark("scale_r7", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    print(f"corpus: {docs.count()} docs, {emb.count()} vectors ({copies}x)")

    last = [_shuffle_bytes(spark)]

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        sb = _shuffle_bytes(spark)
        delta = sb - last[0] if sb >= 0 and last[0] >= 0 else -1
        last[0] = sb
        print(f"{name}: {wall:.2f}s  shuffle_write={delta / 1e6:.1f}MB")
        return out

    # -- near-dup dedup, full pipeline (pair volume grows linearly
    # with copies: disjoint per-copy vocabularies)
    base = DD.token_hashes(docs).persist()
    timed("token_hashes", base.count)
    sigs = DD.minhash_signature(
        base, num_hashes=Q._MH_K, hashes_col="toks"
    ).persist()
    timed("signatures", sigs.count)
    pairs = DD.lsh_candidate_pairs(
        sigs, num_hashes=Q._MH_K, band_size=Q._MH_BAND
    )
    verified = DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base)
    nv = timed("lsh+jaccard_verify", verified.count)
    print(f"  verified pairs: {nv}")
    base.unpersist()
    sigs.unpersist()

    # -- IVF over a materialized index: build once (ingest), search
    # reads ONLY probed cells (partition pruning)
    idx = os.path.join(TMP, f"ivf_idx_x{copies}")
    model = timed("ivf_fit (16 clusters)", lambda: SIM.ivf_fit(emb, 16))
    timed(
        "ivf_index_write (one-time ingest)",
        lambda: SIM.ivf_index_write(emb, idx, model),
    )
    probes = emb.limit(20)
    timed(
        "knn_ivf_indexed SEARCH-ONLY (20 queries, nprobe=2)",
        lambda: SIM.knn_ivf_indexed(spark, idx, probes, k=5, nprobe=2)
        .write.format("noop").mode("overwrite").save(),
    )

    # -- BM25 over a materialized index: build once, search touches
    # only the probed term buckets
    bidx = os.path.join(TMP, f"bm25_idx_x{copies}")
    timed(
        "bm25_index_write (one-time ingest)",
        lambda: RT.bm25_index_write(docs, bidx, n_buckets=64),
    )
    timed(
        "bm25_topk_indexed SEARCH-ONLY (3 queries)",
        lambda: RT.bm25_topk_indexed(
            spark, bidx,
            [(0, "table merge"), (1, "fast row scan"), (2, "index")],
            k=10, n_buckets=64,
        ).write.format("noop").mode("overwrite").save(),
    )


def r7b_mode(copies: int) -> None:
    """Late-round-7 additions at Nx: IVFxPQ search, the ANN recall
    audit, token-budget selection, and trigram-index search-only.
    Wall time + shuffle-write bytes per stage."""
    docs_path = build(copies)
    emb_path = build_emb(copies)

    import pyspark.sql.functions as F

    from reader_spark.functions import text as TX
    from reader_spark.operators import curation as CU
    from reader_spark.operators import retrieval as RT
    from reader_spark.operators import similarity as SIM
    from reader_spark.session import get_spark

    spark = get_spark("scale_r7b", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    print(f"corpus: {docs.count()} docs, {emb.count()} vectors ({copies}x)")

    last = [_shuffle_bytes(spark)]

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        sb = _shuffle_bytes(spark)
        delta = sb - last[0] if sb >= 0 and last[0] >= 0 else -1
        last[0] = sb
        print(f"{name}: {wall:.2f}s  shuffle_write={delta / 1e6:.1f}MB")
        return out

    qids = [r["vec_id"] for r in emb.select("vec_id").limit(10).collect()]
    timed(
        f"knn_ivf_pq (10 queries, nprobe=2, m=8)",
        lambda: SIM.knn_ivf_pq(emb, qids, k=5, rerank=10, m=8, dim=64)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "ann_recall_report (10 queries: brute ground truth + IVF)",
        lambda: SIM.ann_recall_report(emb, qids, k=5, nprobe=2)
        .write.format("noop").mode("overwrite").save(),
    )
    timed(
        "budget_select (30% token budget)",
        lambda: CU.budget_select(
            docs, 50_000 * copies, TX.quality_score(F.col("text"))
        ).write.format("noop").mode("overwrite").save(),
    )
    pidx = os.path.join(TMP, f"ivfpq_idx_x{copies}")
    model = timed("ivf_fit (16 clusters)", lambda: SIM.ivf_fit(emb, 16))
    timed(
        "ivf_pq_index_write (one-time ingest)",
        lambda: SIM.ivf_pq_index_write(emb, pidx, model, m=8, dim=64),
    )
    timed(
        "knn_ivf_pq_indexed SEARCH-ONLY (20 queries, nprobe=2)",
        lambda: SIM.knn_ivf_pq_indexed(
            spark, pidx, emb.limit(20), k=5, rerank=10, nprobe=2, m=8, dim=64
        ).write.format("noop").mode("overwrite").save(),
    )
    tidx = os.path.join(TMP, f"trgm_idx_x{copies}")
    timed(
        "trigram_index_write (one-time ingest)",
        lambda: RT.trigram_index_write(docs, tidx, n_buckets=64),
    )
    timed(
        "trigram_search_indexed SEARCH-ONLY (3 patterns)",
        lambda: RT.trigram_search_indexed(
            spark, tidx, docs,
            [(0, "table"), (1, "fast merge"), (2, "row scan")],
            n_buckets=64,
        ).write.format("noop").mode("overwrite").save(),
    )


def r7c_mode(copies: int) -> None:
    """LPA community detection at Nx, split into its two cost
    regimes: the one-time near-dup edges build (shared with pagerank
    / kcore / triangles — the graph-family input) and the 4
    synchronized label rounds. At sf0.1 the rounds' round-1 shuffle
    is the whole cost (labels start as node ids, so the (node,label)
    aggregate is edge-sized once, then collapses); this probe checks
    that shape holds when pair volume grows linearly."""
    docs_path = build(copies)

    import pyspark.sql.functions as F

    from reader_spark.operators import dedup as DD
    from reader_spark.operators import graph as GR
    from reader_spark.session import get_spark

    spark = get_spark("scale_r7c", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(docs_path)
    print(f"corpus: {docs.count()} docs ({copies}x)")

    last = [_shuffle_bytes(spark)]

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        sb = _shuffle_bytes(spark)
        delta = sb - last[0] if sb >= 0 and last[0] >= 0 else -1
        last[0] = sb
        print(f"{name}: {wall:.2f}s  shuffle_write={delta / 1e6:.1f}MB")
        return out

    from reader_spark.cache import pin, release_pins

    base = pin(DD.token_hashes(docs))
    sigs = pin(DD.minhash_signature(base, num_hashes=16, hashes_col="toks"))
    pairs = DD.lsh_candidate_pairs(sigs, num_hashes=16, band_size=8)
    verified = DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base)
    edges = timed(
        "near-dup edges build (shared graph-family input)",
        lambda: (
            verified.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
            .union(
                verified.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
            )
            .distinct()
            .localCheckpoint()
        ),
    )
    print(f"graph: {edges.count()} directed edges, "
          f"{edges.select('s').distinct().count()} nodes")
    # end-to-end re-derives its own edges checkpoint from the warm
    # pinned signatures — rounds-only cost is this minus the edge
    # rebuild (compare against the shared-build line above)
    timed(
        "lpa_communities end-to-end (4 rounds, pins warm)",
        lambda: GR.lpa_communities(
            verified.select("doc_a", "doc_b"), iterations=4
        ).write.format("noop").mode("overwrite").save(),
    )
    release_pins()
    # the materialized-index path: pay the pipeline once at ingest,
    # every graph query thereafter reads the parquet edge artifact
    idx = os.path.join(TMP, f"ndidx_x{copies}")
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    timed(
        "neardup_index_write (one-time ingest)",
        lambda: DD.neardup_index_write(docs, idx),
    )
    release_pins()
    timed(
        "lpa over materialized index (4 rounds, artifact read)",
        lambda: GR.lpa_communities(
            DD.neardup_edges(spark, idx), iterations=4
        ).write.format("noop").mode("overwrite").save(),
    )


def kmeans_mode(copies: int) -> None:
    """Round-7 clustering probes: the deterministic broadcast-Lloyd
    ORACLE path (sorted sequential-fold means — per-cluster vector
    lists on one task each) versus the production quantizer
    (`ivf_fit`: pyspark.ml KMeans trained on a SAMPLE, JVM-side
    assignment), plus `cluster_balanced_sample` over corpus-scale
    assignments. Evidences the kmeans_clusters docstring's scale
    call: the fold path is for oracle-reproducible runs; at 100x you
    fit on a sample with corpus-scaled K and assign with broadcast
    argmin."""
    emb_path = build_emb(copies)

    import pyspark.sql.functions as F

    from reader_spark.operators import curation as CU
    from reader_spark.operators import similarity as SIM
    from reader_spark.session import get_spark

    spark = get_spark("scale_kmeans", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    print(f"corpus: {n} vectors ({copies}x)")
    last = [_shuffle_bytes(spark)]

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        sb = _shuffle_bytes(spark)
        delta = sb - last[0] if sb >= 0 and last[0] >= 0 else -1
        last[0] = sb
        print(f"{name}: {wall:.2f}s  shuffle_write={delta / 1e6:.1f}MB")
        return out

    # Oracle path: full-corpus Lloyd census. Each re-average collects
    # one cluster's vectors onto one task (the bit-reproducibility
    # price) — bounded by max cluster occupancy, so probe it where a
    # census belongs: on the corpus you oracle-check.
    timed(
        "kmeans_clusters ORACLE PATH (2 Lloyd iters, full corpus)",
        lambda: SIM.kmeans_clusters(emb, n_iters=2)
        .write.format("noop").mode("overwrite").save(),
    )

    # Production path: fit K=64 on a ~100k-row sample (cluster count
    # scales with the corpus; the sample bounds training), then
    # assign the FULL corpus with the broadcast argmin.
    frac = min(1.0, 100_000 / max(n, 1))
    sample = emb.sample(fraction=frac, seed=7)
    model = timed(
        f"ivf_fit PRODUCTION (K=64, {frac:.3f} sample)",
        lambda: SIM.ivf_fit(sample, 64),
    )
    # Assignment, production path: JVM model.transform (vectorized
    # KMeans prediction) — no interpreted higher-order-function dot
    # in sight. This is what an ingest job runs at 100 TB.
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
    )
    assigned = model.transform(feats).select(
        "vec_id", F.col("prediction").alias("cl")
    )
    timed(
        "assign FULL corpus (JVM model.transform, K=64)",
        lambda: assigned.write.format("noop").mode("overwrite").save(),
    )

    # Assignment, oracle-determinism path: broadcast argmin over
    # interpreted zip_with/aggregate folds. Forced end-to-end with a
    # noop write (a count() lets Catalyst PRUNE the dot products —
    # measured 3.8s pruned vs the real cost below).
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cl int, c array<double>",
    ).withColumn("nc", SIM.dot(F.col("c"), F.col("c")))
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn("nv", SIM.dot(F.col("vec"), F.col("vec")))
    timed(
        "assign FULL corpus (interpreted broadcast argmin, K=64)",
        lambda: SIM.nearest_clusters(vecs, cents, 1, "vec_id")
        .select("vec_id", "cl")
        .write.format("noop").mode("overwrite").save(),
    )

    timed(
        "cluster_balanced_sample over model assignments (cap=1000)",
        lambda: CU.cluster_balanced_sample(assigned, cap=1000)
        .write.format("noop").mode("overwrite").save(),
    )


def snapshot_mode(copies: int) -> None:
    """Snapshot-path throughput (the reference's primary workload:
    table scan -> Debezium envelope -> publish, §3.1): full lineitem
    at Nx through `snapshot_envelope` into a parquet publish, as
    rows/sec. The reference's envelope for this path is 5,000-row
    chunks and 2,500-msg Kafka publishes (BASELINE.md)."""
    import shutil

    from reader_spark.envelope import snapshot_envelope
    from reader_spark.session import get_spark, read_table

    d = build_dir(copies)
    spark = get_spark("scale_snap")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    li = read_table(spark, d, "lineitem")
    n = li.count()
    out = os.path.join(TMP, f"snap_out_x{copies}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    env = snapshot_envelope(
        li, ["l_orderkey", "l_linenumber"], db="app", table="lineitem"
    )
    env.write.mode("overwrite").parquet(out)
    wall = time.perf_counter() - t0
    print(
        f"snapshot->envelope->publish: {n} rows in {wall:.1f}s = "
        f"{n / wall:,.0f} rows/sec"
    )


def cdc_mode(rows: int) -> None:
    """Composed CDC pipeline throughput (the 2x-vs-baseline gate made
    non-vacuous): logtail stream -> DDL apply -> positional decode ->
    envelope -> parquet publish, measured as sustained DML rows/sec.
    The reference's operational envelope is 5,000-row chunks /
    2,500-msg publishes / 10 s batch deadline (BASELINE.md) — i.e. it
    is sized for hundreds-to-thousands of rows/sec per worker."""
    import json as _json
    import shutil

    from reader_spark.plans.cdc_mysql import run_pipeline
    from reader_spark.session import get_spark
    from reader_spark.streaming.schema_history import SchemaAdapter

    work = os.path.join(TMP, f"cdc_{rows}")
    shutil.rmtree(work, ignore_errors=True)
    log = os.path.join(work, "log")
    os.makedirs(log)
    n_shards = 8
    ddl = {
        "seq": 0, "ts_ms": 0, "db": "app", "tbl": "users", "kind": "ddl",
        "op": None, "gtid_sid": "s0", "gtid_tx": 0,
        "statement": "CREATE TABLE users (id int, name text, email text)",
        "before": None, "after": None,
    }
    handles = [
        open(os.path.join(log, f"shard{i}.jsonl"), "w")
        for i in range(n_shards)
    ]
    handles[0].write(_json.dumps(ddl) + "\n")
    t0 = time.perf_counter()
    for i in range(1, rows + 1):
        op = "c" if i % 3 else "u"
        after = f'{{\\"id\\": {i}, \\"name\\": \\"user{i}\\", \\"email\\": \\"u{i}@x.io\\"}}'
        bfrag = (
            f'"{{\\"id\\": {i}, \\"name\\": \\"old{i}\\", \\"email\\": null}}"'
            if op == "u" else "null"
        )
        handles[i % n_shards].write(
            f'{{"seq": {i}, "ts_ms": {i * 10}, "db": "app", "tbl": "users",'
            f' "kind": "dml", "op": "{op}", "gtid_sid": "s{i % 4}",'
            f' "gtid_tx": {i}, "statement": null,'
            f' "before": {bfrag}, "after": "{after}"}}\n'
        )
    for h in handles:
        h.close()
    print(f"generated {rows} DML rows in {time.perf_counter() - t0:.1f}s")

    spark = get_spark("scale_cdc")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sink = os.path.join(work, "sink")
    ck = os.path.join(work, "ck")
    cap = int(os.environ.get("CDC_MAX_PER_TRIGGER", "0")) or None
    adapter = SchemaAdapter()
    t0 = time.perf_counter()
    # the Python microbatch stream's availableNow fallback runs
    # bounded batches per start; with a cap set, loop restarts until
    # the backlog drains — each loop is a genuine driver restart, so
    # this ALSO measures the restart path's steady-state overhead
    n_out, batches = 0, 0
    for _ in range(1000):
        q = run_pipeline(
            spark, log, sink, ck, "app", ["users"], adapter,
            max_per_trigger=cap,
        )
        q.awaitTermination(1800)
        batches += 1
        n_out = spark.read.parquet(os.path.join(sink, "users")).count()
        if n_out >= rows:
            break
    wall = time.perf_counter() - t0
    label = f" (cap={cap}, {batches} runs)" if cap else ""
    print(
        f"CDC pipeline: {rows} DML rows -> {n_out} envelopes in "
        f"{wall:.1f}s = {rows / wall:,.0f} rows/sec sustained{label}"
    )


def r8cc_mode(copies: int) -> None:
    """Round-8 probe: component-map maintenance economics. Per ingest
    wave, compare the incremental cc update (label-graph resolve +
    bounded bucket rewrite, riding inside neardup_index_update)
    against the alternative a waveful pipeline would otherwise pay —
    a full connected-components rebuild over all stored edges."""
    import shutil

    from pyspark.sql import functions as F

    from reader_spark.operators import dedup as DD
    from reader_spark.session import get_spark

    path = build(copies)
    spark = get_spark("scale_r8", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(path)
    print(f"corpus: {docs.count()} docs ({copies}x)")
    idx = os.path.join(TMP, f"ccidx_x{copies}")
    shutil.rmtree(idx, ignore_errors=True)
    last = [_shuffle_bytes(spark)]

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        sb = _shuffle_bytes(spark)
        delta = sb - last[0] if sb >= 0 and last[0] >= 0 else -1
        last[0] = sb
        print(f"{name}: {wall:.2f}s  shuffle_write={delta / 1e6:.1f}MB")
        return out

    seed = docs.filter(F.col("doc_id") % 20 != 0)
    delta = docs.filter(F.col("doc_id") % 20 == 0)
    timed("index_write (95%)", lambda: DD.neardup_index_write(seed, idx))
    timed(
        "cc_write (full CC build, one-time)",
        lambda: DD.neardup_cc_write(spark, idx, n_buckets=64),
    )
    # isolate the cc increment: same wave against a cc-less clone
    nocc = idx + "_nocc"
    shutil.rmtree(nocc, ignore_errors=True)
    shutil.copytree(idx, nocc)
    shutil.rmtree(os.path.join(nocc, "cc"))
    timed(
        "wave baseline: index_update(5%), NO cc artifact",
        lambda: DD.neardup_index_update(spark, nocc, delta),
    )
    timed(
        "wave: index_update(5%) incl. incremental cc",
        lambda: DD.neardup_index_update(spark, idx, delta),
    )
    got = timed(
        "read component map",
        lambda: DD.neardup_canonical(spark, idx).count(),
    )
    timed(
        "ALTERNATIVE per wave: full cc rebuild",
        lambda: DD.neardup_cc_write(spark, idx, n_buckets=64),
    )
    want = DD.neardup_canonical(spark, idx).count()
    print(f"labeled docs: incremental={got} rebuild={want} (must match)")
    from reader_spark.cache import release_pins

    release_pins()


def r12_mode(copies: int) -> None:
    """Round-12 probe: the occupancy-cap skew guard's value at scale.
    Corpus = embeddings x copies (disjoint ids) PLUS a synthetic
    mega-cluster of `mega` identical vectors — the boilerplate shape
    (one template embedded everywhere). Times semantic_dedup and
    semdedup_prune with the default auto cap versus the uncapped
    opt-out: uncapped, the mega-group's dominance join is
    O(mega^2) pairs on ONE key; capped, its members pass through
    kept and the cost is the healthy remainder."""
    emb_path = build_emb(copies)
    mega = 20_000

    import pyspark.sql.functions as F

    from reader_spark.operators import curation as CU
    from reader_spark.session import get_spark

    spark = get_spark("scale_r12", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = spark.read.parquet(emb_path)
    dim = len(base.select("embedding").first()[0])
    tmpl = (
        spark.range(mega)
        .select(
            (F.col("id") + 50_000_000).alias("vec_id"),
            F.array(
                *[F.lit(1.0 if d == 0 else 0.25) for d in range(dim)]
            ).alias("embedding"),
            F.lit(0).cast(base.schema["label"].dataType).alias("label"),
        )
    )
    emb = base.unionByName(tmpl)
    n = emb.count()
    print(f"corpus: {n} vectors ({copies}x + {mega} mega-cluster)")
    last = [_shuffle_bytes(spark)]

    def timed(name, fn):
        from reader_spark import cache

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        cache.release_pins()
        sb = _shuffle_bytes(spark)
        delta = sb - last[0] if sb >= 0 and last[0] >= 0 else -1
        last[0] = sb
        print(f"{name}: {wall:.2f}s  shuffle_write={delta / 1e6:.1f}MB")
        return out

    def run(df):
        return df.agg(
            F.count("*"), F.sum("is_kept"), F.sum("is_capped")
        ).collect()[0]

    r = timed(
        "semantic_dedup auto cap",
        lambda: run(CU.semantic_dedup(emb)),
    )
    print(f"  rows={r[0]} kept={r[1]} capped={r[2]}")
    r = timed(
        "semdedup_prune auto cap",
        lambda: run(CU.semdedup_prune(emb)),
    )
    print(f"  rows={r[0]} kept={r[1]} capped={r[2]}")
    # the uncapped control at 1/10th the mega size — the quadratic
    # makes the full-size control impractical, which is the point
    small = base.unionByName(tmpl.limit(mega // 10))
    r = timed(
        "semantic_dedup UNCAPPED (mega/10 control)",
        lambda: run(CU.semantic_dedup(small, max_bucket=None)),
    )
    print(f"  rows={r[0]} kept={r[1]} capped={r[2]}")
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "r8cc":
        r8cc_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "tpch":
        tpch_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r4":
        r4_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r4c":
        r4c_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r4d":
        r4d_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7":
        r7_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7b":
        r7b_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r7c":
        r7c_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "r12":
        r12_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "kmeans":
        kmeans_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "cdc":
        cdc_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "snapshot":
        snapshot_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    path = build(copies)
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
    print(f"corpus: {n} docs ({copies}x sf0.1)")

    from reader_spark import queries as Q
    from reader_spark.operators import dedup as DD
    from reader_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(path)

    t0 = time.perf_counter()
    base = DD.token_hashes(docs).persist()
    base.count()
    t1 = time.perf_counter()
    print(f"token_hashes: {t1 - t0:.2f}s")

    sigs = DD.minhash_signature(base, num_hashes=Q._MH_K, hashes_col="toks").persist()
    sigs.count()
    t2 = time.perf_counter()
    print(f"signatures:   {t2 - t1:.2f}s")

    pairs = DD.lsh_candidate_pairs(sigs, num_hashes=Q._MH_K, band_size=Q._MH_BAND)
    verified = DD.jaccard_verify(pairs, docs, threshold=0.8, toks=base)
    nv = verified.count()
    t3 = time.perf_counter()
    print(f"lsh+verify:   {t3 - t2:.2f}s ({nv} verified pairs)")
    print(f"TOTAL:        {t3 - t0:.2f}s")


if __name__ == "__main__":
    main()
