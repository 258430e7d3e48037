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


def main() -> None:
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
