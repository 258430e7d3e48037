"""Streaming near-duplicate filtering against a static LSH index.

The production shape for continuous corpus ingestion: a batch job
builds a MinHash band-bucket index over the existing corpus
(`reference_band_index`); the ingest stream attaches the same
signatures and drops any document whose band key hits the index
(`stream_dedup_filter`). Stateless on the stream side — no watermark
or state store needed, because the "have I seen something like this"
state lives in the static index, refreshed by re-running the batch
builder (Spark re-plans stream-static joins every micro-batch, so a
replaced index path picks up on the next trigger).

Scale design (100 TB corpus, unbounded stream):
  * The index is per-band DISTINCT bucket keys — |corpus| x n_bands
    longs upper bound, far smaller than the corpus text. Each
    anti-join broadcasts one band's key set when it fits (the same
    plan Catalyst picks for a sub-threshold static side); past that
    the stream-static join shuffles only the micro-batch.
  * Signature attachment is pure projection (md5 + affine mixes, no
    shuffle), identical to the batch path in operators/dedup.py —
    the index and the stream CANNOT drift because both sides share
    `md5_base_mod` / `minhash_mix_params`.
  * False-positive rate is the LSH banding curve: a stream doc is
    dropped iff it collides with some corpus doc on ALL hashes of
    some band — the same guarantee `lsh_candidate_pairs` gives the
    batch pipeline (reference semantics: candidate = any-band full
    match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.operators import dedup as DD


def attach_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
) -> DataFrame:
    """Add h0..h{k-1} MinHash signature columns, keeping every
    existing column (streaming-safe: pure withColumn projections,
    works on unbounded frames where a join-back on id would not)."""
    out = df.withColumn(
        "__hms", F.transform(DD.word_set(F.col(text_col)), DD.md5_base_mod)
    )
    # one-arg closure factory: F.transform reads the lambda's arity,
    # so default-arg capture (lambda h, a=a, b=b) would present as a
    # 3-arg lambda and fail analysis
    def mix(a: int, b: int):
        return lambda h: (F.lit(a).cast("long") * h + F.lit(b)) % DD.MINHASH_P

    for i in range(num_hashes):
        a, b = DD.minhash_mix_params(i)
        out = out.withColumn(
            f"h{i}", F.array_min(F.transform(F.col("__hms"), mix(a, b)))
        )
    return out.drop("__hms")


def band_keys(
    df: DataFrame, num_hashes: int = 8, band_size: int = 2, prefix: str = "bk"
) -> DataFrame:
    """Collapse each signature band to one 64-bit bucket key column
    bk0..bk{n_bands-1} (xxhash64 over the band's hashes — the same
    any-band-full-match semantics as the batch band join, one long
    per band instead of `band_size` columns)."""
    assert num_hashes % band_size == 0
    for band in range(num_hashes // band_size):
        cols = [
            F.col(f"h{j}")
            for j in range(band * band_size, (band + 1) * band_size)
        ]
        # xxhash64 SKIPS NULL inputs, so an all-NULL signature
        # (empty/NULL doc) would key the constant xxhash64(band) in
        # every band: one degenerate reference doc would then drop
        # EVERY degenerate stream doc as its "near-dup". Null the
        # key instead — NULL never equi-matches, so the anti-join
        # keeps degenerate docs (a NULL signature can never verify
        # at any threshold > 0; same rule as the batch band melt).
        df = df.withColumn(
            f"{prefix}{band}",
            F.when(
                F.col("h0").isNotNull(), F.xxhash64(F.lit(band), *cols)
            ),
        )
    return df


def reference_band_index(
    reference_docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
) -> list[DataFrame]:
    """Batch-side index builder: per band, the DISTINCT bucket keys
    of the reference corpus. Returned as one small DataFrame per band
    (cache them — every micro-batch probes all of them)."""
    keyed = band_keys(
        attach_minhash(
            DD.ensure_parallelism(reference_docs), text_col, num_hashes
        ),
        num_hashes,
        band_size,
    )
    n_bands = num_hashes // band_size
    return [
        keyed.select(F.col(f"bk{b}")).distinct() for b in range(n_bands)
    ]


def stream_dedup_filter(
    stream_docs: DataFrame,
    index: list[DataFrame],
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Pass through only stream documents with NO near-duplicate in
    the reference index: one stream-static LEFT ANTI join per band
    (append-mode safe, stateless). A document survives iff every
    band's bucket key misses the index."""
    s = band_keys(
        attach_minhash(stream_docs, text_col, num_hashes),
        num_hashes,
        band_size,
    )
    n_bands = num_hashes // band_size
    assert len(index) == n_bands, "index band count mismatch"
    for b, idx in enumerate(index):
        s = s.join(F.broadcast(idx), f"bk{b}", "left_anti")
    drop = [f"h{i}" for i in range(num_hashes)] + [
        f"bk{b}" for b in range(n_bands)
    ]
    return s.drop(*drop)
