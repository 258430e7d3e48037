"""Streaming near-dup filter (streaming/dedup_stream.py): static LSH
band index + stream-static anti joins."""

import json

from pyspark.sql import types as T

from reader_spark.operators import dedup as DD
from reader_spark.streaming import dedup_stream as DS

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

REFERENCE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark shuffles data between stages when keys move across partitions"),
    (3, "a completely unrelated reference document about cooking pasta slowly"),
]

INCOMING = [
    # near-dup of ref 1 (one word changed)
    (100, "the quick brown fox jumps over the lazy cat near the river bank"),
    # exact dup of ref 2
    (101, "spark shuffles data between stages when keys move across partitions"),
    # novel
    (102, "completely novel text with vocabulary that matches nothing else"),
    (103, "another genuinely new document mentioning telescopes and galaxies"),
]


def _stream(spark, tmp_path, rows):
    p = tmp_path / "docs_in"
    p.mkdir()
    with open(p / "b0.json", "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    return spark.readStream.schema(DOC_SCHEMA).json(str(p))


def test_batch_and_stream_agree_and_novel_pass(spark, tmp_path):
    ref = spark.createDataFrame(REFERENCE, DOC_SCHEMA)
    idx = DS.reference_band_index(ref)

    # batch-mode filter (same function on a bounded frame)
    batch_in = spark.createDataFrame(INCOMING, DOC_SCHEMA)
    batch_kept = sorted(
        r["doc_id"] for r in DS.stream_dedup_filter(batch_in, idx).collect()
    )

    # streaming-mode filter
    out = DS.stream_dedup_filter(_stream(spark, tmp_path, INCOMING), idx)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sdf_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sdf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_kept = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM sdf_out").collect()
    )

    assert stream_kept == batch_kept
    # exact dup always dropped; novel docs always kept
    assert 101 not in stream_kept
    assert 102 in stream_kept and 103 in stream_kept
    # the near-dup is dropped iff the batch LSH pipeline would pair it
    sigs = DD.minhash_signature(
        ref.unionByName(spark.createDataFrame([INCOMING[0]], DOC_SCHEMA))
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DD.lsh_candidate_pairs(sigs).collect()
    }
    lsh_says_dup = any(100 in p for p in pairs)
    assert (100 not in stream_kept) == lsh_says_dup


def test_stream_filter_keeps_payload_columns(spark, tmp_path):
    ref = spark.createDataFrame(REFERENCE, DOC_SCHEMA)
    idx = DS.reference_band_index(ref)
    out = DS.stream_dedup_filter(_stream(spark, tmp_path, INCOMING), idx)
    # signature/bucket scaffolding is dropped; original columns remain
    assert set(out.columns) == {"doc_id", "text"}


def test_index_shape(spark):
    ref = spark.createDataFrame(REFERENCE, DOC_SCHEMA)
    idx = DS.reference_band_index(ref, num_hashes=8, band_size=2)
    assert len(idx) == 4
    for b, frame in enumerate(idx):
        assert frame.columns == [f"bk{b}"]
        n = frame.count()
        assert 0 < n <= len(REFERENCE)


def test_degenerate_docs_pass_the_stream_filter(spark):
    """All-NULL signatures (NULL/sub-shingle docs) must NOT collapse
    onto one constant bucket key: xxhash64 skips NULL inputs, so
    without the guard ONE degenerate reference doc would drop EVERY
    degenerate stream doc as its "near-dup". A NULL signature can
    never verify at any threshold > 0 — the filter keeps those docs
    (same rule as the batch band melt's NULL guard)."""
    ref = spark.createDataFrame(
        REFERENCE + [(4, None)], DOC_SCHEMA
    )
    idx = DS.reference_band_index(ref)
    incoming = spark.createDataFrame(
        INCOMING + [(104, None), (105, None)], DOC_SCHEMA
    )
    kept = sorted(
        r["doc_id"]
        for r in DS.stream_dedup_filter(incoming, idx).collect()
    )
    # degenerate docs survive; real dups still drop
    assert 104 in kept and 105 in kept
    assert 101 not in kept
