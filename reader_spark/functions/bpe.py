"""Distributed BPE tokenizer training and encoding.

The tokenizer-vocabulary verb of a training-data pipeline: learn
byte-pair-encoding merge rules from the corpus, then count/encode
documents under the learned vocabulary.

Scale design (100 TB):
  * The corpus is touched EXACTLY ONCE — the word-frequency count
    (uniform keys, map-side combinable). Everything after operates on
    the vocabulary-sized (word, count) table, exactly how classical
    BPE trainers work; corpus size only changes the counts.
  * Each merge iteration is one explode + one aggregate over the
    vocabulary table plus a 1-row argmax to the driver (the merge
    rule — bounded control-plane state, the same contract as
    connected_components' convergence probes). The pair-merge rewrite
    is a pure array fold; `localCheckpoint` truncates the k-deep
    iteration lineage.
  * Encoding applies the merge list per DISTINCT word (vocabulary-
    sized pandas batch — the merge loop is genuinely iterative
    string surgery, the one place Arrow-batched Python is the right
    tool), then broadcast-joins token counts back to the corpus.

Determinism: argmax tie-breaks are (count DESC, left ASC, right ASC);
greedy left-to-right merge application — the trained rule list is a
pure function of the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the single corpus pass."""
    from reader_spark.operators.dedup import ensure_parallelism

    return (
        ensure_parallelism(docs)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _chars(word: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b —
    a sequential array fold, bit-identical to the reference python
    implementation's scan."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merge rules from the corpus. Stops early
    when no adjacent pair reaches `min_pair_count` weighted
    occurrences. Returns the ordered rule list."""
    wc = word_counts(docs, text_col)
    syms = wc.select(
        "cnt", _chars(F.col("word")).alias("s")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        s = F.col("s")
        pairs = (
            syms.filter(F.size(s) >= 2)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice(s, 1, F.size(s) - 1).alias("a"),
                        F.slice(s, 2, F.size(s) - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(
            F.col("n").desc(), F.col("a"), F.col("b")
        ).first()
        if best is None or best["n"] < min_pair_count:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        syms = syms.select(
            "cnt", _merge_expr(F.col("s"), a, b).alias("s")
        ).localCheckpoint()
    return merges


def apply_merges(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Reference greedy application of the rule list to one symbol
    sequence (also used by the tests as the independent oracle)."""
    for a, b in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token count under the learned merges: encode each
    DISTINCT word once (vocabulary-sized Arrow batches), broadcast the
    per-word token counts back, sum per document."""
    from reader_spark.operators.dedup import ensure_parallelism, maybe_broadcast

    words = (
        ensure_parallelism(docs)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    distinct_words = words.distinct()

    rules = list(merges)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = [
                len(apply_merges(list(w), rules)) for w in pdf["word"]
            ]
            yield pd.DataFrame({"word": pdf["word"], "n_word_tokens": n})

    encoded = distinct_words.mapInPandas(
        enc, "word string, n_word_tokens long"
    )
    per_doc_words = (
        ensure_parallelism(docs)
        .select(
            id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        per_doc_words.join(maybe_broadcast(encoded), "word")
        .groupBy(id_col)
        .agg(F.sum("n_word_tokens").alias("n_bpe_tokens"))
    )
