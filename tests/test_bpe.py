"""Distributed BPE training/encoding vs an independent pure-python
reference trainer (same tie-breaks), on the classic corpus and the
fixture documents."""

from collections import Counter

from reader_spark.functions import bpe


def ref_train(word_freq: dict[str, int], n_merges: int, min_count: int = 2):
    """Independent reference BPE trainer."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            c = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in vocab:
            vocab[w] = bpe.apply_merges(vocab[w], [(a, b)])
    return merges


def test_bpe_train_matches_reference_on_classic_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf = Counter(w for t in texts for w in t.split())
    want = ref_train(dict(wf), 10)
    got = bpe.bpe_train(docs, 10)
    assert got == want
    assert ("e", "s") in got or ("l", "o") in got  # sanity: known merges


def test_bpe_token_counts_match_reference(spark, sf_dir):
    from reader_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(60)
    merges = bpe.bpe_train(docs, 8)
    assert len(merges) == 8
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe.bpe_token_counts(docs, merges).collect()}
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        words = [w for w in r["text"].split(" ") if w]
        want = sum(len(bpe.apply_merges(list(w), merges)) for w in words)
        assert out[r["doc_id"]] == want
    # merging strictly reduces or preserves token counts vs chars
    chars = {r["doc_id"]: sum(len(w) for w in r["text"].split(" ") if w)
             for r in rows}
    assert all(out[d] <= chars[d] for d in out)
    assert any(out[d] < chars[d] for d in out)


def test_bpe_train_matches_reference_on_fixture(spark, sf_dir):
    from reader_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(40)
    texts = [r["text"] for r in docs.select("text").collect()]
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    assert bpe.bpe_train(docs, 6) == ref_train(dict(wf), 6)
