"""Text-analysis scalar functions for training-data pipelines.

Beyond-reference surface (BASELINE.json): language ID, quality
scoring, token counting, document fingerprinting. All pure column
expressions — map-only at any scale, no UDFs, whole-stage codegen.
Every formula is engine-reproducible (DuckDB oracle computes the
identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from reader_spark.functions.localrel import local_df

# Tiny marker lexicons for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a"],
    "de": ["der", "und", "die", "das"],
    "es": ["el", "la", "los", "que"],
    "fr": ["le", "les", "des", "une"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences via length arithmetic —
    deterministic and identical in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def padded(text: Column) -> Column:
    """Space-pad so word-boundary counting can use ' w ' needles."""
    return F.concat(F.lit(" "), text, F.lit(" "))


def marker_score(text: Column, lang: str) -> Column:
    p = padded(text)
    s = F.lit(0).cast("long")
    for w in LANG_MARKERS[lang]:
        s = s + occurrences(p, f" {w} ")
    return s


def lang_id(text: Column) -> Column:
    """Argmax over marker scores with a deterministic preference
    order (en > de > es > fr on ties)."""
    scores = {lang: marker_score(text, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # Build the CASE back-to-front so earlier langs win ties.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_count_ws(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def token_count_bpe_ish(n_chars: Column) -> Column:
    """Cheap BPE token ESTIMATE: ~4 chars/token, integer arithmetic
    so both engines agree exactly (the constant-time path for
    budget/pricing heuristics)."""
    return ((n_chars.cast("long") + 3) / 4).cast("long")


# GPT-2-style pre-tokenizer pattern, minus the trailing-space
# lookahead (RE2 — the DuckDB oracle's engine — has no lookahead).
# Contractions | space-prefixed letter runs | digit runs | other runs
# | whitespace runs.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_regex(text: Column) -> Column:
    """BPE-ish pre-tokenizer COUNT: number of GPT-2-style pre-token
    matches (the exact-split path; JVM regexp, no UDF)."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN)).cast("long")


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(
        F.regexp_replace(text, r"[\.\,\;\:\!\?]", "")
    )


def stopword_count(text: Column) -> Column:
    p = padded(F.lower(text))
    s = F.lit(0).cast("long")
    for w in STOPWORDS:
        s = s + occurrences(p, f" {w} ")
    return s


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, ~1]: rewards stopword
    density and mid-length docs, penalizes punctuation soup.

    score = 0.4*min(1, tokens/100) + 0.4*min(1, 8*stop/tokens)
          + 0.2*(1 - min(1, 4*punct/chars))
    Division order is fixed; round(6) for cross-engine hashing."""
    toks = token_count_ws(text).cast("double")
    stops = stopword_count(text).cast("double")
    puncts = punct_count(text).cast("double")
    chars = F.length(text).cast("double")
    s = (
        F.lit(0.4) * F.least(F.lit(1.0), toks / F.lit(100.0))
        + F.lit(0.4) * F.least(F.lit(1.0), F.lit(8.0) * stops / toks)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), F.lit(4.0) * puncts / chars))
    )
    return F.round(s, 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text. (A content-defined rolling-hash variant lives in
    the Pandas-UDF tier — this is the expression-tier fingerprint.)"""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def shard_pack(
    docs,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    docs_per_bucket: int = 250_000,
):
    """Training-shard packing: assign documents to shards so each
    shard holds ~budget tokens — shard = floor(cumulative_tokens /
    budget) over the stable numeric id order. (A doc larger than the
    budget gets its own shard; packing is deterministic because the
    order is the id order, not a bin-packing search.)

    Scale shape — two-phase distributed prefix sum, NEVER a global
    unpartitioned window (which would funnel every row through one
    task): the id space is cut into order-preserving range buckets,
    per-bucket token subtotals are collected to the driver (one row
    per bucket — thousands at 100 TB, not billions), turned into
    exclusive prefix offsets, broadcast back, and each bucket computes
    its local running sum under a window PARTITIONED by bucket. The
    two prefix passes scan only (id, n_tokens) — column pruning keeps
    the text out of every shuffle."""
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(id_col), token_count_ws(F.col(text_col)).alias("n_tokens")
    )
    lo, hi, cnt = toks.agg(
        F.min(id_col), F.max(id_col), F.count(F.lit(1))
    ).first()
    if not cnt:
        return toks.withColumn("shard_id", F.lit(0).cast("long"))
    width = max(1, (int(hi) - int(lo)) // max(1, cnt // docs_per_bucket + 1) + 1)
    bucket = F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(width)).cast("long")
    b = toks.withColumn("_b", bucket)
    subs = b.groupBy("_b").agg(F.sum("n_tokens").alias("_t")).collect()
    offsets, run = [], 0
    for r in sorted(subs, key=lambda r: r["_b"]):
        offsets.append((r["_b"], run))
        run += int(r["_t"])
    off = local_df(docs.sparkSession, offsets, "_b long, _off long")
    w = W.partitionBy("_b").orderBy(F.col(id_col)).rowsBetween(
        W.unboundedPreceding, -1
    )
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_off")
    return (
        b.join(F.broadcast(off), "_b")
        .withColumn("shard_id", F.floor(prior / F.lit(budget_tokens)).cast("long"))
        .select(id_col, "n_tokens", "shard_id")
    )


def weighted_sample(
    docs,
    weight: Column,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "ws",
):
    """Quality-weighted deterministic sampling: keep a document with
    probability rate * weight (clamped to [0,1]) using the md5-derived
    uniform in [0,1) from its id — reproducible across runs/engines
    (no RNG state), map-only, filter pushes to the scan."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight * F.lit(rate)))
    return docs.filter(u < p)


# ---------------------------------------------------------------------------
# PII scrubbing (RE2-compatible patterns — no lookaround/backrefs, so
# the DuckDB oracle's regex engine matches the JVM's byte-for-byte on
# these classes)

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def pii_scrub(text: Column) -> Column:
    """Replace emails, dotted-quad IPs, and NNN-NNN-NNNN phone
    numbers with typed placeholder tags. Order matters: emails first
    (an email can contain digit runs a later pass would misread),
    then phones, then IPs. Pure JVM regexp_replace — map-only,
    whole-stage codegen, no UDF."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return out


def tag_count(scrubbed: Column, tag: str) -> Column:
    """Count placeholder tags via length arithmetic (identical in
    both engines — avoids regexp_count dialect drift)."""
    return (
        (
            F.length(scrubbed)
            - F.length(F.replace(scrubbed, F.lit(tag), F.lit("")))
        )
        / len(tag)
    ).cast("long")
