"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in Spark SQL functions (JVM, whole-stage codegen);
the rolling-hash fingerprint is the one numpy pandas-UDF (Arrow-batched).
Every function returns plain DataFrames so Catalyst can push filters and
prune columns through them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# language-id heuristic: tiny per-language stopword sets (deterministic,
# SQL-expressible so the DuckDB oracle can replicate exactly)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "des", "une"],
    "es": ["el", "los", "que", "una", "por", "con"],
}


def token_count(c: Column) -> Column:
    """Whitespace-delimited token count (no empty tokens)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))


# GPT-2-style pretokenizer shape, restricted to lookahead-free RE2 syntax so
# the exact same pattern runs in Spark (Java regex) and DuckDB (RE2): a
# token is an optionally space-prefixed letter run, digit run, or symbol
# run; residual whitespace runs count as one token each.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(c: Column) -> Column:
    """BPE-ish subword-boundary token count (pretokenizer granularity —
    the unit a byte-pair tokenizer would start from)."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def word_count(c: Column, word: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(rf"\b{word}\b"), 0))


def stopword_hits(c: Column, lang: str) -> Column:
    words = "|".join(LANG_STOPWORDS[lang])
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(rf"\b({words})\b"), 0))


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword-ratio language id: argmax of per-language stopword
    hit counts (ties → lexicographically first language, deterministic)."""
    c = F.col(text_col)
    hit_cols = [stopword_hits(c, lg).alias(f"hits_{lg}") for lg in sorted(LANG_STOPWORDS)]
    scored = df.select("*", *hit_cols)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pick = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties: apply last
        pick = F.when((F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pick)
    return scored.withColumn("lang_pred", pick)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, tokens, mean token length,
    punctuation ratio, uppercase ratio, stopword ratio — plus a composed
    [0,1] quality score."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tok = token_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[\.,;:!\?]"), 0))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), 0))
    n_stop = stopword_hits(c, "en")
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tok = F.greatest(n_tok, F.lit(1))
    mean_tok_len = ((n_chars - n_tok + 1) / safe_tok).cast("double")
    punct_ratio = (n_punct / safe_chars).cast("double")
    upper_ratio = (n_upper / safe_chars).cast("double")
    stop_ratio = (n_stop / safe_tok).cast("double")
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * 0.3
    ).cast("double")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        F.round(mean_tok_len, 4).alias("q_mean_tok_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(upper_ratio, 4).alias("q_upper_ratio"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        F.round(score, 4).alias("q_score"),
    )


def char_ngrams(c: Column, n: int = 3) -> Column:
    """Array of all character n-grams (SQL-expressible: sequence+transform)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: c.substr(i, F.lit(n)))


def fingerprint_md5(df: DataFrame, key_cols: list[str], text_col: str = "text") -> DataFrame:
    """Whole-document fingerprint (md5 hex) — the cheap exact-dup key."""
    return df.select(*key_cols, F.md5(F.col(text_col)).alias("fp_md5"))


def repetition_ratio(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text", n: int = 4
) -> DataFrame:
    """Duplicate n-gram fraction WITHIN each document — the standard
    boilerplate/repetition quality signal (high ratio → templated or
    looping text). Computed entirely row-local with ``array_distinct``
    over the shingle array: no explode, no shuffle — scales at scan
    speed on any corpus size."""
    c = F.col(text_col)
    sh = F.when(F.length(c) >= n, char_ngrams(c, n)).otherwise(
        F.array().cast("array<string>")
    )
    total = F.size(sh)
    uniq = F.size(F.array_distinct(sh))
    return df.select(
        F.col(key_col),
        total.cast("long").alias("n_ngrams"),
        uniq.cast("long").alias("n_distinct"),
        F.when(total > 0, F.round((total - uniq) / total, 6))
        .otherwise(F.lit(0.0))
        .alias("repetition"),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.0,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: per document, the fraction of its
    DISTINCT character n-grams that appear anywhere in the benchmark set
    (the eval-leakage screen a training pipeline runs before a data
    release). Candidates meet through a shingle equi-join — never
    all-pairs; the distinct benchmark shingle set is broadcast when small
    (``broadcast_benchmark``), else it joins shuffled like any equi-join."""
    c = F.col(text_col)
    d_sh = docs.filter(F.length(c) >= n).select(
        F.col(key_col).alias("key"),
        F.explode(F.array_distinct(char_ngrams(c, n))).alias("sh"),
    )
    b_sh = (
        benchmark.filter(F.length(c) >= n)
        .select(F.explode(F.array_distinct(char_ngrams(c, n))).alias("sh"))
        .distinct()
    )
    b_sh = b_sh.withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    # ONE pass over the expensive doc-shingle stream: mark hits with a
    # left join, then count total and non-null marks in a single groupBy
    # (a separate sizes/hits pair would scan+explode the documents twice
    # and shuffle the shingle stream into two aggregations)
    marked = d_sh.join(b_sh, on="sh", how="left")
    frac = F.col("n_hit") / F.col("n_sh")
    return (
        marked.groupBy("key")
        .agg(
            F.count("*").alias("n_sh"),
            F.count("_hit").alias("n_hit"),
        )
        .select(
            F.col("key").alias(key_col),
            F.col("n_sh").cast("long").alias("n_shingles"),
            F.col("n_hit").cast("long").alias("n_contaminated"),
            F.round(frac, 6).alias("contamination"),
        )
        .filter(F.col("contamination") >= threshold)
    )


_WINNOW_SCHEMA = T.ArrayType(T.LongType())


@F.pandas_udf(_WINNOW_SCHEMA)
def _winnow_udf(texts: pd.Series) -> pd.Series:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003): polynomial
    hash over k-grams, minimum per sliding window. All arithmetic is native
    uint64 with wraparound (hash family = mod 2^64, masked to 63 bits for
    LongType) — no dtype=object big-int math in the hot path.

    Batched across the WHOLE Arrow batch: all documents' bytes are
    concatenated once, the K=8 polynomial passes and the sliding-window
    min run once over the concatenation, and per-document results are
    sliced back out by offset — k-grams and windows that would span a
    document boundary are simply never read (a doc with n bytes owns
    exactly hash positions [o, o+n-K] and window starts [o, o+n-K-W+1]).
    The earlier per-document form repeated the passes once per row."""
    K, W, B = 8, 16, np.uint64(257)

    # B^(K-1-j) mod 2^64, computed once per batch
    powers = np.empty(K, dtype=np.uint64)
    powers[K - 1] = 1
    for j in range(K - 2, -1, -1):
        powers[j] = powers[j + 1] * B  # uint64 wraparound is the modulus

    encoded = [None if t is None else t.encode("utf-8") for t in texts]
    lens = [0 if e is None else len(e) for e in encoded]
    offs = np.concatenate(([0], np.cumsum(lens))).tolist()
    total = offs[-1]

    h = wins = None
    if total >= K:
        buf = np.frombuffer(
            b"".join(e for e in encoded if e), dtype=np.uint8
        ).astype(np.uint64)
        h = np.zeros(total - K + 1, dtype=np.uint64)
        for j in range(K):  # K=8 vector passes for the whole batch
            h += buf[j : total - K + 1 + j] * powers[j]
        h &= np.uint64((1 << 63) - 1)  # non-negative in int64
        h = h.astype(np.int64)  # one bulk cast instead of per-doc casts
        if len(h) > W:
            wins = np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)

    res = []
    for i, e in enumerate(encoded):
        if e is None:
            res.append(None)
            continue
        n, o = lens[i], offs[i]
        if n < K:
            res.append([])
            continue
        nh = n - K + 1  # this doc's hash positions: h[o : o+nh]
        if nh <= W:
            res.append([int(h[o : o + nh].min())])
        else:
            res.append(np.unique(wins[o : o + nh - W + 1]).tolist())
    return pd.Series(res, dtype=object)


def fingerprint_winnow(df: DataFrame, key_cols: list[str], text_col: str = "text") -> DataFrame:
    return df.select(*key_cols, _winnow_udf(F.col(text_col)).alias("fp_winnow"))
