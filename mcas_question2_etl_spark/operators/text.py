"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language-ID heuristic, document fingerprinting.

All are per-row Column expressions over the ``documents`` table — narrow
ops that fuse into the scan stage (no shuffle, no Python). At 100 TB
these run at parquet-scan speed, which is the point: text quality
filtering is the first pass over a crawl and must not cost more than
the read.

The reference has no text layer; these extend its capability surface
per the engine charter (documents/embeddings tables, TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny English stopword set used by the quality/lang-id heuristics;
#: chosen to be expressible identically in any SQL oracle.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: trim + lowercase + collapse
    internal whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), " +", " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Grouping by this 32-hex key instead of the raw text keeps the
    exact-dedup shuffle narrow (fixed-width keys, not document bodies)."""
    return F.md5(normalize_text(col))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: token count, distinct-token ratio,
    stopword ratio, average token length."""
    toks = tokens(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return (
        df.withColumn("n_tokens", n)
        .withColumn("distinct_ratio", n_distinct / n)
        .withColumn("stopword_ratio", n_stop / n)
        .withColumn(
            "avg_token_len",
            (F.length(text_col) - (n - F.lit(1))) / n,
        )
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language-ID heuristic.

    Real language ID needs per-language n-gram profiles (fastText/CLD3
    class libraries — not in this container); this is the standard
    stopword-fraction heuristic with a single English profile:
    stopword_frac >= 0.04 -> 'en', else 'und' (BCP-47 undetermined).
    The Spark-side plumbing (expression shape, column contract) is what
    a real profile table would plug into — swap STOPWORDS for a
    per-language map + argmax over scores.
    """
    toks = tokens(text_col)
    frac = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(toks)
    return df.withColumn("stopword_frac", frac).withColumn(
        "predicted_lang", F.when(frac >= 0.04, "en").otherwise("und")
    )
