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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


#: BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
#: the splits a byte-pair-encoding tokenizer's pre-tokenization pass
#: makes (GPT-2 style, ASCII subset so the Java-regex and RE2 dialects
#: agree byte-for-byte; no lookarounds, which RE2 lacks).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex.

    A real BPE vocab merge is a per-token trie walk (constant work per
    token, Python/Arrow path); the pre-tokenizer count here is the
    standard cheap proxy and stays a narrow JVM expression — at crawl
    scale this runs inside the parquet scan stage.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def bpe_token_count_sql(col: str) -> str:
    """DuckDB twin of :func:`bpe_token_count` (RE2 dialect)."""
    return f"length(regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))"


#: rolling-hash parameters: base fits in 20 bits, modulus is the
#: Mersenne prime 2^31-1, token hashes are 60-bit — every intermediate
#: (acc*B + t < 2^51 + 2^60) stays inside a 64-bit signed int, so the
#: fold is exact in any engine with bigint arithmetic.
ROLL_BASE = 1_000_003
ROLL_MOD = (1 << 31) - 1

# 60-bit md5-derived token hash (same construction as dedup.py's, kept
# textually separate because the two modules render different dialects).
_ROLL_TOKEN_HASH = "cast(conv(substring(md5({t}), 1, 15), 16, 10) as bigint)"
_ROLL_TOKEN_HASH_SQL = "CAST(('0x' || substring(md5({t}), 1, 15)) AS BIGINT)"


def rolling_hash_expr(text_col: str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    (Rabin–Karp) folded over whitespace tokens,
    ``h = (h*B + hash(tok)) mod M``.

    Unlike the md5-of-whole-text fingerprint this is incremental — a
    streaming ingest can extend it token-by-token — and unlike SimHash
    it is order-sensitive, so it distinguishes permuted documents.
    Narrow single-pass projection: no shuffle, no Python.
    """
    hashes = f"transform(split({text_col}, ' '), t -> {_ROLL_TOKEN_HASH.format(t='t')})"
    return F.expr(
        f"aggregate({hashes}, cast(0 as bigint), "
        f"(acc, h) -> (acc * {ROLL_BASE} + h) % {ROLL_MOD})"
    )


def rolling_hash_sql(text_col: str) -> str:
    """DuckDB twin of :func:`rolling_hash_expr`. DuckDB's
    ``list_reduce`` has no explicit zero accumulator, so we prepend 0:
    the first step ``(0*B + h0) % M`` matches Spark's fold from zero."""
    hashes = (
        f"list_transform(string_split({text_col}, ' '), "
        f"t -> {_ROLL_TOKEN_HASH_SQL.format(t='t')})"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes}), "
        f"(acc, h) -> (acc * {ROLL_BASE} + h) % {ROLL_MOD})"
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


def gopher_quality_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style document quality gate (Rae et al. 2021 §A1.1;
    Raffel et al. 2020 §2.2) as ONE narrow projection — every metric is
    a Column expression over the raw text, so at 100 TB the whole gate
    runs inside the parquet scan stage with zero shuffle and zero
    Python.

    Emitted per document:
      * ``n_words``            whitespace word count
      * ``mean_word_len``      (Gopher keeps 3..10)
      * ``alpha_word_frac``    fraction of words containing a letter
      * ``n_stopwords_distinct``  distinct stopwords present (Gopher
                                  demands >= 2 as an English-ness check)
      * ``dup_line_frac``      fraction of non-unique lines (repetition
                               signal; 0.0 for single-line docs)
      * ``top_word_frac``      share of the single most frequent word —
                               the within-doc repetition signal that
                               catches template/boilerplate text
      * ``keep``               the conjunctive gate

    The top-word mode is computed as a per-row higher-order expression
    (distinct words x containment count). That is O(v*n) per document —
    v is the per-doc vocabulary, so cost stays row-local and
    scan-fused; it never becomes a corpus-wide explode+groupBy.
    """
    # tokenize/line-split ONCE per row into array columns: every metric
    # below references the arrays, so the split doesn't re-run per
    # metric (or per lambda element — the top-word mode alone would
    # otherwise re-split O(v) times per document)
    staged = df.select(
        "doc_id",
        F.length(text_col).alias("__len"),
        tokens(text_col).alias("__toks"),
        F.split(F.col(text_col), "\n").alias("__lines"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    n_lines = F.size("__lines")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)),
        )
    )
    mean_len = (F.col("__len") - (n - F.lit(1))) / n
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])))
    dup_line = F.lit(1.0) - F.size(F.array_distinct("__lines")) / n_lines
    top_frac = top_cnt / n
    keep = (
        (n >= 10)
        & (n <= 100000)
        & (mean_len >= 2.0)
        & (mean_len <= 12.0)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
        & (dup_line <= 0.3)
        & (top_frac <= 0.2)
    )
    return staged.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stopwords_distinct"),
        dup_line.alias("dup_line_frac"),
        top_frac.alias("top_word_frac"),
        keep.alias("keep"),
    )


def gopher_quality_sql(stopwords_in: str) -> str:
    """DuckDB twin of :func:`gopher_quality_report` (callers pass the
    quoted stopword list, e.g. plans/data_pipeline._STOP_IN)."""
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lns
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             (length(text) - (len(toks) - 1)) / len(toks) AS mean_word_len,
             len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
               / len(toks) AS alpha_word_frac,
             len(list_intersect(list_distinct(toks), {stopwords_in}))
               AS n_stopwords_distinct,
             1.0 - len(list_distinct(lns)) / len(lns) AS dup_line_frac,
             list_max(list_transform(list_distinct(toks),
                      d -> len(list_filter(toks, w -> w = d))))
               / len(toks) AS top_word_frac
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           mean_word_len, alpha_word_frac,
           CAST(n_stopwords_distinct AS BIGINT) AS n_stopwords_distinct,
           dup_line_frac, top_word_frac,
           n_words BETWEEN 10 AND 100000
             AND mean_word_len BETWEEN 2.0 AND 12.0
             AND alpha_word_frac >= 0.8
             AND n_stopwords_distinct >= 2
             AND dup_line_frac <= 0.3
             AND top_word_frac <= 0.2 AS keep
    FROM m
    """


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k most distinctive terms per document by TF-IDF.

    Uses the LINEAR idf variant (score = tf * N / df, no logarithm):
    for a fixed corpus the ranking is identical to log-idf for any
    monotone idf, but every arithmetic step (int multiply, one double
    divide) is exactly IEEE-reproducible across engines — ln() is last-
    ulp engine-dependent and would make the oracle hash flaky (same
    bit-reproducibility discipline as the Q20 fixed-point cosine in
    operators/similarity.py). Ties break by term ascending.

    Scale: the explode shuffles (doc_id, term) pairs — fixed-width,
    never the document body — with map-side partial counts; the df
    (document-frequency) side is |vocabulary| rows and broadcast back.
    At 100 TB add a min_df prune before the broadcast; the per-doc
    top-k is WindowGroupLimit-pushed so each task keeps k candidates
    per doc before the final exchange.
    """
    from pyspark.sql import Window

    pairs = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = pairs.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "score")
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` over ``documents``."""
    return f"""
    WITH pairs AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM pairs GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM pairs GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS rank
          FROM scored)
    WHERE rank <= {k}
    """


#: RE2-safe PII patterns (no lookarounds, so the Java and RE2 regex
#: dialects agree byte-for-byte): emails and NANP-style phone fragments.
PII_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]*[A-Za-z]"
PII_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def redact_pii(col: Column | str, replacement: str = "<PII>") -> Column:
    """Mask email addresses and phone numbers (C4-style corpus
    hygiene). One narrow regexp_replace chain — scan-fused, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL_RE, replacement),
        PII_PHONE_RE,
        replacement,
    )


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for audit reporting."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.regexp_count(c, F.lit(PII_EMAIL_RE)).cast("long"),
        F.regexp_count(c, F.lit(PII_PHONE_RE)).cast("long"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval: top-``k`` documents for a bag-of-words query.

    Standard Robertson/Sparck-Jones BM25 with the +1 idf smoothing
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), always positive):

    Scale shape: the term postings are filtered to the query's terms at
    the scan (``array_contains``-style IN filter before the explode
    fans out), so the per-(doc, term) tf aggregation shuffles only
    query-matched tokens — O(matches), not O(corpus tokens). The
    corpus-level constants (N, avgdl) and the per-term df are tiny and
    broadcast; the final top-k is a TakeOrdered, never a full sort.
    Ties break on ``id_col`` so the result is total-ordered and
    engine-portable.
    """
    terms = [t for t in query_terms]
    toks = tokens(text_col)
    dl = df.select(
        F.col(id_col), F.size(toks).alias("__dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("__t"))
        .filter(F.col("__t").isin(terms))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dft = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    norm = F.col("__tf") * (k1 + 1) / (
        F.col("__tf")
        + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dft), "__t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", idf * norm)
        .groupBy(id_col)
        .agg(
            F.sum("__s").alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bm25_topk_sql(
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25_topk`."""
    terms_in = "('" + "', '".join(query_terms) + "')"
    return f"""
    WITH dl AS (
      SELECT {id_col}, len(string_split({text_col}, ' ')) AS dl FROM {table}
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT {id_col}, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t
            FROM {table})
      WHERE t IN {terms_in}
      GROUP BY 1, 2
    ),
    dft AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
    SELECT tf.{id_col},
           SUM(ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf * ({k1} + 1)
               / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl)))
             AS score,
           CAST(COUNT(*) AS BIGINT) AS n_matched_terms
    FROM tf
    JOIN dft USING (t)
    JOIN dl ON dl.{id_col} = tf.{id_col}
    CROSS JOIN stats
    GROUP BY 1
    ORDER BY score DESC, tf.{id_col}
    LIMIT {k}
    """


def unigram_logprob_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Language-model quality proxy: per-doc mean unigram negative
    log-probability under the corpus's own empirical distribution —
    the CCNet-style "perplexity filter" shape with the corpus itself
    standing in for the external LM (plug a real KenLM table into the
    same join at production time).

    A doc of common words scores low (fluent/boilerplate); rare-token
    soup scores high. Filtering the extreme tails of this score is the
    classic second-stage quality gate after rule-based Gopher filters.

    Scale shape: the unigram table is one groupBy over tokens whose
    size is the VOCABULARY (tiny; Zipf), so it broadcasts; the per-doc
    score is then a scan-side explode + broadcast-join + one doc-keyed
    aggregation. Nothing wide ever shuffles except (id, token-logp)
    pairs.
    """
    toks = tokens(text_col)
    exploded = df.select(F.col(id_col), F.explode(toks).alias("__t"))
    total = exploded.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    uni = exploded.groupBy("__t").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    return (
        exploded.join(F.broadcast(uni), "__t")
        .crossJoin(F.broadcast(total))
        .withColumn("__nll", -F.log(F.col("__c") / F.col("__n")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__nll").alias("sum_nll"),
            (F.sum("__nll") / F.count(F.lit(1))).alias("mean_nll"),
        )
    )


def unigram_logprob_quality_sql(
    id_col: str = "doc_id", text_col: str = "text", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`unigram_logprob_quality`."""
    return f"""
    WITH e AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
    uni AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS c FROM e GROUP BY t)
    SELECT e.{id_col},
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           SUM(-ln(uni.c / total.n)) AS sum_nll,
           SUM(-ln(uni.c / total.n)) / COUNT(*) AS mean_nll
    FROM e JOIN uni USING (t) CROSS JOIN total
    GROUP BY e.{id_col}
    """


def zipf_token_ranks(
    df: DataFrame, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Rank-frequency table (the Zipf curve) of the corpus vocabulary:
    top ``top_k`` tokens as ``(rank, term, cnt)``, rank 1 = most
    frequent, ties broken by term ascending. All-integer output, so the
    oracle compares exact values.

    Scale: explode shuffles fixed-width (term) keys with map-side
    partial counts; the ranking window runs over the AGGREGATED
    vocab table (Zipf-tiny relative to the corpus), and the global
    top-k is a TakeOrdered, not a full sort.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # top-k FIRST (TakeOrdered over the vocab table), then the ranking
    # window only ever sees top_k rows
    top = counts.orderBy(F.col("cnt").desc(), F.col("term")).limit(top_k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "term", "cnt"
    )


def zipf_token_ranks_sql(top_k: int = 50, table: str = "documents") -> str:
    """DuckDB twin of :func:`zipf_token_ranks`."""
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM {table}
    ),
    counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
           term, CAST(cnt AS BIGINT) AS cnt
    FROM counts
    QUALIFY rank <= {top_k}
    ORDER BY rank
    """


def term_cooccurrence_lift(
    df: DataFrame,
    vocab_k: int = 200,
    top_pairs: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top co-occurring term pairs with their lift
    ``n_ab * N / (n_a * n_b)`` — the collocation-mining kernel (PMI is
    ln(lift); the linear variant keeps every step exact-int multiply +
    one IEEE double divide, the same cross-engine-reproducibility
    discipline as `tfidf_top_terms`). ``n_x`` counts DOCUMENTS
    containing x (presence, not frequency).

    Scale: the quadratic step is the per-document self-join, and it
    runs only over the ``vocab_k`` most frequent terms (ties by term)
    — a broadcast-pruned posting list, so cost is O(docs * k_doc²)
    with k_doc <= distinct vocab terms per doc, never O(vocab²) and
    never a document-body shuffle. Output ordered by n_ab desc,
    (t1, t2) asc, limited to ``top_pairs``.
    """
    pairs = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).distinct()
    vocab = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs_term"))
        .orderBy(F.col("n_docs_term").desc(), F.col("term"))
        .limit(vocab_k)
    )
    pruned = pairs.join(F.broadcast(vocab), "term").select(
        id_col, "term", "n_docs_term"
    )
    a, b = pruned.alias("a"), pruned.alias("b")
    co = (
        a.join(
            b,
            (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("t1"),
            F.col("b.term").alias("t2"),
            F.col("a.n_docs_term").alias("n_a"),
            F.col("b.n_docs_term").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        co.crossJoin(F.broadcast(n_docs))
        .select(
            "t1",
            "t2",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("n_docs")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "t1", "t2")
        .limit(top_pairs)
    )


def term_cooccurrence_lift_sql(
    vocab_k: int = 200, top_pairs: int = 30, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`term_cooccurrence_lift`."""
    return f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM {table}
    ),
    vocab AS (
      SELECT term, COUNT(*) AS n_docs_term FROM pairs GROUP BY term
      ORDER BY n_docs_term DESC, term LIMIT {vocab_k}
    ),
    pruned AS (
      SELECT p.doc_id, p.term, v.n_docs_term
      FROM pairs p JOIN vocab v USING (term)
    ),
    co AS (
      SELECT a.term AS t1, b.term AS t2,
             a.n_docs_term AS n_a, b.n_docs_term AS n_b,
             COUNT(*) AS n_ab
      FROM pruned a JOIN pruned b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2, 3, 4
    )
    SELECT t1, t2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_ab * (SELECT COUNT(*) FROM {table}) AS DOUBLE)
             / (n_a * n_b) AS lift
    FROM co
    ORDER BY n_ab DESC, t1, t2
    LIMIT {top_pairs}
    """


def bigram_logprob_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Second-order LM quality proxy: per-doc mean add-one-smoothed
    bigram negative log-probability -ln((c(w1,w2)+1)/(c1(w1)+V)) under
    the corpus's own bigram distribution, where c1 counts w1 in
    non-final positions and V is the corpus vocabulary. Catches the
    word-salad documents a unigram table scores as fluent (every token
    common, no token ORDER) — the standard step up from
    :func:`unigram_logprob_quality` before reaching for a real KenLM.

    Scale shape: bigrams come from a scan-stage slice+transform (no
    self-join of positions) and the corpus is scanned exactly TWICE
    (once to build the model, once to score): the bigram table
    shuffles fixed-width (w1,w2) keys with map-side combine and is
    Zipf-bounded, so the unigram marginals c1(w1) = sum_w2 c12 and the
    bigram-participating vocabulary V both derive from that tiny table
    — never from a corpus rescan — and broadcast back into the scoring
    scan. The per-doc score is ONE doc-keyed aggregation. The per-doc
    double sum spans ~hundreds of terms — far inside the gate's
    9-significant-digit tolerance.
    """
    # tokenize ONCE per row (a lambda that re-invoked split(text) per
    # element would be O(len^2) splits per document)
    toked = df.select(F.col(id_col), tokens(text_col).alias("__ts"))
    bigrams = F.expr(
        "transform(slice(__ts, 1, size(__ts) - 1), "
        "(t, i) -> struct(t as w1, __ts[i + 1] as w2))"
    )
    pairs = toked.select(
        F.col(id_col), F.explode(bigrams).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # materialize the Zipf-tiny bigram table: the marginal, the
    # vocabulary, and the scoring join all reuse it, and without the
    # checkpoint each consumer would re-run the corpus explode
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    # marginal + vocabulary from the AGGREGATED table (Zipf-tiny), so
    # neither needs another pass over the corpus
    first = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        big.select(F.col("w1").alias("t"))
        .union(big.select(F.col("w2").alias("t")))
        .agg(F.count_distinct("t").cast("double").alias("v"))
    )
    nll = -F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    return (
        pairs.join(F.broadcast(big), ["w1", "w2"])
        .join(F.broadcast(first), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(nll).alias("sum_nll"),
            (F.sum(nll) / F.count(F.lit(1))).alias("mean_nll"),
        )
    )


def bigram_logprob_quality_sql(
    id_col: str = "doc_id", text_col: str = "text", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`bigram_logprob_quality`."""
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS ts FROM {table}
    ),
    pairs AS (
      SELECT {id_col}, ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(range(1, len(ts))) AS t(i)
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    firsts AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
      FROM (SELECT w1 AS t FROM big UNION ALL SELECT w2 FROM big)
    )
    SELECT p.{id_col},
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           SUM(-ln((big.c12 + 1.0) / (firsts.c1 + vocab.v))) AS sum_nll,
           SUM(-ln((big.c12 + 1.0) / (firsts.c1 + vocab.v))) / COUNT(*) AS mean_nll
    FROM pairs p JOIN big USING (w1, w2) JOIN firsts USING (w1) CROSS JOIN vocab
    GROUP BY p.{id_col}
    """


def feature_hash_report(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashing-trick audit: map every corpus token into ``n_buckets``
    via the engine-portable md5 bucket (:func:`.sampling.hash_bucket`)
    and report the bucket-occupancy histogram — (occupancy = distinct
    tokens in bucket) -> (n_buckets, vocab mass, token mass). The
    pre-flight check before committing to a hashed feature dimension:
    occupancy >= 2 rows quantify collision damage, mass-weighted.

    Exactness: bucket assignment is integer md5 arithmetic (identical
    in both engines, unlike murmur/xxhash built-ins) and every
    reported figure is an exact bigint.

    Scale shape: explode + (bucket, token) count with map-side
    combine (vocabulary-sized result), then bucket-grain and
    occupancy-grain rollups — each table smaller than the last.
    """
    from .sampling import hash_bucket

    tok = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("__t")
    ).filter(F.col("__t") != "")
    per_tok = tok.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__m")
    )
    per_bucket = (
        per_tok.withColumn("__b", hash_bucket("__t", n_buckets))
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__occ"),
            F.sum("__m").cast("bigint").alias("__mass"),
        )
    )
    return (
        per_bucket.groupBy(F.col("__occ").alias("occupancy"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("__occ").cast("bigint").alias("n_tokens"),
            F.sum("__mass").cast("bigint").alias("token_mass"),
        )
    )


def feature_hash_report_sql(
    table: str = "documents",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> str:
    """DuckDB twin of :func:`feature_hash_report`."""
    from .sampling import hash_bucket_sql

    b = hash_bucket_sql("t", n_buckets)
    return f"""
    WITH tok AS (
      SELECT unnest(string_split({text_col}, ' ')) AS t FROM {table}
    ),
    pt AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS m
      FROM tok WHERE t <> '' GROUP BY t
    ),
    pb AS (
      SELECT {b} AS b, CAST(COUNT(*) AS BIGINT) AS occ,
             CAST(SUM(m) AS BIGINT) AS mass
      FROM pt GROUP BY 1
    )
    SELECT occ AS occupancy,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(occ) AS BIGINT) AS n_tokens,
           CAST(SUM(mass) AS BIGINT) AS token_mass
    FROM pb GROUP BY occ
    """


def kwic_snippets(
    df: DataFrame,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    context: int = 2,
) -> DataFrame:
    """Keyword-in-context extraction: every occurrence of ``term`` as
    (id, pos, snippet) where snippet is the +-``context``-token window
    joined by spaces — the retrieval-debugging / concordance view
    ("show me how the corpus actually uses this word") and the
    snippet generator under search result rendering.

    Exactness: token positions are integers and snippets are pure
    string slices — byte-identical in both engines.

    Scale shape: tokenize once per row, positional explode, an
    equality filter on the term (pushed into the generate stage), and
    a per-hit array slice; no shuffle at all — the whole operator is
    scan-stage expressions.
    """
    a = F.split(F.col(text_col), " ")
    hit = df.select(
        F.col(id_col), a.alias("__a"), F.posexplode(a).alias("__p0", "__tok")
    ).filter(F.col("__tok") == term)
    pos = F.col("__p0") + 1  # 1-based
    start = F.greatest(pos - context, F.lit(1))
    end = F.least(pos + context, F.size("__a"))
    return hit.select(
        F.col(id_col),
        pos.cast("bigint").alias("pos"),
        F.array_join(
            F.slice("__a", start, end - start + 1), " "
        ).alias("snippet"),
    )


def kwic_snippets_sql(
    term: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    context: int = 2,
) -> str:
    """DuckDB twin of :func:`kwic_snippets`."""
    return f"""
    WITH t AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS a
      FROM {table}
    ),
    hits AS (
      SELECT {id_col}, a, CAST(pos AS BIGINT) AS pos
      FROM t, LATERAL unnest(generate_series(1, len(a))) AS u(pos)
      WHERE a[pos] = '{term}'
    )
    SELECT {id_col}, pos,
           array_to_string(
             list_slice(a, greatest(pos - {context}, 1),
                        least(pos + {context}, len(a))), ' ') AS snippet
    FROM hits
    """


def coleman_liau_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Coleman-Liau readability index per group — the readability
    grade built ONLY from letter/word/sentence counts (no syllable
    dictionary, so it is exactly computable on both engines):

        CLI = 0.0588*L - 0.296*S - 15.8,
        L = letters per 100 words, S = sentences per 100 words.

    A corpus-quality lens the Gopher-style gates lack: flags sources
    whose text is degenerate prose (boilerplate, code dumps, token
    soup) by grade-level outliers rather than ratio thresholds.

    Exactness: letters ``[A-Za-z]``, words ``\\S+`` and sentence
    terminators ``[.!?]+`` are non-overlapping regex counts — exact
    bigints aggregated per group; L, S and CLI are single fixed IEEE
    expressions over those sums. Scale shape: pure scan-stage
    expressions + one group rollup; text never shuffles.
    """
    counts = df.select(
        F.col(group_col).alias("g"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]")).cast("bigint").alias("__lt"),
        F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("bigint").alias("__wd"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("bigint").alias("__st"),
    )
    agg = counts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__lt").cast("bigint").alias("letters"),
        F.sum("__wd").cast("bigint").alias("words"),
        F.sum("__st").cast("bigint").alias("sentences"),
    )
    lper = F.col("letters").cast("double") / F.col("words") * 100
    sper = F.col("sentences").cast("double") / F.col("words") * 100
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "letters",
        "words",
        "sentences",
        lper.alias("l_per_100w"),
        sper.alias("s_per_100w"),
        (F.lit(0.0588) * lper - F.lit(0.296) * sper - 15.8).alias("cli"),
    )


def coleman_liau_report_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`coleman_liau_report`."""
    return f"""
    WITH counts AS (
      SELECT {group_col} AS g,
             CAST(len(regexp_extract_all({text_col}, '[A-Za-z]')) AS BIGINT) AS lt,
             CAST(len(regexp_extract_all({text_col}, '\\S+')) AS BIGINT) AS wd,
             CAST(len(regexp_extract_all({text_col}, '[.!?]+')) AS BIGINT) AS st
      FROM {table}
    ),
    agg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(lt) AS BIGINT) AS letters,
             CAST(SUM(wd) AS BIGINT) AS words,
             CAST(SUM(st) AS BIGINT) AS sentences
      FROM counts GROUP BY g
    )
    SELECT g AS {group_col}, n_docs, letters, words, sentences,
           CAST(letters AS DOUBLE) / words * 100 AS l_per_100w,
           CAST(sentences AS DOUBLE) / words * 100 AS s_per_100w,
           0.0588 * (CAST(letters AS DOUBLE) / words * 100)
             - 0.296 * (CAST(sentences AS DOUBLE) / words * 100)
             - 15.8 AS cli
    FROM agg
    """


def pmi_cooccurrence_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 40,
    min_pairs: int = 5,
    round_to: int = 9,
) -> DataFrame:
    """Pointwise mutual information over top-vocabulary token pairs
    co-occurring in documents — the collocation/topical-association
    statistic (Church & Hanks 1990): PMI(a,b) = ln(N * c_ab /
    (c_a * c_b)) with document-level presence counts.

    Scale containment: the pair space is capped to the TOP-``vocab_k``
    tokens by document frequency (deterministic count-desc/token-asc
    cut), so the self-join runs over per-doc token sets of <= k
    entries — O(docs * k^2) worst case with tiny fixed-width rows,
    never a corpus-wide token cross join. Counts are exact bigints;
    ln runs once per surviving pair on an exact integer ratio and is
    rounded (libm ulp). Pairs need >= ``min_pairs`` co-occurrences.

    Output: (token_a, token_b, n_a, n_b, n_ab, pmi), token_a <
    token_b, ALL qualifying pairs (no top-k row cut — bounded by
    C(vocab_k, 2)).
    """
    toks = df.select(
        F.col(id_col).alias("d"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("t"),
    ).where(F.col("t") != "")
    docfreq = toks.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wtop = Window.orderBy(F.col("c").desc(), F.col("t").asc())
    top = docfreq.withColumn("__rk", F.row_number().over(wtop)).where(
        F.col("__rk") <= vocab_k
    )
    kept = toks.join(F.broadcast(top.select("t", "c")), "t")
    a = kept.select(
        "d", F.col("t").alias("token_a"), F.col("c").alias("n_a")
    )
    b = kept.select(
        "d", F.col("t").alias("token_b"), F.col("c").alias("n_b")
    )
    pairs = (
        a.join(b, "d")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    ndocs = df.agg(F.count(F.lit(1)).cast("bigint").alias("__N"))
    return pairs.crossJoin(F.broadcast(ndocs)).select(
        "token_a",
        "token_b",
        "n_a",
        "n_b",
        "n_ab",
        F.round(
            F.log(
                (F.col("n_ab") * F.col("__N")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ),
            round_to,
        ).alias("pmi"),
    )


def pmi_cooccurrence_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 40,
    min_pairs: int = 5,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`pmi_cooccurrence_pairs`."""
    return f"""
    WITH toks AS (
      SELECT DISTINCT {id_col} AS d, t
      FROM (SELECT {id_col},
                   unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
            FROM {table})
      WHERE t <> ''
    ),
    docfreq AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY t
    ),
    top AS (
      SELECT t, c FROM (
        SELECT t, c, row_number() OVER (ORDER BY c DESC, t ASC) AS rk
        FROM docfreq
      ) WHERE rk <= {vocab_k}
    ),
    kept AS (
      SELECT toks.d, toks.t, top.c FROM toks JOIN top ON top.t = toks.t
    ),
    pairs AS (
      SELECT a.t AS token_a, b.t AS token_b, a.c AS n_a, b.c AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM kept a JOIN kept b ON b.d = a.d AND a.t < b.t
      GROUP BY a.t, b.t, a.c, b.c
      HAVING COUNT(*) >= {min_pairs}
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM {table})
    SELECT token_a, token_b, n_a, n_b, n_ab,
           ROUND(ln(CAST(n_ab * nd.N AS DOUBLE)
                    / CAST(n_a * n_b AS DOUBLE)), {round_to}) AS pmi
    FROM pairs CROSS JOIN nd
    """


def vocab_growth_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10,
) -> DataFrame:
    """Vocabulary growth (Heaps-law) curve: cumulative distinct-token
    count at ``buckets`` equal-width checkpoints of the ``id_col``
    range (ingest order). A saturating curve says the corpus is
    recycling vocabulary (boilerplate/duplication); unbounded growth
    says genuinely novel text — the cheap corpus-novelty monitor that
    complements the LSH dedup family.

    Exactness: a token's first appearance is MIN(id) over its docs
    (exact); its checkpoint bucket is integer arithmetic
    ((first_seen - min_id) * buckets) div (max_id - min_id + 1);
    cumulative sums run over the ``buckets``-row rollup. Everything
    is exact integers.

    Scale: one token-grain aggregation (the explode's shuffle), one
    broadcast of the 2-value id-bounds row, one tiny windowed rollup.
    Output: (bucket, id_hi, n_docs_cum, vocab_cum).
    """
    toks = df.select(
        F.col(id_col).alias("d"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("t"),
    ).where(F.col("t") != "")
    first_seen = toks.groupBy("t").agg(F.min("d").alias("fs"))
    bounds = df.agg(
        F.min(F.col(id_col)).cast("bigint").alias("__lo"),
        F.max(F.col(id_col)).cast("bigint").alias("__hi"),
    )
    wdt = F.col("__hi") - F.col("__lo") + 1
    tok_b = (
        first_seen.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((fs - __lo) * {buckets}) div (__hi - __lo + 1)")
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    )
    doc_b = (
        df.select(F.col(id_col).alias("d"))
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((d - __lo) * {buckets}) div (__hi - __lo + 1)")
            .cast("int")
            .alias("bucket"),
            wdt.alias("__w"),
            F.col("__lo"),
        )
        .groupBy("bucket", "__w", "__lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ndocs"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = doc_b.join(tok_b, "bucket", "left").na.fill({"nv": 0})
    return joined.select(
        F.col("bucket"),
        (
            F.col("__lo")
            + F.expr(f"((bucket + 1) * __w) div {buckets}")
            - 1
        ).cast("bigint").alias("id_hi"),
        F.sum("ndocs").over(wcum).cast("bigint").alias("n_docs_cum"),
        F.sum("nv").over(wcum).cast("bigint").alias("vocab_cum"),
    )


def vocab_growth_curve_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`vocab_growth_curve`."""
    return f"""
    WITH toks AS (
      SELECT DISTINCT {id_col} AS d, t
      FROM (SELECT {id_col},
                   unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
            FROM {table})
      WHERE t <> ''
    ),
    first_seen AS (SELECT t, MIN(d) AS fs FROM toks GROUP BY t),
    bounds AS (
      SELECT CAST(MIN({id_col}) AS BIGINT) AS lo,
             CAST(MAX({id_col}) AS BIGINT) AS hi
      FROM {table}
    ),
    tok_b AS (
      SELECT CAST(((fs - lo) * {buckets}) // (hi - lo + 1) AS INTEGER)
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS nv
      FROM first_seen CROSS JOIN bounds GROUP BY 1
    ),
    doc_b AS (
      SELECT CAST((({id_col} - lo) * {buckets}) // (hi - lo + 1) AS INTEGER)
               AS bucket,
             CAST(MAX(hi - lo + 1) AS BIGINT) AS w,
             CAST(MAX(lo) AS BIGINT) AS lo,
             CAST(COUNT(*) AS BIGINT) AS ndocs
      FROM {table} CROSS JOIN bounds GROUP BY 1
    )
    SELECT doc_b.bucket,
           CAST(doc_b.lo + ((doc_b.bucket + 1) * doc_b.w) // {buckets} - 1
                AS BIGINT) AS id_hi,
           CAST(SUM(doc_b.ndocs) OVER (ORDER BY doc_b.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_docs_cum,
           CAST(SUM(COALESCE(tok_b.nv, 0)) OVER (ORDER BY doc_b.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS vocab_cum
    FROM doc_b LEFT JOIN tok_b ON tok_b.bucket = doc_b.bucket
    """


def source_vocab_jaccard(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-overlap matrix between sources: Jaccard similarity
    of each source pair's DISTINCT token sets — "do these two crawls
    speak the same language" at the vocabulary level, complementing
    cross_source_shared_openings (which fingerprints document
    openings, i.e. boilerplate) and psi_source_drift (length shape).

    Exactness: all counts are exact bigints — per-source vocab sizes
    from one distinct aggregation, pairwise intersections from a
    token-grain self-join (tokens shuffle once; text never does);
    union = |A| + |B| - |A∩B|; one exact-input division per pair.
    Output: (source_a, source_b, vocab_a, vocab_b, n_common,
    jaccard) for source_a < source_b.
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("t"),
    ).where(F.col("t") != "").distinct()
    sizes = toks.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    a = toks.select(F.col("g").alias("ga"), "t")
    b = toks.select(F.col("g").alias("gb"), "t")
    inter = (
        a.join(b, "t")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("g").alias("ga"), F.col("v").alias("vocab_a"))
    sb = sizes.select(F.col("g").alias("gb"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "ga")
        .join(F.broadcast(sb), "gb")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            "vocab_a",
            "vocab_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
                )
            ).alias("jaccard"),
        )
    )


def source_vocab_jaccard_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`source_vocab_jaccard`."""
    return f"""
    WITH toks AS (
      SELECT DISTINCT {group_col} AS g, t
      FROM (SELECT {group_col},
                   unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
            FROM {table})
      WHERE t <> ''
    ),
    sizes AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS v FROM toks GROUP BY g
    ),
    inter AS (
      SELECT a.g AS ga, b.g AS gb, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM toks a JOIN toks b ON b.t = a.t AND a.g < b.g
      GROUP BY a.g, b.g
    )
    SELECT inter.ga AS source_a, inter.gb AS source_b,
           sa.v AS vocab_a, sb.v AS vocab_b, inter.n_common,
           CAST(inter.n_common AS DOUBLE)
             / (sa.v + sb.v - inter.n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = inter.ga
    JOIN sizes sb ON sb.g = inter.gb
    """


def fingerprint_clusters(
    df: DataFrame,
    id_col: str,
    name_col: str,
) -> DataFrame:
    """OpenRefine-style fingerprint clustering of messy strings: the
    key is the SORTED distinct lowercase token multiset ("General
    Electric Co" ~ "co general electric"), entries sharing a key are
    one cluster — the standard first pass of interactive data
    cleaning, as a deterministic engine operator.

    All scan-stage expressions (lower/split/distinct/sort/join) + one
    key rollup; strings shuffle as fingerprints. Output: one row per
    cluster with >= 2 DISTINCT raw spellings — (fingerprint,
    n_rows, n_spellings, canonical_name = the min raw spelling,
    min_id).
    """
    keyed = df.select(
        F.col(id_col).alias("i"),
        F.col(name_col).alias("nm"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(name_col))), r"\s+")
                )
            ),
            " ",
        ).alias("fp"),
    )
    return (
        keyed.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("nm").cast("bigint").alias("n_spellings"),
            F.min("nm").alias("canonical_name"),
            F.min("i").cast("bigint").alias("min_id"),
        )
        .where(F.col("n_spellings") >= 2)
        .select(
            F.col("fp").alias("fingerprint"),
            "n_rows",
            "n_spellings",
            "canonical_name",
            "min_id",
        )
    )


def fingerprint_clusters_sql(
    table: str,
    id_col: str,
    name_col: str,
) -> str:
    """DuckDB twin of :func:`fingerprint_clusters`."""
    return f"""
    WITH keyed AS (
      SELECT {id_col} AS i, {name_col} AS nm,
             array_to_string(list_sort(list_distinct(
               string_split_regex(lower(trim({name_col})), '\\s+'))), ' ')
               AS fp
      FROM {table}
    )
    SELECT fp AS fingerprint, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT nm) AS BIGINT) AS n_spellings,
           MIN(nm) AS canonical_name, CAST(MIN(i) AS BIGINT) AS min_id
    FROM keyed GROUP BY fp
    HAVING COUNT(DISTINCT nm) >= 2
    """


#: RAKE phrase-boundary pattern: runs of stopwords (whole-word) and/or
#: punctuation. Verified to split identically under Java regex and RE2.
RAKE_BOUNDARY_RE = (
    r"(?:\b(?:" + "|".join(STOPWORDS) + r")\b|[^a-z0-9\s])+"
)


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    min_occurrences: int = 3,
    max_phrase_words: int = 4,
    round_to: int = 9,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal runs between stopword/punctuation
    boundaries; each word scores deg(w)/freq(w) (degree = summed
    length of phrases containing it, frequency = occurrences) and a
    phrase scores the sum over its words — multi-word domain terms
    outrank common unigrams.

    Exactness: deg/freq are exact bigints from one phrase-word
    explode; the per-phrase score sums <= ``max_phrase_words``
    ratios and is ROUNDed (addend order differs across engines).
    Scale: two scans of the phrase table (words shuffle as tokens,
    documents never do); the boundary split is scan-stage regex.

    Output: (phrase, n_words, n_occurrences, score) for phrases seen
    >= ``min_occurrences`` times, 1 < n_words <= max_phrase_words.
    """
    phrases = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), RAKE_BOUNDARY_RE)
            ).alias("__raw")
        )
        .select(
            F.regexp_replace(F.trim(F.col("__raw")), r"\s+", " ").alias("ph")
        )
        .where(F.col("ph") != "")
    )
    sized = phrases.select(
        "ph", F.size(F.split(F.col("ph"), " ")).alias("nw")
    ).where(F.col("nw") <= max_phrase_words)
    words = sized.select(
        "ph", "nw", F.explode(F.split(F.col("ph"), " ")).alias("w")
    )
    wstats = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("nw").cast("bigint").alias("deg"),
    )
    scored = (
        words.join(wstats, "w")
        .groupBy("ph", "nw")
        .agg(
            F.round(
                F.sum(
                    F.col("deg").cast("double") / F.col("freq")
                ),
                round_to,
            ).alias("__s"),
        )
    )
    # __s sums word scores over EVERY occurrence row of the phrase;
    # dividing by the occurrence count yields the single-occurrence
    # RAKE score exactly (each occurrence contributes identical terms)
    occ = sized.groupBy("ph", "nw").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    per_occurrence = scored.join(occ, ["ph", "nw"]).select(
        F.col("ph").alias("phrase"),
        F.col("nw").cast("bigint").alias("n_words"),
        "n_occurrences",
        F.round(F.col("__s") / F.col("n_occurrences"), round_to).alias(
            "score"
        ),
    )
    return per_occurrence.where(
        (F.col("n_occurrences") >= min_occurrences) & (F.col("n_words") > 1)
    )


def rake_keywords_sql(
    table: str = "documents",
    text_col: str = "text",
    min_occurrences: int = 3,
    max_phrase_words: int = 4,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`rake_keywords`."""
    pat = RAKE_BOUNDARY_RE
    return f"""
    WITH phrases AS (
      SELECT regexp_replace(trim(p), '\\s+', ' ', 'g') AS ph
      FROM (SELECT unnest(string_split_regex(lower({text_col}),
                   '{pat}')) AS p
            FROM {table})
      WHERE regexp_replace(trim(p), '\\s+', ' ', 'g') <> ''
    ),
    sized AS (
      SELECT ph, len(string_split(ph, ' ')) AS nw
      FROM phrases WHERE len(string_split(ph, ' ')) <= {max_phrase_words}
    ),
    words AS (
      SELECT ph, nw, unnest(string_split(ph, ' ')) AS w FROM sized
    ),
    wstats AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(nw) AS BIGINT) AS deg
      FROM words GROUP BY w
    ),
    scored AS (
      SELECT ph, nw,
             ROUND(SUM(CAST(deg AS DOUBLE) / freq), {round_to}) AS s
      FROM words JOIN wstats ON wstats.w = words.w
      GROUP BY ph, nw
    ),
    occ AS (
      SELECT ph, nw, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM sized GROUP BY ph, nw
    )
    SELECT scored.ph AS phrase, CAST(scored.nw AS BIGINT) AS n_words,
           occ.n_occurrences,
           ROUND(scored.s / occ.n_occurrences, {round_to}) AS score
    FROM scored JOIN occ ON occ.ph = scored.ph AND occ.nw = scored.nw
    WHERE occ.n_occurrences >= {min_occurrences} AND scored.nw > 1
    """


def sliding_vocab_drift(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 5,
) -> DataFrame:
    """Vocabulary drift along ingest order: Jaccard similarity of the
    DISTINCT token sets of CONSECUTIVE equal-width ``id_col`` buckets
    — a falling curve means the crawl's language is shifting (new
    domain mix, new boilerplate), the between-checkpoint complement
    to vocab_growth_curve's cumulative view.

    Exact bigint set algebra throughout (same bucket math as
    vocab_growth_curve, same pairwise-intersection shape as
    source_vocab_jaccard but only adjacent pairs join). Output:
    (bucket_a, bucket_b, vocab_a, vocab_b, n_common, jaccard).
    """
    bounds = df.agg(
        F.min(F.col(id_col)).cast("bigint").alias("__lo"),
        F.max(F.col(id_col)).cast("bigint").alias("__hi"),
    )
    toks = (
        df.select(
            F.col(id_col).alias("d"),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
            ).alias("t"),
        )
        .where(F.col("t") != "")
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((d - __lo) * {buckets}) div (__hi - __lo + 1)")
            .cast("int")
            .alias("b"),
            "t",
        )
        .distinct()
    )
    sizes = toks.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    nxt = toks.select((F.col("b") - 1).alias("b"), F.col("t"))
    inter = (
        toks.join(nxt, ["b", "t"])
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("b"), F.col("v").alias("vocab_a"))
    sb = sizes.select((F.col("b") - 1).alias("b"), F.col("v").alias("vocab_b"))
    return (
        inter.join(sa, "b")
        .join(sb, "b")
        .select(
            F.col("b").alias("bucket_a"),
            (F.col("b") + 1).cast("int").alias("bucket_b"),
            "vocab_a",
            "vocab_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def sliding_vocab_drift_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 5,
) -> str:
    """DuckDB twin of :func:`sliding_vocab_drift`."""
    return f"""
    WITH bounds AS (
      SELECT CAST(MIN({id_col}) AS BIGINT) AS lo,
             CAST(MAX({id_col}) AS BIGINT) AS hi
      FROM {table}
    ),
    toks AS (
      SELECT DISTINCT
             CAST(((d - lo) * {buckets}) // (hi - lo + 1) AS INTEGER) AS b, t
      FROM (SELECT {id_col} AS d,
                   unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
            FROM {table}) CROSS JOIN bounds
      WHERE t <> ''
    ),
    sizes AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS v FROM toks GROUP BY b),
    inter AS (
      SELECT a.b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM toks a JOIN toks n ON n.b = a.b + 1 AND n.t = a.t
      GROUP BY a.b
    )
    SELECT inter.b AS bucket_a, CAST(inter.b + 1 AS INTEGER) AS bucket_b,
           sa.v AS vocab_a, sb.v AS vocab_b, inter.n_common,
           CAST(inter.n_common AS DOUBLE)
             / (sa.v + sb.v - inter.n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.b = inter.b
    JOIN sizes sb ON sb.b = inter.b + 1
    """


def token_burstiness_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 10,
) -> DataFrame:
    """Church-Gale token burstiness: collection frequency / document
    frequency per token — bursty tokens (cf/df >> 1) concentrate
    inside few documents (names, topical jargon, boilerplate
    repeats) while function-like words spread evenly; the signal
    behind adaptive-LM caching and term-weighting beyond tf-idf.

    Exact bigint cf (total occurrences) and df (containing docs)
    from ONE tokenized pass (posexplode keeps duplicates for cf;
    countDistinct doc gives df); one division. Output: (token, cf,
    df, burstiness) for df >= ``min_df``.
    """
    toks = df.select(
        F.col(id_col).alias("d"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
    ).where(F.col("t") != "")
    stats = toks.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cf"),
        F.countDistinct("d").cast("bigint").alias("df"),
    )
    return stats.where(F.col("df") >= min_df).select(
        F.col("t").alias("token"),
        "cf",
        "df",
        (F.col("cf").cast("double") / F.col("df")).alias("burstiness"),
    )


def token_burstiness_report_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 10,
) -> str:
    """DuckDB twin of :func:`token_burstiness_report`."""
    return f"""
    WITH toks AS (
      SELECT {id_col} AS d,
             unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
      FROM {table}
    )
    SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS cf,
           CAST(COUNT(DISTINCT d) AS BIGINT) AS df,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT d) AS burstiness
    FROM toks WHERE t <> ''
    GROUP BY t
    HAVING COUNT(DISTINCT d) >= {min_df}
    """


def oov_rate_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per source: build the vocabulary from
    the FIRST id-half of the corpus (train), measure what fraction of
    the SECOND half's token OCCURRENCES fall outside it — the
    tokenizer/vocab-coverage question every train/eval split must
    answer before perplexities mean anything (a source with high OOV
    is drifting away from the training distribution).

    Exact bigint token counts throughout; the vocabulary rides a
    LEFT ANTI join on the token key (tokens shuffle, text never);
    one division per source. Output: (source, n_tokens, n_oov,
    oov_rate).
    """
    bounds = df.agg(
        F.min(F.col(id_col)).cast("bigint").alias("__lo"),
        F.max(F.col(id_col)).cast("bigint").alias("__hi"),
    )
    toks = (
        df.select(
            F.col(id_col).alias("d"),
            F.col(group_col).alias("g"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
        )
        .where(F.col("t") != "")
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            "t",
            (
                F.col("d") - F.col("__lo")
                < F.expr("(__hi - __lo + 1) div 2")
            ).alias("train"),
        )
    )
    vocab = toks.where(F.col("train")).select("t").distinct()
    test = toks.where(~F.col("train"))
    oov = test.join(vocab, "t", "left_anti").groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_oov")
    )
    tot = test.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    return (
        tot.join(oov, "g", "left")
        .na.fill({"n_oov": 0})
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
    )


def oov_rate_by_source_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> str:
    """DuckDB twin of :func:`oov_rate_by_source`."""
    return f"""
    WITH bounds AS (
      SELECT CAST(MIN({id_col}) AS BIGINT) AS lo,
             CAST(MAX({id_col}) AS BIGINT) AS hi
      FROM {table}
    ),
    toks AS (
      SELECT g, t, (d - lo) < (hi - lo + 1) // 2 AS train
      FROM (SELECT {id_col} AS d, {group_col} AS g,
                   unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
            FROM {table}) CROSS JOIN bounds
      WHERE t <> ''
    ),
    vocab AS (SELECT DISTINCT t FROM toks WHERE train),
    test AS (SELECT g, t FROM toks WHERE NOT train),
    oov AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_oov
      FROM test ANTI JOIN vocab ON vocab.t = test.t
      GROUP BY g
    ),
    tot AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM test GROUP BY g
    )
    SELECT tot.g AS {group_col}, tot.n_tokens,
           CAST(COALESCE(oov.n_oov, 0) AS BIGINT) AS n_oov,
           CAST(COALESCE(oov.n_oov, 0) AS DOUBLE) / tot.n_tokens AS oov_rate
    FROM tot LEFT JOIN oov ON oov.g = tot.g
    """


def kneser_ney_bigram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the canonical n-gram
    LM smoothing (Kneser & Ney 1995; what KenLM/SRILM default to),
    one full rung above :func:`bigram_logprob_quality`'s add-one:

      ``P_KN(w2|w1) = max(c12 - D, 0)/c1
                      + D * N1+(w1*)/c1 * N1+(*w2)/T``

    where ``N1+(w1*)`` = distinct continuations of w1, ``N1+(*w2)`` =
    distinct histories of w2 (the continuation probability that scores
    "Francisco" low despite high unigram count), and T = distinct
    bigram types. Per-doc mean negative log-prob under the corpus's
    own model.

    Scale shape: identical to :func:`bigram_logprob_quality` — the
    corpus is scanned exactly twice (model build, scoring); every
    model table (bigram counts, the two continuation-count marginals,
    T) derives from the ONE Zipf-bounded aggregated bigram table and
    broadcasts back into the scoring scan; the per-doc score is one
    doc-keyed aggregation.
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("__ts"))
    bigrams = F.expr(
        "transform(slice(__ts, 1, size(__ts) - 1), "
        "(t, i) -> struct(t as w1, __ts[i + 1] as w2))"
    )
    pairs = toked.select(
        F.col(id_col), F.explode(bigrams).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    firsts = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n_cont"),
    )
    hists = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hist")
    )
    types = big.agg(F.count(F.lit(1)).cast("double").alias("t_types"))
    d = F.lit(float(discount))
    p_kn = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n_cont") / F.col("c1")
        * (F.col("n_hist") / F.col("t_types"))
    )
    nll = -F.log(p_kn)
    return (
        pairs.join(F.broadcast(big), ["w1", "w2"])
        .join(F.broadcast(firsts), "w1")
        .join(F.broadcast(hists), "w2")
        .crossJoin(F.broadcast(types))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            (F.sum(nll) / F.count(F.lit(1))).alias("mean_nll_kn"),
        )
    )


def kneser_ney_bigram_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    discount: float = 0.75,
) -> str:
    """DuckDB twin of :func:`kneser_ney_bigram`."""
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS ts FROM {table}
    ),
    pairs AS (
      SELECT {id_col}, ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(range(1, len(ts))) AS t(i)
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    firsts AS (
      SELECT w1, SUM(c12) AS c1, CAST(COUNT(*) AS BIGINT) AS n_cont
      FROM big GROUP BY w1
    ),
    hists AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_hist FROM big GROUP BY w2
    ),
    types AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t_types FROM big)
    SELECT p.{id_col},
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           SUM(-ln(GREATEST(big.c12 - {discount!r}, 0.0) / firsts.c1
                   + {discount!r} * firsts.n_cont / firsts.c1
                     * (hists.n_hist / types.t_types)))
             / COUNT(*) AS mean_nll_kn
    FROM pairs p JOIN big USING (w1, w2) JOIN firsts USING (w1)
         JOIN hists USING (w2) CROSS JOIN types
    GROUP BY p.{id_col}
    """


def doremi_domain_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    eta: float = 1.0,
) -> DataFrame:
    """DoReMi-style domain mixture reweighting, one multiplicative-
    weights step (Xie et al. 2023, simplified to a unigram reference):
    each domain's EXCESS LOSS — its mean token NLL under the corpus
    unigram LM minus the corpus mean — scales its baseline token share
    by ``exp(eta * excess)``, renormalized. Domains the reference
    model finds hardest (relative to the mix) get upweighted, the
    data-mixing knob a 100 TB pretraining pipeline tunes before
    sampling shards.

    Scale shape: one explode -> (source, token) count with map-side
    combine (Zipf-bounded result); the corpus unigram table and the
    per-domain rollups all derive from that aggregate — the corpus is
    scanned ONCE and nothing row-sized ever shuffles again; the final
    softmax runs over #domains rows.

    Output per source: (source, n_tokens, mean_nll, excess, weight).
    """
    tok = df.select(
        F.col(source_col).alias("__src"),
        F.explode(tokens(text_col)).alias("__t"),
    ).filter(F.col("__t") != "")
    st = tok.groupBy("__src", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    ).localCheckpoint(eager=False)
    corpus = st.groupBy("__t").agg(F.sum("__c").alias("__ct"))
    total = corpus.agg(F.sum("__ct").cast("double").alias("__n"))
    scored = (
        st.join(F.broadcast(corpus), "__t")
        .crossJoin(F.broadcast(total))
        .groupBy("__src")
        .agg(
            F.sum("__c").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.col("__c") * -F.log(F.col("__ct") / F.col("__n")))
                / F.sum("__c")
            ).alias("mean_nll"),
        )
    )
    grand = scored.agg(
        (
            F.sum(F.col("n_tokens") * F.col("mean_nll")) / F.sum("n_tokens")
        ).alias("__gm"),
        F.sum("n_tokens").cast("double").alias("__nt"),
    )
    ex = scored.crossJoin(F.broadcast(grand)).withColumn(
        "excess", F.col("mean_nll") - F.col("__gm")
    ).withColumn(
        "__raw",
        (F.col("n_tokens") / F.col("__nt"))
        * F.exp(F.lit(float(eta)) * F.col("excess")),
    )
    z = ex.agg(F.sum("__raw").alias("__z"))
    return (
        ex.crossJoin(F.broadcast(z))
        .select(
            F.col("__src").alias("source"),
            "n_tokens",
            F.round("mean_nll", 6).alias("mean_nll"),
            F.round("excess", 6).alias("excess"),
            F.round(F.col("__raw") / F.col("__z"), 6).alias("weight"),
        )
        .orderBy("source")
    )


def doremi_domain_weights_sql(
    source_col: str = "source",
    text_col: str = "text",
    table: str = "documents",
    eta: float = 1.0,
) -> str:
    """DuckDB twin of :func:`doremi_domain_weights`."""
    return f"""
    WITH tok AS (
      SELECT {source_col} AS src,
             unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    clean AS (SELECT * FROM tok WHERE t <> ''),
    st AS (
      SELECT src, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM clean GROUP BY src, t
    ),
    corpus AS (SELECT t, SUM(c) AS ct FROM st GROUP BY t),
    total AS (SELECT CAST(SUM(ct) AS DOUBLE) AS n FROM corpus),
    scored AS (
      SELECT st.src,
             CAST(SUM(st.c) AS BIGINT) AS n_tokens,
             SUM(st.c * -ln(corpus.ct / total.n)) / SUM(st.c) AS mean_nll
      FROM st JOIN corpus USING (t) CROSS JOIN total
      GROUP BY st.src
    ),
    grand AS (
      SELECT SUM(n_tokens * mean_nll) / SUM(n_tokens) AS gm,
             CAST(SUM(n_tokens) AS DOUBLE) AS nt
      FROM scored
    ),
    ex AS (
      SELECT s.src, s.n_tokens, s.mean_nll,
             s.mean_nll - g.gm AS excess,
             (s.n_tokens / g.nt) * EXP({eta!r} * (s.mean_nll - g.gm))
               AS raw
      FROM scored s CROSS JOIN grand g
    ),
    z AS (SELECT SUM(raw) AS z FROM ex)
    SELECT ex.src AS source, ex.n_tokens,
           ROUND(ex.mean_nll, 6) AS mean_nll,
           ROUND(ex.excess, 6) AS excess,
           ROUND(ex.raw / z.z, 6) AS weight
    FROM ex CROSS JOIN z
    ORDER BY source
    """


def js_divergence_pairs(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source token
    distributions over the top-``top_n`` global types (renormalized)
    — the SYMMETRIC, bounded (<= ln 2) divergence matrix that
    `source_token_divergence`'s KL-from-global cannot give (KL is
    asymmetric and unbounded; JS is what you cluster domains by):

      ``JS(p,q) = 0.5 KL(p||m) + 0.5 KL(q||m)``, ``m = (p+q)/2``.

    Scale shape: one corpus explode to (source, token) counts; the
    top-n type table broadcasts back; per-source distributions are
    (sources x top_n) tiny and the pair matrix is #source-pairs rows.
    Zero-count cells contribute 0 to their own KL term (lim p->0 of
    p ln(p/m) = 0) and are handled identically in both engines via
    the full grid.

    Output per pair (a < b): (source_a, source_b, js, js_distance).
    """
    clean = df.select(
        F.col(source_col).alias("__src"),
        F.explode(tokens(text_col)).alias("__t"),
    ).filter(F.col("__t") != "")
    counts = clean.groupBy("__t").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy(F.col("__cnt").desc(), F.col("__t"))
    top = counts.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= top_n
    ).select("__t")
    per_src = (
        clean.join(F.broadcast(top), "__t")
        .groupBy("__src", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    src_tot = per_src.groupBy("__src").agg(F.sum("__c").alias("__n"))
    # full grid (source x top token) incl. zero cells
    grid = (
        src_tot.crossJoin(top)
        .join(per_src, ["__src", "__t"], "left")
        .select(
            "__src",
            "__t",
            (
                F.coalesce(F.col("__c"), F.lit(0)).cast("double")
                / F.col("__n")
            ).alias("__p"),
        )
    )
    a = grid.select(
        F.col("__src").alias("source_a"),
        F.col("__t").alias("__t"),
        F.col("__p").alias("__pa"),
    )
    b = grid.select(
        F.col("__src").alias("source_b"),
        F.col("__t").alias("__t"),
        F.col("__p").alias("__pb"),
    )
    pairs = a.join(b, "__t").filter(F.col("source_a") < F.col("source_b"))
    m = (F.col("__pa") + F.col("__pb")) / 2.0
    term_a = F.when(
        F.col("__pa") > 0.0,
        F.col("__pa") * F.log(F.col("__pa") / m),
    ).otherwise(0.0)
    term_b = F.when(
        F.col("__pb") > 0.0,
        F.col("__pb") * F.log(F.col("__pb") / m),
    ).otherwise(0.0)
    js = pairs.groupBy("source_a", "source_b").agg(
        (0.5 * F.sum(term_a) + 0.5 * F.sum(term_b)).alias("__js")
    )
    return js.select(
        "source_a",
        "source_b",
        F.round("__js", 6).alias("js"),
        F.round(F.sqrt(F.col("__js")), 6).alias("js_distance"),
    ).orderBy("source_a", "source_b")


def js_divergence_pairs_sql(
    source_col: str = "source",
    text_col: str = "text",
    table: str = "documents",
    top_n: int = 100,
) -> str:
    """DuckDB twin of :func:`js_divergence_pairs`."""
    return f"""
    WITH clean AS (
      SELECT {source_col} AS src,
             unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    cl AS (SELECT * FROM clean WHERE t <> ''),
    counts AS (SELECT t, COUNT(*) AS cnt FROM cl GROUP BY t),
    top AS (
      SELECT t FROM (
        SELECT t, ROW_NUMBER() OVER (ORDER BY cnt DESC, t) AS rn
        FROM counts
      ) WHERE rn <= {top_n}
    ),
    per_src AS (
      SELECT cl.src, cl.t, COUNT(*) AS c
      FROM cl JOIN top USING (t) GROUP BY cl.src, cl.t
    ),
    src_tot AS (SELECT src, SUM(c) AS n FROM per_src GROUP BY src),
    grid AS (
      SELECT st.src, top.t,
             CAST(COALESCE(ps.c, 0) AS DOUBLE) / st.n AS p
      FROM src_tot st CROSS JOIN top
      LEFT JOIN per_src ps ON ps.src = st.src AND ps.t = top.t
    ),
    pairs AS (
      SELECT a.src AS source_a, b.src AS source_b,
             a.p AS pa, b.p AS pb
      FROM grid a JOIN grid b ON a.t = b.t AND a.src < b.src
    ),
    js AS (
      SELECT source_a, source_b,
             0.5 * SUM(CASE WHEN pa > 0.0
                            THEN pa * ln(pa / ((pa + pb) / 2.0))
                            ELSE 0.0 END)
             + 0.5 * SUM(CASE WHEN pb > 0.0
                              THEN pb * ln(pb / ((pa + pb) / 2.0))
                              ELSE 0.0 END) AS js
      FROM pairs GROUP BY source_a, source_b
    )
    SELECT source_a, source_b,
           ROUND(js, 6) AS js,
           ROUND(SQRT(js), 6) AS js_distance
    FROM js ORDER BY source_a, source_b
    """


def burrows_delta(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Burrows' Delta — the classic stylometric distance (Burrows
    2002; the standard authorship-attribution measure): z-score each
    source's relative frequency of the top-``top_n`` corpus types
    across sources, then Delta(a,b) = mean |z_a - z_b| over the
    types. Domains with similar function-word profiles score low —
    a copy-editing/provenance signal no content-topic measure gives.

    Same scale shape as :func:`js_divergence_pairs`: one corpus
    explode; everything after lives on (sources x top_n) tables.
    The population sd across sources uses the exact-moment form; a
    type with zero cross-source variance is skipped in both engines
    (contributes no |dz| term and shrinks the denominator count).

    Output per pair (a < b): (source_a, source_b, n_terms, delta).
    """
    clean = df.select(
        F.col(source_col).alias("__src"),
        F.explode(tokens(text_col)).alias("__t"),
    ).filter(F.col("__t") != "")
    counts = clean.groupBy("__t").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy(F.col("__cnt").desc(), F.col("__t"))
    top = counts.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= top_n
    ).select("__t")
    per_src = (
        clean.join(F.broadcast(top), "__t")
        .groupBy("__src", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    src_tot = clean.groupBy("__src").agg(F.sum(F.lit(1)).alias("__n"))
    grid = (
        src_tot.crossJoin(top)
        .join(per_src, ["__src", "__t"], "left")
        .select(
            "__src",
            "__t",
            (
                F.coalesce(F.col("__c"), F.lit(0)).cast("double")
                / F.col("__n")
            ).alias("__f"),
        )
    )
    stats = grid.groupBy("__t").agg(
        F.avg("__f").alias("__mu"),
        F.count(F.lit(1)).alias("__k"),
        (
            F.sum(F.col("__f") * F.col("__f")) / F.count(F.lit(1))
        ).alias("__m2"),
    ).select(
        "__t",
        "__mu",
        F.sqrt(
            F.greatest(
                F.col("__m2") - F.col("__mu") * F.col("__mu"), F.lit(0.0)
            )
        ).alias("__sd"),
    ).filter(F.col("__sd") > 0.0)
    z = grid.join(F.broadcast(stats), "__t").select(
        "__src",
        "__t",
        ((F.col("__f") - F.col("__mu")) / F.col("__sd")).alias("__z"),
    )
    a = z.select(
        F.col("__src").alias("source_a"), "__t", F.col("__z").alias("__za")
    )
    b = z.select(
        F.col("__src").alias("source_b"), "__t", F.col("__z").alias("__zb")
    )
    pairs = a.join(b, "__t").filter(F.col("source_a") < F.col("source_b"))
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(
                F.sum(F.abs(F.col("__za") - F.col("__zb")))
                / F.count(F.lit(1)),
                6,
            ).alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )


def burrows_delta_sql(
    source_col: str = "source",
    text_col: str = "text",
    table: str = "documents",
    top_n: int = 50,
) -> str:
    """DuckDB twin of :func:`burrows_delta`."""
    return f"""
    WITH clean AS (
      SELECT {source_col} AS src,
             unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    cl AS (SELECT * FROM clean WHERE t <> ''),
    counts AS (SELECT t, COUNT(*) AS cnt FROM cl GROUP BY t),
    top AS (
      SELECT t FROM (
        SELECT t, ROW_NUMBER() OVER (ORDER BY cnt DESC, t) AS rn
        FROM counts
      ) WHERE rn <= {top_n}
    ),
    per_src AS (
      SELECT cl.src, cl.t, COUNT(*) AS c
      FROM cl JOIN top USING (t) GROUP BY cl.src, cl.t
    ),
    src_tot AS (SELECT src, SUM(1) AS n FROM cl GROUP BY src),
    grid AS (
      SELECT st.src, top.t,
             CAST(COALESCE(ps.c, 0) AS DOUBLE) / st.n AS f
      FROM src_tot st CROSS JOIN top
      LEFT JOIN per_src ps ON ps.src = st.src AND ps.t = top.t
    ),
    stats AS (
      SELECT t, mu, SQRT(GREATEST(m2 - mu * mu, 0.0)) AS sd
      FROM (
        SELECT t, AVG(f) AS mu,
               SUM(f * f) / COUNT(*) AS m2
        FROM grid GROUP BY t
      )
      WHERE SQRT(GREATEST(m2 - mu * mu, 0.0)) > 0.0
    ),
    z AS (
      SELECT g.src, g.t, (g.f - s.mu) / s.sd AS z
      FROM grid g JOIN stats s ON g.t = s.t
    ),
    pairs AS (
      SELECT a.src AS source_a, b.src AS source_b,
             ABS(a.z - b.z) AS dz
      FROM z a JOIN z b ON a.t = b.t AND a.src < b.src
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(SUM(dz) / COUNT(*), 6) AS delta
    FROM pairs GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 2,
    damping: float = 0.85,
    top_n: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
    over the word co-occurrence graph (adjacent-token edges), the
    graph-centrality complement to `rake_keywords` (degree-heuristic)
    and `tfidf_top_terms` (frequency-contrast):

      ``PR_{t+1}(w) = (1-d) + d * sum over neighbors u of
        weight(u,w)/wdeg(u) * PR_t(u)``,

    from PR_0 = 1, a fixed small number of rounds (the deterministic-
    iteration discipline used by `pagerank_customer_supplier` and
    `hits_supplier_authority`).

    Scale shape: ONE corpus scan builds the Zipf-bounded weighted
    edge list (adjacent bigrams, symmetrized, weight = count); each
    round is one broadcast-join + aggregate over that edge table;
    scores live on the vocabulary table. Integer weights and degree
    sums keep the transition fractions bit-identical across engines.

    Output: top-``top_n`` (word, score) by rounded score, word
    tie-break.
    """
    toked = df.select(tokens(text_col).alias("__ts"))
    bigrams = F.expr(
        "transform(slice(__ts, 1, size(__ts) - 1), "
        "(t, i) -> struct(t as w1, __ts[i + 1] as w2))"
    )
    pairs = toked.select(F.explode(bigrams).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).filter((F.col("w1") != "") & (F.col("w2") != "") & (F.col("w1") != F.col("w2")))
    und = pairs.unionAll(
        pairs.select(F.col("w2").alias("w1"), F.col("w1").alias("w2"))
    )
    edges = und.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("__wt")
    ).localCheckpoint(eager=False)
    wdeg = edges.groupBy("w1").agg(F.sum("__wt").alias("__deg"))
    trans = edges.join(F.broadcast(wdeg), "w1").select(
        "w1",
        "w2",
        (F.col("__wt").cast("double") / F.col("__deg")).alias("__p"),
    )
    scores = wdeg.select("w1", F.lit(1.0).alias("__pr"))
    d = float(damping)
    for _ in range(rounds):
        contrib = trans.join(
            F.broadcast(scores.withColumnRenamed("__pr", "__prev")), "w1"
        ).groupBy("w2").agg(
            F.sum(F.col("__p") * F.col("__prev")).alias("__in")
        )
        scores = (
            wdeg.select("w1")
            .join(contrib.withColumnRenamed("w2", "w1"), "w1", "left")
            .select(
                "w1",
                (
                    F.lit(1.0 - d)
                    + F.lit(d) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("__pr"),
            )
        )
    return (
        scores.select(
            F.col("w1").alias("word"), F.round("__pr", 6).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("word").asc())
        .limit(top_n)
    )


def textrank_keywords_sql(
    text_col: str = "text",
    table: str = "documents",
    rounds: int = 2,
    damping: float = 0.85,
    top_n: int = 20,
) -> str:
    """DuckDB twin of :func:`textrank_keywords` (rounds unrolled)."""
    d = float(damping)
    prev = "s0"
    round_ctes = []
    for k in range(1, rounds + 1):
        round_ctes.append(
            f"""c{k} AS (
      SELECT t.w2, SUM(t.p * s.pr) AS cin
      FROM trans t JOIN {prev} s ON t.w1 = s.w1
      GROUP BY t.w2
    ),
    s{k} AS (
      SELECT wdeg.w1,
             {1.0 - d!r} + {d!r} * COALESCE(c{k}.cin, 0.0) AS pr
      FROM wdeg LEFT JOIN c{k} ON wdeg.w1 = c{k}.w2
    )"""
        )
        prev = f"s{k}"
    rounds_sql = ",\n    ".join(round_ctes)
    return f"""
    WITH toks AS (
      SELECT string_split({text_col}, ' ') AS ts FROM {table}
    ),
    pairs AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(range(1, len(ts))) AS t(i)
      WHERE ts[i] <> '' AND ts[i + 1] <> '' AND ts[i] <> ts[i + 1]
    ),
    und AS (
      SELECT w1, w2 FROM pairs UNION ALL SELECT w2, w1 FROM pairs
    ),
    edges AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS wt
      FROM und GROUP BY w1, w2
    ),
    wdeg AS (SELECT w1, SUM(wt) AS deg FROM edges GROUP BY w1),
    trans AS (
      SELECT e.w1, e.w2, CAST(e.wt AS DOUBLE) / w.deg AS p
      FROM edges e JOIN wdeg w ON e.w1 = w.w1
    ),
    s0 AS (SELECT w1, 1.0 AS pr FROM wdeg),
    {rounds_sql}
    SELECT w1 AS word, ROUND(pr, 6) AS score
    FROM {prev}
    ORDER BY score DESC, word ASC
    LIMIT {top_n}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 79: lexical richness + readability
# ──────────────────────────────────────────────────────────────────────────
def lexical_richness_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 9,
) -> DataFrame:
    """Vocabulary-richness profile per group from the token frequency
    spectrum — the length-robust quality signals TTR can't give
    (type/token ratio collapses as N grows; these are designed not
    to):

      Yule's K  = 10^4 * (Σc² - N) / N²      (repeat-rate; boilerplate
                                              and template spam push it UP)
      Simpson's D = Σ c(c-1) / (N(N-1))      (p two random tokens equal)
      Herdan's C  = ln V / ln N              (log-log TTR)
      Guiraud's R = V / sqrt(N)              (root TTR)

    Tokens are ``split(lower(text), '\\s+')`` minus empties — the
    suite-wide whitespace convention. The frequency spectrum is ONE
    hash aggregate (map-side combined) and the rollup reduces each
    group to four exact-bigint power sums before any double math, so
    the shuffle carries (group, token) counts, never text.

    Output: (group, n_tokens, vocab, yules_k, simpson_d, herdan_c,
    guiraud_r), ordered by group.
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    tf = toks.groupBy("g", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = tf.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.sum(F.col("c") * (F.col("c") - F.lit(1)))
        .cast("bigint")
        .alias("sc1"),
    )
    nn = F.col("n_tokens").cast("double")
    vv = F.col("vocab").cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        "n_tokens",
        "vocab",
        F.round(
            F.lit(10000.0) * (F.col("s2").cast("double") - nn) / (nn * nn),
            round_to,
        ).alias("yules_k"),
        F.round(
            F.col("sc1").cast("double") / (nn * (nn - 1.0)), round_to
        ).alias("simpson_d"),
        F.round(F.log(vv) / F.log(nn), round_to).alias("herdan_c"),
        F.round(vv / F.sqrt(nn), round_to).alias("guiraud_r"),
    ).orderBy(group_col)


def lexical_richness_report_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`lexical_richness_report`."""
    return f"""
    WITH toks AS (
      SELECT g, t FROM (
        SELECT {group_col} AS g,
               unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
        FROM {table}
      ) WHERE t <> ''
    ),
    tf AS (
      SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
    ),
    agg AS (
      SELECT g,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS sc1
      FROM tf GROUP BY g
    )
    SELECT g AS {group_col}, n_tokens, vocab,
           ROUND(10000.0 * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
                 / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
                 {round_to}) AS yules_k,
           ROUND(CAST(sc1 AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE)
                    * (CAST(n_tokens AS DOUBLE) - 1.0)),
                 {round_to}) AS simpson_d,
           ROUND(LN(CAST(vocab AS DOUBLE)) / LN(CAST(n_tokens AS DOUBLE)),
                 {round_to}) AS herdan_c,
           ROUND(CAST(vocab AS DOUBLE) / SQRT(CAST(n_tokens AS DOUBLE)),
                 {round_to}) AS guiraud_r
    FROM agg ORDER BY {group_col}
    """


def flesch_kincaid_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 9,
) -> DataFrame:
    """Flesch-Kincaid grade level + Flesch reading ease per group —
    the syllable-weighted readability pair beside coleman_liau_report
    (CLI avoids syllables; FK is the convention most corpus-quality
    filters quote). Syllables use the standard vowel-group heuristic
    ``[aeiouy]+`` over the lowercased text (documented estimator, the
    SAME regexp in both engines; exactness is in the counting, not
    the phonology):

      grade = 0.39 * words/sentence + 11.8 * syllables/word - 15.59
      ease  = 206.835 - 1.015 * words/sentence - 84.6 * syllables/word

    All three counts are scan-stage ``regexp_count`` expressions
    reduced to exact bigint sums per group; ratios use group TOTALS
    (micro-average), so empty-sentence docs never divide by zero.

    Output: (group, n_docs, words, sentences, syllables, fk_grade,
    flesch_ease), ordered by group.
    """
    counts = df.select(
        F.col(group_col).alias("g"),
        F.regexp_count(F.col(text_col), F.lit(r"\S+"))
        .cast("bigint")
        .alias("__wd"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
        .cast("bigint")
        .alias("__st"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"))
        .cast("bigint")
        .alias("__sy"),
    )
    agg = counts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__wd").cast("bigint").alias("words"),
        F.sum("__st").cast("bigint").alias("sentences"),
        F.sum("__sy").cast("bigint").alias("syllables"),
    )
    ok = (F.col("sentences") > 0) & (F.col("words") > 0)
    wps = F.col("words").cast("double") / F.col("sentences").cast("double")
    spw = F.col("syllables").cast("double") / F.col("words").cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.round(
            F.when(
                ok, F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
            ),
            round_to,
        ).alias("fk_grade"),
        F.round(
            F.when(
                ok,
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
            ),
            round_to,
        ).alias("flesch_ease"),
    ).orderBy(group_col)


def flesch_kincaid_report_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`flesch_kincaid_report`."""
    return f"""
    WITH counts AS (
      SELECT {group_col} AS g,
             CAST(len(regexp_extract_all({text_col}, '\\S+')) AS BIGINT) AS wd,
             CAST(len(regexp_extract_all({text_col}, '[.!?]+')) AS BIGINT) AS st,
             CAST(len(regexp_extract_all(lower({text_col}), '[aeiouy]+'))
                  AS BIGINT) AS sy
      FROM {table}
    ),
    agg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(wd) AS BIGINT) AS words,
             CAST(SUM(st) AS BIGINT) AS sentences,
             CAST(SUM(sy) AS BIGINT) AS syllables
      FROM counts GROUP BY g
    )
    SELECT g AS {group_col}, n_docs, words, sentences, syllables,
           ROUND(CASE WHEN sentences > 0 AND words > 0 THEN
                 0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                 + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
                 - 15.59 END, {round_to}) AS fk_grade,
           ROUND(CASE WHEN sentences > 0 AND words > 0 THEN
                 206.835
                 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                 - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
                 END, {round_to}) AS flesch_ease
    FROM agg ORDER BY {group_col}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 81: tokenizer fertility + Heaps-law fit
# ──────────────────────────────────────────────────────────────────────────
def tokenizer_fertility_report(
    df: DataFrame,
    lang_col: str = "lang",
    source_col: str = "source",
    text_col: str = "text",
    round_to: int = 9,
) -> DataFrame:
    """Tokenizer fertility per (lang, source): BPE-ish subword tokens
    per whitespace word, plus characters per token — THE standard
    tokenizer-efficiency metrics (fertility >> 1 means the tokenizer
    fragments that language/source, inflating sequence lengths and
    training cost; the per-slice view is what drives vocab rebalance
    decisions). Counts are the suite's shared pre-tokenizer
    (``BPE_TOKEN_RE``) and whitespace-word regexes, all scan-stage
    JVM expressions reduced to exact bigint sums; ratios are
    micro-averages over slice totals.

    Output: (lang, source, n_docs, words, bpe_tokens, chars,
    fertility, chars_per_token), ordered by (lang, source).
    """
    counts = df.select(
        F.col(lang_col).alias("l"),
        F.col(source_col).alias("s"),
        F.regexp_count(F.col(text_col), F.lit(r"\S+"))
        .cast("bigint")
        .alias("__wd"),
        bpe_token_count(F.col(text_col)).cast("bigint").alias("__tk"),
        F.length(F.col(text_col)).cast("bigint").alias("__ch"),
    )
    agg = counts.groupBy("l", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__wd").cast("bigint").alias("words"),
        F.sum("__tk").cast("bigint").alias("bpe_tokens"),
        F.sum("__ch").cast("bigint").alias("chars"),
    )
    ok_w = F.col("words") > 0
    ok_t = F.col("bpe_tokens") > 0
    return agg.select(
        F.col("l").alias(lang_col),
        F.col("s").alias(source_col),
        "n_docs",
        "words",
        "bpe_tokens",
        "chars",
        F.round(
            F.when(
                ok_w,
                F.col("bpe_tokens").cast("double")
                / F.col("words").cast("double"),
            ),
            round_to,
        ).alias("fertility"),
        F.round(
            F.when(
                ok_t,
                F.col("chars").cast("double")
                / F.col("bpe_tokens").cast("double"),
            ),
            round_to,
        ).alias("chars_per_token"),
    ).orderBy(lang_col, source_col)


def tokenizer_fertility_report_sql(
    table: str = "documents",
    lang_col: str = "lang",
    source_col: str = "source",
    text_col: str = "text",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`tokenizer_fertility_report`."""
    return f"""
    WITH counts AS (
      SELECT {lang_col} AS l, {source_col} AS s,
             CAST(len(regexp_extract_all({text_col}, '\\S+')) AS BIGINT) AS wd,
             CAST({bpe_token_count_sql(text_col)} AS BIGINT) AS tk,
             CAST(length({text_col}) AS BIGINT) AS ch
      FROM {table}
    ),
    agg AS (
      SELECT l, s, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(wd) AS BIGINT) AS words,
             CAST(SUM(tk) AS BIGINT) AS bpe_tokens,
             CAST(SUM(ch) AS BIGINT) AS chars
      FROM counts GROUP BY l, s
    )
    SELECT l AS {lang_col}, s AS {source_col}, n_docs, words, bpe_tokens,
           chars,
           ROUND(CASE WHEN words > 0 THEN
                 CAST(bpe_tokens AS DOUBLE) / CAST(words AS DOUBLE) END,
                 {round_to}) AS fertility,
           ROUND(CASE WHEN bpe_tokens > 0 THEN
                 CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE) END,
                 {round_to}) AS chars_per_token
    FROM agg ORDER BY {lang_col}, {source_col}
    """


def heaps_law_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10,
    round_to: int = 9,
) -> DataFrame:
    """Heaps-law fit ``V = k * N^alpha`` over the corpus growth
    checkpoints — the fitted-exponent summary of
    :func:`vocab_growth_curve` (alpha near the english-corpus 0.4-0.6
    band = healthy novelty; alpha collapsing toward 0 = the corpus is
    recycling vocabulary, the aggregate symptom LSH dedup then
    localizes). ln V regresses on ln N over the ``buckets`` cumulative
    (tokens, vocab) points by closed-form OLS.

    Exactness: cumulative token counts and first-seen vocab counts
    are exact bigints (same bucketing arithmetic as
    vocab_growth_curve); the ln/OLS chain runs over the
    ``buckets``-row rollup in one shared operation order.

    Output (one row): (n_points, alpha, k_coef, r2).
    """
    toks = df.select(
        F.col(id_col).alias("d"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
    ).where(F.col("t") != "")
    bounds = df.agg(
        F.min(F.col(id_col)).cast("bigint").alias("__lo"),
        F.max(F.col(id_col)).cast("bigint").alias("__hi"),
    )
    tok_b = (
        toks.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((d - __lo) * {buckets}) div (__hi - __lo + 1)")
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
    )
    first_seen = toks.groupBy("t").agg(F.min("d").alias("fs"))
    voc_b = (
        first_seen.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((fs - __lo) * {buckets}) div (__hi - __lo + 1)")
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pts = (
        tok_b.join(voc_b, "bucket", "left")
        .withColumn("nv", F.coalesce(F.col("nv"), F.lit(0).cast("bigint")))
        .select(
            "bucket",
            F.sum("tc").over(w).alias("tn"),
            F.sum("nv").over(w).alias("vc"),
        )
        .select(
            F.log(F.col("tn").cast("double")).alias("__x"),
            F.log(F.col("vc").cast("double")).alias("__y"),
        )
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("sx2"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).alias("sy2"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    nn = F.col("n_points").cast("double")
    sxx = F.col("sx2") - F.col("sx") * F.col("sx") / nn
    syy = F.col("sy2") - F.col("sy") * F.col("sy") / nn
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / nn
    alpha = sxy_c / sxx
    intercept = F.col("sy") / nn - alpha * (F.col("sx") / nn)
    r2 = sxy_c * sxy_c / (sxx * syy)
    return agg.select(
        "n_points",
        F.round(alpha, round_to).alias("alpha"),
        F.round(F.exp(intercept), round_to).alias("k_coef"),
        F.round(r2, round_to).alias("r2"),
    )


def heaps_law_fit_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`heaps_law_fit`."""
    return f"""
    WITH toks AS (
      SELECT d, t FROM (
        SELECT {id_col} AS d,
               unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
        FROM {table}
      ) WHERE t <> ''
    ),
    bounds AS (
      SELECT CAST(MIN({id_col}) AS BIGINT) AS lo,
             CAST(MAX({id_col}) AS BIGINT) AS hi
      FROM {table}
    ),
    tok_b AS (
      SELECT CAST(((d - lo) * {buckets}) // (hi - lo + 1) AS INTEGER)
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS tc
      FROM toks CROSS JOIN bounds GROUP BY 1
    ),
    first_seen AS (SELECT t, MIN(d) AS fs FROM toks GROUP BY t),
    voc_b AS (
      SELECT CAST(((fs - lo) * {buckets}) // (hi - lo + 1) AS INTEGER)
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS nv
      FROM first_seen CROSS JOIN bounds GROUP BY 1
    ),
    pts AS (
      SELECT LN(CAST(SUM(tc) OVER (ORDER BY t.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE)) AS x,
             LN(CAST(SUM(COALESCE(v.nv, 0)) OVER (ORDER BY t.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE)) AS y
      FROM tok_b t LEFT JOIN voc_b v ON t.bucket = v.bucket
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
             SUM(x) AS sx, SUM(x * x) AS sx2,
             SUM(y) AS sy, SUM(y * y) AS sy2,
             SUM(x * y) AS sxy
      FROM pts
    )
    SELECT n_points,
           ROUND((sxy - sx * sy / CAST(n_points AS DOUBLE))
                 / (sx2 - sx * sx / CAST(n_points AS DOUBLE)),
                 {round_to}) AS alpha,
           ROUND(EXP(sy / CAST(n_points AS DOUBLE)
                 - ((sxy - sx * sy / CAST(n_points AS DOUBLE))
                    / (sx2 - sx * sx / CAST(n_points AS DOUBLE)))
                   * (sx / CAST(n_points AS DOUBLE))),
                 {round_to}) AS k_coef,
           ROUND((sxy - sx * sy / CAST(n_points AS DOUBLE))
                 * (sxy - sx * sy / CAST(n_points AS DOUBLE))
                 / ((sx2 - sx * sx / CAST(n_points AS DOUBLE))
                    * (sy2 - sy * sy / CAST(n_points AS DOUBLE))),
                 {round_to}) AS r2
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 105: Dunning log-likelihood keyness
# ──────────────────────────────────────────────────────────────────────────


def dunning_keyness(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Dunning (1993) log-likelihood keyness: for every (group, token)
    the G² statistic of the 2×2 table (token vs rest-of-vocabulary ×
    group vs rest-of-corpus) — the INFERENTIAL "what words
    characterize this source" ranking, where raw top-frequency lists
    (top_tokens_per_source) just re-rank the global Zipf head and
    PMI over-rewards rare flukes. G² = 2·Σ O·ln(O/E) over the four
    cells with the 0·ln0 = 0 convention; only OVERUSED terms
    (O11 > E11) are ranked, the keyness convention.

    All cell counts and marginals are exact bigints; E-cells are
    rationals of those, so both engines sum identical doubles over 4
    terms. One token rollup + two broadcast marginal joins + a per-
    group top-k window. Output: (group, token, obs, expected, g2),
    top ``top_k`` per group by (g2 desc, token)."""
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(F.split(F.col(text_col), " ")).alias("__t"),
    ).filter(F.col("__t") != "")
    cells = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("o11")
    )
    tok_tot = toks.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("tot_t")
    )
    grp_tot = toks.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    n_all = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    j = (
        cells.join(F.broadcast(tok_tot), "__t")
        .join(F.broadcast(grp_tot), "__g")
        .crossJoin(F.broadcast(n_all))
    )
    o11 = F.col("o11").cast("double")
    o12 = (F.col("tot_t") - F.col("o11")).cast("double")
    o21 = (F.col("n_g") - F.col("o11")).cast("double")
    o22 = (
        F.col("n_all") - F.col("tot_t") - F.col("n_g") + F.col("o11")
    ).cast("double")
    nn = F.col("n_all").cast("double")
    e11 = F.col("tot_t").cast("double") * F.col("n_g").cast("double") / nn
    e12 = F.col("tot_t").cast("double") * (nn - F.col("n_g").cast("double")) / nn
    e21 = (nn - F.col("tot_t").cast("double")) * F.col("n_g").cast("double") / nn
    e22 = (
        (nn - F.col("tot_t").cast("double"))
        * (nn - F.col("n_g").cast("double"))
        / nn
    )

    def _term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    g2 = F.lit(2.0) * (
        _term(o11, e11) + _term(o12, e12) + _term(o21, e21) + _term(o22, e22)
    )
    ranked = j.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias("token"),
        F.col("o11").alias("obs"),
        F.round(e11, round_to).alias("expected"),
        F.round(g2, round_to).alias("g2"),
        (o11 > e11).alias("__over"),
    ).filter(F.col("__over"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("g2").desc(), F.col("token")
    )
    return (
        ranked.select(
            group_col,
            "token",
            "obs",
            "expected",
            "g2",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= top_k)
        .orderBy(group_col, "rank")
    )


def dunning_keyness_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`dunning_keyness`."""
    return f"""
    WITH toks AS (
      SELECT {group_col} AS g, t FROM (
        SELECT {group_col}, unnest(string_split({text_col}, ' ')) AS t
        FROM {table}
      ) WHERE t <> ''
    ),
    cells AS (
      SELECT g, t, CAST(COUNT(*) AS BIGINT) AS o11
      FROM toks GROUP BY 1, 2
    ),
    tok_tot AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS tot_t FROM toks GROUP BY 1
    ),
    grp_tot AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g FROM toks GROUP BY 1
    ),
    n_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM toks),
    terms AS (
      SELECT c.g, c.t, c.o11,
             CAST(tt.tot_t AS DOUBLE) * CAST(gt.n_g AS DOUBLE)
               / CAST(n.n_all AS DOUBLE) AS e11,
             2.0 * (
               (CASE WHEN c.o11 > 0 THEN CAST(c.o11 AS DOUBLE)
                 * LN(CAST(c.o11 AS DOUBLE)
                      / (CAST(tt.tot_t AS DOUBLE) * CAST(gt.n_g AS DOUBLE)
                         / CAST(n.n_all AS DOUBLE))) ELSE 0.0 END)
             + (CASE WHEN tt.tot_t - c.o11 > 0
                 THEN CAST(tt.tot_t - c.o11 AS DOUBLE)
                 * LN(CAST(tt.tot_t - c.o11 AS DOUBLE)
                      / (CAST(tt.tot_t AS DOUBLE)
                         * (CAST(n.n_all AS DOUBLE)
                            - CAST(gt.n_g AS DOUBLE))
                         / CAST(n.n_all AS DOUBLE))) ELSE 0.0 END)
             + (CASE WHEN gt.n_g - c.o11 > 0
                 THEN CAST(gt.n_g - c.o11 AS DOUBLE)
                 * LN(CAST(gt.n_g - c.o11 AS DOUBLE)
                      / ((CAST(n.n_all AS DOUBLE)
                          - CAST(tt.tot_t AS DOUBLE))
                         * CAST(gt.n_g AS DOUBLE)
                         / CAST(n.n_all AS DOUBLE))) ELSE 0.0 END)
             + (CASE WHEN n.n_all - tt.tot_t - gt.n_g + c.o11 > 0
                 THEN CAST(n.n_all - tt.tot_t - gt.n_g + c.o11 AS DOUBLE)
                 * LN(CAST(n.n_all - tt.tot_t - gt.n_g + c.o11 AS DOUBLE)
                      / ((CAST(n.n_all AS DOUBLE)
                          - CAST(tt.tot_t AS DOUBLE))
                         * (CAST(n.n_all AS DOUBLE)
                            - CAST(gt.n_g AS DOUBLE))
                         / CAST(n.n_all AS DOUBLE))) ELSE 0.0 END)
             ) AS g2
      FROM cells c
      JOIN tok_tot tt ON tt.t = c.t
      JOIN grp_tot gt ON gt.g = c.g
      CROSS JOIN n_all n
    ),
    ranked AS (
      SELECT g AS {group_col}, t AS token, o11 AS obs,
             ROUND(e11, {round_to}) AS expected,
             ROUND(g2, {round_to}) AS g2,
             ROW_NUMBER() OVER (PARTITION BY g
                                ORDER BY ROUND(g2, {round_to}) DESC, t)
               AS rank
      FROM terms
      WHERE CAST(o11 AS DOUBLE) > e11
    )
    SELECT {group_col}, token, obs, expected, g2, rank
    FROM ranked WHERE rank <= {top_k}
    ORDER BY {group_col}, rank
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 116: Zipf-Mandelbrot rank-law fit
# ──────────────────────────────────────────────────────────────────────────


def zipf_mandelbrot_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    q_grid: tuple = (0, 1, 2, 3, 4, 5, 6, 8, 10, 15, 20),
    round_to: int = 6,
) -> DataFrame:
    """Zipf-Mandelbrot fit f(r) ∝ (r + q)^(−α): plain Zipf
    (zipf_token_ranks shows the curve) systematically bends at the
    head — Mandelbrot's offset q straightens it. Nonlinear in q, but
    q is a SMALL literal grid: for each candidate the fit is the
    closed-form log-log OLS of ln f on ln(r + q), and the winner is
    the candidate minimizing residual SS (tie → smaller q). Reports
    the plain-Zipf fit (q = 0) beside the winner, so the R² gain IS
    the head-bend measurement.

    One vocab rollup → top_k ranks → |grid|×top_k tiny cross —
    everything downstream of the corpus scan is literal-sized.
    Output (one row): n_ranks, q_best, alpha, r2, alpha_zipf,
    r2_zipf."""
    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("term")).limit(top_k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    ranked = top.select(
        F.row_number().over(w).cast("double").alias("__r"),
        F.col("cnt").cast("double").alias("__f"),
    )
    qs = F.array(*[F.lit(float(q)) for q in q_grid])
    terms = ranked.select(
        "__r", "__f", F.explode(qs).alias("__q")
    ).select(
        "__q",
        F.log(F.col("__r") + F.col("__q")).alias("__lx"),
        F.log("__f").alias("__ly"),
    )
    fits = terms.groupBy("__q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranks"),
        F.sum("__lx").alias("sx"),
        F.sum(F.col("__lx") * F.col("__lx")).alias("sxx"),
        F.sum("__ly").alias("sy"),
        F.sum(F.col("__ly") * F.col("__ly")).alias("syy"),
        F.sum(F.col("__lx") * F.col("__ly")).alias("sxy"),
    )
    nn = F.col("n_ranks").cast("double")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / nn
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / nn
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / nn
    scored = fits.select(
        "__q",
        "n_ranks",
        (-sxy_c / sxx_c).alias("__alpha"),
        (sxy_c * sxy_c / (sxx_c * syy_c)).alias("__r2"),
        (syy_c - sxy_c * sxy_c / sxx_c).alias("__ssr"),
    )
    w_best = Window.orderBy(F.col("__ssr"), F.col("__q"))
    best = scored.select(
        "*", F.row_number().over(w_best).alias("__rk")
    ).filter(F.col("__rk") == 1)
    zipf0 = scored.filter(F.col("__q") == 0.0).select(
        F.col("__alpha").alias("__a0"), F.col("__r2").alias("__r20")
    )
    return best.crossJoin(F.broadcast(zipf0)).select(
        "n_ranks",
        F.col("__q").cast("int").alias("q_best"),
        F.round(F.col("__alpha"), round_to).alias("alpha"),
        F.round(F.col("__r2"), round_to).alias("r2"),
        F.round(F.col("__a0"), round_to).alias("alpha_zipf"),
        F.round(F.col("__r20"), round_to).alias("r2_zipf"),
    )


def zipf_mandelbrot_fit_sql(
    table: str = "documents",
    text_col: str = "text",
    top_k: int = 100,
    q_grid: tuple = (0, 1, 2, 3, 4, 5, 6, 8, 10, 15, 20),
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`zipf_mandelbrot_fit`."""
    grid = ", ".join(f"{float(q)!r}" for q in q_grid)
    return f"""
    WITH toks AS (
      SELECT t AS term FROM (
        SELECT unnest(string_split({text_col}, ' ')) AS t FROM {table}
      ) WHERE t <> ''
    ),
    counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    ranked AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS DOUBLE)
               AS r,
             CAST(cnt AS DOUBLE) AS f
      FROM counts
      QUALIFY r <= {top_k}
    ),
    terms AS (
      SELECT q.q, LN(r + q.q) AS lx, LN(f) AS ly
      FROM ranked CROSS JOIN (SELECT unnest([{grid}]) AS q) q
    ),
    fits AS (
      SELECT q, CAST(COUNT(*) AS BIGINT) AS n_ranks,
             SUM(lx) AS sx, SUM(lx * lx) AS sxx,
             SUM(ly) AS sy, SUM(ly * ly) AS syy,
             SUM(lx * ly) AS sxy
      FROM terms GROUP BY q
    ),
    scored AS (
      SELECT q, n_ranks,
             -(sxy - sx * sy / CAST(n_ranks AS DOUBLE))
               / (sxx - sx * sx / CAST(n_ranks AS DOUBLE)) AS alpha,
             (sxy - sx * sy / CAST(n_ranks AS DOUBLE))
               * (sxy - sx * sy / CAST(n_ranks AS DOUBLE))
               / ((sxx - sx * sx / CAST(n_ranks AS DOUBLE))
                  * (syy - sy * sy / CAST(n_ranks AS DOUBLE))) AS r2,
             (syy - sy * sy / CAST(n_ranks AS DOUBLE))
               - (sxy - sx * sy / CAST(n_ranks AS DOUBLE))
                 * (sxy - sx * sy / CAST(n_ranks AS DOUBLE))
                 / (sxx - sx * sx / CAST(n_ranks AS DOUBLE)) AS ssr
      FROM fits
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY ssr, q) AS rk FROM scored
    ),
    zipf0 AS (SELECT alpha AS a0, r2 AS r20 FROM scored WHERE q = 0.0)
    SELECT b.n_ranks,
           CAST(b.q AS INT) AS q_best,
           ROUND(b.alpha, {round_to}) AS alpha,
           ROUND(b.r2, {round_to}) AS r2,
           ROUND(z.a0, {round_to}) AS alpha_zipf,
           ROUND(z.r20, {round_to}) AS r2_zipf
    FROM best b CROSS JOIN zipf0 z WHERE b.rk = 1
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 121: winnowing fingerprints (Schleimer, Wilkerson & Aiken,
# SIGMOD 2003 — the MOSS local document fingerprinting algorithm)
# ──────────────────────────────────────────────────────────────────────────

#: winnowing position packing: combined = hash * 2^16 + (2^16-1 - pos),
#: so an integer MIN picks (smallest hash, RIGHTMOST position on ties)
#: — the paper's robust tie rule — in one bigint comparison. Bounds:
#: hash < 2^32 from the md5 prefix, pos < 2^16 grams per document.
_WINNOW_POS_LIMIT = 1 << 16


def winnow_fingerprint_cols(
    text_col: str = "text", k: int = 4, window: int = 4
) -> dict[str, "Column"]:
    """Winnowing fingerprint statistics as narrow JVM columns.

    Token k-gram hashes h_0..h_{m-1} (32-bit md5 prefix of the joined
    gram over the whitespace-normalized text); every length-``window``
    window of consecutive hashes selects its minimum, RIGHTMOST on ties
    (packed-integer trick above); the fingerprint SET is the distinct
    selected (hash, pos) pairs. Guarantees from the paper: any shared
    substring of length >= k + window - 1 tokens yields at least one
    shared fingerprint (0% false negatives at that scale), and the
    expected density is 2/(window+1).

    Everything is array expressions inside the scan stage — O(m*window)
    per document, no explode, no shuffle of gram rows, no Python. Each
    array stage sits in its own column so the md5 work is not re-run
    across lambda boundaries (Catalyst does not CSE into lambdas).

    Returns a dict of column expressions keyed by output name:
    n_grams, n_fps, fp_checksum (sum of packed fingerprints mod 1e12 —
    exact integer, order-free).
    """
    toks = "__winnow_toks"
    comb = "__winnow_comb"
    return {
        toks: F.split(normalize_text(text_col), " "),
        # Spark's sequence(0, n) DESCENDS for n < 0 (DuckDB's range is
        # empty there), so both stages guard short documents explicitly
        # position packed as (pl-1) - (i % pl): wraps at the 2^16 pack
        # limit instead of going NEGATIVE for pathologically long
        # documents (>= 65536 grams would otherwise corrupt the
        # packed ordering; identical wrap in the DuckDB twin —
        # ADVICE r7 #4)
        comb: F.expr(
            f"if(size({toks}) >= {k}, "
            f"transform(sequence(0, size({toks}) - {k}), i -> "
            f"cast(conv(substring(md5(array_join("
            f"slice({toks}, i + 1, {k}), ' ')), 1, 8), 16, 10) as bigint)"
            f" * {_WINNOW_POS_LIMIT} + {_WINNOW_POS_LIMIT - 1}"
            f" - i % {_WINNOW_POS_LIMIT}), "
            f"array())"
        ),
        "__winnow_fps": F.expr(
            f"if(size({comb}) >= {window}, "
            f"array_distinct(transform("
            f"sequence(0, size({comb}) - {window}), s -> "
            f"array_min(slice({comb}, s + 1, {window})))), "
            f"cast(array() as array<bigint>))"
        ),
    }


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprints: (doc_id, n_grams, n_fps,
    fp_checksum, density). Documents shorter than k + window - 1 tokens
    have no full window and emit n_fps = 0.

    Scale shape: single narrow projection inside the parquet scan —
    the fingerprint set (the thing a plagiarism/near-dup index would
    shuffle) is ~2/(window+1) of the gram count, never the body.
    """
    cols = winnow_fingerprint_cols(text_col, k=k, window=window)
    staged = docs
    for name, c in cols.items():
        staged = staged.withColumn(name, c)
    m = F.greatest(F.size(F.col("__winnow_comb")), F.lit(0))
    fps = F.when(
        F.size(F.col("__winnow_comb")) >= window, F.col("__winnow_fps")
    ).otherwise(F.array().cast("array<bigint>"))
    n_fps = F.size(fps)
    return staged.withColumn("__winnow_fps_guarded", fps).select(
        "doc_id",
        m.cast("bigint").alias("n_grams"),
        n_fps.cast("bigint").alias("n_fps"),
        # mod applied INSIDE the fold: accumulator stays < 2e12, so
        # the non-ANSI int64 aggregate cannot wrap however long the
        # document (DuckDB's list_sum promotes to HUGEINT, so its
        # plain sum % 1e12 equals this exactly — ADVICE r7 #4)
        F.coalesce(
            F.expr(
                "aggregate(__winnow_fps_guarded, cast(0 as bigint),"
                " (a, x) -> (a + x % 1000000000000) % 1000000000000)"
            ),
            F.lit(0).cast("bigint"),
        ).alias("fp_checksum"),
        F.round(
            n_fps.cast("double") / F.when(m > 0, m.cast("double")), 6
        ).alias("density"),
    )


def winnow_fingerprints_sql(
    docs_sql: str, text_col: str = "text", k: int = 4, window: int = 4
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (list_* dialect;
    1-based inclusive list_slice vs Spark's (start, length) slice)."""
    pl = _WINNOW_POS_LIMIT
    norm = f"regexp_replace(lower(trim({text_col})), ' +', ' ', 'g')"
    return f"""
    WITH d AS ({docs_sql}),
    toked AS (
      SELECT doc_id, string_split({norm}, ' ') AS toks FROM d
    ),
    combed AS (
      SELECT doc_id,
             list_transform(range(0, len(toks) - {k} + 1), i ->
               CAST(('0x' || substring(md5(array_to_string(
                 list_slice(toks, i + 1, i + {k}), ' ')), 1, 8)) AS BIGINT)
               * {pl} + {pl - 1} - i % {pl}) AS comb
      FROM toked
    ),
    fpd AS (
      SELECT doc_id,
             len(comb) AS m,
             CASE WHEN len(comb) >= {window} THEN
               list_distinct(list_transform(
                 range(0, len(comb) - {window} + 1), s ->
                 list_min(list_slice(comb, s + 1, s + {window}))))
             ELSE [] END AS fps
      FROM combed
    )
    SELECT doc_id,
           CAST(m AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fps,
           COALESCE(list_sum(fps), 0) % 1000000000000 AS fp_checksum,
           ROUND(CAST(len(fps) AS DOUBLE)
                 / CASE WHEN m > 0 THEN CAST(m AS DOUBLE) END, 6)
             AS density
    FROM fpd
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 130: term burstiness / adaptation (Church & Gale; Katz)
# ──────────────────────────────────────────────────────────────────────────


def term_burstiness(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_df: int = 10,
    top_k: int = 25,
    round_to: int = 6,
) -> DataFrame:
    """Term burstiness a la Church-Gale / Katz: content words do not
    arrive Poisson — once a term appears in a document it tends to
    RECUR. Two standard measurements per term:

      * adaptation ``P(k >= 2 | k >= 1) = df2 / df1`` (Church's
        "adaptation" probability; df_k = docs with >= k occurrences),
      * burstiness ``B = cf/df1 / (lambda / (1 - e^-lambda))`` —
        observed within-doc mean vs the zero-truncated-Poisson mean a
        memoryless term with the same corpus rate lambda = cf/N would
        show; B >> 1 marks topical/content terms, B ~ 1 function words.

    All inputs are exact integer counts (cf, df1, df2, N); the only
    doubles are the final closed-form ratios (one exp), bit-identical
    cross-engine. (adaptation desc, term) totally orders the top-k.

    Scale shape: one (doc, term) count aggregate (the shuffle every
    vocabulary statistic pays), one term rollup; min_df keeps the
    long-tail noise out of the ranking.
    """
    n_docs = df.select(F.countDistinct(doc_col).alias("nd"))
    dt = (
        df.select(
            F.col(doc_col).alias("d"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("d", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    per_term = dt.groupBy("term").agg(
        F.sum("k").cast("bigint").alias("cf"),
        F.count(F.lit(1)).cast("bigint").alias("df1"),
        F.sum((F.col("k") >= 2).cast("bigint")).cast("bigint").alias("df2"),
    ).filter(F.col("df1") >= min_df)
    j = per_term.crossJoin(F.broadcast(n_docs))
    lam = F.col("cf").cast("double") / F.col("nd").cast("double")
    ztp_mean = lam / (F.lit(1.0) - F.exp(-lam))
    obs_mean = F.col("cf").cast("double") / F.col("df1").cast("double")
    adapt = F.col("df2").cast("double") / F.col("df1").cast("double")
    return (
        j.select(
            "term",
            "cf",
            "df1",
            "df2",
            F.round(adapt, round_to).alias("adaptation"),
            F.round(obs_mean / ztp_mean, round_to).alias("burstiness"),
        )
        .orderBy(F.col("adaptation").desc(), F.col("term").asc())
        .limit(top_k)
    )


def term_burstiness_sql(
    table: str = "documents",
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_df: int = 10,
    top_k: int = 25,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`term_burstiness` (raw whitespace split,
    matching the Spark side's ``tokens()``)."""
    return f"""
    WITH n_docs AS (
      SELECT CAST(COUNT(DISTINCT {doc_col}) AS BIGINT) AS nd FROM {table}
    ),
    dt AS (
      SELECT {doc_col} AS d, UNNEST(string_split({text_col}, ' ')) AS term
      FROM {table}
    ),
    dtk AS (
      SELECT d, term, CAST(COUNT(*) AS BIGINT) AS k
      FROM dt WHERE term <> '' GROUP BY d, term
    ),
    per_term AS (
      SELECT term,
             CAST(SUM(k) AS BIGINT) AS cf,
             CAST(COUNT(*) AS BIGINT) AS df1,
             CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM dtk GROUP BY term HAVING COUNT(*) >= {min_df}
    )
    SELECT term, cf, df1, df2,
           ROUND(CAST(df2 AS DOUBLE) / df1, {round_to}) AS adaptation,
           ROUND((CAST(cf AS DOUBLE) / df1)
                 / ((CAST(cf AS DOUBLE) / nd)
                    / (1.0 - exp(-(CAST(cf AS DOUBLE) / nd)))),
                 {round_to}) AS burstiness
    FROM per_term CROSS JOIN n_docs
    ORDER BY adaptation DESC, term ASC
    LIMIT {top_k}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 134: simple Good-Turing frequency smoothing
# ──────────────────────────────────────────────────────────────────────────


def good_turing_mass(
    df: DataFrame,
    text_col: str = "text",
    max_r: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Good-Turing frequency-of-frequencies analysis of the token
    unigram distribution: the unseen-type mass ``P0 = N1/N`` (the
    probability the NEXT token is a type never seen — what every
    smoothed language model reserves) and the Turing-discounted counts
    ``r* = (r+1)·N_{r+1}/N_r`` for r = 1..max_r, whose ratio r*/r IS
    the discount the Kneser-Ney family applies. The inventory-side
    complement to the ACE/Chao richness estimators (how many types are
    MISSING) — this prices how much probability they carry.

    Every statistic derives from the frequency-of-frequencies table
    N_r — exact integer counts of integer counts; the only doubles are
    final closed-form ratios (wave-118 discipline). Two aggregates:
    the (term -> count) rollup every vocabulary op pays, then the
    (count -> N_r) rollup, which is tiny.

    Output: one row per r in 0..max_r: (r, n_r, p_mass, r_star) where
    p_mass is the TOTAL probability of the r-count stratum under GT
    (r=0 row: N_r = distinct singleton types N1, p_mass = P0,
    r_star = NULL).
    """
    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    fof = counts.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    tot = counts.agg(
        F.sum("r").cast("bigint").alias("n_tok"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("rp"), F.col("n_r").alias("n_r1")
    )
    base = (
        fof.filter(F.col("r") <= max_r)
        .join(nxt, fof["r"] == nxt["rp"], "left")
        .crossJoin(F.broadcast(tot))
    )
    r_d = F.col("r").cast("double")
    mass = (
        (r_d + F.lit(1.0))
        * F.col("n_r1").cast("double")
        / F.col("n_tok").cast("double")
    )
    r_star = (
        (r_d + F.lit(1.0))
        * F.col("n_r1").cast("double")
        / F.col("n_r").cast("double")
    )
    rows = base.select(
        F.col("r").cast("bigint").alias("r"),
        F.col("n_r"),
        F.round(mass, round_to).alias("p_mass"),
        F.round(r_star, round_to).alias("r_star"),
    )
    zero = (
        fof.filter(F.col("r") == 1)
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit(0).cast("bigint").alias("r"),
            F.col("n_r"),
            F.round(
                F.col("n_r").cast("double") / F.col("n_tok").cast("double"),
                round_to,
            ).alias("p_mass"),
            F.lit(None).cast("double").alias("r_star"),
        )
    )
    return zero.unionByName(rows).orderBy("r")


def good_turing_mass_sql(
    table: str = "documents",
    text_col: str = "text",
    max_r: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`good_turing_mass`."""
    return f"""
    WITH terms AS (
      SELECT UNNEST(string_split({text_col}, ' ')) AS term FROM {table}
    ),
    counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS r
      FROM terms WHERE term <> '' GROUP BY term
    ),
    fof AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM counts GROUP BY r
    ),
    tot AS (
      SELECT CAST(SUM(r) AS BIGINT) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM counts
    ),
    rows_r AS (
      SELECT f.r, f.n_r,
             ROUND((CAST(f.r AS DOUBLE) + 1.0) * CAST(nx.n_r AS DOUBLE)
                   / CAST(t.n_tok AS DOUBLE), {round_to}) AS p_mass,
             ROUND((CAST(f.r AS DOUBLE) + 1.0) * CAST(nx.n_r AS DOUBLE)
                   / CAST(f.n_r AS DOUBLE), {round_to}) AS r_star
      FROM fof f
      LEFT JOIN fof nx ON nx.r = f.r + 1
      CROSS JOIN tot t
      WHERE f.r <= {max_r}
    ),
    row_zero AS (
      SELECT CAST(0 AS BIGINT) AS r, f.n_r,
             ROUND(CAST(f.n_r AS DOUBLE) / CAST(t.n_tok AS DOUBLE),
                   {round_to}) AS p_mass,
             CAST(NULL AS DOUBLE) AS r_star
      FROM fof f CROSS JOIN tot t WHERE f.r = 1
    )
    SELECT * FROM row_zero
    UNION ALL
    SELECT * FROM rows_r
    ORDER BY r
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 155: Min-K% Prob pretraining-membership / contamination signal
# ──────────────────────────────────────────────────────────────────────────


def mink_prob_membership(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_pct: float = 0.2,
    top_n: int = 20,
) -> DataFrame:
    """Min-K% Prob (Shi et al. 2023, "Detecting Pretraining Data from
    Large Language Models"): score each document by the MEAN
    log-probability of its k% LEAST-probable tokens. A genuinely novel
    document always contains some tokens the model finds surprising;
    a document the model trained on (or near-duplicates of corpus
    boilerplate) is fluent even in its WORST tokens — so a high
    bottom-k% log-prob (low NLL) flags membership/contamination.

    As with :func:`unigram_logprob_quality` (whose per-token NLL join
    this reuses), the corpus's own empirical unigram distribution
    stands in for the external LM; a real LM's token logprobs slot
    into the same per-token frame. Output: the ``top_n`` most
    member-like documents, ascending by the bottom-k% mean NLL
    (doc_id tie-break), with ranks.

    Scale shape: vocab-sized broadcast join onto the exploded scan;
    the k%-tail selection is one per-doc window over (nll DESC, token
    ASC) — deterministic under ties — followed by a doc-keyed
    aggregate; the global cut is TakeOrdered(top_n), never a full
    sort. Determinism: per-token NLLs are identical doubles in both
    engines (same log of the same exact ratio); the k-tail mean is
    ROUNDed at 6dp, far above any summation-order ulp at its O(1..20)
    magnitude.

    Output: (rank, doc_id, n_tokens, k_tokens, mink_mean_nll).
    """
    from pyspark.sql import Window

    toks = tokens(text_col)
    exploded = df.select(F.col(id_col), F.explode(toks).alias("__t"))
    total = exploded.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    uni = exploded.groupBy("__t").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    scored = (
        exploded.join(F.broadcast(uni), "__t")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "__t",
            (-F.log(F.col("__c") / F.col("__n"))).alias("__nll"),
        )
    )
    wdoc = Window.partitionBy(id_col).orderBy(
        F.col("__nll").desc(), F.col("__t").asc()
    )
    wcnt = Window.partitionBy(id_col)
    ranked = scored.select(
        id_col,
        "__nll",
        F.row_number().over(wdoc).cast("bigint").alias("__r"),
        F.count(F.lit(1)).over(wcnt).cast("bigint").alias("__nt"),
    )
    k_tokens = F.ceil(F.col("__nt").cast("double") * F.lit(float(k_pct)))
    per_doc = (
        ranked.filter(F.col("__r") <= k_tokens)
        .groupBy(id_col)
        .agg(
            F.max("__nt").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("k_tokens"),
            F.round(
                F.sum("__nll") / F.count(F.lit(1)), 6
            ).alias("mink_mean_nll"),
        )
    )
    wtop = Window.orderBy(
        F.col("mink_mean_nll").asc(), F.col(id_col).asc()
    )
    return (
        per_doc.orderBy(
            F.col("mink_mean_nll").asc(), F.col(id_col).asc()
        )
        .limit(int(top_n))
        .withColumn("rank", F.row_number().over(wtop).cast("bigint"))
        .select("rank", id_col, "n_tokens", "k_tokens", "mink_mean_nll")
    )


def mink_prob_membership_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    k_pct: float = 0.2,
    top_n: int = 20,
) -> str:
    """DuckDB twin of :func:`mink_prob_membership`."""
    return f"""
    WITH e AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
    uni AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS c FROM e GROUP BY t),
    scored AS (
      SELECT e.{id_col}, e.t, -ln(uni.c / total.n) AS nll
      FROM e JOIN uni USING (t) CROSS JOIN total
    ),
    ranked AS (
      SELECT {id_col}, nll,
             CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
                                     ORDER BY nll DESC, t ASC)
                  AS BIGINT) AS r,
             CAST(COUNT(*) OVER (PARTITION BY {id_col}) AS BIGINT) AS nt
      FROM scored
    ),
    per_doc AS (
      SELECT {id_col},
             MAX(nt) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS k_tokens,
             ROUND(SUM(nll) / COUNT(*), 6) AS mink_mean_nll
      FROM ranked
      WHERE r <= CEIL(CAST(nt AS DOUBLE) * {float(k_pct)!r})
      GROUP BY {id_col}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY mink_mean_nll ASC,
                                   {id_col} ASC) AS BIGINT) AS rank,
           {id_col}, n_tokens, k_tokens, mink_mean_nll
    FROM per_doc
    ORDER BY mink_mean_nll ASC, {id_col} ASC
    LIMIT {int(top_n)}
    """
