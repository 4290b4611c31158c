"""Text-analysis kit for training-data pipelines (north-star ops,
SURVEY §2.12): language ID, quality scoring, token counting, document
fingerprinting. All pure ``F.*`` column expressions — no Python UDFs —
so they run inside whole-stage codegen and scale as narrow,
shuffle-free per-row transforms (embarrassingly parallel at 100 TB; the
only cost is the scan).

Each op is deterministic and reproducible in ANSI SQL (the DuckDB
oracle twins live in __spark_entry__.py). Regex patterns stick to
constructs with identical semantics in Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import normalize_text, rolling_hash, tokens_regex, word_ngrams

# Marker stopwords per language for the n-gram/stopword-count heuristic.
# Deterministic tie-break: preference order en > de > fr > es.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "les", "et", "des", "est", "une"],
    "es": ["el", "los", "que", "por", "una", "para"],
}

STOPWORDS_EN = ["the", "a", "and", "of", "to", "is", "in", "it", "on", "for"]


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def _marker_score(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: count per-language marker tokens, argmax
    with a fixed preference order (unknown if no marker hits)."""
    tokens = _tokens(text_col)
    scored = df.select(
        "doc_id",
        *[
            _marker_score(tokens, m).alias(f"score_{lang}")
            for lang, m in LANG_MARKERS.items()
        ],
        F.col("lang").alias("lang_actual"),
    )
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    best = F.greatest(*s.values())
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in LANG_MARKERS:  # dict order == preference order
        pred = pred.when(s[lang] == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred)


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features: char/token counts, alpha & punctuation ratios,
    stopword ratio, and a composite score in [0,1]."""
    text = F.col(text_col)
    tokens = _tokens(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(tokens)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(0.0)
    alpha_ratio = safe(n_alpha, n_chars)
    punct_ratio = safe(n_punct, n_chars)
    stop_ratio = safe(n_stop, n_tokens)
    score = (
        0.4 * F.least(n_tokens.cast("double") / 20.0, F.lit(1.0))
        + 0.3 * alpha_ratio
        + 0.2 * (1.0 - punct_ratio)
        + 0.1 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex
    tokens (letter runs / digit runs / single punctuation)."""
    return df.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.size(tokens_regex(text_col)).alias("regex_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def ngram_counts(
    df: DataFrame, n: int = 2, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Corpus-level n-gram frequency (vocabulary building / contamination
    checks). Same physical shape as word_counts — narrow shingle
    generation, partial agg, one shuffle on the n-gram key. At 100 TB
    hash the n-gram (``rolling_hash``) before the shuffle and join the
    strings back only for the surviving rows."""
    from ..functions import word_ngrams

    tokens = F.split(F.col(text_col), " ")
    return (
        df.select(F.explode(word_ngrams(tokens, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document top-k characteristic terms by TF-IDF:
    (doc_id, term, tf, df, tfidf, rnk).

    score = tf * ln((N+1)/(df+1)), ranked per doc on (score desc,
    term asc). Empty tokens (multi-space runs) are dropped — they are
    separators here, not vocabulary.

    Physical shape: one shuffle on (doc_id, term) for TF, one on term
    for DF, a term-keyed join of the two, and the per-doc top-k window.
    The corpus size N joins in as a broadcast 1-row aggregate (no
    driver-side count action — the whole thing is ONE Catalyst plan).
    At 100 TB the df relation is vocabulary-sized (≪ corpus) and the
    top-k window partitions by doc_id — no global sort anywhere."""
    from pyspark.sql import Window

    terms = df.select(
        "doc_id", F.explode(_tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", F.round("tfidf", 4).alias("tfidf"), "rnk")
    )


def remove_stopwords(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Stopword filter (SURVEY §2.12): tokenize, drop stopwords, emit
    both the surviving token array and the re-joined cleaned text.
    Narrow per-row array ops — no shuffle, no UDF."""
    sw = stopwords if stopwords is not None else STOPWORDS_EN
    arr = F.array(*[F.lit(w) for w in sw])
    kept = F.filter(
        _tokens(text_col), lambda tok: ~F.array_contains(arr, tok)
    )
    return df.select(
        "doc_id",
        kept.alias("tokens"),
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).alias("n_tokens"),
    )


def doc_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: polynomial rolling hash of
    the raw and the normalized text (the dedup-key primitive)."""
    return df.select(
        "doc_id",
        rolling_hash(text_col).alias("fp_raw"),
        rolling_hash(normalize_text(text_col)).alias("fp_norm"),
    )


# PII patterns — the common Java-regex/RE2 subset (no backrefs, no
# lookaround), so the DuckDB oracle applies the exact same automaton.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9][0-9()\- ]{6,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}
_PII_ORDER = ("email", "phone", "ipv4")


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: emails, phone numbers and
    IPv4 addresses replaced with typed placeholders, with per-category
    match counts kept for audit/filter decisions downstream.

    Pure regexp_replace / regexp_extract_all column expressions —
    narrow, shuffle-free, codegen'd; at 100 TB the cost is the scan.
    Patterns are applied in a fixed order (email before phone before
    ip) so replacement composition is deterministic.
    """
    scrubbed = F.col(text_col)
    for kind in _PII_ORDER:
        scrubbed = F.regexp_replace(
            scrubbed, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return df.select(
        "doc_id",
        scrubbed.alias("clean_text"),
        *[
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS[k]), 0)
            )
            .cast("long")
            .alias(f"n_{k}")
            for k in _PII_ORDER
        ],
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/boilerplate signals per document: the
    fraction of duplicate words and duplicate word-bigrams, in exact
    basis points (integer — no float reaches the output).

    dup_bp = floor((n_total - n_distinct) * 10000 / n_total): heavily
    repetitive documents (boilerplate, keyword stuffing, template spam)
    score high and get filtered before training. Array-native
    (split / array_distinct / size) — shuffle-free per-row transform.
    """
    toks = _tokens(text_col)
    bigrams = word_ngrams(toks, 2)

    def dup_bp(arr: Column) -> Column:
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        return F.when(n <= 0, F.lit(0).cast("long")).otherwise(
            F.floor((n - nd) * F.lit(10000) / n).cast("long")
        )

    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        dup_bp(toks).alias("word_dup_bp"),
        dup_bp(bigrams).alias("bigram_dup_bp"),
    )
