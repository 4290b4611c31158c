"""Reusable column expressions — all JVM-side ``pyspark.sql.functions``.

Everything here stays inside whole-stage codegen (no Python UDFs): these
are the scalar building blocks for the wordcount pipeline (reference
``demo-etl-2a-notebook.py:53``), the sink enrichment columns
(``process_tsv.py:81-87``), and the north-star text/dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for polynomial rolling hashes: large prime < 2^31 so the fold
# accumulator (acc*31 + c) stays well inside BIGINT range.
FNV_MOD = 1_000_000_007


def split_words(col: str | Column, sep: str = " ") -> Column:
    """Literal-separator split, preserving empty tokens.

    Mirrors the reference's ``split(df.review_body, " ")``
    (``demo-etl-2a-notebook.py:53``): Spark's second argument is a regex,
    so the separator is regex-escaped to keep literal semantics.
    """
    import re

    return F.split(F.col(col) if isinstance(col, str) else col, re.escape(sep))


def explode_words(col: str | Column, sep: str = " ") -> Column:
    """P1: project a derived token column — ``explode(split(text, ' '))``."""
    return F.explode(split_words(col, sep))


def normalize_text(col: str | Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for dedup keys."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens_regex(col: str | Column) -> Column:
    """BPE-ish tokenization: letter runs, digit runs, single punctuation.

    The pattern uses only constructs with identical semantics in Java
    regex (Spark) and common SQL engines, so an oracle can reproduce it.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-gram shingles from a token array, JVM-side.

    ``transform`` over indices + ``slice`` — no Python UDF; scales as a
    narrow per-row transform. Docs with < n tokens yield an empty array
    via the guard: ``sequence(1, 0)`` would otherwise DESCEND ([1, 0])
    and feed slice an illegal start of 0.
    """
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(col: str | Column, k: int = 5) -> Column:
    """Character k-gram shingles of normalized text (distinct not
    applied). Same short-input guard as word_ngrams."""
    c = normalize_text(col)
    make = F.transform(
        F.sequence(F.lit(1), F.length(c) - (k - 1)),
        lambda i: F.substring(c, i, k),
    )
    return F.when(F.length(c) >= k, make).otherwise(F.array().cast("array<string>"))


def rolling_hash(col: str | Column, base: int = 31, mod: int = FNV_MOD) -> Column:
    """Polynomial rolling hash of a string: fold (acc*base + ascii(ch)) % mod.

    Deterministic, engine-agnostic (reproducible in ANSI SQL via a list
    fold), used for document fingerprinting and as the token hash for
    MinHash signatures.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),  # character array
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def stopword_ratio(tokens: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    hits = F.size(
        F.filter(tokens, lambda t: F.lower(t).isin([s.lower() for s in stopwords]))
    )
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


# --- vector math over array<float>/array<double>, all JVM-side -------------


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (double accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- scan-parallelism guard -------------------------------------------------


def spread_scan(df, min_factor: int = 2):
    """Repartition a too-few-partition input before an explode-heavy map
    stage.

    Small single-file test inputs arrive as ONE scan partition (a 600 KB
    parquet file is far below ``spark.sql.files.maxPartitionBytes``, and a
    single row group can't be byte-range split), which serializes the
    shingle/token explode — the dominant cost of the dedup family — onto
    one core. A round-robin ``repartition`` to the session's shuffle
    parallelism costs one tiny shuffle of the RAW rows (pre-explode, so
    bytes moved ≈ input size, not shingle volume) and buys full-width
    execution of the heavy map stage.

    At production scale the input already has ≥ shuffle-partition many
    splits, so the guard is a no-op branch — this never adds a shuffle to
    a 100 TB scan. Results are partitioning-invariant for every caller
    (hash/min/sum aggregates only).
    """
    try:
        n = df.rdd.getNumPartitions()
        target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # streaming plans have no .rdd — leave untouched
        return df
    return df.repartition(target) if n * min_factor <= target else df
