"""End-to-end training-data cleaning pipeline (the composition layer).

``clean_corpus`` is the canonical LLM-data-prep flow — quality filter →
exact dedup keep-first — expressed as one Catalyst plan. This is what
the north-star operators exist FOR; registering it as a single query
proves the pieces compose without materialization barriers between
stages.

Physical shape at 100 TB: the quality features are narrow per-row
expressions fused into the scan stage; the dedup keep-first is one
hash-agg shuffle on the 8-byte content fingerprint plus a semi join
back — so the whole cleaning pass costs ~1 shuffle of (doc_id, fp)
pairs over the filtered (smaller) corpus, with blobs/text never
shuffled (only doc_ids and hashes move).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text


def clean_corpus(
    t: dict[str, DataFrame], min_quality: float = 0.85
) -> DataFrame:
    """Surviving documents after quality filtering + exact dedup.

    Returns (doc_id, lang, source, n_chars) of documents whose
    composite quality score ≥ ``min_quality`` and which are the
    keep-first (min doc_id) representative of their normalized-text
    duplicate group among the quality survivors.
    """
    docs = t["documents"]
    good_ids = (
        text.text_quality(docs)
        .filter(F.col("quality_score") >= min_quality)
        .select("doc_id")
    )
    good = docs.join(good_ids, "doc_id", "semi")
    survivors = dedup.drop_exact_duplicates(good)
    # no ORDER BY: the surviving-set contract is order-free, and a
    # cosmetic global sort is a full range exchange at scale
    return survivors.select("doc_id", "lang", "source", "n_chars")


def clean_corpus_sql(min_quality: float = 0.85) -> str:
    """DuckDB twin, composed from the same oracle generators."""
    from .oracle import NORMALIZE, ROLLING_HASH
    from .oracle_text import text_quality_sql

    fp = ROLLING_HASH.format(s=NORMALIZE.format(s="text"))
    return f"""
    WITH q AS ({text_quality_sql()}),
    good AS (
        SELECT d.* FROM documents d
        JOIN q ON d.doc_id = q.doc_id
        WHERE q.quality_score >= {min_quality}
    ),
    fps AS (SELECT doc_id, {fp} AS fp FROM good),
    keep AS (SELECT min(doc_id) AS doc_id FROM fps GROUP BY fp)
    SELECT g.doc_id, g.lang, g.source, g.n_chars
    FROM good g JOIN keep USING (doc_id)
    """
