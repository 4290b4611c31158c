"""The production corpus pipeline composed as ONE plan.

Every tier below is individually green as a registered query
(``dedup_funnel_report`` measures them independently), but a training
corpus is not built by running tiers in isolation — it is built by
running them in SEQUENCE, and composition is exactly where operator
contracts break: a column renamed between tiers, a filter that changes
what the next tier's fingerprints see, a persist dropped across a tier
boundary. ``corpus_pipeline_e2e`` registers the composed job so the
correctness gate checks the COMPOSITION, not just the parts:

    raw documents
      → Gopher rule filter        (text.gopher_quality_rules, pass_all)
      → language filter           (text.language_id, lang_pred == 'en')
      → PII scrub                 (text.scrub_pii; scrubbed text flows on)
      → exact dedup               (dedup.drop_exact_duplicates, keep-first)
      → MinHash+LSH near-dup      (dedup.near_dup_clusters; representative
                                   = longest-then-lowest-id per cluster)
      → duplicate-span removal    (dedup.remove_duplicate_spans; docs
                                   scrubbed down to nothing are dropped)
      → whitespace tokenize+pack  (curation.pack_sequences, first-fit)

Order matters and is pinned by a planted test: PII scrubbing runs
BEFORE exact dedup, so two docs differing only in their email address
collapse to one (dedup on raw text would keep both); span removal runs
AFTER representative election, so a doc can leave the pipeline empty
even though every earlier tier passed it.

Scale shape: each tier is the already-scale-audited operator — the
composition adds only doc_id-keyed semi/anti joins between tiers (8-byte
keys, broadcastable survivor sets once the funnel narrows). The two
relations consumed by multiple downstream branches (the exact-dedup
survivor set feeding the LSH tier's shingles AND the representative
election, and the near-dup survivor set feeding the span tier twice)
are tracked-persisted so no tier re-runs an upstream tier.

DuckDB twin: the tier twins already exist (gopher_quality_rules_sql,
language_id_sql, scrub_pii_sql, near_dup_clusters_sql,
remove_duplicate_spans_sql, pack_sequences_sql); the composed twin
re-bases each one onto the previous tier's output by rewriting its
``documents`` table reference to the stage CTE (see :func:`_nest`) — so
the e2e oracle is built from the very same SQL the per-tier oracles
are, not a second hand-derivation that could drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..operators.curation import pack_sequences
from ..operators.dedup import (
    drop_exact_duplicates,
    near_dup_clusters,
    remove_duplicate_spans,
)
from ..operators.text import gopher_quality_rules, language_id, scrub_pii

PIPE_LANG = "en"
PIPE_BUDGET = 256


def corpus_pipeline_e2e(
    t: dict[str, DataFrame],
    lang: str = PIPE_LANG,
    budget: int = PIPE_BUDGET,
) -> DataFrame:
    """Run the full corpus job; output one row per surviving document:
    (doc_id, n_tokens, pack_id) on the final (scrubbed, span-cleaned)
    text — the manifest a training loader would consume."""
    docs = t["documents"]
    # 1. Gopher rules: auditable flags -> act on pass_all. Persisted:
    # the language tier reads s1 twice (classifier input + semi-join
    # base), and without the barrier each read re-runs the Gopher pass
    s1 = tracked_persist(
        docs.join(
            gopher_quality_rules(docs).filter("pass_all").select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    # 2. language filter on the PREDICTED language (the raw `lang`
    # label is metadata, not a classifier)
    s2 = s1.join(
        language_id(s1)
        .filter(F.col("lang_pred") == lang)
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    # 3. PII scrub — the scrubbed text is what flows downstream
    s3 = scrub_pii(s2).select("doc_id", F.col("clean_text").alias("text"))
    # 4. exact dedup on the SCRUBBED text (keep-first): docs differing
    # only in scrubbed spans collapse here — the composition effect the
    # planted test pins
    s4 = tracked_persist(drop_exact_duplicates(s3))
    # 5. MinHash near-dup: keep non-members + one representative per
    # cluster (longest current text, ties to lowest doc_id)
    members = near_dup_clusters(s4)
    sized = s4.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    reps = (
        members.join(sized, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("rep")
        )
        .select((-F.col("rep.neg_id")).cast("long").alias("doc_id"))
    )
    survivors = (
        s4.join(members.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id")
        .unionByName(reps)
    )
    s5 = tracked_persist(s4.join(survivors, "doc_id", "left_semi"))
    # 6. duplicate-span removal; a doc that was ALL duplicated spans
    # leaves empty and is dropped (the second composition effect)
    s6 = (
        remove_duplicate_spans(s5)
        .filter(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    # 7. whitespace tokenize + first-fit pack into training sequences
    return pack_sequences(s6, budget=budget).select(
        "doc_id", "n_tokens", "pack_id"
    )


def _nest(inner_sql: str, source_cte: str) -> str:
    """Re-base a tier twin onto ``source_cte``: rewrite its ``documents``
    table references to the source CTE name (word-boundary exact, so
    ``n_docs``-style identifiers are untouched). Shadowing ``documents``
    with a nested CTE would be cleaner, but DuckDB 1.0's binder flags
    ANY bare ``documents`` reference in a statement that also defines a
    CTE of that name as circular — and schema-qualifying the base table
    (``main.documents``) would tie the twin to how the harness registers
    its views. The rewrite keeps the statement name-collision-free.

    Precondition (held by construction): no tier twin defines a CTE
    named like our stage CTEs (s1..s6), so the rewritten reference can
    only bind to the outer stage."""
    import re

    s = inner_sql.strip()
    assert not re.search(
        rf"\b{source_cte}\b\s+AS\s*\(", s, re.IGNORECASE
    ), f"tier twin defines a CTE named {source_cte}; rewrite would self-bind"
    return re.sub(r"\bdocuments\b", source_cte, s)


def corpus_pipeline_e2e_sql(
    lang: str = PIPE_LANG, budget: int = PIPE_BUDGET
) -> str:
    """Composed twin: each tier is the tier's OWN oracle generator,
    re-based via :func:`_nest` — one statement, same funnel."""
    from ..operators.curation import pack_sequences_sql
    from ..operators.oracle import (
        NORMALIZE,
        ROLLING_HASH,
        near_dup_clusters_sql,
        remove_duplicate_spans_sql,
    )
    from ..operators.oracle_text import language_id_sql, scrub_pii_sql
    from ..operators.text import gopher_quality_rules_sql

    fp = ROLLING_HASH.format(s=NORMALIZE.format(s="text"))
    return f"""
    WITH g AS ({gopher_quality_rules_sql()}),
    s1 AS MATERIALIZED (
        SELECT d.* FROM documents d
        JOIN g ON g.doc_id = d.doc_id AND g.pass_all
    ),
    li AS MATERIALIZED ({_nest(language_id_sql(), "s1")}),
    s2 AS MATERIALIZED (
        SELECT s1.* FROM s1
        JOIN li ON li.doc_id = s1.doc_id AND li.lang_pred = '{lang}'
    ),
    sc AS MATERIALIZED ({_nest(scrub_pii_sql(), "s2")}),
    s3 AS MATERIALIZED (SELECT doc_id, clean_text AS text FROM sc),
    fps AS MATERIALIZED (SELECT doc_id, text, {fp} AS f FROM s3),
    s4 AS MATERIALIZED (
        SELECT doc_id, text FROM fps
        WHERE doc_id IN (SELECT min(doc_id) FROM fps GROUP BY f)
    ),
    members AS MATERIALIZED ({_nest(near_dup_clusters_sql(), "s4")}),
    sized AS MATERIALIZED (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM s4
    ),
    reps AS MATERIALIZED (
        SELECT doc_id FROM (
            SELECT m.doc_id,
                   row_number() OVER (
                       PARTITION BY m.cluster_id
                       ORDER BY z.n_chars DESC, m.doc_id ASC
                   ) AS rn
            FROM members m JOIN sized z ON z.doc_id = m.doc_id
        ) WHERE rn = 1
    ),
    s5 AS MATERIALIZED (
        SELECT s4.doc_id, s4.text FROM s4
        WHERE s4.doc_id NOT IN (SELECT doc_id FROM members)
           OR s4.doc_id IN (SELECT doc_id FROM reps)
    ),
    rd AS MATERIALIZED ({_nest(remove_duplicate_spans_sql(), "s5")}),
    s6 AS MATERIALIZED (
        SELECT doc_id, clean_text AS text FROM rd WHERE clean_text != ''
    ),
    packed AS ({_nest(pack_sequences_sql(budget=budget), "s6")})
    SELECT doc_id, n_tokens, pack_id FROM packed
    """
