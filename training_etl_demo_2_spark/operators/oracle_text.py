"""DuckDB oracle-SQL twins for text.py and similarity.py operators.
Generated from the same constants as the Spark implementations."""

from __future__ import annotations

from .oracle import NORMALIZE, ROLLING_HASH
from .text import LANG_MARKERS, STOPWORDS_EN


def _in_list(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def language_id_sql() -> str:
    score_cols = ",\n               ".join(
        f"len(list_filter(toks, x -> list_contains({_in_list(m)}, x))) "
        f"AS score_{lang}"
        for lang, m in LANG_MARKERS.items()
    )
    score_names = [f"score_{lang}" for lang in LANG_MARKERS]
    best = f"greatest({', '.join(score_names)})"
    case = f"CASE WHEN {best} <= 0 THEN 'unknown'"
    for lang in LANG_MARKERS:
        case += f" WHEN score_{lang} = {best} THEN '{lang}'"
    case += " END"
    return f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               {score_cols},
               lang AS lang_actual
        FROM t
    )
    SELECT doc_id, {', '.join(score_names)}, lang_actual, {case} AS lang_pred
    FROM s
    """


def doc_lang_consistency_sql(seg_words: int = 20) -> str:
    """Twin of text.doc_lang_consistency: same positional chunker as
    line_dedup_sql, same marker-argmax CASE at doc and chunk grain."""
    k = seg_words

    def score_cols(toks: str) -> str:
        return ",\n               ".join(
            f"len(list_filter({toks}, x -> list_contains({_in_list(m)}, x))) "
            f"AS score_{lang}"
            for lang, m in LANG_MARKERS.items()
        )

    score_names = [f"score_{lang}" for lang in LANG_MARKERS]
    best = f"greatest({', '.join(score_names)})"
    case = f"CASE WHEN {best} <= 0 THEN 'unknown'"
    for lang in LANG_MARKERS:
        case += f" WHEN score_{lang} = {best} THEN '{lang}'"
    case += " END"
    return f"""
    WITH doc_scored AS (
        SELECT doc_id,
               {score_cols("string_split(lower(text), ' ')")}
        FROM documents
    ),
    doc_pred AS (SELECT doc_id, {case} AS lang_doc FROM doc_scored),
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sized AS (
        SELECT doc_id, w,
               CAST(ceil(len(w) / CAST({k} AS DOUBLE)) AS BIGINT) AS nseg
        FROM toks
    ),
    segs AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, nseg),
                   i -> array_to_string(w[i*{k}+1 : i*{k}+{k}], ' ')
               )) AS seg
        FROM sized
    ),
    chunk_scored AS (
        SELECT doc_id,
               {score_cols("string_split(lower(seg), ' ')")}
        FROM segs
    ),
    chunk_pred AS (SELECT doc_id, {case} AS lang_chunk FROM chunk_scored)
    SELECT c.doc_id,
           d.lang_doc,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN c.lang_chunk = d.lang_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           CAST(floor(1e4 * sum(CASE WHEN c.lang_chunk = d.lang_doc
                                     THEN 1 ELSE 0 END)
                      / count(*) + 0.5) AS BIGINT) AS agree_bp
    FROM chunk_pred c JOIN doc_pred d USING (doc_id)
    GROUP BY c.doc_id, d.lang_doc
    """


def text_quality_sql() -> str:
    return f"""
    WITH base AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
               length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
               len(list_filter(string_split(lower(text), ' '),
                   x -> list_contains({_in_list(STOPWORDS_EN)}, x))) AS n_stop
        FROM documents
    ),
    ratios AS (
        SELECT doc_id, n_chars, n_tokens,
               CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END AS alpha_ratio,
               CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS punct_ratio,
               CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS stop_ratio
        FROM base
    )
    SELECT doc_id, n_chars, n_tokens,
           round(alpha_ratio, 6) AS alpha_ratio,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_ratio, 6) AS stopword_ratio,
           round(0.4 * least(n_tokens * 1.0 / 20.0, 1.0)
                 + 0.3 * alpha_ratio
                 + 0.2 * (1.0 - punct_ratio)
                 + 0.1 * least(stop_ratio * 5.0, 1.0), 6) AS quality_score
    FROM ratios
    """


def token_stats_sql() -> str:
    return r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS regex_tokens,
           length(text) AS n_chars
    FROM documents
    """


def repetition_stats_sql() -> str:
    """Twin of text.repetition_stats: duplicate-word / duplicate-bigram
    ratios in exact basis points (both engines: count arithmetic +
    one exactly-rounded double division + floor)."""
    dup = (
        "CAST(CASE WHEN len({a}) <= 0 THEN 0 ELSE "
        "floor((len({a}) - len(list_distinct({a}))) * 10000 / len({a})) "
        "END AS BIGINT)"
    )
    return f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           {dup.format(a='toks')} AS word_dup_bp,
           {dup.format(a='bgs')} AS bigram_dup_bp
    FROM (
        SELECT doc_id, toks,
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1]) AS bgs
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents)
    )
    """


def scrub_pii_sql() -> str:
    """Twin of text.scrub_pii — same RE2-compatible patterns, same
    fixed replacement order."""
    from .text import _PII_ORDER, PII_PATTERNS

    scrub = "text"
    for kind in _PII_ORDER:
        scrub = (
            f"regexp_replace({scrub}, '{PII_PATTERNS[kind]}', "
            f"'<{kind.upper()}>', 'g')"
        )
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{PII_PATTERNS[k]}')) AS BIGINT)"
        f" AS n_{k}"
        for k in _PII_ORDER
    )
    return f"""
    SELECT doc_id,
           {scrub} AS clean_text,
           {counts}
    FROM documents
    """


def doc_fingerprints_sql() -> str:
    fp_raw = ROLLING_HASH.format(s="text")
    fp_norm = ROLLING_HASH.format(s=NORMALIZE.format(s="text"))
    return f"""
    SELECT doc_id, {fp_raw} AS fp_raw, {fp_norm} AS fp_norm
    FROM documents
    """


def tfidf_top_terms_sql(k: int = 3) -> str:
    """Twin of text.tfidf_top_terms: same score, same deterministic
    per-doc ranking."""
    return f"""
    WITH terms AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM terms WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               tf.tf * ln((n.n_docs + 1) * 1.0 / (dfreq.df + 1)) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tf, df, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
               ) AS rnk
        FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           round(tfidf, 4) AS tfidf, rnk
    FROM ranked WHERE rnk <= {k}
    """


# --- similarity -----------------------------------------------------------


def _cosine_pairs_cte(left_filter: str = "") -> str:
    return f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    """


def brute_topk_sql(k: int = 5, query_pred: str = "vec_id < 20") -> str:
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.e, c.e), 6) AS sim
        FROM (SELECT * FROM v WHERE {query_pred}) q
        JOIN v c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
               ) AS rnk
        FROM pairs
    )
    SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= {k}
    """


def filtered_topk_sql(k: int = 5, query_pred: str = "vec_id < 20") -> str:
    """Twin of similarity.filtered_topk: candidates constrained to the
    query's label inside the join, not post-hoc."""
    return f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.e, c.e), 6) AS sim
        FROM (SELECT * FROM v WHERE {query_pred}) q
        JOIN v c ON q.label = c.label AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
               ) AS rnk
        FROM pairs
    )
    SELECT query_id, neighbor_id, sim, rnk FROM ranked WHERE rnk <= {k}
    """


def cosine_near_pairs_sql(threshold: float = 0.45) -> str:
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(a.e, b.e), 6) AS sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= {threshold}
    """


def _knn_winner_cte(k: int, query_mod: int) -> str:
    """Shared v/pairs/topk/votes/winner CTE chain for the kNN vote
    oracles — one definition so the agreement and suspects twins can
    never drift from each other (mirror of the Spark-side
    ``_knn_vote_winners`` core)."""
    return f"""v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    pairs AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS neighbor_id, c.label AS n_label,
               round(list_cosine_similarity(q.e, c.e), 6) AS sim
        FROM (SELECT * FROM v WHERE vec_id % {query_mod} = 0) q
        JOIN v c ON q.vec_id <> c.vec_id
    ),
    topk AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
            ) AS rnk FROM pairs
        ) WHERE rnk <= {k}
    ),
    votes AS (
        SELECT query_id, q_label, n_label, count(*) AS cnt
        FROM topk GROUP BY 1, 2, 3
    ),
    winner AS (
        SELECT query_id, q_label, n_label AS voted_label FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cnt DESC, n_label ASC
            ) AS vr FROM votes
        ) WHERE vr = 1
    )"""


def knn_label_agreement_sql(k: int = 10, query_mod: int = 10) -> str:
    """Twin of similarity.knn_label_agreement: identical neighbor
    ranking (rounded sim desc, neighbor asc) and vote tie-break
    (count desc, label asc)."""
    return f"""
    WITH {_knn_winner_cte(k, query_mod)}
    SELECT q_label AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN voted_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           round(sum(CASE WHEN voted_label = q_label THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS agree_pct
    FROM winner GROUP BY 1
    """


def knn_label_suspects_sql(k: int = 10, query_mod: int = 10) -> str:
    """Per-vector complement of knn_label_agreement_sql: the sampled
    vectors whose vote disagrees with their own label."""
    return f"""
    WITH {_knn_winner_cte(k, query_mod)}
    SELECT query_id, q_label AS own_label, voted_label
    FROM winner
    WHERE voted_label <> q_label
    ORDER BY query_id
    """
