"""Driver-contract regression guards: the external gate verifies only
the first 50 ``queries()`` entries, so window composition is load-bearing
— a reorder that drops a north-star query below position 50 silently
un-verifies it."""

from __future__ import annotations

import __spark_entry__ as entrymod

GATE_WINDOW = 50

# Every query that MUST have a driver CORRECTNESS row: the north-star
# layers, the operators newly added this round, and the queries that were
# red in round 1 (their green rows prove the fixes).
MUST_BE_IN_WINDOW = {
    # reference core
    "word_count", "top10_words", "sql_nation_revenue", "sink_word_items",
    # text analysis
    "language_id", "text_quality", "token_stats", "doc_fingerprints",
    "bigram_counts", "stopword_filtered", "repetition_stats",
    # dedup
    "dedup_exact", "clean_corpus", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "simhash_fingerprints", "simhash_near_pairs",
    "near_dup_clusters",
    # curation contamination gate
    "contamination_check",
    # data-quality validation suite (round-2 additions)
    "data_profile_lineitem", "fk_integrity", "constraint_violations",
    # similarity
    "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "embedding_near_pairs",
    # multimodal
    "multimodal_metadata", "multimodal_features", "multimodal_resize",
    "multimodal_frames", "multimodal_audio",
    # temporal joins
    "asof_last_order", "events_followups_1h",
    # streaming replay
    "stream_hourly_stats", "stream_user_nation_stats",
    # UDF surface
    "udf_minmax_norm",
    # round-1 reds (fixed; must show green)
    "priority_mix_by_year", "user_event_gaps", "events_props_stats",
    "priorities_per_status",
    # round-5 north-star promotions
    "line_dedup", "unigram_logprob", "quality_classifier",
    "winsorized_value_stats",
    # round-6 north-star promotions (displacing q1/q3/q4/idle/set-ops,
    # whose green driver rows exist in CORRECTNESS_r01-r03)
    "substring_dup_stats", "dsir_selection", "bm25_topk",
    "pagerank_near_dups", "stream_exact_dedup",
}


def test_window_contains_all_must_have_queries():
    names = list(entrymod.queries().keys())
    window = set(names[:GATE_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"queries fell out of the gate window: {sorted(missing)}"


def test_every_query_has_unique_name_and_callable():
    qs = entrymod.queries()
    assert len(qs) == len(set(qs.keys()))
    assert all(callable(fn) for fn in qs.values())


def test_oracles_reference_registered_queries_only():
    qs = set(entrymod.queries().keys())
    orphans = set(entrymod.oracle_sql().keys()) - qs
    assert not orphans, f"oracle_sql entries with no query: {sorted(orphans)}"


def test_window_entries_all_have_oracles():
    """Inside the gate window, rows-only entries waste a checked slot —
    every windowed query should carry a SQL oracle unless its semantics
    are genuinely not SQL-expressible (declared below)."""
    # Round 5: empty — every windowed query carries a SQL oracle (the
    # ANN tiers gained literal-hyperplane / exact-integer-Lloyd twins).
    rows_only_allowed: set[str] = set()
    names = list(entrymod.queries().keys())[:GATE_WINDOW]
    oracles = set(entrymod.oracle_sql().keys())
    missing = [n for n in names if n not in oracles and n not in rows_only_allowed]
    assert not missing, f"windowed queries without oracle: {missing}"


# The exact first-50 key order of the round-5 driver gate
# (CORRECTNESS_r05.json, all green). New queries MUST append at the
# dict tail; any mid-dict insert shifts this window and silently swaps
# a verified query for an unverified one (the round-4 near-miss class).
R05_GATE_WINDOW_KEYS = [
    "word_count", "top10_words", "sql_nation_revenue", "sink_word_items",
    "language_id", "text_quality", "token_stats", "doc_fingerprints",
    "bigram_counts", "stopword_filtered", "repetition_stats",
    "dedup_exact", "clean_corpus", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "simhash_fingerprints", "simhash_near_pairs",
    "near_dup_clusters", "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_near_pairs", "multimodal_metadata", "multimodal_features",
    "multimodal_resize", "multimodal_frames", "multimodal_audio",
    "contamination_check", "data_profile_lineitem", "fk_integrity",
    "constraint_violations", "asof_last_order", "events_followups_1h",
    "stream_hourly_stats", "stream_user_nation_stats", "udf_minmax_norm",
    "substring_dup_stats", "dsir_selection", "bm25_topk",
    "pagerank_near_dups", "stream_exact_dedup", "priority_mix_by_year",
    "sessionize_events", "user_event_gaps", "events_props_stats",
    "priorities_per_status", "line_dedup", "unigram_logprob",
    "quality_classifier", "winsorized_value_stats",
]


def test_gate_window_insertion_order_is_pinned():
    names = list(entrymod.queries().keys())[:GATE_WINDOW]
    assert names == R05_GATE_WINDOW_KEYS, (
        "gate-window order drifted from the r05 green window; append new "
        "queries at the registry TAIL only. Diff: "
        + str([(i, a, b) for i, (a, b) in
               enumerate(zip(names, R05_GATE_WINDOW_KEYS)) if a != b])
    )


def test_readme_headline_matches_registry():
    """README.md's headline counts regenerate from the registry or fail
    CI — round 6 shipped with a stale '283 gate queries' headline; this
    pins the three numbers (total, oracle-backed, rows-only) to
    queries()/oracle_sql() so docs cannot drift again."""
    import re
    from pathlib import Path

    readme = (Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(
        r"\*\*(\d+) gate queries — (\d+) verified row-for-row\n"
        r"against DuckDB oracles\*\* on the same parquet \((\d+) declared",
        readme,
    )
    assert m, "README headline sentence not found / reworded without the pin"
    total, oracled = len(entrymod.queries()), len(entrymod.oracle_sql())
    assert tuple(map(int, m.groups())) == (
        total, oracled, total - oracled,
    ), (
        f"README headline says {m.groups()}, registry has "
        f"({total}, {oracled}, {total - oracled}) — update README.md"
    )


def test_every_query_mapped_in_coverage():
    """Every queries() name must be resolvable in COVERAGE.md — round 9
    found six oracle-backed, fully-tested registry entries with no
    coverage-map row (the map was incomplete, not the coverage); this
    turns the map into a checked artifact like the README headline."""
    from pathlib import Path

    cov = (Path(__file__).parent.parent / "COVERAGE.md").read_text()
    unmapped = [n for n in entrymod.queries() if n not in cov]
    assert not unmapped, (
        f"registry entries missing from COVERAGE.md: {unmapped} — "
        "add a row (or name them in an existing grouped row)"
    )
