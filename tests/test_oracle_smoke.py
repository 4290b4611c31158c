"""Fast oracle smoke sweep: a deterministic ~40-query stride of the
registry, differentially checked against DuckDB at sf0.001 on every
default pytest run.

The FULL 389-query sweep (test_oracle_sweep.py) takes ~45 min and is
now opt-in (`-m slow`) so the default suite finishes inside the
driver's verify window; this smoke keeps end-to-end Spark-vs-oracle
coverage in every run. The stride is over registry (insertion) order,
so it is stable across runs and drifts only when queries are appended —
which is exactly when new coverage should rotate in.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

from tools.check_oracle import sweep

STRIDE = 10

# Families touched by recent optimization rounds: always smoke-checked
# regardless of where the stride lands.
ALWAYS = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_edit_distance",
    "lsh_recall_eval",
    "bottomk_containment",
    "jaccard_threshold_curve",
    "token_loop_stats",
    "substring_dup_stats",
    "decontaminate_spans",
    "lexical_semantic_agreement",
    "kmeans_clusters",
    "corpus_pipeline_e2e",
]


def smoke_set() -> list[str]:
    names = list(entrymod.queries())
    picked = names[::STRIDE]
    picked += [n for n in ALWAYS if n in names and n not in picked]
    return picked


def test_oracle_smoke_subset(spark, sf_dir):
    only = smoke_set()
    assert len(only) >= 40
    report = sweep(spark, sf_dir, only=only)
    assert set(report) == set(only)
    failures = {n: p for n, p in report.items() if p}
    assert not failures, (
        f"{len(failures)} oracle mismatches in smoke subset: "
        + "; ".join(f"{n}: {p}" for n, p in failures.items())
    )
