"""CI growth-law gate: the heavy families' wall time at 1× vs 10× a
content-disjoint replicated corpus must stay under the R^1.5 bound that
separates linear candidate generation from an accidental all-pairs tier
(see tools/scale_bench.py for the replication design and why disjoint
replicas make linear time the correct expectation).

This is the in-repo mirror of the committed SCALING.md measurement
(sf0.1 base): same harness, sf0.01 base so the suite stays tractable.
The candidate-volume anchor is deterministic (exact integer counts from
lsh_cost_advisor), so it is asserted tightly; wall ratios get the
generous family bound because CI hosts are time-shared.
"""

from __future__ import annotations

import pytest

from tools.scale_bench import FAMILIES, build_replicated_dir, measure

N_REP = 10
BASE = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_growth_laws_linear_families(spark, tmp_path):
    result = measure(spark, BASE, N_REP, str(tmp_path))

    # deterministic: banding candidate volume grows ~R, never ~R²
    growth = result["candidate_growth"]
    assert growth <= 1.2 * N_REP, (
        f"candidate volume grew {growth}× under {N_REP}× disjoint "
        f"replication — banding is no longer linear"
    )
    # and it actually grew (the 10× corpus is not being silently truncated)
    assert growth >= 0.8 * N_REP, growth

    bad = {
        name: row
        for name, row in result["families"].items()
        if not row["ok"]
    }
    assert not bad, f"families over the R^1.5 wall-ratio bound: {bad}"
    # every declared family was measured
    assert set(result["families"]) == set(FAMILIES)


def test_replicated_dir_is_content_disjoint(spark, tmp_path):
    """The builder's word tags keep replicas shingle-disjoint: distinct
    word count grows exactly R× and exact-dedup finds no cross-replica
    groups (every text is unique)."""
    from pyspark.sql import functions as F

    out = build_replicated_dir(spark, BASE, 3, str(tmp_path / "x3"))
    docs = spark.read.parquet(f"{out}/documents.parquet")
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    assert docs.count() == 3 * base.count()

    def vocab(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != "")
            .distinct()
            .count()
        )

    assert vocab(docs) == 3 * vocab(base)
    assert docs.select("text").distinct().count() == docs.count()
    # ids stay unique across replicas
    assert docs.select("doc_id").distinct().count() == docs.count()
