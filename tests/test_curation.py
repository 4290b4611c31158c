"""Dataset-curation operators: determinism, proportions, invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import curation


def test_split_is_deterministic_and_total(tables):
    docs = tables["documents"]
    a = {r["doc_id"]: r["split"] for r in curation.dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in curation.dataset_split(docs).collect()}
    assert a == b
    assert len(a) == docs.count()
    # proportions roughly honor the 80/10/10 request
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert 0.6 * n < c["train"] < 0.95 * n
    assert c["val"] > 0 and c["test"] > 0


def test_split_stable_under_append(spark, tables):
    """Hash assignment of existing rows must not change when rows are
    added — the property that makes eval sets trustworthy over time."""
    docs = tables["documents"]
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_assign = {
        r["doc_id"]: r["split"]
        for r in curation.dataset_split(docs).collect()
    }
    half_assign = {
        r["doc_id"]: r["split"]
        for r in curation.dataset_split(half).collect()
    }
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_hash_sample_subset_semantics(tables):
    docs = tables["documents"]
    s10 = {r["doc_id"] for r in curation.hash_sample(docs, 10).collect()}
    s20 = {r["doc_id"] for r in curation.hash_sample(docs, 20).collect()}
    assert s10 <= s20  # rate increase only ADDS rows
    assert 0 < len(s10) < len(s20) < docs.count()


def test_contamination_excludes_probe_and_finds_overlap(spark, tables):
    docs = tables["documents"]
    probe = docs.filter(curation.PROBE_PRED)
    out = curation.contamination_check(docs, probe)
    probe_ids = {r["doc_id"] for r in probe.select("doc_id").collect()}
    got_ids = {r["doc_id"] for r in out.collect()}
    assert not (got_ids & probe_ids)  # probe docs never flag themselves
    assert out.filter(F.col("n_shared_shingles") <= 0).count() == 0
    # fixture vocabulary is tiny -> overlap must exist
    assert len(got_ids) > 0


def test_pack_sequences_invariants(tables):
    budget = 256
    docs = tables["documents"]
    out = curation.pack_sequences(docs, budget=budget).collect()
    assert len(out) == docs.count()  # every doc packed exactly once
    assert len({r["doc_id"] for r in out}) == len(out)
    from collections import defaultdict

    per_pack = defaultdict(list)
    for r in out:
        per_pack[r["pack_id"]].append(r["n_tokens"])
    for toks in per_pack.values():
        assert sum(toks) <= budget or len(toks) == 1  # oversized doc solo
    # packing should be reasonably tight: average fill > 50% of budget
    fills = [sum(t) for t in per_pack.values()]
    assert sum(fills) / (len(fills) * budget) > 0.5


def test_balanced_sample_caps_per_class(tables):
    docs = tables["documents"]
    out = curation.balanced_sample(docs, by="lang", k=10)
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 10 for r in per)
    # deterministic across invocations
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"] for r in curation.balanced_sample(docs, by="lang", k=10).collect()
    )
    assert a == b


def test_curated_corpus_composition(tables):
    from training_etl_demo_2_spark.operators.pipeline import clean_corpus

    out = curation.curated_corpus(tables)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    # subset of clean_corpus survivors, minus probe docs
    survivors = {r["doc_id"] for r in clean_corpus(tables).collect()}
    assert ids <= survivors
    assert not {i for i in ids if i < 5}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert len(ids) > 0


def test_corpus_mix_tracks_target_weights(tables):
    import collections

    docs = tables["documents"]
    n_by = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    out = curation.corpus_mix(docs)
    mix = collections.Counter(r["lang"] for r in out.collect())
    tot = sum(mix.values())
    # the limiting group (max n_g/w_g ratio binds at min) is kept ~whole
    t_cap = min(n_by[g] / w for g, w in curation.DEFAULT_MIX.items() if g in n_by)
    assert tot >= 0.8 * t_cap
    # achieved proportions within hash-uniformity noise of the targets
    for g, w in curation.DEFAULT_MIX.items():
        assert abs(mix[g] / tot - w) < 0.05, (g, mix[g] / tot, w)


def test_corpus_mix_deterministic_and_drops_unweighted(tables):
    docs = tables["documents"]
    weights = {"en": 0.7, "de": 0.3}  # es/fr/zh unweighted -> dropped
    a = sorted(r["doc_id"] for r in curation.corpus_mix(docs, weights).collect())
    b = sorted(r["doc_id"] for r in curation.corpus_mix(docs, weights).collect())
    assert a == b and len(a) > 0
    langs = {r["lang"] for r in curation.corpus_mix(docs, weights).collect()}
    assert langs <= {"en", "de"}


def test_corpus_shuffle_is_seeded_permutation(tables):
    docs = tables["documents"]
    n = docs.count()
    a = {r["doc_id"]: r["shuffle_rank"] for r in curation.corpus_shuffle(docs).collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in curation.corpus_shuffle(docs).collect()}
    assert a == b  # reproducible
    assert sorted(a.values()) == list(range(1, n + 1))  # exact permutation
    c = {r["doc_id"]: r["shuffle_rank"] for r in
         curation.corpus_shuffle(docs, seed="epoch1").collect()}
    assert c != a  # independent permutation per seed
    assert sorted(c.values()) == list(range(1, n + 1))


def test_corpus_shuffle_permutation_at_scale(spark):
    """Regression for the repartitionByRange formulation: sampled range
    boundaries recomputed between the counts pass and the rank pass made
    ranks a non-permutation at sizes where the sampler is partial. The
    value-derived bucketing must give exactly 1..N twice over."""
    df = spark.range(150_000).selectExpr("id AS doc_id")
    out = curation.corpus_shuffle(df)
    stats = out.selectExpr(
        "min(shuffle_rank)", "max(shuffle_rank)",
        "count(DISTINCT shuffle_rank)", "count(*)"
    ).collect()[0]
    assert tuple(stats) == (1, 150_000, 150_000, 150_000)
    again = curation.corpus_shuffle(df)
    assert (
        out.alias("a")
        .join(again.alias("b"), "doc_id")
        .filter("a.shuffle_rank != b.shuffle_rank")
        .count()
        == 0
    )


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token appears in at least one chunk; consecutive chunks
    share exactly `overlap` tokens; short docs yield one short chunk."""
    from training_etl_demo_2_spark.operators.curation import chunk_documents

    words = [f"w{i}" for i in range(100)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c")], "doc_id long, text string"
    )
    out = sorted(
        (r for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect()),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    doc1 = [r for r in out if r.doc_id == 1]
    assert [r.chunk_idx for r in doc1] == [0, 1]
    c0, c1 = doc1[0].chunk_text.split(" "), doc1[1].chunk_text.split(" ")
    assert c0 == words[:64]
    assert c1 == words[48:100]  # stride 48
    assert c0[-16:] == c1[:16]  # exact overlap
    assert set(c0) | set(c1) == set(words)  # full coverage
    doc2 = [r for r in out if r.doc_id == 2]
    assert len(doc2) == 1 and doc2[0].chunk_text == "a b c"
    assert doc2[0].n_tokens == 3


def test_dsir_importance_prefers_target_like_docs(spark):
    """Docs sharing the target (en) slice's vocabulary score higher
    than docs full of off-target terms; every doc is covered."""
    rows = [
        (1, "alpha beta gamma alpha beta", "en"),
        (2, "alpha beta gamma gamma beta", "en"),
        (3, "alpha beta gamma beta alpha", "zh"),  # en-like content, zh label
        (4, "zeta eta theta iota kappa", "zh"),  # off-target vocabulary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in curation.dsir_importance(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    # target-vocab docs (regardless of their own label) beat off-target
    assert out[3].avg_logw > out[4].avg_logw
    assert out[1].avg_logw > out[4].avg_logw
    assert out[1].keep and not out[4].keep
    assert out[4].n_tokens == 5


def test_dsir_importance_fixture_separation(tables):
    """At sf0.001 the mean score of en docs exceeds the mean score of
    non-en docs (the selection signal actually separates the target
    domain on the fixture corpus)."""
    docs = tables["documents"]
    out = curation.dsir_importance(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    from pyspark.sql import functions as F

    m = {
        r.is_en: r.mean_logw
        for r in out.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("avg_logw").alias("mean_logw"))
        .collect()
    }
    assert m[True] > m[False]


def test_negative_samples_never_self_and_uniform_ish(tables):
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators.curation import negative_samples

    docs = tables["documents"]
    n = docs.count()
    neg = negative_samples(docs, k=4)
    assert neg.count() == 4 * n
    assert neg.filter(F.col("neg_id") == F.col("doc_id")).count() == 0
    assert neg.filter((F.col("neg_id") < 0) | (F.col("neg_id") >= n)).count() == 0
    # seeds decorrelate epochs; same seed reproduces exactly
    a = {tuple(r) for r in negative_samples(docs, k=2, seed="e1").collect()}
    b = {tuple(r) for r in negative_samples(docs, k=2, seed="e2").collect()}
    assert a != b
    assert a == {tuple(r) for r in negative_samples(docs, k=2, seed="e1").collect()}
    # coverage: negatives hit a large share of the id space
    distinct_negs = neg.select("neg_id").distinct().count()
    assert distinct_negs > 0.8 * min(4 * n, n) * 0.5


def test_split_leakage_detects_crossing_near_dups(tables):
    """The fixture's planted near-dups land in different hash-split
    buckets: the detector must report crossing pairs, and the total
    over all split pairs must equal the LSH pair count."""
    from training_etl_demo_2_spark.operators.curation import split_leakage
    from training_etl_demo_2_spark.operators.dedup import minhash_lsh_pairs

    docs = tables["documents"]
    out = split_leakage(docs).collect()
    total = sum(r.n_pairs for r in out)
    assert total == minhash_lsh_pairs(docs, threshold=0.8).count()
    crossing = [r for r in out if r.split_a != r.split_b]
    assert sum(r.n_pairs for r in crossing) > 0


def test_curriculum_phases_balanced_and_ordered(tables):
    from training_etl_demo_2_spark.operators.curation import curriculum_phases

    out = curriculum_phases(tables["documents"]).collect()
    n = len(out)
    sizes = {}
    for r in out:
        sizes[r.phase] = sizes.get(r.phase, 0) + 1
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
    # every phase-1 doc scores >= every phase-4 doc
    p1_min = min(r.avg_logprob for r in out if r.phase == 1)
    p4_max = max(r.avg_logprob for r in out if r.phase == 4)
    assert p1_min >= p4_max


def test_curriculum_phases_stable_under_repartitioning(spark, tables):
    """Round-9 re-base proof: the distributed exact-rank ntile must
    assign IDENTICAL phases regardless of the input's physical layout
    — the classic failure of a re-based ntile is ties straddling range
    partitions. The rounded-6 score + doc_id tiebreak makes the order
    total, so the (doc_id -> phase) map must be bit-stable under any
    repartitioning, and must equal the single-task ntile reference.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators.curation import (
        curriculum_phases,
    )
    from training_etl_demo_2_spark.operators.text import unigram_logprob

    docs = tables["documents"]
    base = {
        r.doc_id: r.phase for r in curriculum_phases(docs).collect()
    }
    for layout in (docs.repartition(7), docs.repartition(3, "lang"),
                   docs.coalesce(1)):
        got = {
            r.doc_id: r.phase
            for r in curriculum_phases(layout).collect()
        }
        assert got == base
    # reference: the single-task global ntile the operator replaced
    w = Window.orderBy(F.desc("avg_logprob"), F.asc("doc_id"))
    ref = {
        r.doc_id: r.phase
        for r in unigram_logprob(docs)
        .select("doc_id", F.ntile(4).over(w).alias("phase"))
        .collect()
    }
    assert base == ref


def test_soft_quality_sample_rate_tracks_score(tables):
    """Keep rate over the corpus ≈ mean quality prob (probability-
    proportional), deterministic per seed, different across seeds."""
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators.curation import (
        soft_quality_sample,
    )

    docs = tables["documents"]
    out = soft_quality_sample(docs)
    row = out.agg(
        F.avg(F.col("keep").cast("double")).alias("rate"),
        F.avg("quality_prob").alias("mean_p"),
    ).collect()[0]
    # binomial-ish tolerance at n=500
    assert abs(row.rate - row.mean_p) < 0.1
    a = {(r.doc_id, r.keep) for r in out.collect()}
    assert a == {(r.doc_id, r.keep) for r in soft_quality_sample(docs).collect()}
    b = {(r.doc_id, r.keep) for r in soft_quality_sample(docs, seed="s2").collect()}
    assert a != b


def test_weighted_sample_topk_aes(spark, tables):
    """A-ES exact-k weighted sample: exactly k rows, ranks dense and
    ordered by (key desc, doc_id), selection reproduces the brute-force
    key computation, and the result is partition-invariant."""
    import math

    from training_etl_demo_2_spark.operators.curation import (
        _MIX_KNUTH,
        MIX_RESOLUTION,
        weighted_sample_topk,
    )
    from training_etl_demo_2_spark.functions import FNV_MOD

    def py_rolling_hash(s, base=31, mod=FNV_MOD):
        acc = 0
        for ch in s:
            acc = (acc * base + ord(ch)) % mod
        return acc

    docs = tables["documents"]
    k = 25
    got = weighted_sample_topk(docs, k=k).orderBy("rk").collect()
    assert len(got) == k
    assert [r.rk for r in got] == list(range(1, k + 1))
    keys = [r.aes_key for r in got]
    assert keys == sorted(keys, reverse=True)

    # brute-force replication of the selection rule on the driver
    rows = docs.select("doc_id", "n_chars").collect()
    brute = []
    for r in rows:
        h = (py_rolling_hash(f"aes:aes0:{r.doc_id}") * _MIX_KNUTH % FNV_MOD) % MIX_RESOLUTION
        u = (h + 1.0) / MIX_RESOLUTION
        key = round(math.log(u) / float(r.n_chars), 6) + 0.0
        brute.append((-key, r.doc_id))
    brute.sort()
    want_ids = [d for _, d in brute[:k]]
    assert [r.doc_id for r in got] == want_ids

    got2 = weighted_sample_topk(docs.repartition(7), k=k).orderBy("rk").collect()
    assert [(r.doc_id, r.aes_key) for r in got2] == [
        (r.doc_id, r.aes_key) for r in got
    ]


def test_source_mixture_weights_flatten(spark):
    """alpha < 1 flattens: the small source's weight share strictly
    exceeds its token share; weights normalize to ~10000 bp."""
    from training_etl_demo_2_spark.operators.curation import source_mixture_weights

    docs = [(i, "big", "tok " * 99 + "tok") for i in range(9)] + [
        (100, "small", "tok " * 99 + "tok")
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = {r.source: r for r in source_mixture_weights(df, alpha=0.7).collect()}
    assert rows["big"].n_tokens == 900 and rows["small"].n_tokens == 100
    total_bp = rows["big"].w_bp + rows["small"].w_bp
    assert abs(total_bp - 10_000) <= 1  # integer rounding slack
    # proportional share of small = 1000 bp; temperature must raise it
    assert rows["small"].w_bp > 1000
    assert rows["big"].w_bp < 9000
    # alpha=1 degenerates to proportional shares
    prop = {r.source: r for r in source_mixture_weights(df, alpha=1.0).collect()}
    assert abs(prop["small"].w_bp - 1000) <= 1


def test_neyman_allocation_favors_variable_strata(spark):
    """Equal-size strata: the high-variance stratum gets the larger
    allocation, allocations sum to ~budget, constant stratum gets 0
    only if sd==0."""
    rows = [(i, "flat", 100) for i in range(50)] + [
        (i + 50, "spread", 10 + (i % 10) * 200) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from training_etl_demo_2_spark.operators.curation import neyman_allocation

    out = {r.source: r for r in neyman_allocation(df, budget=100).collect()}
    assert out["flat"].sd_measure == 0.0
    assert out["flat"].alloc == 0
    assert out["spread"].alloc == 100
    assert out["spread"].sd_measure > 0


def test_neyman_allocation_constant_strata_fallback(spark):
    """Every stratum constant: Σw == 0, so the allocation must fall
    back to proportional (not NULLs)."""
    rows = [(i, "a", 100) for i in range(30)] + [
        (100 + i, "b", 7) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from training_etl_demo_2_spark.operators.curation import neyman_allocation

    out = {r.source: r for r in neyman_allocation(df, budget=100).collect()}
    assert out["a"].alloc == 75 and out["b"].alloc == 25
    assert out["a"].sd_measure == 0.0 and out["b"].sd_measure == 0.0
