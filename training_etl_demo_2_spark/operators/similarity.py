"""Similarity search over embedding columns (north-star, SURVEY §2.12).

Three tiers:

* ``brute_topk`` — exact cosine top-k, fully relational (zip_with +
  aggregate fold, double precision). The correctness baseline; its
  DuckDB SQL twin lives in ``oracle_sim.py``. Cost O(|Q|·|N|·d): fine
  for a broadcastable query set, the wrong tool for all-pairs at scale.
* ``brute_topk_pandas`` — same result via Arrow-batched numpy matrix
  multiply in ``mapInPandas``: the single-op throughput path (BLAS dot
  beats per-row codegen folds once d·|Q| is large). Queries are closed
  over and broadcast with the serialized function.
* ``lsh_topk`` — random-hyperplane LSH (sign-bit buckets, L tables):
  candidates = union of same-bucket vectors over tables, then exact
  cosine re-rank. Sub-linear candidate sets at 100 TB (bucket join
  replaces the cross join); recall is tunable via (nbits, L) and
  verified against ``brute_topk`` in tests. Deterministic: planes come
  from a fixed-seed generator.

All cosine math is done in float64 regardless of the array<float>
storage type, so engine and oracle agree after round(6).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine

LSH_SEED = 42
# Short signatures × many tables: the fixture's embeddings are weakly
# correlated (top neighbors at cos ≈ 0.4, collision prob per hyperplane
# ≈ 0.63), so recall needs (1-p^nbits)^tables small. 5 bits × 12 tables
# → ~70% top-5 recall here; on real clustered embeddings raise nbits to
# sharpen buckets (recall/candidate-count knob, data-dependent).
LSH_NBITS = 5
LSH_TABLES = 12
ROUND = 6


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Rank candidates per query on (rounded sim desc, neighbor asc) —
    fully deterministic — and keep top-k."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


def brute_topk(
    emb: DataFrame, k: int = 5, query_pred: str = "vec_id < 20"
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The (small) query side is broadcast, so the plan is a single pass
    over the candidate set with no shuffle until the final per-query
    top-k (which AQE keeps tiny)."""
    q = emb.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), ROUND).alias("sim"),
        )
    )
    return _ranked_topk(pairs, k)


def brute_topk_pandas(
    emb: DataFrame, k: int = 5, query_pred: str = "vec_id < 20"
) -> DataFrame:
    """Same semantics as brute_topk, executed as an Arrow-batched numpy
    matmul per partition (the high-throughput scan pattern)."""
    out_schema = "query_id long, neighbor_id long, sim double"
    queries = emb.filter(query_pred).select("vec_id", "embedding").collect()
    if not queries:  # empty query set: a 0-row result, not a numpy error
        return _ranked_topk(
            emb.sparkSession.createDataFrame([], out_schema), k
        )
    q_ids = np.array([r.vec_id for r in queries], dtype=np.int64)
    q_mat = np.array([r.embedding for r in queries], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            sims = (q_mat @ c_mat.T) / np.outer(q_norm, np.linalg.norm(c_mat, axis=1))
            qq, cc = np.meshgrid(np.arange(len(q_ids)), np.arange(len(c_ids)),
                                 indexing="ij")
            yield pd.DataFrame(
                {
                    "query_id": q_ids[qq.ravel()],
                    "neighbor_id": c_ids[cc.ravel()],
                    "sim": np.round(sims.ravel(), ROUND),
                }
            )

    pairs = (
        emb.select("vec_id", "embedding")
        .mapInPandas(score, out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    return _ranked_topk(pairs, k)


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(LSH_SEED)
    return rng.randn(LSH_TABLES, LSH_NBITS, dim)


def lsh_buckets(emb: DataFrame, dim: int = 64) -> DataFrame:
    """(vec_id, table, bucket): sign-bit bucket per LSH table, computed
    vectorized in mapInPandas (planes are fixed-seed, shipped in the
    task closure)."""
    planes = _planes(dim)
    out_schema = "vec_id long, table int, bucket long"

    def assign(batches: Iterator) -> Iterator:
        import pandas as pd

        pows = (2 ** np.arange(LSH_NBITS)).astype(np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            frames = []
            for t in range(LSH_TABLES):
                bits = (mat @ planes[t].T) > 0  # (n, nbits)
                buckets = bits.astype(np.int64) @ pows
                frames.append(
                    pd.DataFrame({"vec_id": ids, "table": t, "bucket": buckets})
                )
            yield pd.concat(frames, ignore_index=True)

    return emb.select("vec_id", "embedding").mapInPandas(assign, out_schema)


def lsh_topk(
    emb: DataFrame, k: int = 5, query_pred: str = "vec_id < 20", dim: int = 64
) -> DataFrame:
    """ANN top-k: same-bucket candidates over L tables → exact cosine
    re-rank. The candidate join is (table, bucket)-keyed, so at scale
    each query only meets ~|N| / 2^nbits · L candidates."""
    buckets = lsh_buckets(emb, dim)
    q_buckets = buckets.join(
        emb.filter(query_pred).select("vec_id"), "vec_id", "semi"
    ).select(F.col("vec_id").alias("query_id"), "table", "bucket")
    cand = (
        q_buckets.join(
            buckets.select(F.col("vec_id").alias("neighbor_id"), "table", "bucket"),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    pairs = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), ROUND).alias("sim"),
        )
    )
    return _ranked_topk(pairs, k)


IVF_SEED = 7
IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_SAMPLE = 2048
IVF_ITERS = 10


def _ivf_centroids(emb: DataFrame, dim: int, n_centroids: int) -> np.ndarray:
    """Seeded Lloyd iterations on a deterministic sample (lowest vec_ids).

    At 100 TB the quantizer is still trained on a driver-sized sample —
    that's standard IVF practice (the codebook must be small enough to
    broadcast anyway); only assignment is distributed.
    """
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(IVF_SAMPLE)
        .collect()
    )
    if not sample:
        return np.zeros((n_centroids, dim))
    x = np.array([r.embedding for r in sample], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.RandomState(IVF_SEED)
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(IVF_ITERS):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine: all unit vectors
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    return cent


def ivf_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment, vectorized per Arrow
    batch. The codebook ships in the task closure (it is tiny)."""
    out_schema = "vec_id long, cell int"

    def assign(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            cell = np.argmax(mat @ centroids.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": ids, "cell": cell})

    return emb.select("vec_id", "embedding").mapInPandas(assign, out_schema)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id < 20",
    dim: int = 64,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus into cells, probe each
    query's ``nprobe`` nearest cells, exact-cosine re-rank the union.

    The scale path beside ``lsh_topk``: candidates per query shrink to
    ~nprobe/n_centroids of the corpus, and the candidate join is
    cell-keyed (shuffle on a small int key). Recall is the
    nprobe/n_centroids knob; verified against ``brute_topk`` in tests.
    """
    centroids = _ivf_centroids(emb, dim, n_centroids)
    cells = ivf_assign(emb, centroids)

    # Each query probes its nprobe nearest cells: a tiny (query, cell)
    # relation built the same vectorized way, then broadcast.
    q_emb = emb.filter(query_pred)
    out_schema = "query_id long, cell int"

    def probe(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            order = np.argsort(-(mat @ centroids.T), axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, nprobe),
                    "cell": order.ravel().astype(np.int32),
                }
            )

    q_cells = q_emb.select("vec_id", "embedding").mapInPandas(probe, out_schema)
    cand = (
        F.broadcast(q_cells)
        .join(cells.select(F.col("vec_id").alias("neighbor_id"), "cell"), ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    pairs = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), ROUND).alias("sim"),
        )
    )
    return _ranked_topk(pairs, k)


def cosine_near_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim ≥
    threshold).

    Physical strategy: broadcast the (normalized) full matrix, stream
    partitions of the other side through a numpy block-matmul in
    mapInPandas, emit only above-threshold pairs. One pass, no shuffle,
    BLAS throughput — ~20× faster than a crossJoin with a per-pair
    fold. At 100 TB the broadcast side no longer fits: swap candidate
    generation to ``lsh_buckets`` blocking (bucket-join instead of
    broadcast) and keep this kernel as the within-block scorer.
    """
    sc = emb.sparkSession.sparkContext
    pdf = emb.select("vec_id", "embedding").toPandas()
    if pdf.empty:
        return emb.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, sim double"
        )
    all_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    all_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
    all_mat /= np.linalg.norm(all_mat, axis=1, keepdims=True)
    b_ids = sc.broadcast(all_ids)
    b_mat = sc.broadcast(all_mat)

    out_schema = "vec_a long, vec_b long, sim double"

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        ids, mat = b_ids.value, b_mat.value
        for pdf_part in batches:
            if pdf_part.empty:
                continue
            part_ids = pdf_part["vec_id"].to_numpy(dtype=np.int64)
            part_mat = np.array(list(pdf_part["embedding"]), dtype=np.float64)
            part_mat /= np.linalg.norm(part_mat, axis=1, keepdims=True)
            sims = np.round(part_mat @ mat.T, ROUND)
            aa, bb = np.nonzero((sims >= threshold) & (part_ids[:, None] < ids[None, :]))
            yield pd.DataFrame(
                {
                    "vec_a": part_ids[aa],
                    "vec_b": ids[bb],
                    "sim": sims[aa, bb],
                }
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(score, out_schema)
    )
