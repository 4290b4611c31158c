"""Sketch-based approximate aggregates — the cardinality/quantile scale
path for 100 TB interactive analytics.

Exact ``count(DISTINCT)`` shuffles every distinct value; a DataSketches
HLL sketch is a fixed ~KB summary with two properties that matter at
scale:

* **single-pass**: one shuffle of sketch buffers, never of values;
* **mergeable**: per-partition / per-day sketches union losslessly, so
  rollups (day -> month -> total) and incremental (streaming) updates
  never rescan history — the property exact distinct counts lack.

Estimates are engine-specific (no DuckDB twin can match bit-for-bit),
so these register as rows-only queries; pytest pins relative error
against the exact answer and checks merge-consistency invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lgConfigK=12 -> 4 KiB sketches, ~1.6% relative standard error.
LG_K = 12


def approx_user_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event-type approximate distinct users (HLL) next to the exact
    percentile sketch of values — the interactive-dashboard aggregate.
    One shuffle; state per group is O(KB) regardless of row count."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(LG_K))
            ).alias("approx_users"),
            F.approx_count_distinct("user_id").alias("approx_users_hllpp"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def daily_user_sketches(t: dict[str, DataFrame]) -> DataFrame:
    """Materialized per-day HLL sketches — the incremental building
    block: a new day appends one row; any date-range cardinality is a
    union over the covered rows (no rescan of events)."""
    return (
        t["events"]
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("user_sketch"))
    )


def union_user_estimate(daily: DataFrame) -> DataFrame:
    """Cardinality over any set of per-day sketch rows via lossless
    union — demonstrates the mergeability contract."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias(
            "approx_users_total"
        )
    )


# ---------------------------------------------------------------------------
# mergeable fixed-bin histograms -> approximate quantiles
# ---------------------------------------------------------------------------

# Bin width for event values: fine enough that the quantile estimate
# (bin lower edge) sits within one width of the exact answer, coarse
# enough that |bins| stays metadata-sized. DETERMINISTIC — unlike
# t-digest/KLL, a fixed-bin histogram has no data-dependent layout, so
# an ANSI-SQL oracle reproduces it bit-for-bit.
HIST_BIN_WIDTH = 5.0


def daily_value_histograms(
    events: DataFrame, bin_width: float = HIST_BIN_WIDTH
) -> DataFrame:
    """Materialized per-(day, type) value histograms:
    (day, event_type, bin, n) with bin = floor(value / width).

    The quantile analogue of ``daily_user_sketches``: a new day appends
    rows; any date-range quantile is a SUM of bin counts over covered
    rows — mergeable by construction, no rescan of events. State per
    (day, type) is |occupied bins|, bounded by range/width."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
            F.floor(F.col("value") / bin_width).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
    bin_width: float = HIST_BIN_WIDTH,
) -> DataFrame:
    """Approximate quantiles per event_type from merged histogram
    blocks: merge (sum bins across days), cumulative-sum, and for each
    q report the LOWER EDGE of the first bin whose cumulative count
    reaches ceil(q·n) — pure integer selection, so engine and oracle
    agree exactly; the approximation error is < bin_width by
    construction (pytest pins it against exact percentiles).

    Merge is one small shuffle over (type, bin); the window runs over
    |occupied bins| rows per type — metadata scale."""
    from pyspark.sql import Window

    merged = hist.groupBy("event_type", "bin").agg(
        F.sum("n").cast("long").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tot).alias("total"),
    )
    # ONE pass for all quantiles: broadcast the tiny q relation across
    # the cumulative bins and take min(bin) per (type, q) — a per-q
    # union would recompute the merge+window once per quantile.
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")).cast("long"))
        .groupBy("event_type", "q")
        .agg(F.min("bin").alias("bin"))
        .select(
            "event_type",
            "q",
            F.round(F.col("bin") * bin_width, 2).alias("q_est"),
        )
    )


def events_histogram_quantiles(t: dict[str, DataFrame]) -> DataFrame:
    """Registered query: quantile estimates per type reconstructed from
    the mergeable daily blocks (never from raw events)."""
    return histogram_quantiles(daily_value_histograms(t["events"]))


def events_histogram_quantiles_sql(
    qs: tuple = (0.25, 0.5, 0.75, 0.95), bin_width: float = HIST_BIN_WIDTH
) -> str:
    """Oracle twin: same daily blocks, same merge, same integer
    selection rule."""
    q_rows = ", ".join(f"(CAST({q} AS DOUBLE))" for q in qs)
    return f"""
    WITH hist AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type,
               CAST(floor(value / {bin_width}) AS BIGINT) AS bin,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    ), merged AS (
        SELECT event_type, bin, CAST(sum(n) AS BIGINT) AS n
        FROM hist GROUP BY event_type, bin
    ), cum AS (
        SELECT event_type, bin,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM merged
    ), qs(q) AS (VALUES {q_rows})
    SELECT event_type, q, round(min(bin) * {bin_width}, 2) AS q_est
    FROM cum CROSS JOIN qs
    WHERE c >= ceil(q * total)
    GROUP BY event_type, q
    """


# ---------------------------------------------------------------------------
# count-min sketch (heavy hitters)
# ---------------------------------------------------------------------------

# Deterministic pairwise-independent hash rows: bucket_d(h) =
# ((CMS_A[d]*h + CMS_B[d]) % P) % CMS_W. Plain integer arithmetic
# (products < P^2 < 2^63), so engine and oracle agree bit-for-bit —
# unlike the HLL sketches above, the CMS is fully oracle-checkable.
CMS_P = 1_000_000_007
CMS_D = 4
CMS_W = 1024
CMS_A = [((i + 1) * 2_654_435_761) % CMS_P for i in range(CMS_D)]
CMS_B = [((i + 1) * 60_013 + 7) % CMS_P for i in range(CMS_D)]


def cms_word_estimates(docs: DataFrame, k: int = 20) -> DataFrame:
    """Count-min sketch over the corpus word stream, evaluated on the
    top-``k`` true heavy hitters: (word, true_cnt, cms_est).

    The sketch is a (CMS_D x CMS_W) integer grid built with ONE
    groupBy over (row, bucket) pairs — 4 rows per token, partial aggs
    do the compression map-side. It is mergeable by cell-wise addition
    (daily sketch blocks sum losslessly, like the HLL/histogram blocks
    above) and its estimate min_d(grid[d][bucket_d(w)]) upper-bounds
    the true count (pinned in tests: est >= true, and with W=1024 vs a
    31-word vocabulary, est == true — no collisions to inflate).

    100 TB shape: the grid is 4x1024 longs (~32 KB) regardless of
    corpus size; queries touch CMS_D cells per item via a broadcast
    join of the tiny grid relation.
    """
    from ..functions import rolling_hash

    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    hashed = words.select("w", rolling_hash(F.col("w")).alias("h"))

    rows = hashed.select(
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (((F.lit(CMS_A[d]) * F.col("h") + F.lit(CMS_B[d]))
                          % CMS_P) % CMS_W).alias("b"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("db"),
    ).select(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
    grid = rows.groupBy("d", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )

    true_counts = (
        hashed.groupBy("w", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("w"))
        .limit(k)
    )
    probes = true_counts.select(
        "w",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (((F.lit(CMS_A[d]) * F.col("h") + F.lit(CMS_B[d]))
                          % CMS_P) % CMS_W).alias("b"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("db"),
    ).select("w", "true_cnt", F.col("db.d").alias("d"), F.col("db.b").alias("b"))
    return (
        probes.join(F.broadcast(grid), ["d", "b"])
        .groupBy("w", "true_cnt")
        .agg(F.min("c").cast("long").alias("cms_est"))
        .select(F.col("w").alias("word"), "true_cnt", "cms_est")
    )


def cms_word_estimates_sql(k: int = 20) -> str:
    from .oracle import ROLLING_HASH

    h = ROLLING_HASH.format(s="w")
    bucket = "((({a} * h + {b}) % {p}) % {w})"
    rows_union = " UNION ALL ".join(
        f"SELECT {d} AS d, "
        + bucket.format(a=CMS_A[d], b=CMS_B[d], p=CMS_P, w=CMS_W)
        + " AS b FROM hashed"
        for d in range(CMS_D)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT w, true_cnt, {d} AS d, "
        + bucket.format(a=CMS_A[d], b=CMS_B[d], p=CMS_P, w=CMS_W)
        + " AS b FROM topk"
        for d in range(CMS_D)
    )
    return f"""
    WITH words AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    hashed AS (SELECT w, {h} AS h FROM words WHERE w != ''),
    grid AS (
        SELECT d, b, CAST(count(*) AS BIGINT) AS c
        FROM ({rows_union}) GROUP BY d, b
    ),
    topk AS (
        SELECT w, h, CAST(count(*) AS BIGINT) AS true_cnt
        FROM hashed GROUP BY w, h
        ORDER BY true_cnt DESC, w ASC LIMIT {k}
    )
    SELECT p.w AS word, p.true_cnt, CAST(min(g.c) AS BIGINT) AS cms_est
    FROM ({probe_union}) p JOIN grid g USING (d, b)
    GROUP BY p.w, p.true_cnt
    """


def cms_join_size_estimate(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """Equi-join cardinality estimation from two count-min sketches —
    the optimizer-statistics primitive (AGMS/CMS inner product): for
    each hash row d, sum_b gridA[d][b] * gridB[d][b] upper-bounds the
    true join size; the estimate is the MIN over rows. Exact when no
    buckets collide. Returns one row (est_join_size, true_join_size)
    so the bound is visible in the output itself.

    Why it matters at 100 TB: join-size estimates decide broadcast vs
    shuffle vs skew handling BEFORE running the join; two 32 KB grids
    (built with one groupBy each, mergeable per-partition/per-day)
    answer it without touching either table again. Integer arithmetic
    throughout (fixture counts keep products < 2^63; at trillion-row
    scale switch the inner product to DOUBLE — the estimate is
    approximate anyway).
    """
    def grid(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(F.col(key).cast("long").alias("h"))
            .select(
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(d).alias("d"),
                            (((F.lit(CMS_A[d]) * F.col("h") + F.lit(CMS_B[d]))
                              % CMS_P) % CMS_W).alias("b"),
                        )
                        for d in range(CMS_D)
                    ])
                ).alias("cell")
            )
            .groupBy(F.col("cell.d").alias("d"), F.col("cell.b").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    ga = grid(fact, fact_key).withColumnRenamed("cnt", "ca")
    gb = grid(dim, dim_key).withColumnRenamed("cnt", "cb")
    est = (
        ga.join(gb, ["d", "b"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_join_size"))
    )
    true_size = (
        fact.select(F.col(fact_key).alias("k"))
        .join(dim.select(F.col(dim_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("true_join_size"))
    )
    return est.crossJoin(F.broadcast(true_size))


def cms_join_size_sql(
    fact_sql: str, dim_sql: str, fact_key: str, dim_key: str
) -> str:
    bucket = "((({a} * h + {b}) % {p}) % {w})"
    rows_a = "\n            UNION ALL\n            ".join(
        f"SELECT {d} AS d, "
        + bucket.format(a=CMS_A[d], b=CMS_B[d], p=CMS_P, w=CMS_W)
        + " AS b FROM ka"
        for d in range(CMS_D)
    )
    rows_b = "\n            UNION ALL\n            ".join(
        f"SELECT {d} AS d, "
        + bucket.format(a=CMS_A[d], b=CMS_B[d], p=CMS_P, w=CMS_W)
        + " AS b FROM kb"
        for d in range(CMS_D)
    )
    return f"""
    WITH ka AS (SELECT CAST({fact_key} AS BIGINT) AS h FROM ({fact_sql})),
    kb AS (SELECT CAST({dim_key} AS BIGINT) AS h FROM ({dim_sql})),
    ga AS (
        SELECT d, b, CAST(count(*) AS BIGINT) AS ca
        FROM ({rows_a}) GROUP BY d, b
    ),
    gb AS (
        SELECT d, b, CAST(count(*) AS BIGINT) AS cb
        FROM ({rows_b}) GROUP BY d, b
    ),
    est AS (
        SELECT CAST(min(ip) AS BIGINT) AS est_join_size
        FROM (SELECT d, sum(ca * cb) AS ip
              FROM ga JOIN gb USING (d, b) GROUP BY d)
    ),
    tru AS (
        SELECT CAST(count(*) AS BIGINT) AS true_join_size
        FROM ka JOIN kb ON ka.h = kb.h
    )
    SELECT est_join_size, true_join_size FROM est CROSS JOIN tru
    """
