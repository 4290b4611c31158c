"""Temporal joins: as-of join and banded range join.

Neither exists as a built-in Spark operator (the reference engine has no
counterpart either — these are the time-series operators a training-data
pipeline needs when aligning event streams with slowly-changing facts).
Both are expressed as compositions of existing DataFrame ops so Catalyst
keeps optimizing them — no Python in the hot path.

As-of join (backward): for each left row, attach the right row with the
greatest ``right_ts <= left_ts`` for the same key.  Implementation is the
classic union + ordered-window carry-forward:

  1. project both sides onto a common layout (key, ts, side-tag, payload
     struct, right-payload struct),
  2. union — ONE relation, ONE shuffle on the key (the window's
     partitionBy), no join node at all,
  3. ``last(right_struct, ignorenulls=True)`` over
     ``(key) ORDER BY ts, tag ROWS UNBOUNDED PRECEDING..CURRENT`` carries
     the most recent right row onto every left row,
  4. keep left rows, unpack the struct.

The right payload rides in a single struct so a right row whose
individual columns contain NULLs is still carried atomically (per-column
``last(ignorenulls)`` would stitch values from different rows).

Scale notes: cost is one hash exchange of |L|+|R| rows plus an
in-partition sort — the same price as a sort-merge join, with no
candidate blow-up on dense right sides (contrast the naive
``left join .. on key and rts <= lts`` + max() approach, which is
O(|L| x matching |R|)).  Skewed keys behave like any skewed window:
pre-aggregate the right side per (key, ts) — as `asof_last_order` does —
and let AQE handle residual imbalance.

Banded range join: match points to intervals (``lo <= pt < hi`` — or
pairs within a max gap) by quantizing time into buckets of width ~= the
maximum interval span, equi-joining on (key, bucket) with intervals
exploded to every bucket they overlap, then re-applying the exact range
predicate.  This turns an unbounded theta-join (which Spark executes as
BroadcastNestedLoop or a full cartesian per key) into an equi shuffle
join whose candidate count is O(points x avg-intervals-per-bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TAG = "__asof_tag"
_TS = "__asof_ts"
_LEFT = "__asof_left"
_RIGHT = "__asof_right"
_BUCKET = "__range_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (left outer): each left row gains the right row's
    columns for the nearest ``right_ts <= left_ts`` (backward, ties
    inclusive) or ``right_ts >= left_ts`` (forward) within the same key.

    Right-side column names must not collide with left-side ones (rename
    before calling — the result carries both payloads unprefixed).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    left_payload = [c for c in left.columns if c not in keys]
    right_payload = [c for c in right.columns if c not in keys]
    collide = set(left_payload) & set(right_payload)
    if collide:
        raise ValueError(f"column collision between sides: {sorted(collide)}")

    # Common layout. Right rows sort BEFORE left rows at equal ts for
    # backward (tag 0 < 1: an exactly-simultaneous fact is visible), and
    # AFTER for forward (symmetric inclusivity).
    l_norm = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.struct(*left_payload).alias(_LEFT),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in right.select(*right_payload).dtypes) + ">"
        ).alias(_RIGHT),
    )
    r_norm = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.select(*left_payload).dtypes) + ">"
        ).alias(_LEFT),
        F.struct(*right_payload).alias(_RIGHT),
    )
    unioned = l_norm.unionByName(r_norm)

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_TAG).asc()]
        frame = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carried = F.last(_RIGHT, ignorenulls=True).over(frame)
    else:
        # forward: nearest right at or after the left ts — scan from the
        # end; at equal ts the right row (tag 0) must sit AFTER the left
        # row in ascending order so the following-frame still sees it.
        order = [F.col(_TS).asc(), F.col(_TAG).desc()]
        frame = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        carried = F.first(_RIGHT, ignorenulls=True).over(frame)

    matched = unioned.withColumn(_RIGHT, carried).filter(F.col(_TAG) == 1)
    out_cols: list[Column] = [F.col(k) for k in keys]
    out_cols += [F.col(f"{_LEFT}.{c}").alias(c) for c in left_payload]
    out_cols += [F.col(f"{_RIGHT}.{c}").alias(c) for c in right_payload]
    return matched.select(*out_cols)


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    interval_lo: str,
    interval_hi: str,
    max_span: int | None = None,
) -> DataFrame:
    """Point-in-interval join: rows of ``points`` matched to every row of
    ``intervals`` with the same key and ``lo <= pt <= hi``, as an
    equi-join on (key, bucket) instead of a theta-join.

    ``point_ts`` / ``interval_lo`` / ``interval_hi`` are integer-typed
    columns (e.g. ``unix_micros``) so bucketing is exact.  ``max_span``
    is the bucket width; defaults to the largest interval span (computed
    with one cheap agg) — pass it explicitly when you know the bound, to
    save the extra job.  Intervals are exploded to every bucket they
    overlap (span/width + 1 rows, ~2 for spans <= width), so candidate
    fan-out stays bounded; the exact predicate re-filters after the join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if max_span is None:
        row = intervals.select(
            F.max(F.col(interval_hi) - F.col(interval_lo)).alias("s")
        ).first()
        max_span = int(row["s"]) if row["s"] is not None else 1
    width = max(int(max_span), 1)

    pts = points.withColumn(_BUCKET, F.floor(F.col(point_ts) / width))
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(interval_lo) / width),
                F.floor(F.col(interval_hi) / width),
            )
        ),
    )
    joined = pts.join(ivs, on=keys + [_BUCKET]).filter(
        (F.col(point_ts) >= F.col(interval_lo))
        & (F.col(point_ts) <= F.col(interval_hi))
    )
    return joined.drop(_BUCKET)


# ---------------------------------------------------------------------------
# Registered queries over the fixture tables
# ---------------------------------------------------------------------------


def asof_last_order(t: dict[str, DataFrame]) -> DataFrame:
    """For every event, the user's most recent order activity at or
    before the event time: as-of(backward) events -> per-(custkey, day)
    order rollup.  The right side is pre-aggregated to one row per
    (key, ts) — both the determinism requirement (ASOF is ambiguous on
    duplicate timestamps) and the skew mitigation (window partitions
    carry |days|, not |orders|).
    """
    od = (
        t["orders"]
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("last_order_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents: totalprice is a 2-dp decimal stored as double
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("spend_c"),
        )
    )
    ev = t["events"].select("user_id", "ts", "event_id")
    res = asof_join(ev, od, on="user_id", left_ts="ts", right_ts="last_order_ts")
    return res.select("event_id", "user_id", "ts", "last_order_ts", "n_orders", "spend_c")


def events_followups_within(
    t: dict[str, DataFrame], gap_s: int = 3600
) -> DataFrame:
    """Per user: how many ordered event pairs fall within ``gap_s``
    seconds (0 < t_b - t_a <= gap) — a time-range self-join executed as
    a banded range join (bucket width == gap, so each 'interval'
    [t_a, t_a+gap] spans <= 2 buckets of candidates).
    """
    gap_us = gap_s * 1_000_000
    e = t["events"].select("user_id", F.unix_micros("ts").alias("t"))
    pts = e.withColumnRenamed("t", "t_b")
    ivs = e.select(
        "user_id",
        F.col("t").alias("lo"),
        (F.col("t") + gap_us).alias("hi"),
    )
    pairs = banded_range_join(
        pts, ivs, on="user_id", point_ts="t_b",
        interval_lo="lo", interval_hi="hi", max_span=gap_us,
    ).filter(F.col("t_b") > F.col("lo"))
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


ASOF_LAST_ORDER_ORACLE = """
    WITH od AS (
        SELECT o_custkey AS user_id,
               o_orderdate AS last_order_ts,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS spend_c
        FROM orders
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, od.last_order_ts, od.n_orders, od.spend_c
    FROM events e
    ASOF LEFT JOIN od
      ON e.user_id = od.user_id AND e.ts >= od.last_order_ts
"""

EVENTS_FOLLOWUPS_ORACLE = """
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
    GROUP BY a.user_id
"""


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_lo: str = "l_lo",
    left_hi: str = "l_hi",
    right_lo: str = "r_lo",
    right_hi: str = "r_hi",
    max_span: int | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (the temporal primitive beside
    as-of and point-in-band): key-equal pairs whose intervals satisfy
    l_lo <= r_hi AND r_lo <= l_hi, executed as a banded equi-join.

    Both sides explode to every bucket their interval touches; a pair
    overlapping several shared buckets would surface once per bucket,
    so the join keeps only the bucket holding the OVERLAP START
    (max(l_lo, r_lo)) — each true pair is emitted exactly once with no
    dedup shuffle (the emit-once trick, cheaper than ``distinct`` over
    the candidate set). Bucket width defaults to the larger side's max
    span so fan-out stays <= 2 rows per interval per side; candidates
    per bucket scale with interval density, never |left| × |right|.
    Bounds are integer-typed (e.g. unix_micros) so bucketing is exact.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if max_span is None:
        s1 = left.select(
            F.max(F.col(left_hi) - F.col(left_lo)).alias("s")
        ).first()["s"]
        s2 = right.select(
            F.max(F.col(right_hi) - F.col(right_lo)).alias("s")
        ).first()["s"]
        max_span = max(int(s1 or 1), int(s2 or 1))
    width = max(int(max_span), 1)

    def banded(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / width), F.floor(F.col(hi) / width)
                )
            ),
        )

    l = banded(left, left_lo, left_hi)
    r = banded(right, right_lo, right_hi)
    overlap_start = F.greatest(F.col(left_lo), F.col(right_lo))
    return (
        l.join(r, on=keys + [_BUCKET])
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col(_BUCKET) == F.floor(overlap_start / width))
        )
        .drop(_BUCKET)
    )


def session_error_overlaps(t: dict[str, DataFrame]) -> DataFrame:
    """Registered overlap-join query: per user, click activity windows
    ([ts, ts+30min] around each click) that OVERLAP error windows
    ([ts, ts+10min] around each error) — the "which sessions saw an
    incident" correlation. Output: one row per overlapping pair with
    the overlap length in seconds (exact integer micros arithmetic)."""
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_lo"),
        (F.unix_micros("ts") + 1800 * 1_000_000).alias("c_hi"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("e_lo"),
        (F.unix_micros("ts") + 600 * 1_000_000).alias("e_hi"),
    )
    pairs = interval_overlap_join(
        clicks, errors, on="user_id",
        left_lo="c_lo", left_hi="c_hi",
        right_lo="e_lo", right_hi="e_hi",
        max_span=1800 * 1_000_000,
    )
    overlap_us = F.least(F.col("c_hi"), F.col("e_hi")) - F.greatest(
        F.col("c_lo"), F.col("e_lo")
    )
    return pairs.select(
        "user_id",
        "click_id",
        "error_id",
        F.floor(overlap_us / F.lit(1_000_000)).cast("long").alias("overlap_s"),
    )


SESSION_ERROR_OVERLAPS_ORACLE = """
    WITH clicks AS (
        SELECT user_id, event_id AS click_id,
               epoch_us(ts) AS c_lo, epoch_us(ts) + 1800000000 AS c_hi
        FROM events WHERE event_type = 'click'
    ),
    errors AS (
        SELECT user_id, event_id AS error_id,
               epoch_us(ts) AS e_lo, epoch_us(ts) + 600000000 AS e_hi
        FROM events WHERE event_type = 'error'
    )
    SELECT c.user_id, c.click_id, e.error_id,
           CAST(floor((least(c.c_hi, e.e_hi) - greatest(c.c_lo, e.e_lo))
                / 1000000) AS BIGINT) AS overlap_s
    FROM clicks c
    JOIN errors e
      ON c.user_id = e.user_id
     AND c.c_lo <= e.e_hi AND e.e_lo <= c.c_hi
"""


# ---------------------------------------------------------------------------
# watermark lateness audit (streaming-design sizing tool)
# ---------------------------------------------------------------------------

# Candidate withWatermark() delays to audit, in seconds.
WATERMARK_DELAYS = (0, 60, 300, 900, 3600)
# Deterministic delivery jitter: Knuth multiplicative hash of event_id,
# folded to [0, 600) seconds. Exact BIGINT arithmetic in both engines.
_JITTER_MULT = 2654435761
_JITTER_MOD = 600


def watermark_lateness_audit(
    t: dict[str, DataFrame],
    delays=WATERMARK_DELAYS,
    jitter_mod: int = _JITTER_MOD,
) -> DataFrame:
    """How many events would each candidate watermark delay DROP?

    Before picking `withWatermark("ts", "10 minutes")` for a streaming
    job you want the drop rate per candidate delay, measured on real
    traffic. This audit replays the batch events table in simulated
    ARRIVAL order (event time + deterministic per-event delivery
    jitter — the fixture's event_ids are already time-ordered, so the
    jitter models network reordering), tracks the running max event
    time exactly as Spark's watermark does, and counts events whose
    lateness (watermark minus own event time at arrival) exceeds each
    candidate delay.

    Scale shape (100 TB): the running max is computed scan-parallel,
    not through one global window task — arrival days are independent
    buckets (per-day window, parallel), and cross-bucket carry-in is
    the cummax of ~days-of-retention per-bucket maxima (metadata-sized,
    broadcast back). The delay fan-out is a narrow 5x explode before a
    5-group aggregate. Output: one row per candidate delay with exact
    integer basis points.
    """
    e = t["events"].select(
        "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    jitter_s = (F.col("event_id") * F.lit(_JITTER_MULT)) % F.lit(
        4294967296
    ) % F.lit(jitter_mod)
    arr = e.withColumn(
        "arrival_us", F.col("ts_us") + jitter_s * F.lit(1_000_000)
    ).withColumn(
        "bucket",
        ((F.col("arrival_us") - F.col("arrival_us") % 86400_000_000)
         / 86400_000_000).cast("long"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("arrival_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = arr.withColumn("run_max_us", F.max("ts_us").over(w_in))
    # carry-in: max event time of all STRICTLY EARLIER buckets
    # (metadata-sized: one row per arrival day)
    bmax = arr.groupBy("bucket").agg(F.max("ts_us").alias("b_max"))
    w_prev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bmax.select(
        "bucket", F.max("b_max").over(w_prev).alias("prev_max_us")
    )
    wm = arr.join(F.broadcast(carry), "bucket").withColumn(
        "wm_us",
        F.greatest(
            F.col("run_max_us"),
            F.coalesce(F.col("prev_max_us"), F.lit(-(1 << 62))),
        ),
    )
    lateness = (F.col("wm_us") - F.col("ts_us")).alias("late_us")
    fanned = wm.select(
        lateness,
        F.explode(
            F.array(*[F.lit(int(d)) for d in delays])
        ).alias("delay_s"),
    )
    agg = fanned.groupBy("delay_s").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (
                F.col("late_us")
                > F.col("delay_s").cast("long") * F.lit(1_000_000)
            ).cast("long")
        ).alias("n_late"),
    )
    late_bp = (
        (F.col("n_late") * 10000
         - (F.col("n_late") * 10000) % F.col("n_events"))
        / F.col("n_events")
    ).cast("long")
    return agg.select("delay_s", "n_events", "n_late", late_bp.alias("late_bp"))


def watermark_lateness_audit_sql(
    delays=WATERMARK_DELAYS, jitter_mod: int = _JITTER_MOD
) -> str:
    """Twin of watermark_lateness_audit: one running-max window in
    arrival order (the bucketed two-pass scan and the single window are
    the same fixpoint), same integer jitter, exact integer basis
    points."""
    delay_rows = ", ".join(f"({int(d)})" for d in delays)
    return f"""
    WITH arr AS (
        SELECT event_id, epoch_us(ts) AS ts_us,
               epoch_us(ts)
               + ((event_id * {_JITTER_MULT}) % 4294967296 % {jitter_mod})
                 * 1000000 AS arrival_us
        FROM events
    ),
    wm AS (
        SELECT ts_us,
               max(ts_us) OVER (
                   ORDER BY arrival_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - ts_us AS late_us
        FROM arr
    ),
    dv(delay_raw) AS (VALUES {delay_rows}),
    d AS (SELECT CAST(delay_raw AS BIGINT) AS delay_s FROM dv)
    SELECT d.delay_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (
               WHERE wm.late_us > d.delay_s * 1000000) AS BIGINT) AS n_late,
           CAST((count(*) FILTER (
                    WHERE wm.late_us > d.delay_s * 1000000) * 10000)
                // count(*) AS BIGINT) AS late_bp
    FROM wm CROSS JOIN d
    GROUP BY d.delay_s
    """


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------


def cusum_changepoint(t: dict[str, DataFrame]) -> DataFrame:
    """CUSUM mean-shift changepoint over the daily order-revenue
    series (Page 1954 / the standardized-CUSUM scan): the day t* that
    maximizes |S_t| = |Σ_{i≤t}(x_i − x̄)| — the split point of the
    most likely single mean shift — with the scan statistic
    max|S_t| / (σ̂·√n) whose >1.358 exceedance rejects "no change" at
    α=0.05 (Brownian-bridge asymptotics, same c(α) as the KS test).

    Exactness: the argmax is decided on n·S_t = n·cum_t − t·T — exact
    decimal(38,0) integers over CENTS (no float compare picks the
    day); ties break to the earliest day. Only the reported statistic
    divides.

    Scale shape: one groupBy collapses orders to the daily series
    (calendar-bounded metadata: ~2.4k rows for seven years at ANY
    corpus size); prefix sums and the argmax run over that metadata
    relation. Output: one row.
    """
    o = t["orders"].select(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd")
        .alias("day"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    daily = o.groupBy("day").agg(F.sum("cents").cast("long").alias("x"))
    w_ord = Window.orderBy("day")
    w_all = Window.partitionBy()
    dec = lambda c: c.cast("decimal(38,0)")
    cur = daily.select(
        "day",
        F.row_number().over(w_ord).alias("tt"),
        F.sum("x").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("tot"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).over(w_all).alias("sq"),
    )
    ns = dec(F.col("n")) * dec(F.col("cum")) - dec(F.col("tt")) * dec(
        F.col("tot")
    )
    scored = cur.select(
        "day", "n", "tot", "sq", F.abs(ns).alias("ns_abs")
    )
    top = scored.orderBy(F.desc("ns_abs"), F.asc("day")).limit(1)
    n_d = F.col("n").cast("double")
    mean_c = F.col("tot").cast("double") / n_d
    var_c = F.col("sq").cast("double") / n_d - mean_c * mean_c
    stat = F.when(var_c <= 0, F.lit(0.0)).otherwise(
        F.col("ns_abs").cast("double")
        / n_d
        / (F.sqrt(var_c) * F.sqrt(n_d))
    )
    return top.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("day").alias("cp_day"),
        F.round(stat, 6).alias("cusum_stat_r6"),
        (stat > 1.358).cast("int").alias("shift_detected"),
    )


def cusum_changepoint_sql() -> str:
    """Twin of cusum_changepoint: HUGEINT n·cum − t·T argmax, same
    double formulas."""
    return """
    WITH daily AS (
        SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    cur AS (
        SELECT day,
               row_number() OVER (ORDER BY day) AS tt,
               CAST(sum(x) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(count(*) OVER () AS BIGINT) AS n,
               CAST(sum(x) OVER () AS BIGINT) AS tot,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) OVER () AS sq
        FROM daily
    ),
    scored AS (
        SELECT day, n, tot, sq,
               abs(CAST(n AS HUGEINT) * cum - CAST(tt AS HUGEINT) * tot)
                   AS ns_abs
        FROM cur
    ),
    top AS (
        SELECT * FROM scored ORDER BY ns_abs DESC, day ASC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_days, day AS cp_day,
           round(CASE WHEN vc <= 0 THEN 0.0
                      ELSE CAST(ns_abs AS DOUBLE) / CAST(n AS DOUBLE)
                           / (sqrt(vc) * sqrt(CAST(n AS DOUBLE))) END, 6)
               AS cusum_stat_r6,
           CAST(CASE WHEN vc <= 0 THEN 0.0
                     ELSE CAST(ns_abs AS DOUBLE) / CAST(n AS DOUBLE)
                          / (sqrt(vc) * sqrt(CAST(n AS DOUBLE))) END
                > 1.358 AS INT) AS shift_detected
    FROM (SELECT *,
                 CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)) AS vc
          FROM top)
    """


# ---------------------------------------------------------------------------
# EWMA smoothing of the hourly event series
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.2
EWMA_H = 24  # truncated kernel horizon (hours of history)
# shared weight literals: w_j = (1-alpha)^j, generated once in Python so
# both engines multiply by bit-identical doubles
EWMA_W = [(1.0 - EWMA_ALPHA) ** j for j in range(EWMA_H)]


def ewma_hourly_smooth(t: dict[str, DataFrame]) -> DataFrame:
    """Exponentially-weighted moving average of hourly event counts per
    type — the denoised load curve behind capacity/anomaly baselines —
    with a TRUNCATED kernel: s_t = Σ_{j<H} w_j·x_{t−j} / Σ_{j<H} w_j
    over the trailing H observed hours, w_j = (1−α)^j. Truncation (vs
    the textbook infinite recursion) is what makes the smoother a
    stateless window expression instead of a sequential fold: any
    engine, any partitioning, any restart computes the same value,
    and the dropped tail carries weight (1−α)^H < 0.5%.

    Index-based, not calendar-based: lags step over OBSERVED hours
    (gap handling belongs to events_hourly_gapfilled upstream).

    Exactness: counts are integers; the weighted sums evaluate one
    shared left-folded chain of double literals generated once in
    Python, so both engines run the identical IEEE sequence.

    Scale shape: events collapse to the (type, hour) series (calendar
    -bounded metadata) in one groupBy; the H-lag window partitions by
    type. Output: one row per (type, hour).
    """
    hourly = (
        t["events"]
        .groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    x = F.col("n_events").cast("double")
    num = x * EWMA_W[0]
    den = F.lit(EWMA_W[0])
    for j in range(1, EWMA_H):
        lx = F.lag(x, j).over(w)
        num = num + F.coalesce(lx * EWMA_W[j], F.lit(0.0))
        den = den + F.when(lx.isNotNull(), F.lit(EWMA_W[j])).otherwise(
            F.lit(0.0)
        )
    return hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.round(num / den, 6).alias("ewma_r6"),
    )


def ewma_hourly_smooth_sql() -> str:
    """Twin of ewma_hourly_smooth: identical left-folded weight chain
    over the same lag terms."""
    over = "OVER (PARTITION BY event_type ORDER BY hour)"
    num_terms = [f"CAST(n_events AS DOUBLE) * {EWMA_W[0]!r}"]
    den_terms = [f"{EWMA_W[0]!r}"]
    for j in range(1, EWMA_H):
        lx = f"lag(CAST(n_events AS DOUBLE), {j}) {over}"
        num_terms.append(f"coalesce({lx} * {EWMA_W[j]!r}, 0.0)")
        den_terms.append(
            f"CASE WHEN {lx} IS NOT NULL THEN {EWMA_W[j]!r} ELSE 0.0 END"
        )
    num = "\n                 + ".join(num_terms)
    den = "\n                 + ".join(den_terms)
    return f"""
    WITH hourly AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, n_events,
           round(({num})
                 / ({den}), 6) AS ewma_r6
    FROM hourly
    """
