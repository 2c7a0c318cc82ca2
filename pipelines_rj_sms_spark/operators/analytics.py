"""Event-sequence analytics: funnels and cohort retention.

The reference's monitoring flows answer "how many users completed the
HCI conversation flow?" with per-step BigQuery counts re-scanned per
report (monitoramento_hci/tasks.py:34-63 shape). The scalable form is
the windowed-funnel aggregate (the ClickHouse `windowFunnel` shape,
public): ONE hash aggregation per user collecting the (ts, step)
sequence, then an expression-only fold over the sorted array computing
the furthest funnel stage reached — no per-step self-joins (k-step
funnel via joins is k shuffles of the fact table; this is one).

Cohort retention is the companion: bucket users by first-activity
period, count distinct active users per (cohort, period offset) — two
hash aggregations, shuffles carry (user, period) pairs, never events.

Everything is JVM expressions (collect_list + sort_array + aggregate
fold); no Python, no window over the event table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                      det_units)
from pipelines_rj_sms_spark.functions.numeric import \
    pin_round6 as _p6


def funnel_stages(df: DataFrame, user_col: str, ts_col: str,
                  step_col: str, steps: list[str],
                  within_seconds: float | None = None,
                  tiebreak_col: str | None = None,
                  stage_col: str = "stage") -> DataFrame:
    """Furthest funnel stage per user: one row per user with the count
    of ``steps`` prefix-matched IN ORDER through their event sequence.

    A user at stage k completed steps[0..k-1] in timestamp order
    (interleaved other events are fine; repeats are fine). With
    ``within_seconds``, the whole funnel must complete within that many
    seconds of the stage-1 event (the windowed-funnel semantic).

    One hash aggregation (collect the per-user sequence) + a codegen'd
    `aggregate` fold over the sorted array. Per-user state is the event
    list — the same bound every sessionizer has; for heavy users cap
    upstream. ``tiebreak_col`` makes same-timestamp ordering
    deterministic (defaults to the step value itself).
    """
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(step_col)
    seq = F.sort_array(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"), tb.alias("tb"),
        F.col(step_col).alias("step"))))
    per_user = df.groupBy(user_col).agg(seq.alias("_seq"))
    steps_arr = F.array(*[F.lit(s) for s in steps])

    if within_seconds is None:
        fold = F.aggregate(
            F.col("_seq"), F.lit(0),
            lambda acc, x: F.when(
                x["step"] == F.get(steps_arr, acc), acc + F.lit(1)
            ).otherwise(acc))
        return per_user.select(user_col, fold.alias(stage_col))

    def ep(x: Column) -> Column:
        return x["ts"].cast("double")

    init = F.struct(F.lit(0).alias("stage"), F.lit(0.0).alias("t0"))
    limit = F.lit(float(within_seconds))

    def step_fn(acc: Column, x: Column) -> Column:
        expected = F.get(steps_arr, acc["stage"])
        in_window = (acc["stage"] == 0) | (ep(x) - acc["t0"] <= limit)
        advance = (x["step"] == expected) & in_window
        return F.when(advance, F.struct(
            (acc["stage"] + 1).alias("stage"),
            F.when(acc["stage"] == 0, ep(x)).otherwise(acc["t0"])
            .alias("t0"),
        )).otherwise(acc)

    fold = F.aggregate(F.col("_seq"), init, step_fn)["stage"]
    return per_user.select(user_col, fold.alias(stage_col))


def funnel_counts(df: DataFrame, user_col: str, ts_col: str,
                  step_col: str, steps: list[str],
                  within_seconds: float | None = None,
                  tiebreak_col: str | None = None) -> DataFrame:
    """Funnel report: users per furthest-stage (stage 0 = entered
    nothing). Cumulative "reached >= k" is a running sum over this
    len(steps)+1-row result — driver-trivial by construction."""
    stages = funnel_stages(df, user_col, ts_col, step_col, steps,
                           within_seconds, tiebreak_col)
    return (stages.groupBy("stage")
            .agg(F.count("*").alias("n_users")))


def top_paths(df: DataFrame, user_col: str, ts_col: str, step_col: str,
              n: int = 3, k: int = 20,
              tiebreak_col: str | None = None) -> DataFrame:
    """The ``k`` most common length-``n`` event sequences across user
    journeys ("top paths"): collect each user's ordered step sequence
    (one hash agg — same bound as the funnel), slide an n-gram window
    over it as a codegen'd array transform, explode the n-grams, count,
    and TakeOrdered the top k. Returns (path, cnt) with steps joined
    by '>'.

    Per-user state is the step sequence; heavy users should be capped
    upstream (sample_per_group) exactly like the sessionizer. The
    n-gram explode emits len-n+1 short strings per user — narrow."""
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(step_col)
    seq = F.sort_array(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"), tb.alias("tb"),
        F.col(step_col).alias("step"))))
    steps = F.transform(seq, lambda s: s["step"])
    grams = F.when(
        F.size(steps) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(steps) - n),
            lambda i: F.concat_ws(">", F.slice(steps, i + 1, n)))
    ).otherwise(F.array().cast("array<string>"))
    per_user = df.groupBy(user_col).agg(grams.alias("_grams"))
    return (per_user
            .select(F.explode("_grams").alias("path"))
            .groupBy("path").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("path").asc())
            .limit(k))


def rolling_anomalies(df: DataFrame, ts_col: str, value_col: str,
                      keys: list[str] | None = None,
                      lookback: int = 24, z_threshold: float = 3.0,
                      min_points: int = 5) -> DataFrame:
    """Rolling z-score anomaly flags over a metric series.

    For each row, the mean/stddev of the PREVIOUS ``lookback`` points
    (current point excluded, so a spike cannot mask itself) within its
    key series define the expected band; ``z`` is the deviation in
    sigmas and ``is_anomaly`` fires at |z| >= ``z_threshold``. Rows
    with fewer than ``min_points`` of history or zero variance get a
    null z (cold start / constant series — not judgeable).

    This is the monitoring half the reference runs as cron'd BigQuery
    threshold checks (monitoramento flows): here it is one window over
    the already-aggregated series — the input should be a per-bucket
    rollup (e.g. `timeseries.downsample_ohlc` or a groupBy count), so
    the window moves O(buckets) rows, never raw events. One Exchange
    on ``keys``; the frame is row-bounded so per-row state is O(1).
    """
    part = keys or []
    w = (Window.partitionBy(*part).orderBy(ts_col)
         .rowsBetween(-lookback, -1))
    # windowed moments from det-quantized Σx / Σx² (closed-form sample
    # variance): windowed avg/stddev_samp accumulate doubles in an
    # engine-internal frame order, so the last ulp — and occasionally
    # the 6dp-rounded z — differs across engines; integer-unit window
    # sums are exact under any association (functions/numeric.py)
    from pipelines_rj_sms_spark.functions.numeric import (DET_SCALE,
                                                          det_units)
    v = F.col(value_col)
    npts = F.count(value_col).over(w)
    s = (F.sum(det_units(v)).over(w).cast("double") / float(DET_SCALE))
    q = (F.sum(det_units(v * v)).over(w).cast("double")
         / float(DET_SCALE))
    mean = s / npts
    var = F.when(npts > 1, (q - s * s / npts) / (npts - 1))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        (npts >= min_points) & (sd > 0),
        (F.col(value_col) - mean) / sd)
    return df.select(
        *part, ts_col, value_col,
        npts.alias("n_history"),
        z.alias("z"),
        (F.abs(z) >= F.lit(z_threshold)).alias("is_anomaly"),
    )


def equi_depth_histogram(df: DataFrame, value_col: str,
                         n_buckets: int = 10,
                         approx: bool = False,
                         approx_accuracy: int = 10000) -> DataFrame:
    """Equal-population histogram WITHOUT a global sort: bucket
    boundaries are interpolated percentiles (one aggregation row,
    broadcast), assignment is a codegen'd count-of-boundaries-below
    filter, and per-bucket (cnt, min, max) is one hash agg. The
    ntile() spelling forces every row through a single-partition sort
    — this shape never does. Values equal to a boundary land in the
    lower bucket (strict comparison), so assignment is deterministic.

    ``approx``: exact ``percentile`` (the default — the oracle/replay
    contract) buffers EVERY DISTINCT value of ``value_col`` in its
    final aggregator; over a continuous raw-event column that map is
    ~|rows| and will not survive 100x scale. ``approx=True`` swaps in
    ``approx_percentile`` (bounded sketch, rank error <=
    1/``approx_accuracy`` at any n) for the boundary step — bucket
    populations then deviate from n/n_buckets by at most the rank
    error; opt-in because the result is no longer bit-replayable.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    qarr = ", ".join(map(str, qs))
    # boundaries are rounded to 6 dp before assignment: engines
    # interpolate (1-f)a+fb vs a+f(b-a), which differ in the last ulp
    # exactly when a quantile lands on duplicated values — rounding
    # pins the cut points so assignment is replayable cross-engine
    pct = (f"approx_percentile({value_col}, array({qarr}), "
           f"{approx_accuracy})" if approx
           else f"percentile({value_col}, array({qarr}))")
    bounds = F.broadcast(df.agg(F.transform(
        F.expr(pct),
        lambda b: F.round(b, 6)).alias("_b")))
    bucket = F.size(F.filter(
        F.col("_b"), lambda b: b < F.col(value_col)))
    return (df.crossJoin(bounds)
            .select(bucket.alias("bucket"), F.col(value_col))
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"),
                 F.min(value_col).alias("lo"),
                 F.max(value_col).alias("hi")))


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     granularity: str = "month") -> DataFrame:
    """Classic retention triangle: users bucketed by first-activity
    period (their cohort), counted per (cohort, period-offset) they
    were active in.

    Offsets are integer period arithmetic (year*12+month for months,
    day ordinals for days) so the result is engine-exact. Two hash
    aggregations; the join ships (user, cohort) pairs only.
    """
    if granularity == "month":
        period = (F.year(F.col(ts_col)) * 12
                  + F.month(F.col(ts_col)) - 1).alias("_p")
    elif granularity == "day":
        period = F.datediff(F.to_date(F.col(ts_col)),
                            F.lit("1970-01-01").cast("date")).alias("_p")
    else:
        raise ValueError(f"granularity must be month|day: {granularity}")
    active = df.select(F.col(user_col).alias("_u"), period).distinct()
    cohorts = active.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    return (
        active.join(cohorts, "_u")
        .groupBy(F.col("_cohort").alias("cohort_period"),
                 (F.col("_p") - F.col("_cohort")).alias("period_offset"))
        .agg(F.count("*").alias("n_users"))
    )


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_pair_count: int = 2,
                      max_items_per_basket: int = 200) -> DataFrame:
    """Pairwise market-basket association rules: support, directional
    confidences, and lift for every co-occurring item pair.

    The classic Apriori-to-pairs shape (Agrawal/Srikant, public): the
    candidate generator is a SELF-EQUI-JOIN on the basket key with the
    ``item_a < item_b`` ordering inside the join condition — never a
    cross product, and each pair is emitted once. ``max_items_per_basket``
    is the hot-key guard (a basket with k items fans out k*(k-1)/2
    pairs; the cap bounds the worst key to max²/2 — same posture as the
    winnowing max_df cap). Dropped baskets are dropped from BOTH the
    pair counts and the denominators, so the probabilities stay
    consistent over the measured population.

    Scale shape: distinct (basket, item) → one Exchange on the basket
    key that the size-cap window AND both join sides reuse (Catalyst
    sees the same partitioning, no re-shuffle); item margins are one
    hash agg joined back on the item key; the global basket count rides
    in as a broadcast 1-row frame. Rows after the first projection are
    narrow (basket, item) pairs — fact bodies never move.

    Returns (item_a, item_b, pair_count, support, conf_a_to_b,
    conf_b_to_a, lift), floats rounded to 6.
    """
    base = df.select(F.col(basket_col).alias("_b"),
                     F.col(item_col).alias("_i")).distinct()
    sized = base.withColumn(
        "_sz", F.count("*").over(Window.partitionBy("_b")))
    kept = sized.filter(F.col("_sz") <= max_items_per_basket).drop("_sz")

    n_baskets = F.broadcast(
        kept.select("_b").distinct()
        .agg(F.count("*").cast("double").alias("_n")))
    item_counts = kept.groupBy(F.col("_i").alias("_it")).agg(
        F.count("*").alias("_ni"))

    a = kept.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = kept.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (a.join(b, (a["_b"] == b["_b"])
                    & (F.col("item_a") < F.col("item_b")))
             .groupBy("item_a", "item_b")
             .agg(F.count("*").alias("pair_count"))
             .filter(F.col("pair_count") >= min_pair_count))

    return (
        pairs
        .join(item_counts.withColumnRenamed("_ni", "_na"),
              F.col("item_a") == F.col("_it")).drop("_it")
        .join(item_counts.withColumnRenamed("_ni", "_nb"),
              F.col("item_b") == F.col("_it")).drop("_it")
        .crossJoin(n_baskets)
        .select(
            "item_a", "item_b", "pair_count",
            # pin_round6: support/confidence/lift are exact integer
            # ratios — the .5e-6-tie class (functions/numeric.py)
            _p6(F.col("pair_count") / F.col("_n")).alias("support"),
            _p6(F.col("pair_count") / F.col("_na"))
            .alias("conf_a_to_b"),
            _p6(F.col("pair_count") / F.col("_nb"))
            .alias("conf_b_to_a"),
            _p6(F.col("pair_count") * F.col("_n")
                / (F.col("_na") * F.col("_nb"))).alias("lift")))


def attribution_credits(df: DataFrame, user_col: str, ts_col: str,
                        event_col: str,
                        conversion_events: list[str],
                        touch_events: list[str],
                        model: str = "linear",
                        lookback_seconds: float | None = None,
                        ) -> DataFrame:
    """Multi-touch attribution: split each conversion's credit across
    the user's preceding touch events.

    ``model``: ``linear`` (1/n to each touch in the window),
    ``first_touch`` / ``last_touch`` (all credit to the earliest /
    latest touch; ties on the timestamp break by the event id order of
    appearance being irrelevant — (ts, event) lexicographic). Touches
    strictly before the conversion qualify; ``lookback_seconds`` bounds
    the window (and the join fan-out — unbounded lookback on a hot user
    is the quadratic case, so pass it at scale).

    Scale shape: both sides collapse to (user, ts, channel) BEFORE the
    equi-join on the user key; the range predicate rides inside the join
    condition so no post-filter row ever materializes. Per-conversion
    statistics (n touches, min/max rank) come from a window over the
    joined credit rows keyed by (user, conversion ts) — narrow rows,
    one extra Exchange. Returns (channel, credited, n_touches) where
    ``credited`` sums each conversion's [0, 1] credit per touch channel,
    rounded to 6.
    """
    if model not in ("linear", "first_touch", "last_touch",
                     "position"):
        raise ValueError(f"unknown attribution model: {model}")
    conv = df.filter(F.col(event_col).isin(list(conversion_events))).select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_cts"))
    touch = df.filter(F.col(event_col).isin(list(touch_events))).select(
        F.col(user_col).alias("_tu"), F.col(ts_col).alias("_tts"),
        F.col(event_col).alias("channel"))
    cond = (conv["_u"] == touch["_tu"]) & (touch["_tts"] < conv["_cts"])
    if lookback_seconds is not None:
        cond = cond & (touch["_tts"] >= conv["_cts"]
                       - F.expr(f"INTERVAL {float(lookback_seconds)} SECOND"))
    joined = conv.join(touch, cond).drop("_tu")

    w = Window.partitionBy("_u", "_cts")
    if model == "linear":
        credit = F.lit(1.0) / F.count("*").over(w)
    elif model == "position":
        # U-shaped 40/20/40: first and last touch get 0.4 each, the
        # middles split the remaining 0.2 (1 touch -> 1.0, 2 -> 0.5
        # each) — the standard position-based model (public)
        wo = w.orderBy(F.col("_tts").asc(), F.col("channel").asc())
        n = F.count("*").over(w)
        rn = F.row_number().over(wo)
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when((rn == 1) | (rn == n), F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2).cast("double")))
    else:
        # row_number (not a min/max-struct match) so EXACTLY one touch
        # row per conversion carries the credit even under duplicate
        # (ts, channel) touches
        if model == "first_touch":
            wo = w.orderBy(F.col("_tts").asc(), F.col("channel").asc())
        else:
            wo = w.orderBy(F.col("_tts").desc(), F.col("channel").desc())
        credit = F.when(F.row_number().over(wo) == 1,
                        F.lit(1.0)).otherwise(F.lit(0.0))
    # det_sum: linear credits are 1/k doubles summed across partitions
    # — quantized accumulation keeps `credited` identical under any
    # combine order (functions/numeric.py)
    return (joined.withColumn("_credit", credit)
            .groupBy("channel")
            .agg(F.round(det_sum(F.col("_credit")), 6).alias("credited"),
                 F.count("*").alias("n_touches")))


def cusum_deviations(df: DataFrame, ts_col: str, value_col: str,
                     key_cols: list[str] | None = None,
                     threshold_sigmas: float = 3.0,
                     integral_values: bool = False,
                     det_scale: int = 10**6) -> DataFrame:
    """Cumulative-deviation change detection over an ordered series
    (the non-resetting CUSUM chart): C_i = Σ_{j<=i} (x_j - mean), with
    the crossing flag |C_i| > h·σ·√N. The max-|C| row is the classic
    change-point location estimate; the flag column marks every
    excursion beyond the band.

    Per-key global mean/stddev/count come from ONE hash aggregation
    joined back broadcast-style on the key (the series rows themselves
    never shuffle twice); the cumulative sum is one window with O(1)
    running state. Series-level operator — feed it a rollup (e.g.
    hourly counts), not raw events, and the window moves O(buckets)
    rows. Returns the input keys + (ts, value, cusum, band, exceeds).

    Determinism: with ``integral_values=True`` (the value column holds
    integer fixed-point units) the mean and stddev come from EXACT
    decimal(38,0) sums — the closed-form variance from Σx / Σx² — so
    every statistic is combine-order-independent and engine-identical;
    the default path keeps avg/stddev_samp for arbitrary doubles. The
    running sum always quantizes its (x - mean) addends to 1/det_scale
    units (functions/numeric.py) so the cumulative values match across
    engines regardless of how each engine associates the window frame
    additions (Spark runs sequentially; a segment-tree combine would
    associate differently).
    """
    keys = list(key_cols or [])
    if integral_values:
        dv = F.col(value_col).cast("decimal(38,0)")
        stats0 = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.sum(dv).alias("_s"),
            F.sum(dv * dv).alias("_q"),
            F.count("*").alias("_n"))
        mu = F.col("_s").cast("double") / F.col("_n")
        var = F.when(
            F.col("_n") > 1,
            (F.col("_q").cast("double") - mu * mu * F.col("_n"))
            / (F.col("_n") - 1)).otherwise(F.lit(0.0))
        stats = stats0.select(
            *keys, "_n", mu.alias("_mu"),
            F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sd"))
    else:
        stats = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.avg(value_col).alias("_mu"),
            F.coalesce(F.stddev_samp(value_col), F.lit(0.0)).alias("_sd"),
            F.count("*").alias("_n"))
    joined = df.join(F.broadcast(stats), keys) if keys else \
        df.crossJoin(F.broadcast(stats))
    w = (Window.partitionBy(*[F.col(k) for k in keys])
         .orderBy(F.col(ts_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cusum = (F.sum(det_units(F.col(value_col) - F.col("_mu"), det_scale))
             .over(w).cast("double") / float(det_scale))
    band = F.lit(float(threshold_sigmas)) * F.col("_sd") * F.sqrt("_n")
    return joined.select(
        *keys, F.col(ts_col), F.col(value_col),
        F.round(cusum, 6).alias("cusum"),
        F.round(band, 6).alias("band"),
        (F.abs(cusum) > band).alias("exceeds"))


def rfm_scores(df: DataFrame, entity_col: str, ts_col: str,
               amount_col: str, n_tiers: int = 5,
               asof_ts=None, approx: bool = False,
               approx_accuracy: int = 10000) -> DataFrame:
    """RFM segmentation: per entity recency / frequency / monetary plus
    1..``n_tiers`` quantile scores on each dimension.

    Recency is days from the entity's latest activity to ``asof_ts``
    (defaults to the corpus max timestamp, delivered as a broadcast
    1-row aggregate — never a driver collect); frequency is the
    activity count; monetary sums the amount in BIGINT fixed-point
    hundredths (engine-exact). Scores use exact interpolated-percentile
    boundaries over the PER-ENTITY table (one aggregation row,
    broadcast; boundaries rounded to 6 dp so assignment replays across
    engines — same discipline as `equi_depth_histogram`), with higher =
    better: recent, frequent, high-spend entities score ``n_tiers``.

    Shape: one hash agg entity-rollup from the fact table, one
    boundary aggregation over the rollup, one broadcast-assignment
    projection. The fact table is scanned once.

    ``approx``: tier boundaries default to exact ``percentile``,
    whose final aggregator buffers every distinct value of each RFM
    dimension — bounded by |entities| here (a per-entity rollup, one
    or two orders below the fact count, and recency/frequency are
    small-integer-valued), so exact is usually fine; for a
    billion-entity rollup with continuous monetary values pass
    ``approx=True`` (``approx_percentile``, bounded sketch, rank
    error <= 1/``approx_accuracy``) — tier cuts move by at most the
    rank error, the result is then not bit-replayable (opt-in).
    """
    units = F.floor(F.col(amount_col) * 100 + 0.5).cast("bigint")
    per = df.groupBy(F.col(entity_col).alias("entity")).agg(
        F.max(ts_col).alias("_last"),
        F.count("*").alias("frequency"),
        (F.sum(units) / 100.0).alias("monetary"))
    if asof_ts is None:
        asof = F.broadcast(df.agg(F.max(ts_col).alias("_asof")))
        per = per.crossJoin(asof)
    else:
        per = per.withColumn("_asof", F.lit(asof_ts).cast("timestamp"))
    per = per.withColumn(
        "recency_days",
        F.datediff(F.to_date("_asof"), F.to_date("_last"))).drop(
        "_asof", "_last")

    qs = [i / n_tiers for i in range(1, n_tiers)]
    qlist = ", ".join(map(str, qs))

    def _bounds(col: str) -> F.Column:
        pct = (f"approx_percentile({col}, array({qlist}), "
               f"{approx_accuracy})" if approx
               else f"percentile({col}, array({qlist}))")
        return F.transform(F.expr(pct), lambda b: F.round(b, 6))

    bounds = F.broadcast(per.agg(
        _bounds("recency_days").alias("_rb"),
        _bounds("frequency").alias("_fb"),
        _bounds("monetary").alias("_mb")))

    def _tier(col: str, barr: str) -> F.Column:
        return (F.size(F.filter(F.col(barr),
                                lambda b: b < F.col(col))) + 1)

    return (per.crossJoin(bounds)
            .select(
                "entity", "recency_days", "frequency", "monetary",
                # recency inverts: smaller days-since = better score
                (F.lit(n_tiers + 1) - _tier("recency_days", "_rb"))
                .alias("r_score"),
                _tier("frequency", "_fb").alias("f_score"),
                _tier("monetary", "_mb").alias("m_score")))


def ewma_smooth(df: DataFrame, ts_col: str, value_col: str,
                key_cols: list[str] | None = None,
                alpha: float = 0.3, lookback: int = 12,
                out_col: str = "ewma") -> DataFrame:
    """Exponentially weighted moving average in its bounded-window
    form: ewma_i = Σ_{j=0..L} (1-α)^j·x_{i-j} / Σ_{j avail} (1-α)^j.

    This truncates the classic recursion at ``lookback`` terms (the
    dropped tail carries (1-α)^(L+1) of the weight — <1% at the
    defaults), which buys two things the recursive form can't give a
    distributed engine: no sequential dependency (every row computes
    independently from its L predecessors via lag() over ONE window
    spec) and cross-engine replayability (the weights are Python float
    literals baked into both plans; no accumulation ordering exists).
    Leading rows renormalize over the weights actually present. O(L)
    expressions per row, O(1) window state, one Exchange on the keys.
    """
    keys = [F.col(k) for k in (key_cols or [])]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    num = None
    den = None
    for j in range(lookback + 1):
        wj = (1.0 - alpha) ** j
        xj = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        term = F.when(xj.isNotNull(), F.lit(wj) * xj)
        dterm = F.when(xj.isNotNull(), F.lit(wj))
        num = term if num is None else num + F.coalesce(term, F.lit(0.0))
        den = dterm if den is None else den + F.coalesce(dterm, F.lit(0.0))
    # pin_round6, not F.round: the weighted sums of 2dp-unit inputs
    # produce dyadic rationals that can land exactly on .5e-6 ties,
    # which engines' round() conventions resolve differently
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    return df.withColumn(out_col, pin_round6(num / den))


def concentration_metrics(df: DataFrame, key_cols: list[str],
                          value_col: str) -> DataFrame:
    """Per-group market-concentration report: Gini coefficient,
    Herfindahl–Hirschman index, and top-contributor share over a
    positive value column (the "is revenue/volume dominated by a few
    members?" audit — the reference's monitoring analog is manual
    BigQuery share queries).

    One ascending-rank window inside each group feeds the closed-form
    Gini (2·Σ rank·x / (n·Σx) − (n+1)/n — tie order provably cancels,
    so no tiebreak column is needed for determinism) and ONE hash
    aggregation computes n / total / Σrank·x / max / Σx² together;
    HHI = Σ(x/total)², top_share = max/total. O(1) window state, one
    Exchange on the keys, floats rounded to 6.

    Sums keep the value column's native type — pass BIGINT fixed-point
    units for engine-exact totals (double sums of ~1e9 magnitude differ
    across engines at the 6dp grid); the Σx² term is summed as
    DECIMAL(38,0) so it stays exact past int64 without falling back to
    an order-sensitive double sum.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    ranked = df.withColumn("_rk", F.row_number().over(w))
    agg = ranked.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("_tot"),
        F.sum(F.col("_rk") * F.col(value_col)).alias("_rx"),
        F.max(value_col).alias("_mx"),
        # decimal(38,0) squares: the sum-of-squares of unit values is
        # exact and combine-order-independent (a double-product sum
        # drifts in the last ulp with shuffle order); cast BEFORE the
        # multiply so the square itself never rounds
        F.sum(F.col(value_col).cast("decimal(19,0)")
              * F.col(value_col).cast("decimal(19,0)")).alias("_sq"))
    gini = (2.0 * F.col("_rx") / (F.col("n") * F.col("_tot"))
            - (F.col("n") + 1.0) / F.col("n"))
    # pin_round6: share/HHI/Gini are exact integer ratios — the
    # .5e-6-tie class (functions/numeric.py)
    return agg.select(
        *key_cols, "n",
        F.round("_tot", 6).alias("total"),
        _p6(F.col("_mx") / F.col("_tot")).alias("top_share"),
        _p6(F.col("_sq").cast("double")
            / (F.col("_tot").cast("double")
               * F.col("_tot"))).alias("hhi"),
        _p6(gini).alias("gini"))


def survival_curve(df: DataFrame, duration_col: str, event_col: str,
                  key_cols: list[str] | None = None) -> DataFrame:
    """Kaplan–Meier survival estimator (public formula) over
    right-censored durations: one row per distinct duration with
    (n_at_risk, n_events, n_censored, survival), where survival(t) =
    Π_{s<=t} (1 - d_s/n_s) — the time-to-event readout (signup →
    conversion, admission → discharge, install → churn).

    The product reformulates as exp(Σ ln(1-d/n)) so it computes as ONE
    window cumsum over the per-duration rollup (O(distinct durations)
    rows, never raw subjects); a risk set that empties (d=n) pins
    survival to exactly 0.0 from that point by an explicit flag, not
    ln(0). Per-key totals ride back via broadcast. Floats round to 6.
    ``event_col``: 1 = event observed, 0 = censored at that duration.
    """
    keys = [F.col(k) for k in (key_cols or [])]
    kn = list(key_cols or [])
    per = df.groupBy(*keys, F.col(duration_col).alias("duration")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum((F.lit(1) - F.col(event_col)).cast("long"))
        .alias("n_censored"))
    totals = per.groupBy(*keys).agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("_total"))
    joined = (per.join(F.broadcast(totals), kn) if kn
              else per.crossJoin(F.broadcast(totals)))
    wo = Window.partitionBy(*keys).orderBy(F.col("duration"))
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    at_risk = (F.col("_total") - prior).alias("n_at_risk")
    frame = joined.withColumn("n_at_risk", at_risk)
    dead = (F.col("n_events") >= F.col("n_at_risk")).cast("int")
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          det_log_units)
    # ln pinned to the 1e-6 grid (functions/numeric.py "pinned
    # transcendental values"): libm ln may differ in the last ulp
    # across engines; the pin keeps the cumsum addends bit-identical
    ln_term = F.when(
        F.col("n_events") < F.col("n_at_risk"),
        det_log_units(1.0 - F.col("n_events") / F.col("n_at_risk"))
        / F.lit(float(LOG_SCALE))).otherwise(F.lit(0.0))
    # quantize the ln terms before the window cumsum: the frame's
    # addition order is engine-internal (sequential vs segment-tree),
    # so a raw double cumsum can differ in the last ulp across engines;
    # integer units make it exact (functions/numeric.py)
    from pipelines_rj_sms_spark.functions.numeric import (DET_SCALE,
                                                          det_units)
    survival = F.when(F.max(dead).over(wc) == 1, F.lit(0.0)) \
        .otherwise(F.exp(F.sum(det_units(ln_term)).over(wc)
                         .cast("double") / float(DET_SCALE)))
    return frame.select(
        *kn, "duration", "n_at_risk", "n_events", "n_censored",
        F.round(survival, 6).alias("survival"))


def trend_fit(df: DataFrame, x_col: str, y_col: str,
              key_cols: list[str] | None = None) -> DataFrame:
    """Per-group ordinary-least-squares trend line: (n, slope,
    intercept, r2) — "is this metric drifting and how fast?" as a
    closed-form aggregation (the `regr_*` SQL-standard family; both
    Spark and DuckDB implement it JVM/vector-side). ONE hash
    aggregation, no iteration, no driver math; feed it a rollup series
    (e.g. day ordinal vs daily count). Floats round to 6.

    The slope/intercept/r2 come from the normal-equation closed form
    over det-quantized sums (Σx, Σy, Σxy, Σx², Σy²), not the built-in
    regr_* aggregates: those accumulate running co-moments in doubles,
    so their last ulp moves with combine order and disagrees across
    engines; quantized sums are exact and associate freely
    (functions/numeric.py). Same formula, deterministic arithmetic:

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        r2    = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    """
    from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                          det_sum_big)
    keys = [F.col(k) for k in (key_cols or [])]
    y0, x0 = F.col(y_col), F.col(x_col)
    both = x0.isNotNull() & y0.isNotNull()
    x = F.when(both, x0)
    y = F.when(both, y0)
    agg = df.groupBy(*keys).agg(
        F.count(x).alias("n"),
        det_sum(x).alias("_sx"),
        det_sum(y).alias("_sy"),
        det_sum_big(x * y).alias("_sxy"),
        det_sum_big(x * x).alias("_sxx"),
        det_sum_big(y * y).alias("_syy"))
    n = F.col("n").cast("double")
    cov_n = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.when(varx_n != 0, cov_n / varx_n)
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    r2 = F.when((varx_n != 0) & (vary_n != 0),
                cov_n * cov_n / (varx_n * vary_n))
    return agg.select(
        *(key_cols or []),
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"))


def period_over_period(df: DataFrame, ts_col: str, value_col: str,
                       key_cols: list[str] | None = None,
                       lag_periods: int = 1) -> DataFrame:
    """Period-over-period change report over a rollup series: previous
    value at ``lag_periods`` back, absolute delta, and growth ratio
    (null when the base is 0 or missing) — the MoM/YoY reporting shape.
    One lag window per key series, O(1) state; feed it a bucketed
    rollup so rows moved are O(buckets). Ratios round to 6.
    """
    keys = [F.col(k) for k in (key_cols or [])]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    prev = F.lag(value_col, lag_periods).over(w)
    delta = F.col(value_col) - prev
    growth = F.when(prev != 0, delta / prev)
    return df.select(
        *(key_cols or []), ts_col, value_col,
        prev.alias("prev_value"),
        F.round(delta, 6).alias("delta"),
        F.round(growth, 6).alias("growth"))


def seasonal_profile(df: DataFrame, ts_col: str, value_col: str,
                     key_cols: list[str] | None = None,
                     season: str = "dow") -> DataFrame:
    """Seasonality fingerprint of a series: per (keys, season index)
    mean and its deviation from the key's overall mean — "is Monday
    systematically heavier?" / "which hour carries the load?".
    ``season``: ``dow`` (1=Sunday..7, Spark dayofweek convention) or
    ``hour``. Two hash aggregations (season rollup + key rollup), the
    overall mean rides back broadcast on the key. Floats round to 6.
    """
    if season == "dow":
        idx = F.dayofweek(F.col(ts_col)).alias("season_idx")
    elif season == "hour":
        idx = F.hour(F.col(ts_col)).alias("season_idx")
    else:
        raise ValueError(f"season must be dow|hour: {season}")
    from pipelines_rj_sms_spark.functions.numeric import (DET_SCALE,
                                                          LOG_SCALE,
                                                          det_units,
                                                          grid_mean)
    keys = [F.col(k) for k in (key_cols or [])]
    kn = list(key_cols or [])
    # carry quantized BIGINT units through BOTH aggregation levels and
    # round every emitted ratio IN EXACT INTEGER ARITHMETIC
    # (grid_mean): means of fixed-point units are integer rationals
    # that land exactly on .5e-6 rounding ties (tools/tie_audit.py
    # flagged this family at sf0.001), and a double round() resolves
    # those engine-dependently (functions/numeric.py)
    per = df.groupBy(*keys, idx).agg(
        F.sum(det_units(F.col(value_col))).alias("_su"),
        F.count("*").alias("n_obs"))
    overall = per.groupBy(*keys).agg(
        F.sum("_su").cast("decimal(38,0)").alias("_osu"),
        F.sum("n_obs").cast("decimal(38,0)").alias("_on"))
    joined = (per.join(F.broadcast(overall), kn) if kn
              else per.crossJoin(F.broadcast(overall)))
    d38 = "decimal(38,0)"
    fac = DET_SCALE // LOG_SCALE          # unit grid -> 6dp grid
    su = F.col("_su").cast(d38)
    n = F.col("n_obs").cast(d38)
    osu, on = F.col("_osu"), F.col("_on")
    return joined.select(
        *kn, "season_idx", "n_obs",
        grid_mean(su, n * fac).alias("season_mean"),
        grid_mean(osu, on * fac).alias("overall_mean"),
        # mean - omean = (su*on - osu*n) / (DET_SCALE * n * on)
        grid_mean(su * on - osu * n, n * on * fac).alias("deviation"),
        # mean / omean = su*on / (osu*n), rounded at 1e-6 exactly;
        # grid_mean needs a positive denominator, so osu's sign moves
        # to the numerator
        F.when(osu > 0, grid_mean(su * on * LOG_SCALE, osu * n))
        .when(osu < 0, grid_mean(-su * on * LOG_SCALE, -osu * n))
        .alias("seasonal_index"))


def theil_sen_trend(df: DataFrame, x_col: str, y_col: str,
                    key_cols: list[str] | None = None) -> DataFrame:
    """Robust trend per key: the Theil–Sen estimator (median of all
    pairwise slopes, public) — immune to the outliers that drag OLS
    (`trend_fit`) around; the pair's intercept is median(y − slope·x).

    Series-level operator: feed it a ROLLUP (e.g. monthly totals), not
    raw rows — the pairwise self-join on the key is O(buckets²) per
    series by construction (80 months → 3k pairs), never O(data²).
    Exact interpolated medians (same percentile spelling both
    engines), slopes from ties-on-x excluded. Floats round to 6.
    """
    keys = list(key_cols or [])
    a = df.select(*keys, F.col(x_col).alias("_xa"),
                  F.col(y_col).alias("_ya"))
    b = df.select(*keys, F.col(x_col).alias("_xb"),
                  F.col(y_col).alias("_yb"))
    cond = [a[k] == b[k] for k in keys] if keys else []
    pairs = (a.join(b, cond + [a["_xa"] < b["_xb"]]) if keys
             else a.join(b, a["_xa"] < b["_xb"]))
    # drop the duplicated key columns from the right side
    pairs = pairs.select(*[a[k] for k in keys], "_xa", "_ya", "_xb", "_yb")
    slopes = pairs.select(
        *keys,
        ((F.col("_yb") - F.col("_ya"))
         / (F.col("_xb") - F.col("_xa"))).alias("_s"))
    slope = slopes.groupBy(*keys).agg(
        F.expr("percentile(_s, 0.5)").alias("slope"),
        F.count("*").alias("n_pairs"))
    base = df.join(F.broadcast(slope), keys) if keys \
        else df.crossJoin(F.broadcast(slope))
    return (base
            .withColumn("_r", F.col(y_col) - F.col("slope") * F.col(x_col))
            .groupBy(*keys)
            .agg(F.round(F.first("slope"), 6).alias("slope"),
                 F.round(F.expr("percentile(_r, 0.5)"), 6)
                 .alias("intercept"),
                 F.first("n_pairs").cast("bigint").alias("n_pairs")))


def change_decomposition(df: DataFrame, period_col, segment_cols: list[str],
                         value_col: str, period_a, period_b) -> DataFrame:
    """Waterfall decomposition of a metric change: which segments drove
    the move between two periods? Per segment: the value in each
    period, the delta, and its share of the total delta (null share
    when the total didn't move).

    ONE conditional hash aggregation over the two periods' rows
    (never a scan per period), total delta as a broadcast 1-row frame.
    Keep ``value_col`` in BIGINT fixed-point for engine-exact money
    totals. Shares round to 6.
    """
    p = F.col(period_col)
    in_a, in_b = p == F.lit(period_a), p == F.lit(period_b)
    seg = (df.filter(in_a | in_b)
           .groupBy(*[F.col(c) for c in segment_cols])
           .agg(F.sum(F.when(in_a, F.col(value_col))
                      .otherwise(F.lit(0))).alias("value_a"),
                F.sum(F.when(in_b, F.col(value_col))
                      .otherwise(F.lit(0))).alias("value_b")))
    seg = seg.withColumn("delta", F.col("value_b") - F.col("value_a"))
    total = F.broadcast(seg.agg(F.sum("delta").alias("_td")))
    return (seg.crossJoin(total)
            .select(*segment_cols, "value_a", "value_b", "delta",
                    F.round(F.when(F.col("_td") != 0,
                                   F.col("delta") / F.col("_td")), 6)
                    .alias("share_of_change")))


def standardized_rates(df: DataFrame, strata_col: str,
                       event_pred: Column,
                       std_weights: dict[str, float],
                       reference_rates: dict[str, float] | None = None,
                       per: float = 1000.0) -> DataFrame:
    """Direct (and optionally indirect) standardization of an event
    rate across strata — the classic epidemiology comparison statistic
    (a health secretariat compares districts/periods with different
    age structures; crude rates mislead, standardized ones don't).
    Public formulas:

    - crude        = total events / total n, per ``per``
    - direct (DSR) = Σ w_s · rate_s / Σ w_s — the rate the population
      WOULD have under the standard weights ``std_weights``
    - indirect SMR = observed / expected, expected = Σ n_s · ref_s,
      when per-stratum ``reference_rates`` are supplied (the
      small-strata-robust alternative)

    One hash aggregation over the rows (events and n per stratum in
    the same pass) collapses the data to |strata| rows; weights and
    reference rates enter as literal CASE chains over that tiny frame,
    and a second |strata|-row aggregation emits the statistic — no
    joins, no second data scan. Strata
    missing from ``std_weights`` contribute only to the crude rate
    (documented epi convention: the standard population defines the
    standardization domain). Returns ONE row: (n_total, events_total,
    crude_rate, dsr[, smr]) rounded to 6.
    """
    ev = event_pred.cast("int")
    per_stratum = (df.groupBy(F.col(strata_col).alias("_s"))
                   .agg(F.count("*").alias("_n"),
                        F.sum(ev).alias("_ev")))
    wcol = F.lit(None).cast("double")
    for k, v in std_weights.items():
        wcol = F.when(F.col("_s") == k, F.lit(float(v))).otherwise(wcol)
    refcol = F.lit(None).cast("double")
    for k, v in (reference_rates or {}).items():
        refcol = F.when(F.col("_s") == k,
                        F.lit(float(v))).otherwise(refcol)
    enriched = per_stratum.select(
        "_s", "_n", "_ev", wcol.alias("_w"),
        refcol.alias("_ref") if reference_rates else
        F.lit(None).cast("double").alias("_ref"))
    # pin_round6, not F.round: crude_rate is an exact integer ratio
    # (the .5e-6-tie class) and dsr/smr ride mirrored det-sum doubles
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    out = enriched.agg(
        F.sum("_n").alias("n_total"),
        F.sum("_ev").alias("events_total"),
        pin_round6(F.lit(per) * F.sum("_ev") / F.sum("_n"))
        .alias("crude_rate"),
        # det_sum on the weighted-rate terms: per-stratum doubles whose
        # combine order must not move the 6dp result
        pin_round6(F.lit(per)
                   * det_sum(F.col("_w") * F.col("_ev") / F.col("_n"))
                   / det_sum(F.col("_w"))).alias("dsr"),
        *([pin_round6(
            F.sum("_ev")
            / det_sum(F.col("_n") * F.col("_ref") / F.lit(per)))
           .alias("smr")] if reference_rates else []))
    return out


def mann_kendall_test(df: DataFrame, x_col: str, y_col: str,
                      key_cols: list[str] | None = None) -> DataFrame:
    """Mann–Kendall monotonic-trend TEST per key — the significance
    half of the robust-trend pair (`theil_sen_trend` estimates the
    slope; this says whether a monotonic trend exists at all), the
    standard nonparametric choice for environmental/epi series (public
    method):

        S      = Σ_{i<j} sign(y_j − y_i)          (ordered by x)
        var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
                 (t = sizes of tied-y groups)
        z      = (S∓1)/√var(S)   (continuity-corrected, 0 when S=0)

    Series-level operator like theil_sen_trend: feed a ROLLUP — the
    pairwise self-join is O(buckets²) per key by construction. S and
    the tie correction are INTEGER sums (exact, order-free); only the
    final z touches floats. Ties on x are excluded from pairs (the
    standard treatment when x is a strictly-ordering time axis; equal
    x carries no order information). Returns (keys..., n, s_stat,
    var_s, z) with var/z rounded to 6.
    """
    keys = list(key_cols or [])
    a = df.select(*keys, F.col(x_col).alias("_xa"),
                  F.col(y_col).alias("_ya"))
    b = df.select(*keys, F.col(x_col).alias("_xb"),
                  F.col(y_col).alias("_yb"))
    cond = [a[k] == b[k] for k in keys] if keys else []
    pairs = (a.join(b, cond + [a["_xa"] < b["_xb"]]) if keys
             else a.join(b, a["_xa"] < b["_xb"]))
    pairs = pairs.select(*[a[k] for k in keys], "_ya", "_yb")
    s = pairs.groupBy(*keys).agg(
        F.sum(F.signum(F.col("_yb") - F.col("_ya")).cast("long"))
        .alias("s_stat"))
    n = df.groupBy(*keys).agg(F.count("*").alias("n"))
    t = F.col("_t").cast("double")
    ties = (df.groupBy(*keys, F.col(y_col).alias("_y"))
            .agg(F.count("*").alias("_t"))
            .filter(F.col("_t") > 1)
            .groupBy(*keys)
            .agg(F.sum(t * (t - 1) * (2 * t + 5)).alias("_tc")))
    nn = F.col("n").cast("double")
    var_s = (nn * (nn - 1) * (2 * nn + 5)
             - F.coalesce(F.col("_tc"), F.lit(0.0))) / 18.0
    sgn = F.col("s_stat")
    z = F.when(sgn > 0, (sgn - 1) / F.sqrt(var_s)) \
        .when(sgn < 0, (sgn + 1) / F.sqrt(var_s)) \
        .otherwise(F.lit(0.0))
    out = (n.join(s, keys) if keys else n.crossJoin(s))
    out = (out.join(ties, keys, "left") if keys
           else out.crossJoin(ties.select(F.col("_tc"))))
    return out.select(
        *keys, "n", "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(F.when(var_s > 0, z).otherwise(F.lit(0.0)), 6)
        .alias("z"))


def log_rank_test(df: DataFrame, duration_col: str, event_col: str,
                  group_col: str, group_a, group_b) -> DataFrame:
    """Log-rank test between two survival curves — the significance
    companion to :func:`survival_curve` (public formula): at every
    event time t, group A's observed deaths are compared with the
    hypergeometric expectation d_t·nA_t/n_t given the pooled risk set;

        z = (O − E) / sqrt(V),   chi2 = z²,
        V = Σ d_t·nA_t·(n_t−nA_t)·(n_t−d_t) / (n_t²·(n_t−1))

    Scale shape: subjects collapse to a per-(duration) pivoted rollup
    (dA, cA, dB, cB) in one hash aggregation; risk sets are cumulative
    windows OVER THE COLLAPSED duration table (never the subjects);
    every count is an exact integer, the per-time E and V terms are
    single double expressions over those integers, and the three
    totals accumulate det-quantized (1e-6 units) in DECIMAL so the
    one-row output is order-independent. Output: (n_a, n_b,
    observed_a, expected_a, chi2, z_stat), floats rounded to 6.
    ``event_col``: 1 = event observed, 0 = right-censored.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_units

    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    ev = F.col(event_col).cast("long")
    per = (df.filter(in_a | in_b)
           .groupBy(F.col(duration_col).alias("_t"))
           .agg(F.sum(F.when(in_a, ev).otherwise(0)).alias("_da"),
                F.sum(F.when(in_a, 1 - ev).otherwise(0)).alias("_ca"),
                F.sum(F.when(in_b, ev).otherwise(0)).alias("_db"),
                F.sum(F.when(in_b, 1 - ev).otherwise(0)).alias("_cb")))
    # distributed prefix sums over the duration support; exclusive
    # prior = inclusive cum − own row, totals = broadcast last cums —
    # no SinglePartition exchange (operators/ids.global_cumsum)
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_cumsum
    cc = global_cumsum(
        per.withColumn("_ga", F.col("_da") + F.col("_ca"))
        .withColumn("_gb", F.col("_db") + F.col("_cb")),
        ["_t"], ["_ga", "_gb"])
    tots = F.broadcast(cc.agg(F.max("_cum__ga").alias("_ta0"),
                              F.max("_cum__gb").alias("_tb0")))
    prior_a = F.col("_cum__ga") - F.col("_ga")
    prior_b = F.col("_cum__gb") - F.col("_gb")
    frame = cc.crossJoin(tots).select(
        "_da", "_db",
        F.col("_ta0").alias("_ta"), F.col("_tb0").alias("_tb"),
        (F.col("_ta0") - prior_a).alias("_na"),
        (F.col("_ta0") - prior_a + F.col("_tb0") - prior_b)
        .alias("_n"))
    d = F.col("_da") + F.col("_db")
    na, n = F.col("_na"), F.col("_n")
    e_term = F.when(d > 0, d * na / n)
    v_term = F.when((d > 0) & (n > 1),
                    d * na / n * (n - na) / n * (n - d) / (n - 1))
    scale = 1_000_000
    d38 = "decimal(38,0)"
    agg = frame.agg(
        F.max("_ta").cast("bigint").alias("n_a"),
        F.max("_tb").cast("bigint").alias("n_b"),
        F.sum("_da").cast("bigint").alias("observed_a"),
        (F.sum(det_units(e_term, scale).cast(d38)).cast("double")
         / F.lit(float(scale))).alias("_e"),
        (F.sum(det_units(v_term, scale).cast(d38)).cast("double")
         / F.lit(float(scale))).alias("_v"))
    z = F.when(F.col("_v") > 0,
               (F.col("observed_a") - F.col("_e")) / F.sqrt("_v"))
    return track(agg.select(
        "n_a", "n_b", "observed_a",
        F.round("_e", 6).alias("expected_a"),
        F.round(z * z, 6).alias("chi2"),
        F.round(z, 6).alias("z_stat")), cc)


def markov_transitions(df: DataFrame, seq_col: str, state_col: str,
                       order_cols: list[str],
                       alpha: float = 1.0) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences — the sequence-model companion to :func:`funnel_stages`
    (the reference's monitoring flows count step completions; the
    transition matrix is the full next-step model those counts sample —
    public textbook method).

    Each sequence (one per ``seq_col`` value, ordered by
    ``order_cols`` — include a unique id as the last tiebreak column
    so ordering is total) contributes (state_t → state_{t+1}) pairs;
    transitions never cross sequence boundaries. Probabilities are
    Laplace-smoothed over the observed state space K (states appearing
    as src or dst anywhere):

        p(dst|src) = (cnt + alpha) / (src_total + alpha*K)

    Scale shape: ONE window pass over the event table partitioned by
    sequence key (the same shuffle a sessionize does), then every
    later step runs on the COLLAPSED (src,dst) rollup — at most K²
    rows no matter how many events. K itself is a 1-row aggregate of
    the collapsed state list, broadcast-joined back (the standard
    scalar-subquery plan; build side is exactly one row). Counts are
    exact integers; the probability is a single double division —
    deterministic under any partitioning. Returns (src_state,
    dst_state, cnt, src_total, prob) with prob rounded to 6.
    """
    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    pairs = (df.select(F.col(state_col).alias("src_state"),
                       F.lead(state_col).over(w).alias("dst_state"))
             .filter(F.col("dst_state").isNotNull()))
    rollup = (pairs.groupBy("src_state", "dst_state")
              .agg(F.count("*").alias("cnt")))
    wsrc = Window.partitionBy("src_state")
    rollup = rollup.withColumn(
        "src_total", F.sum("cnt").over(wsrc))
    states = (rollup.select(F.col("src_state").alias("_s"))
              .union(rollup.select(F.col("dst_state").alias("_s")))
              .distinct().agg(F.count("*").alias("_k")))
    a = float(alpha)
    out = rollup.join(F.broadcast(states))
    prob = ((F.col("cnt").cast("double") + F.lit(a))
            / (F.col("src_total").cast("double")
               + F.lit(a) * F.col("_k").cast("double")))
    return out.select(
        "src_state", "dst_state", "cnt",
        F.col("src_total").cast("bigint").alias("src_total"),
        F.round(prob, 6).alias("prob"))


def gini_coefficient(df: DataFrame, units_col: str,
                     key_cols: list[str] | None = None) -> DataFrame:
    """Gini concentration coefficient per key over NON-NEGATIVE
    integer-unit values (callers quantize doubles to fixed-point units
    first — the det_sum convention) — the inequality companion to the
    HHI in :func:`market_concentration` (public formula):

        G = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ),  x ascending, i=1..n

    Scale shape: the facts collapse to the (key, units, count) value
    support in one hash aggregation; the rank-sum runs over that
    COLLAPSED support (the rank-statistics posture used by the
    Spearman/KS/MWU suite). A group of c ties at cumulative position
    ``base`` contributes x·(c·base + c(c+1)/2) to Σ i·xᵢ — integer
    arithmetic throughout, accumulated in DECIMAL(38,0) so position ×
    magnitude survives billion-row groups; the single final division
    is the only float op. Ties need no tiebreak: Σ i·xᵢ is invariant
    under permutations within equal x. Returns (keys..., n, sum_units,
    gini) with gini rounded to 6; NULL gini when the key has no mass
    (Σx = 0) or a single row.
    """
    keys = list(key_cols or [])
    d38 = "decimal(38,0)"
    sup = (df.groupBy(*keys, F.col(units_col).alias("_x"))
           .agg(F.count("*").alias("_c")))
    w = (Window.partitionBy(*keys).orderBy("_x")
         .rowsBetween(Window.unboundedPreceding, -1))
    base = F.coalesce(F.sum("_c").over(w), F.lit(0)).cast(d38)
    cdec = F.col("_c").cast(d38)
    # c(c+1) is always even: integer div is exact, stays scale-0 LONG
    # (c ≤ ~3e9 ties per value before c(c+1) nears the LONG bound)
    pos_mass = cdec * base + F.expr("_c * (_c + 1) div 2").cast(d38)
    sup = sup.select(
        *keys, "_x", "_c",
        (F.col("_x").cast(d38) * pos_mass).cast(d38).alias("_rx"))
    agg = sup.groupBy(*keys).agg(
        F.sum("_c").alias("n"),
        F.sum(F.col("_x").cast(d38) * F.col("_c").cast(d38))
        .cast(d38).alias("sum_units"),
        F.sum("_rx").cast(d38).alias("_r"))
    n = F.col("n").cast(d38)
    s = F.col("sum_units")
    num = (F.lit(2).cast(d38) * F.col("_r")
           - (n + 1) * s).cast("double")
    den = (n * s).cast("double")
    return agg.select(
        *keys, F.col("n").cast("bigint").alias("n"),
        F.col("sum_units").cast("double").alias("sum_units"),
        F.round(F.when((F.col("n") > 1) & (s > 0), num / den), 6)
        .alias("gini"))


def nelson_aalen(df: DataFrame, duration_col: str, event_col: str,
                 key_cols: list[str] | None = None) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — the additive
    companion to :func:`survival_curve` (KM multiplies survival
    fractions; NA sums the hazard increments d/n, the better-behaved
    quantity for comparing cumulative risk between cohorts and the
    basis of the log-rank expectation; public formula):

        H(t) = Σ_{s≤t} d_s/n_s,     Var(t) = Σ_{s≤t} d_s/n_s²

    Identical scale shape to the KM curve: subjects collapse to the
    per-duration rollup once, risk sets are cumulative windows over
    that collapsed frame, and both running sums accumulate
    det-quantized (the d/n terms are data-dependent doubles; integer
    units make the window cumsum engine- and order-exact). Returns
    one row per distinct duration (keys..., duration, n_at_risk,
    n_events, n_censored, cum_hazard, hazard_se) rounded to 6.
    ``event_col``: 1 = event observed, 0 = right-censored.
    """
    from pipelines_rj_sms_spark.functions.numeric import (DET_SCALE,
                                                          det_units)

    keys = [F.col(k) for k in (key_cols or [])]
    kn = list(key_cols or [])
    per = df.groupBy(*keys, F.col(duration_col).alias("duration")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum((F.lit(1) - F.col(event_col)).cast("long"))
        .alias("n_censored"))
    totals = per.groupBy(*keys).agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("_total"))
    joined = (per.join(F.broadcast(totals), kn) if kn
              else per.crossJoin(F.broadcast(totals)))
    wo = Window.partitionBy(*keys).orderBy(F.col("duration"))
    prior = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    frame = joined.withColumn("n_at_risk",
                              F.col("_total") - prior)
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    nr = F.col("n_at_risk").cast("double")
    h_term = F.when(F.col("n_at_risk") > 0,
                    F.col("n_events").cast("double") / nr) \
        .otherwise(F.lit(0.0))
    v_term = F.when(F.col("n_at_risk") > 0,
                    F.col("n_events").cast("double") / (nr * nr)) \
        .otherwise(F.lit(0.0))
    cum_h = (F.sum(det_units(h_term)).over(wc).cast("double")
             / float(DET_SCALE))
    cum_v = (F.sum(det_units(v_term)).over(wc).cast("double")
             / float(DET_SCALE))
    return frame.select(
        *kn, "duration", "n_at_risk", "n_events", "n_censored",
        F.round(cum_h, 6).alias("cum_hazard"),
        F.round(F.sqrt(cum_v), 6).alias("hazard_se"))


def gumbel_block_maxima(df: DataFrame, block_col: str, units_col: str,
                        return_period: int = 12) -> DataFrame:
    """Gumbel (EV-I) fit to block maxima by the method of moments —
    the capacity-planning readout ("how big is the once-a-year worst
    day?") for any bursty series (public formulas):

        β̂ = s·√6/π,   μ̂ = x̄ − γ·β̂   (γ = Euler-Mascheroni)
        return level x_T = μ̂ − β̂·ln(−ln(1 − 1/T))

    Pipeline: one hash agg to per-block integer maxima (max is
    order-free), one DECIMAL(38,0) moment agg over the ≤#blocks rows
    (x̄ and sample s are fixed double expressions over exact
    integers), closed-form everything — no sorting, no iteration.
    One row: (n_blocks, mean_max, beta, mu, return_level) @6dp;
    NULL fit when fewer than 2 blocks or zero variance.
    """
    d38 = "decimal(38,0)"
    mx = (df.groupBy(F.col(block_col))
          .agg(F.max(F.col(units_col)).alias("_m")))
    u = F.col("_m").cast(d38)
    agg = mx.agg(F.count("*").alias("_nb"),
                 F.sum(u).cast(d38).alias("_s"),
                 F.sum((u * u).cast(d38)).cast(d38).alias("_q"))
    n = F.col("_nb").cast(d38)
    mean = F.col("_s").cast("double") / F.col("_nb").cast("double")
    svar = ((n * F.col("_q") - F.col("_s") * F.col("_s"))
            .cast("double") / (n * (n - 1)).cast("double"))
    ok = (F.col("_nb") > 1) & (svar > 0)
    beta = F.sqrt(svar) * (F.sqrt(F.lit(6.0))
                           / F.lit(3.141592653589793))
    mu = mean - F.lit(0.5772156649015329) * beta
    t = float(return_period)
    rl = mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / F.lit(t)))
    # grid_mean / pin_round6, not F.round: mean_max = s/nb is an
    # integer ratio that lands exactly on .5e-6 rounding ties
    # (tools/tie_audit.py flagged it at sf0.001), and the float
    # mu/beta chain inherits the boundary — engines' round()
    # conventions can split there
    from pipelines_rj_sms_spark.functions.numeric import (grid_mean,
                                                          pin_round6)
    return agg.select(
        F.col("_nb").cast("bigint").alias("n_blocks"),
        grid_mean(F.col("_s") * 1_000_000, F.col("_nb"))
        .alias("mean_max"),
        pin_round6(F.when(ok, beta)).alias("beta"),
        pin_round6(F.when(ok, mu)).alias("mu"),
        pin_round6(F.when(ok, rl)).alias("return_level"))


def restricted_mean_survival(df: DataFrame, duration_col: str,
                             event_col: str) -> DataFrame:
    """Restricted mean survival time (RMST) to the last observed
    duration τ — the area under the Kaplan-Meier step curve, i.e.
    "expected event-free days within the window" (public formula;
    the single-number summary hazard ratios can't give when curves
    cross). Composes `survival_curve`:

        RMST = Σ_i S(t_{i−1})·(t_i − t_{i−1}),  t_0 = 0, S(0) = 1

    One lag window over the ≤|distinct durations| K-M rollup; the
    addends (6dp-pinned survival × integer day gaps) det-quantize so
    the final sum is combine-order-free. One row:
    (n_durations, tau, rmst) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    km = survival_curve(df, duration_col, event_col)
    # distributed lag over the K-M rollup (operators/ids.global_shift)
    # — no SinglePartition global-sort window
    from pipelines_rj_sms_spark.operators.cache import track
    from pipelines_rj_sms_spark.operators.ids import global_shift
    km = global_shift(km, ["duration"], ["survival", "duration"],
                      offset=-1)
    sp = F.coalesce(F.col("_lag_survival"), F.lit(1.0))
    tp = F.coalesce(F.col("_lag_duration"), F.lit(0))
    addend = sp * (F.col("duration") - tp).cast("double")
    return track(
        km.select("duration", addend.alias("_a"))
        .agg(F.count("*").cast("bigint").alias("n_durations"),
             F.max("duration").cast("bigint").alias("tau"),
             F.round(det_sum(F.col("_a")), 6).alias("rmst")), km)


def loglog_elasticity(df: DataFrame, qty_col: str, price_col: str,
                      key_cols: list[str] | None = None) -> DataFrame:
    """Per-key log-log price elasticity of demand (public formula):
    the OLS slope of ln(quantity) on ln(unit price) — "a 1% price
    increase moves volume by ε%", the pricing readout behind every
    revenue-optimization dashboard.

        ε = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²),
        x = ln(price), y = ln(qty);  plus r² for fit quality.

    Positive-value rows only (logs must exist). The ln values are
    fixed IEEE expressions; all five moments det-quantize (addends
    are |ln|²-bounded — tiny), so slope/r² are combine-order-free.
    One hash aggregation per key. Returns (keys..., n, elasticity,
    r_squared) @6dp; NULL when var(x) or var(y) is 0.
    """
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          det_log_units,
                                                          det_sum)

    keys = list(key_cols or [])
    ok = (F.col(qty_col) > 0) & (F.col(price_col) > 0)
    # ln pinned to the 1e-6 grid: the moments det-sum ~n ln-products
    # where a cross-engine libm ulp would be amplified by the 1e9
    # quantizer (functions/numeric.py "pinned transcendental values")
    x = (det_log_units(F.col(price_col).cast("double"))
         / F.lit(float(LOG_SCALE)))
    y = (det_log_units(F.col(qty_col).cast("double"))
         / F.lit(float(LOG_SCALE)))
    agg = (df.filter(ok).groupBy(*keys).agg(
        F.count("*").alias("n"),
        det_sum(x).alias("_sx"), det_sum(y).alias("_sy"),
        det_sum(x * x).alias("_sxx"), det_sum(y * y).alias("_syy"),
        det_sum(x * y).alias("_sxy")))
    nd = F.col("n").cast("double")
    cov = nd * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = nd * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = nd * F.col("_syy") - F.col("_sy") * F.col("_sy")
    good = (vx > 0) & (vy > 0)
    return agg.select(
        *keys, F.col("n").cast("bigint").alias("n"),
        F.round(F.when(good, cov / vx), 6).alias("elasticity"),
        F.round(F.when(good, cov * cov / (vx * vy)), 6)
        .alias("r_squared"))


def price_indexes(df: DataFrame, period_col: str, item_col: str,
                  price_units: str, qty_units: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indexes per period vs the
    FIRST period (public formulas) — "how much did the same basket
    inflate", the economics-grade alternative to a naive average-price
    trend (which confuses mix shift with price change):

        L_t = Σ p_t·q_0 / Σ p_0·q_0     (base-period basket)
        P_t = Σ p_t·q_t / Σ p_0·q_t     (current basket)
        F_t = √(L_t·P_t)

    Inputs are integer-unit price/qty fact columns; per-(period, item)
    unit prices are exact integer ratios (Σprice_units/Σqty_units);
    the base period rides back as a broadcast item join (items absent
    from the base drop — the matched-basket rule); basket sums
    det-quantize at 1e-6 units (p·q addends overflow the default
    1e-9 capacity). One row per period: (period, n_items, laspeyres,
    paasche, fisher) @6dp, base period = 1 by construction.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    scale = 1_000_000
    per = (df.groupBy(F.col(period_col).alias("_per"),
                      F.col(item_col).alias("_it"))
           .agg(F.sum(F.col(price_units)).alias("_sp"),
                F.sum(F.col(qty_units)).alias("_sq"))
           .filter(F.col("_sq") > 0))
    base_per = F.broadcast(per.agg(F.min("_per").alias("_b")))
    base = (per.crossJoin(base_per)
            .filter(F.col("_per") == F.col("_b"))
            .select(F.col("_it"),
                    (F.col("_sp").cast("double")
                     / F.col("_sq").cast("double")).alias("_p0"),
                    F.col("_sq").cast("double").alias("_q0")))
    j = per.join(F.broadcast(base), "_it")
    pt = F.col("_sp").cast("double") / F.col("_sq").cast("double")
    qt = F.col("_sq").cast("double")
    agg = j.groupBy("_per").agg(
        F.count("*").alias("n_items"),
        det_sum(pt * F.col("_q0"), scale).alias("_l_num"),
        det_sum(F.col("_p0") * F.col("_q0"), scale).alias("_l_den"),
        det_sum(pt * qt, scale).alias("_p_num"),
        det_sum(F.col("_p0") * qt, scale).alias("_p_den"))
    lasp = F.when(F.col("_l_den") > 0,
                  F.col("_l_num") / F.col("_l_den"))
    paas = F.when(F.col("_p_den") > 0,
                  F.col("_p_num") / F.col("_p_den"))
    return agg.select(
        F.col("_per").alias("period"),
        F.col("n_items").cast("bigint").alias("n_items"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"))


def cohort_ltv_curve(df: DataFrame, user_col: str, ts_col: str,
                     value_units: str) -> DataFrame:
    """Cohort lifetime-value curve: users bucketed by first-activity
    month, CUMULATIVE value per cohort member by month age — the
    "how much is a January signup worth by month 3" readout that
    retention counts alone can't give (public construction).

    Integer month arithmetic (year·12+month) keeps cohorts/ages
    engine-exact; per-(cohort, age) value sums are exact integer
    units; cohort sizes ride back on a broadcast; the cumulative sum
    runs over the COLLAPSED (cohort, age) grid. Returns one row per
    (cohort_month, month_age): (cohort_size, period_value,
    cum_value_per_user) @6dp.
    """
    period = (F.year(F.col(ts_col)) * 12
              + F.month(F.col(ts_col)) - 1).alias("_p")
    base = df.select(F.col(user_col).alias("_u"), period,
                     F.col(value_units).alias("_v"))
    cohorts = base.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    sizes = cohorts.groupBy("_cohort").agg(
        F.count("*").alias("_size"))
    per = (base.join(cohorts, "_u")
           .groupBy("_cohort",
                    (F.col("_p") - F.col("_cohort")).alias("_age"))
           .agg(F.sum("_v").alias("_val")))
    w = (Window.partitionBy("_cohort").orderBy("_age")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (per.join(F.broadcast(sizes), "_cohort")
           .withColumn("_cum", F.sum("_val").over(w)))
    return out.select(
        F.col("_cohort").cast("bigint").alias("cohort_month"),
        F.col("_age").cast("int").alias("month_age"),
        F.col("_size").cast("bigint").alias("cohort_size"),
        F.col("_val").cast("bigint").alias("period_value"),
        F.round(F.col("_cum").cast("double")
                / F.col("_size").cast("double"), 6)
        .alias("cum_value_per_user"))


def markov_entropy_rate(df: DataFrame, seq_col: str, state_col: str,
                        order_cols: list[str]) -> DataFrame:
    """Empirical entropy rate of the first-order Markov chain over
    per-key event sequences (public formula) — "how predictable is
    the next event given the current one", the single-number summary
    of the `markov_transitions` matrix:

        H_rate = −Σ_ij (n_ij/N)·ln(n_ij/n_i·)
        H_marg = −Σ_i (n_i·/N)·ln(n_i·/N)
        predictability = 1 − H_rate/H_marg

    (H_rate ≤ H_marg always; equality = next state independent of
    current.) Same windowed pair construction as the transition
    matrix; everything after runs on the ≤K² collapsed rollup with
    exact integer rationals inside the ln and det-summed ≤K²
    addends. One row: (n_transitions, n_states, entropy_rate,
    marginal_entropy, predictability) @6dp.
    """
    from pipelines_rj_sms_spark.functions.numeric import (LOG_SCALE,
                                                          det_log_units,
                                                          det_sum)

    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    pairs = (df.select(F.col(state_col).alias("_src"),
                       F.lead(state_col).over(w).alias("_dst"))
             .filter(F.col("_dst").isNotNull()))
    rollup = (pairs.groupBy("_src", "_dst")
              .agg(F.count("*").alias("_c")))
    wsrc = Window.partitionBy("_src")
    wall = Window.partitionBy(F.lit(1))
    rollup = (rollup
              .withColumn("_st", F.sum("_c").over(wsrc))
              .withColumn("_n", F.sum("_c").over(wall)))
    cd = F.col("_c").cast("double")
    std = F.col("_st").cast("double")
    nd = F.col("_n").cast("double")
    # ln pinned to the 1e-6 grid before the probability multiply
    # (functions/numeric.py "pinned transcendental values")
    rate_add = (cd / nd) * (det_log_units(cd / std)
                            / F.lit(float(LOG_SCALE)))
    agg = rollup.agg(
        F.max("_n").alias("n_transitions"),
        F.count_distinct("_src").alias("_ks"),
        det_sum(rate_add).alias("_hr"))
    srcs = (rollup.groupBy("_src")
            .agg(F.max("_st").alias("_st2"), F.max("_n").alias("_n2")))
    sd2 = F.col("_st2").cast("double")
    nd2 = F.col("_n2").cast("double")
    marg = F.broadcast(srcs.agg(
        det_sum((sd2 / nd2) * (det_log_units(sd2 / nd2)
                               / F.lit(float(LOG_SCALE)))).alias("_hm")))
    out = agg.crossJoin(marg)
    hr = -F.col("_hr")
    hm = -F.col("_hm")
    return out.select(
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.col("_ks").cast("int").alias("n_states"),
        F.round(hr, 6).alias("entropy_rate"),
        F.round(hm, 6).alias("marginal_entropy"),
        F.round(F.when(hm > 0, F.lit(1.0) - hr / hm), 6)
        .alias("predictability"))
