"""Time-series joins: as-of and range, shuffle-minimal by construction.

The reference has no as-of/range joins (SURVEY §2.4 lists them as
stretch), but any event-log lakehouse needs them, and the naive Spark
spelling — a non-equi join condition — degenerates to a broadcast
nested-loop / cartesian product that cannot survive 100 TB. Both
operators here reduce to ONE hash shuffle on the join key:

- ``asof_join``: the union+window trick. Tag left/right rows, union,
  sort within each key partition by time, and carry the last-seen right
  payload forward with an unbounded-preceding window. Cost = one
  shuffle + one in-partition sort — the same plan shape a sort-merge
  join would produce, with no O(n·m) pair enumeration.
- ``range_join_bucketed``: quantize time into fixed buckets; points get
  their single covering bucket, intervals explode to every bucket they
  overlap, then an *equi* join on (key, bucket) + an exact residual
  filter. This is the standard bucketed-range-join rewrite (Databricks
  exposes it as a hint); pair enumeration is bounded per bucket instead
  of per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.numeric import det_sum

_TS, _SIDE, _LPAY, _RPAY, _MATCH, _BKT = (
    "__asof_ts", "__asof_is_left", "__asof_l", "__asof_r", "__asof_match",
    "__range_bucket")


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward",
              tolerance_seconds: int | None = None,
              right_prefix: str = "") -> DataFrame:
    """Left as-of join: for each left row, the single right row (same
    key) with the greatest ``right_ts <= left_ts`` (``backward``) or the
    least ``right_ts >= left_ts`` (``forward``); inclusive, LEFT-outer
    (unmatched left rows keep nulls). Matches DuckDB
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`` semantics.

    ``tolerance_seconds`` voids matches farther than the tolerance.
    Right-side columns (minus keys) are emitted with ``right_prefix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    rcols = [c for c in right.columns if c not in keys]

    l2 = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LPAY),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias(_RPAY),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(
            left.select(F.struct("*").alias("s")).schema["s"].dataType
        ).alias(_LPAY),
        F.struct(*[F.col(c) for c in rcols]).alias(_RPAY),
    )

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    # at equal ts the right row must sort before the left row so the
    # inclusive (<= / >=) match is visible to the window
    w = (Window.partitionBy(*keys).orderBy(ts_order, F.col(_SIDE).asc())
         .rowsBetween(Window.unboundedPreceding, 0))

    u = l2.unionByName(r2).withColumn(_MATCH, F.last(_RPAY, ignorenulls=True).over(w))
    out = u.filter(F.col(_SIDE) == 1)

    match = F.col(_MATCH)
    if tolerance_seconds is not None:
        gap = F.abs(F.col(_TS).cast("double") - match[right_ts].cast("double"))
        match = F.when(gap <= float(tolerance_seconds), match)

    return out.select(
        *[F.col(f"{_LPAY}.{c}").alias(c) for c in left.columns],
        *[match[c].alias(f"{right_prefix}{c}") for c in rcols],
    )


def downsample_ohlc(df: DataFrame, ts_col: str, value_col: str,
                    keys: list[str] | None = None,
                    interval: str = "1 hour") -> DataFrame:
    """Hypertable-style rollup: per (keys, time bucket) emit
    open/high/low/close/n/mean of ``value_col``.

    open/close are ``min_by``/``max_by`` on the timestamp — a single
    hash aggregation (partial + final, map-side combine free), no
    window, no self-join. At 100 TB this is the only shape that works:
    one shuffle keyed on (keys, bucket), state bounded per group. The
    reference's freshness/monitoring rollups (SURVEY A3/Q3,
    reports/monitoramento_hci/tasks.py:34-63) are the 1-bucket special
    case of this operator.

    Ties on the timestamp make open/close nondeterministic (same as
    DuckDB ``arg_min``); callers with tie-prone data should pass a
    composite ``ts_col`` expression instead.
    """
    keys = keys or []
    bucket = F.window(F.col(ts_col), interval)
    return (
        df.groupBy(bucket.alias("__w"), *keys)
        .agg(
            F.min_by(value_col, ts_col).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ts_col).alias("close"),
            F.count("*").alias("n"),
            (F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
             / F.count("*")).alias("mean_value"),
        )
        .select(F.col("__w.start").alias("bucket_start"), *keys,
                "open", "high", "low", "close", "n", "mean_value")
    )


def gap_fill(df: DataFrame, bucket_col: str,
             keys: list[str] | None = None,
             step: str = "interval 1 hour",
             fill: dict[str, object] | None = None) -> DataFrame:
    """Densify a (possibly downsampled) series: emit one row per key per
    time step between each key's min and max bucket, carrying observed
    rows through and filling the gaps' value columns from ``fill``
    (default null).

    The bucket spine is `sequence()+explode` per key — generated
    distributed, sized by each key's own span (not the global min/max,
    which would explode sparse keys' row counts) — then a left join
    back on (keys, bucket). Two shuffles total (the groupBy and the
    join share the key partitioning under AQE).
    """
    keys = keys or []
    fill = fill or {}
    spine = (
        df.groupBy(*keys).agg(
            F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(*keys,
                F.explode(F.sequence("_lo", "_hi", F.expr(step)))
                .alias(bucket_col))
    )
    out = spine.join(df, keys + [bucket_col], "left")
    for c, v in fill.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def range_join_bucketed(points: DataFrame, intervals: DataFrame,
                        point_ts: str, start_col: str, end_col: str,
                        on: str | list[str] | None = None,
                        bucket_seconds: int = 3600,
                        how: str = "inner") -> DataFrame:
    """Point-in-interval join as an equi join on (keys, time bucket).

    Each point carries exactly one bucket, so a matched pair is emitted
    exactly once (no post-join dedup). ``bucket_seconds`` should be on
    the order of the typical interval length: too small explodes the
    interval side, too large packs unrelated rows into one bucket.
    Non-key column names must be disjoint between the two inputs.

    ``how`` is 'inner' or 'left'. The range predicate lives INSIDE the
    join condition (not a post-join filter, which would silently drop
    every unmatched left row and degrade left->inner). 'right'/'full'
    are rejected: the interval side is bucket-exploded, so an unmatched
    interval would surface once per bucket — duplicated, not once.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join_bucketed supports how='inner'|'left', got {how!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    p = points.withColumn(
        _BKT, F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds))
    # rename interval-side join columns so the mixed equi+range condition
    # is unambiguous; they are dropped after the join (point side wins)
    i = intervals.withColumn(
        _BKT,
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
            F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds))))
    renames = {k: f"_r_{k}" for k in keys + [_BKT]}
    for old, new in renames.items():
        i = i.withColumnRenamed(old, new)
    cond = p[_BKT] == i[renames[_BKT]]
    for k in keys:
        cond = cond & (p[k] == i[renames[k]])
    cond = cond & F.col(point_ts).between(F.col(start_col), F.col(end_col))
    joined = p.join(i, cond, how)
    return joined.drop(_BKT, *renames.values())


def overlap_join(left: DataFrame, right: DataFrame,
                 l_start: str, l_end: str, r_start: str, r_end: str,
                 on: str | list[str] | None = None,
                 bucket_seconds: int = 3600) -> DataFrame:
    """Interval-overlap join: all (left, right) pairs whose closed
    intervals intersect (l_start <= r_end AND r_start <= l_end) —
    concurrent sessions, conflicting bookings, co-active incidents.

    Both sides explode into the time buckets they cover and meet in an
    equi-join on (keys, bucket); the exact overlap predicate sits
    INSIDE the join condition. A pair sharing several buckets is
    emitted ONCE without any dedup shuffle: only the first co-covered
    bucket — max(floor(l_start), floor(r_start)) — emits (the standard
    report-once trick for bucketed spatial/temporal joins). Size
    ``bucket_seconds`` near the typical interval length; a long-lived
    interval costs rows proportional to its span, same trade as
    range_join_bucketed. Non-key columns must be pre-renamed disjoint.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    def bkt(c):
        return F.floor(F.unix_timestamp(F.col(c)) / bucket_seconds)

    le = left.withColumn(
        _BKT, F.explode(F.sequence(bkt(l_start), bkt(l_end))))
    ri = right.withColumn(
        _BKT, F.explode(F.sequence(bkt(r_start), bkt(r_end))))
    renames = {k: f"_r_{k}" for k in keys + [_BKT]}
    for old, new in renames.items():
        ri = ri.withColumnRenamed(old, new)
    cond = le[_BKT] == ri[renames[_BKT]]
    for k in keys:
        cond = cond & (le[k] == ri[renames[k]])
    cond = (cond
            & (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            # report-once: only the first shared bucket emits the pair
            & (le[_BKT] == F.greatest(bkt(l_start), bkt(r_start))))
    return le.join(ri, cond, "inner").drop(_BKT, *renames.values())


def concurrency(df: DataFrame, start_col: str, end_col: str,
                keys: list[str] | None = None,
                out_col: str = "active") -> DataFrame:
    """Sweep-line concurrency: for every distinct boundary timestamp,
    how many intervals are active (start inclusive, end exclusive) —
    peak-load / max-overlap analysis as ONE window cumsum.

    Each interval becomes a +1 at start and a -1 at end; deltas are
    pre-summed per (keys, ts) in a hash aggregation, then one ordered
    cumsum per key yields the active count as of each boundary. Shuffle
    carries (keys, ts, delta) triplets; window state is one running
    integer. max(active) is the answer to "how many X at once".
    """
    part = keys or []
    starts = df.select(*part, F.col(start_col).alias("_ts"),
                       F.lit(1).alias("_delta"))
    ends = df.select(*part, F.col(end_col).alias("_ts"),
                     F.lit(-1).alias("_delta"))
    deltas = (starts.unionByName(ends)
              .groupBy(*part, "_ts").agg(F.sum("_delta").alias("_d")))
    w = (Window.partitionBy(*part).orderBy("_ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (deltas
            .withColumn(out_col, F.sum("_d").over(w).cast("bigint"))
            .select(*part, F.col("_ts").alias("ts"), out_col))


def _epoch_secs(c):
    """Epoch seconds in double; NTZ timestamps route through one
    TZ-cast (session TZ is pinned UTC, so this equals DuckDB's
    epoch_us(naive)/1e6 bit-for-bit)."""
    return c.cast("timestamp").cast("double")


def time_weighted_avg(df: DataFrame, ts_col: str, value_col: str,
                      key_cols: list[str] | None = None,
                      bucket: str | None = None,
                      carry_in: bool = False) -> DataFrame:
    """Time-weighted average of an irregularly-sampled series: each
    observation's value holds until the next observation (step / LOCF
    interpolation), so the average weights every value by how long it
    was in force — the TWAP spelling (public; what TimescaleDB calls
    `time_weight('LOCF', ...)`).

    With ``bucket`` (a `date_trunc` unit, e.g. ``"hour"``) and the
    default ``carry_in=False``, an observation's weight is CLIPPED at
    its own bucket's end: a value whose next observation lies several
    buckets later is NOT credited to the intervening buckets, and
    buckets containing no observation are OMITTED from the output —
    a deliberate one-window/one-agg shape with no densification, but
    NOT TimescaleDB's gap-spanning LOCF semantic. Set
    ``carry_in=True`` for the true bucketed-LOCF semantic: each
    observation's [ts, next) interval is split across every bucket it
    spans (sequence + explode, fan-out = spanned-bucket count — the
    same bounded blow-up posture as `gap_fill`), so gap-spanning
    values credit the buckets they were in force during and those
    buckets appear in the output (n_obs = 0 there). The series tail
    (no successor) carries to its own bucket's end, matching the
    clipped variant's boundary rule (least() skips the null next-ts
    on both engines). Without ``bucket``, one row per key over the
    whole series.

    Shape: one `lead` window per key series (O(1) state, narrow rows)
    + one hash aggregation (+ the carry explode when requested).
    Returns keys [+ bucket] + (twap, n_obs); twap rounds to 6.
    """
    keys = list(key_cols or [])
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(ts_col))
    nxt = F.lead(ts_col).over(w)
    if bucket is None:
        dur = _epoch_secs(F.col("_nxt")) - _epoch_secs(F.col(ts_col))
        rows = df.withColumn("_nxt", nxt)
        grp = [F.col(k) for k in keys]
    elif not carry_in:
        bstart = F.date_trunc(bucket, F.col(ts_col))
        bend = bstart + F.expr(f"INTERVAL 1 {bucket}")
        rows = (df.withColumn("_nxt", F.least(nxt, bend))
                .withColumn("_bucket", bstart))
        dur = _epoch_secs(F.col("_nxt")) - _epoch_secs(F.col(ts_col))
        grp = [F.col(k) for k in keys] + [F.col("_bucket").alias("bucket")]
    else:
        step = F.expr(f"INTERVAL 1 {bucket}")
        one_us = F.expr("INTERVAL 1 MICROSECOND")
        ts = F.col(ts_col).cast("timestamp")
        # buckets spanned by [ts, next): trunc(ts) .. trunc(next-1us);
        # greatest() guards duplicate timestamps (next == ts)
        stop = F.date_trunc(bucket, F.greatest(
            F.col("_nxt").cast("timestamp") - one_us, ts))
        spans = F.when(
            F.col("_nxt").isNotNull(),
            F.sequence(F.date_trunc(bucket, ts), stop, step)
        ).otherwise(F.array(F.date_trunc(bucket, ts)))
        rows = (df.withColumn("_nxt", nxt)
                .withColumn("_bucket", F.explode(spans)))
        seg_start = F.greatest(ts, F.col("_bucket"))
        seg_end = F.least(F.col("_nxt").cast("timestamp"),
                          F.col("_bucket") + step)
        dur = F.greatest(
            _epoch_secs(seg_end) - _epoch_secs(seg_start), F.lit(0.0))
        own = F.date_trunc(bucket, ts) == F.col("_bucket")
        # det_sum on the duration-weighted terms: value*dur products
        # are doubles whose combine order must not move the 6dp twap
        # (functions/numeric.py); the all-zero-duration fallback mean
        # is spelled det_sum/count for the same reason
        wsum = det_sum(F.col(value_col) * dur)
        tsum = det_sum(dur)
        return (rows.groupBy(*[F.col(k) for k in keys],
                             F.col("_bucket").alias("bucket"))
                .agg(F.round(
                    F.when(tsum > 0, wsum / tsum)
                    .otherwise(det_sum(F.when(own, F.col(value_col)))
                               / F.count(F.when(own, F.col(value_col)))),
                    6).alias("twap"),
                    F.sum(F.when(own, 1).otherwise(0))
                    .cast("bigint").alias("n_obs")))
    # rows with no successor (series tail) carry zero duration; a
    # series/bucket whose durations all collapse to zero falls back to
    # the plain average of its observations (spelled det_sum/count so
    # it, too, is combine-order-independent)
    wsum = det_sum(F.col(value_col) * dur)
    tsum = det_sum(dur)
    return (rows.groupBy(*grp)
            .agg(F.round(
                F.when(tsum > 0, wsum / tsum)
                .otherwise(det_sum(F.col(value_col))
                           / F.count(value_col)), 6).alias("twap"),
                F.count("*").alias("n_obs")))


def interpolate_linear(df: DataFrame, ts_col: str, value_col: str,
                       key_cols: list[str] | None = None,
                       out_col: str | None = None) -> DataFrame:
    """Fill null gaps in a series by linear interpolation between the
    nearest non-null neighbors (the `interpolate()` companion to
    `gap_fill`'s null spine): for a null row at t between observations
    (t0, v0) and (t1, v1), the fill is v0 + (v1-v0)·(t-t0)/(t1-t0).
    Leading/trailing nulls clamp to the nearest observed value; series
    with no observation stay null.

    Two running windows per key series: prev-observation carry via
    last(..., ignorenulls) over the ascending preceding frame, next
    via the SAME running frame over the descending order — never
    first() over a [current, unboundedFollowing] frame, which Spark
    recomputes from scratch per row (O(series²); the reversed running
    frame is incremental). One Exchange on the key (the two sorts are
    local), no self-join and no per-gap explode. Non-null rows pass
    through untouched (bit-identical, not re-derived).
    """
    keys = [F.col(k) for k in (key_cols or [])]
    wp = (Window.partitionBy(*keys).orderBy(F.col(ts_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(ts_col))
    pv = F.last(v, ignorenulls=True).over(wp)
    pt = F.last(obs_ts, ignorenulls=True).over(wp)
    nv = F.last(v, ignorenulls=True).over(wn)
    nt = F.last(obs_ts, ignorenulls=True).over(wn)
    t = _epoch_secs(F.col(ts_col))
    frac = (t - _epoch_secs(pt)) / (_epoch_secs(nt) - _epoch_secs(pt))
    filled = (
        F.when(v.isNotNull(), v)
        .when(pv.isNotNull() & nv.isNotNull(),
              F.round(pv + (nv - pv) * frac, 6))
        .otherwise(F.coalesce(pv, nv)))
    return df.withColumn(out_col or value_col, filled)


def seasonal_decompose(df: DataFrame, ts_col: str,
                       period: int = 7) -> DataFrame:
    """Classical additive seasonal decomposition of the daily count
    series: observed = trend + seasonal + resid (public textbook
    method — centered moving-average trend, period-position means of
    the detrended series, zero-centered seasonal component).

    ``period`` must be ODD (7 = weekly on daily buckets) so the
    centered window is symmetric; trend is null at the (period−1)/2
    edge days and resid is null with it. The series must be gap-free —
    compose with :func:`gap_fill` first — because the centered frame is
    a ROWS window.

    Exactness: observed is an integer count, the trend is an integer
    window sum divided once, detrended means accumulate det-quantized
    (1e-6 units) so the seasonal component is order-independent, and
    the centering mean runs over the collapsed ``period``-row table.
    Scale shape: one hash aggregation to the daily rollup; every
    window (trend, seasonal margins, centering) runs over collapsed
    tables — never the events.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_units
    if period % 2 == 0:
        raise ValueError("period must be odd (centered MA window)")
    half = period // 2
    scale = 1_000_000
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (df.groupBy(day.alias("bucket"))
             .agg(F.count("*").alias("observed")))
    w = (Window.orderBy("bucket").rowsBetween(-half, half))
    trend = F.when(
        F.count("*").over(w) == period,
        F.sum("observed").over(w).cast("double") / float(period))
    pos = F.pmod(F.datediff(F.col("bucket"),
                            F.lit("1970-01-01").cast("date")),
                 F.lit(period))
    base = (daily
            .withColumn("pos", pos)
            .withColumn("trend", trend)
            .withColumn("_det", F.col("observed") - F.col("trend")))
    seas = (base.filter(F.col("trend").isNotNull())
            .groupBy("pos")
            .agg((F.sum(det_units(F.col("_det"), scale)).cast("double")
                  / float(scale) / F.count("*")).alias("_s_raw")))
    center = (F.sum(det_units(F.col("_s_raw"), scale))
              .over(Window.partitionBy()).cast("double")
              / float(scale) / F.count("*").over(Window.partitionBy()))
    seas = seas.withColumn("seasonal", F.col("_s_raw") - center)
    # pin_round6, not F.round: the seasonal component is a rational
    # that lands on (or within double-eps of) .5e-6 rounding ties
    # (tools/tie_audit.py flagged it at sf0.001) — engines' round()
    # conventions can split there; the explicit floor is the same
    # IEEE op on the same mirrored doubles in both engines
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    out = (base.join(F.broadcast(seas.select("pos", "seasonal")), "pos")
           .select(
               "bucket", "pos",
               F.col("observed").cast("bigint").alias("observed"),
               pin_round6(F.col("trend")).alias("trend"),
               pin_round6(F.col("seasonal")).alias("seasonal"),
               pin_round6(F.col("observed") - F.col("trend")
                          - F.col("seasonal")).alias("resid")))
    return out


def seasonal_anomalies(df: DataFrame, ts_col: str, period: int = 7,
                       n_sigma: float = 2.0) -> DataFrame:
    """Seasonality-aware anomaly flags: :func:`seasonal_decompose`'s
    residuals scored against their own spread — a day is anomalous
    when |resid| > n_sigma·σ(resid), which catches level breaks the
    plain rolling z-score (analytics.rolling_anomalies) confounds
    with weekly shape. σ comes from det-quantized Σr/Σr² over the
    COLLAPSED daily table (one broadcast row); the output keeps the
    decomposition columns plus (resid_z, is_anomaly). Edge days with
    null trend carry null z and false flags.
    """
    from pipelines_rj_sms_spark.functions.numeric import (det_sum,
                                                          det_sum_big)
    dec = seasonal_decompose(df, ts_col, period=period)
    r = F.col("resid")
    stats = F.broadcast(dec.filter(r.isNotNull()).agg(
        F.count("*").alias("_n"),
        det_sum(r, 1_000_000).alias("_s"),
        det_sum_big(r * r, 1_000_000).alias("_q")))
    var = (F.col("_q") - F.col("_s") * F.col("_s") / F.col("_n")) \
        / F.col("_n")
    sigma = F.sqrt(var)
    z = F.when(sigma > 0, r / sigma)
    from pipelines_rj_sms_spark.functions.numeric import pin_round6
    return (dec.crossJoin(stats)
            .select("bucket", "pos", "observed", "trend", "seasonal",
                    "resid",
                    pin_round6(z).alias("resid_z"),
                    F.coalesce(F.abs(z) > F.lit(float(n_sigma)),
                               F.lit(False)).alias("is_anomaly")))


def autocorrelation(df: DataFrame, t_col: str, units_col: str,
                    max_lag: int = 10,
                    key_cols: list[str] | None = None) -> DataFrame:
    """Sample autocorrelation function (ACF) at lags 1..``max_lag``
    over an integer-indexed, integer-unit series (callers collapse the
    facts to a (t, units) rollup and quantize first — the det_sum
    convention):

        acf(k) = Σ_t d_t·d_{t+k} / Σ_t d_t²,   d_t = n·u_t − Σu

    The n-scaled deviation d_t clears the fractional mean, so the
    numerator and denominator are EXACT integers (the n² factors
    cancel in the ratio); accumulation runs in DECIMAL(38,0) so
    deviation² × series length survives long horizons, and the single
    final division is the only float op — order-independent under any
    partitioning, bit-identical to the HUGEINT oracle mirror.

    Scale shape: everything runs on the COLLAPSED series (one row per
    time bucket — days/hours, thousands of rows for years of data,
    never the facts). Global n/Σu/Σd² come from unbounded windows over
    that collapsed frame; lagged pairs are an EQUI-join on
    (key, t+lag) against the lag-exploded series — max_lag·|series|
    rows, no nested loop. Gaps in the index simply contribute no pair
    at lags that would bridge them (document or gap_fill upstream).
    Returns (keys..., lag, n, acf) with acf rounded to 6; NULL when
    the series is constant (zero variance).
    """
    keys = list(key_cols or [])
    d38 = "decimal(38,0)"
    w_all = Window.partitionBy(*keys) if keys else \
        Window.partitionBy(F.lit(1))
    ser = (df.select(*keys, F.col(t_col).alias("_t"),
                     F.col(units_col).alias("_u"))
           .withColumn("_n", F.count("*").over(w_all))
           .withColumn("_tot", F.sum("_u").over(w_all)))
    ser = ser.withColumn(
        "_d", (F.col("_n").cast(d38) * F.col("_u").cast(d38)
               - F.col("_tot").cast(d38)).cast(d38))
    ser = ser.withColumn(
        "_den", F.sum((F.col("_d") * F.col("_d")).cast(d38))
        .over(w_all).cast(d38))
    a = ser.withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))))
    b = ser.select(*keys, F.col("_t").alias("_tb"),
                   F.col("_d").alias("_db"))
    cond = [a[k] == b[k] for k in keys]
    pairs = a.join(b, cond + [b["_tb"] == a["_t"] + a["lag"]])
    agg = pairs.groupBy(*[a[k] for k in keys], "lag").agg(
        F.max(a["_n"]).cast("bigint").alias("n"),
        F.max(a["_den"]).alias("_dn"),
        F.sum((a["_d"] * F.col("_db")).cast(d38)).cast(d38)
        .alias("_num"))
    return agg.select(
        *keys, "lag", "n",
        F.round(F.when(F.col("_dn") > 0,
                       F.col("_num").cast("double")
                       / F.col("_dn").cast("double")), 6).alias("acf"))


def cross_correlation(df: DataFrame, t_col: str, x_col: str,
                      y_col: str, max_lag: int = 7) -> DataFrame:
    """Lead-lag cross-correlation between two integer-unit series on a
    shared integer index (callers build the zero-filled spine — one
    row per bucket with both series' units):

        r(L) = Σ_t dx_t·dy_{t+L} / √(Σdx² · Σdy²),   L = −max..+max

    Positive L means y LAGS x by L buckets (x leads); the argmax row
    is the lead-lag estimate. Same exactness posture as
    :func:`autocorrelation`: d = n·u − Σu clears the fractional mean,
    n² cancels between numerator and denominator, all moments are
    exact DECIMAL(38,0) integers, and the only float ops are the final
    multiply/√/divide — one fixed expression, identical in the oracle.

    Scale shape: all math on the COLLAPSED spine; the ±L shift is an
    equi-join on t+L against the lag-exploded frame (2L+1 × |spine|
    rows). Returns (lag, n, xcorr) rounded to 6; NULL for a constant
    side.
    """
    d38 = "decimal(38,0)"
    w = Window.partitionBy(F.lit(1))
    ser = (df.select(F.col(t_col).alias("_t"),
                     F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
           .withColumn("_n", F.count("*").over(w))
           .withColumn("_sx", F.sum("_x").over(w))
           .withColumn("_sy", F.sum("_y").over(w)))
    ser = (ser.withColumn(
        "_dx", (F.col("_n").cast(d38) * F.col("_x").cast(d38)
                - F.col("_sx").cast(d38)).cast(d38))
        .withColumn(
        "_dy", (F.col("_n").cast(d38) * F.col("_y").cast(d38)
                - F.col("_sy").cast(d38)).cast(d38)))
    ser = (ser.withColumn(
        "_vx", F.sum((F.col("_dx") * F.col("_dx")).cast(d38))
        .over(w).cast(d38))
        .withColumn(
        "_vy", F.sum((F.col("_dy") * F.col("_dy")).cast(d38))
        .over(w).cast(d38)))
    a = ser.withColumn(
        "lag", F.explode(F.sequence(F.lit(-int(max_lag)),
                                    F.lit(int(max_lag)))))
    b = ser.select(F.col("_t").alias("_tb"), F.col("_dy").alias("_dyb"))
    pairs = a.join(b, b["_tb"] == a["_t"] + a["lag"])
    agg = pairs.groupBy("lag").agg(
        F.max(a["_n"]).cast("bigint").alias("n"),
        F.max(a["_vx"]).alias("_mvx"),
        F.max(a["_vy"]).alias("_mvy"),
        F.sum((a["_dx"] * F.col("_dyb")).cast(d38)).cast(d38)
        .alias("_num"))
    den = F.sqrt(F.col("_mvx").cast("double")
                 * F.col("_mvy").cast("double"))
    return agg.select(
        "lag", "n",
        F.round(F.when((F.col("_mvx") > 0) & (F.col("_mvy") > 0),
                       F.col("_num").cast("double") / den), 6)
        .alias("xcorr"))


def holt_winters_additive(df: DataFrame, t_col: str, y_col: str,
                          period: int = 7, alpha: float = 0.3,
                          beta: float = 0.1, gamma: float = 0.2,
                          horizon: int = 7) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) fit +
    h-step forecast — the seasonal-trend forecaster the EWMA/decompose
    pair can't give, because its level/trend/seasonal recursions are
    COUPLED and genuinely sequential (public method):

        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
        s_t = γ(y_t − l_t) + (1−γ)s_{t−m}

    Execution model: the caller passes the COLLAPSED series (one row
    per bucket); it folds as ONE Catalyst `aggregate` expression over
    the sorted value array — an explicit state machine
    (level, trend, seasonal[m], sse) entirely inside whole-stage
    codegen: no Python, no driver loop, no per-step shuffle. The
    sequentiality is intrinsic to the model, so confining it to a
    single fold over an already-collapsed array IS the scale answer
    (thousands of buckets for years of data; facts were reduced in
    the one upstream aggregation).

    Cross-engine determinism: smoothing constants are emitted as
    Python float literals (α and 1−α both precomputed), the
    initialization means are explicit fixed-order element sums (not an
    engine fold), and the recursion's expression tree is spelled
    identically in the DuckDB recursive-CTE oracle — every step is
    the same IEEE op sequence, so the fold is bit-identical.
    Init (standard): l₀ = mean(first period), b₀ = (mean(second
    period) − mean(first period))/m, s = first-period deviations;
    the fold runs over indices m..n−1. Returns ``horizon`` rows
    (h, forecast, level, trend, sse_insample, n) rounded to 6;
    empty when n < 2·period.
    """
    m = int(period)
    a, b_, g = float(alpha), float(beta), float(gamma)
    one_a, one_b, one_g = 1.0 - a, 1.0 - b_, 1.0 - g
    ser = (df.select(F.col(t_col).alias("_t"),
                     F.col(y_col).cast("double").alias("_y"))
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col("_t").alias("t"), F.col("_y").alias("y"))))
               .alias("_arr")))
    ys = F.transform(F.col("_arr"), lambda s: s["y"])
    n = F.size(ys)
    ser = ser.select(ys.alias("_ys"), n.alias("_n")) \
        .filter(F.col("_n") >= 2 * m)

    def el(i):  # 0-based element
        return F.get(F.col("_ys"), i)

    mean1 = sum([el(j) for j in range(1, m)], el(0)) / F.lit(float(m))
    mean2 = sum([el(m + j) for j in range(1, m)], el(m)) \
        / F.lit(float(m))
    l0 = mean1
    b0 = (mean2 - mean1) / F.lit(float(m))
    s0 = F.transform(F.slice(F.col("_ys"), 1, m),
                     lambda x: x - l0)
    state0 = F.struct(l0.alias("l"), b0.alias("b"), s0.alias("s"),
                      F.lit(0.0).alias("sse"))
    idx = F.sequence(F.lit(m), F.col("_n") - 1)

    def step(acc, i):
        y = F.get(F.col("_ys"), i)
        si = (i % F.lit(m)).cast("int")
        s_i = F.get(acc["s"], si)
        l_new = (F.lit(a) * (y - s_i)
                 + F.lit(one_a) * (acc["l"] + acc["b"]))
        b_new = (F.lit(b_) * (l_new - acc["l"])
                 + F.lit(one_b) * acc["b"])
        s_val = F.lit(g) * (y - l_new) + F.lit(one_g) * s_i
        s_new = F.concat(
            F.slice(acc["s"], 1, si),
            F.array(s_val),
            F.slice(acc["s"], si + 2, F.lit(m) - si - 1))
        pred = acc["l"] + acc["b"] + s_i
        return F.struct(l_new.alias("l"), b_new.alias("b"),
                        s_new.alias("s"),
                        (acc["sse"] + (y - pred) * (y - pred))
                        .alias("sse"))

    fin = F.aggregate(idx, state0, step)
    ser = ser.select("_n", fin.alias("_f"))
    hs = ser.select(
        "_n", "_f",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon))))
        .alias("h"))
    fc = (F.col("_f.l")
          + F.col("h").cast("double") * F.col("_f.b")
          + F.get(F.col("_f.s"),
                  ((F.col("_n") + F.col("h") - 1) % F.lit(m))
                  .cast("int")))
    return hs.select(
        "h",
        F.round(fc, 6).alias("forecast"),
        F.round(F.col("_f.l"), 6).alias("level"),
        F.round(F.col("_f.b"), 6).alias("trend"),
        F.round(F.col("_f.sse"), 6).alias("sse_insample"),
        F.col("_n").cast("bigint").alias("n"))


def ljung_box(df: DataFrame, t_col: str, units_col: str,
              max_lag: int = 10) -> DataFrame:
    """Ljung-Box portmanteau whiteness test (public formula) — "are
    the first m autocorrelations jointly zero?", the standard residual
    diagnostic after any fit (`trend_fit`, `holt_winters_additive`):

        Q = n(n+2)·Σ_{k=1..m} ρ̂_k²/(n−k)   (~χ²_m under white noise)

    Composes :func:`autocorrelation` (exact integer deviation ratios,
    6dp-pinned in both engines); the ≤m addends det-quantize, so Q is
    combine-order-free. Lags whose ACF is undefined (constant series)
    force a NULL Q rather than a silently partial sum. One row:
    (n, m_lags, q_stat, df) @6dp; df = lags actually present.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    ac = autocorrelation(df, t_col, units_col, max_lag=max_lag)
    addend = ((F.col("acf") * F.col("acf"))
              / (F.col("n") - F.col("lag")).cast("double"))
    agg = ac.agg(F.max("n").alias("n"),
                 F.count("*").alias("_m"),
                 F.count("acf").alias("_mn"),
                 det_sum(addend).alias("_s"))
    nd = F.col("n").cast("double")
    q = F.when(F.col("_m") == F.col("_mn"),
               nd * (nd + 2.0) * F.col("_s"))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("_m").cast("int").alias("m_lags"),
        F.round(q, 6).alias("q_stat"),
        F.col("_m").cast("int").alias("df"))


def croston_forecast(df: DataFrame, t_col: str, y_col: str,
                     alpha: float = 0.1) -> DataFrame:
    """Croston's method for INTERMITTENT demand (public method, plus
    the Syntetos-Boylan bias correction): separate exponential
    smoothing of the nonzero demand sizes z and the inter-demand
    intervals x, forecast rate = z/x per period — the standard
    forecaster where Holt-Winters/EWMA smear zeros into nonsense
    (spare parts, rare-event volumes).

        on demand:  z ← α·y + (1−α)z,  x ← α·q + (1−α)x,  q ← 0
        otherwise:  q ← q + 1                   (q = periods waited)

    Same execution model as `holt_winters_additive`: the caller
    passes the COLLAPSED (gap-filled) series; the genuinely
    sequential recursion folds as ONE Catalyst `aggregate` expression
    over the sorted value array — codegen state machine
    (initialized, z, x, q, n_nonzero), no Python, no driver loop.
    Smoothing constants are Python float literals shared with the
    recursive-CTE oracle, so the fold is bit-identical cross-engine.
    One row: (n, n_nonzero, size_hat, interval_hat, croston_rate,
    sba_rate) @6dp; NULL forecast when no nonzero demand.
    """
    a = float(alpha)
    one_a = 1.0 - a
    sba_f = 1.0 - a / 2.0
    ser = (df.select(F.col(t_col).alias("_t"),
                     F.col(y_col).cast("double").alias("_y"))
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col("_t").alias("t"), F.col("_y").alias("y"))))
               .alias("_arr")))
    ys = F.transform(F.col("_arr"), lambda s: s["y"])
    ser = ser.select(ys.alias("_ys"), F.size(ys).alias("_n")) \
        .filter(F.col("_n") > 0)
    state0 = F.struct(F.lit(0).alias("ini"), F.lit(0.0).alias("z"),
                      F.lit(0.0).alias("x"), F.lit(0.0).alias("q"),
                      F.lit(0).alias("nz"))
    idx = F.sequence(F.lit(0), F.col("_n") - 1)

    def step(acc, i):
        y = F.get(F.col("_ys"), i)
        hit = y > 0
        z_new = F.when(
            hit, F.when(acc["ini"] == 0, y)
            .otherwise(F.lit(a) * y + F.lit(one_a) * acc["z"])) \
            .otherwise(acc["z"])
        x_new = F.when(
            hit, F.when(acc["ini"] == 0, acc["q"] + F.lit(1.0))
            .otherwise(F.lit(a) * (acc["q"] + F.lit(1.0))
                       + F.lit(one_a) * acc["x"])) \
            .otherwise(acc["x"])
        q_new = F.when(hit, F.lit(0.0)) \
            .otherwise(acc["q"] + F.lit(1.0))
        ini_new = F.when(hit, F.lit(1)).otherwise(acc["ini"])
        nz_new = acc["nz"] + F.when(hit, F.lit(1)).otherwise(F.lit(0))
        return F.struct(ini_new.alias("ini"), z_new.alias("z"),
                        x_new.alias("x"), q_new.alias("q"),
                        nz_new.alias("nz"))

    fin = F.aggregate(idx, state0, step)
    out = ser.select("_n", fin.alias("_f"))
    ok = (F.col("_f.ini") == 1) & (F.col("_f.x") > 0)
    rate = F.col("_f.z") / F.col("_f.x")
    return out.select(
        F.col("_n").cast("bigint").alias("n"),
        F.col("_f.nz").cast("bigint").alias("n_nonzero"),
        F.round(F.when(ok, F.col("_f.z")), 6).alias("size_hat"),
        F.round(F.when(ok, F.col("_f.x")), 6).alias("interval_hat"),
        F.round(F.when(ok, rate), 6).alias("croston_rate"),
        F.round(F.when(ok, F.lit(sba_f) * rate), 6).alias("sba_rate"))


def hurst_rs(df: DataFrame, t_col: str, units_col: str,
             window_sizes: tuple[int, ...] = (8, 16, 32, 64)) -> DataFrame:
    """Hurst exponent by classical rescaled-range (R/S) analysis
    (public method): long-memory diagnostic of a series — H ≈ 0.5
    random walk, > 0.5 trending/persistent, < 0.5 mean-reverting —
    the regime summary ACF lag plots only hint at.

    For each window size w: split the indexed series into FULL
    consecutive buckets, compute the range of cumulative deviations
    R and the population σ per bucket, average ln(R/S) over buckets,
    then H = slope of mean-ln(R/S) on ln(w).

    Exactness: bucket deviations use the n-scaled-integer trick
    (d = w·u − Σu, exact DECIMAL), so the running cumdev, its
    max/min, and R are EXACT integers; R/S = R2/√(w·Σu²−S²) is one
    fixed double expression; per-w means and the 4-point slope
    det-quantize. Degenerate buckets (zero range or variance) drop
    in both engines. Scale: the explode is |series|×|sizes| rows of
    the COLLAPSED series; two hash aggs + one bucket window. Returns
    one row per window size: (window, n_buckets, mean_log_rs, hurst)
    @6dp with the slope repeated per row.
    """
    from pipelines_rj_sms_spark.functions.numeric import det_sum

    d38 = "decimal(38,0)"
    sizes = [int(w) for w in window_sizes]
    # distributed 0-based position (operators/ids.with_global_index) —
    # no SinglePartition row_number window over the series
    from pipelines_rj_sms_spark.operators.ids import with_global_index
    idx0 = with_global_index(
        df.select(F.col(t_col).alias("_t"),
                  F.col(units_col).alias("_u")), ["_t"], id_col="_i")
    # keep idx0 (direct helper return) for track() — withColumn drops
    # the attr chain with_global_index attached
    base = idx0.withColumn("_i", F.col("_i") - 1)
    ex = base.select(
        "_i", "_u",
        F.explode(F.array(*[F.lit(w) for w in sizes])).alias("_w"))
    # explicit floor: Spark's double->int cast truncates but DuckDB's
    # ROUNDS — floor() is the portable spelling (i >= 0 here)
    ex = ex.withColumn("_b", F.floor(F.col("_i") / F.col("_w"))
                       .cast("int"))
    grp = (ex.groupBy("_w", "_b")
           .agg(F.count("*").alias("_c"),
                F.sum(F.col("_u").cast(d38)).cast(d38).alias("_s"),
                F.sum((F.col("_u").cast(d38) * F.col("_u").cast(d38))
                      .cast(d38)).cast(d38).alias("_q"))
           .filter(F.col("_c") == F.col("_w")))
    j = ex.join(grp, ["_w", "_b"])
    d = (F.col("_w").cast(d38) * F.col("_u").cast(d38)
         - F.col("_s")).cast(d38)
    wc = (Window.partitionBy("_w", "_b").orderBy("_i")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(d).over(wc)
    per_b = (j.select("_w", "_b", "_s", "_q", cum.alias("_cum"))
             .groupBy("_w", "_b")
             .agg(F.max("_cum").alias("_mx"), F.min("_cum").alias("_mn"),
                  F.max("_s").alias("_s2"), F.max("_q").alias("_q2")))
    w_d = F.col("_w").cast(d38)
    var_num = (w_d * F.col("_q2") - F.col("_s2") * F.col("_s2"))
    r2 = (F.col("_mx") - F.col("_mn")).cast("double")
    rs = r2 / F.sqrt(var_num.cast("double"))
    ok = (F.col("_mx") > F.col("_mn")) & (var_num > 0)
    # ln pinned to the 1e-6 grid (functions/numeric.py "pinned
    # transcendental values"): rs is bit-identical cross-engine (exact
    # integer moments + correctly-rounded sqrt), but ln(rs) is libm —
    # pinning it makes mlr and the OLS moments bit-replayable
    from pipelines_rj_sms_spark.functions.numeric import LOG_SCALE, pin_units
    log_rs = F.when(ok, pin_units(F.log(rs)) / F.lit(float(LOG_SCALE)))
    per_w = (per_b.filter(ok)
             .groupBy("_w")
             .agg(F.count("*").alias("n_buckets"),
                  (det_sum(log_rs)
                   / F.count("*").cast("double")).alias("_mlr")))
    x = pin_units(F.log(F.col("_w").cast("double"))) / F.lit(float(LOG_SCALE))
    fit = F.broadcast(per_w.agg(
        F.count("*").alias("_k"),
        det_sum(x).alias("_sx"), det_sum(F.col("_mlr")).alias("_sy"),
        det_sum(x * x).alias("_sxx"),
        det_sum(x * F.col("_mlr")).alias("_sxy")))
    kd = F.col("_k").cast("double")
    slope = F.when(
        kd * F.col("_sxx") - F.col("_sx") * F.col("_sx") > 0,
        (kd * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        / (kd * F.col("_sxx") - F.col("_sx") * F.col("_sx")))
    from pipelines_rj_sms_spark.operators.cache import track
    return track(per_w.crossJoin(fit)
                 .select(F.col("_w").cast("int").alias("window"),
                         F.col("n_buckets").cast("bigint")
                         .alias("n_buckets"),
                         F.round(F.col("_mlr"), 6).alias("mean_log_rs"),
                         F.round(slope, 6).alias("hurst")), idx0)


class _SqlExpr:
    """Tiny arithmetic-expression wrapper so ONE Python builder can
    emit the identical Durbin-Levinson expression tree as Spark
    Columns AND as oracle SQL text (parenthesized at every node, so
    precedence can't diverge)."""

    def __init__(self, s: str):
        self.s = s

    def __add__(self, o):
        return _SqlExpr(f"({self.s} + {o.s})")

    def __sub__(self, o):
        return _SqlExpr(f"({self.s} - {o.s})")

    def __mul__(self, o):
        return _SqlExpr(f"({self.s} * {o.s})")

    def __truediv__(self, o):
        return _SqlExpr(f"({self.s} / {o.s})")


def durbin_levinson_pacf(rhos: list, one) -> list:
    """Partial autocorrelations φ_kk from autocorrelations ρ_1..ρ_m by
    the Durbin-Levinson recursion (public formula), built SYMBOLICALLY:
    ``rhos`` may be Spark Columns or _SqlExpr wrappers — the SAME
    loop constructs the same tree for both engines, so every multiply
    and divide happens in the same order and the results are
    bit-identical given identical ρ inputs. ``one`` is the matching
    1.0 literal. Returns [φ_11..φ_mm].
    """
    m = len(rhos)
    pacf = [rhos[0]]
    phi = [rhos[0]]
    for k in range(2, m + 1):
        num = rhos[k - 1]
        den = one
        for j in range(1, k):
            num = num - phi[j - 1] * rhos[k - j - 1]
            den = den - phi[j - 1] * rhos[j - 1]
        pkk = num / den
        phi = [phi[j - 1] - pkk * phi[k - 1 - j]
               for j in range(1, k)] + [pkk]
        pacf.append(pkk)
    return pacf


def pacf(df: DataFrame, t_col: str, units_col: str,
         max_lag: int = 5) -> DataFrame:
    """Sample partial autocorrelation function at lags 1..max_lag —
    the AR-order diagnostic (PACF cuts off at p for an AR(p)) that
    completes the ACF / Ljung-Box identification trio.

    Composes :func:`autocorrelation` (exact integer ratios, 6dp-
    pinned), pivots the ≤m ACF rows to one row, and applies the
    symbolic Durbin-Levinson recursion (`durbin_levinson_pacf`) —
    the same Python loop emits the oracle's SQL tree, so no engine
    ever re-associates the arithmetic. Driver-free: the pivot is a
    hash agg, the recursion is ONE projection. Returns (lag, acf,
    pacf) @6dp rows; requires all m lags present (gapless collapsed
    series), NULL pacf otherwise propagates naturally.

    Known benign fallback: at max_lag=5 the expanded recursion tree
    exceeds janino's method-size limit, so Spark logs one "Failed to
    compile the generated Java code" ERROR and evaluates the
    projection interpreted. The projection runs over exactly ONE
    pivoted row, so the interpreted path costs microseconds and is
    semantically identical (same Catalyst expressions) — accepted
    over splitting the recursion into barriered stages, which would
    add real jobs to dodge a log line.
    """
    m = int(max_lag)
    ac = autocorrelation(df, t_col, units_col, max_lag=m)
    row = ac.agg(*[
        F.max(F.when(F.col("lag") == k, F.col("acf")))
        .alias(f"_r{k}") for k in range(1, m + 1)])
    rhos = [F.col(f"_r{k}") for k in range(1, m + 1)]
    pk = durbin_levinson_pacf(rhos, F.lit(1.0))
    arr = F.array(*[
        F.struct(F.lit(k).alias("lag"),
                 F.col(f"_r{k}").alias("acf"),
                 F.round(pk[k - 1], 6).alias("pacf"))
        for k in range(1, m + 1)])
    return (row.select(F.explode(arr).alias("_e"))
            .select(F.col("_e.lag").alias("lag"),
                    F.col("_e.acf").alias("acf"),
                    F.col("_e.pacf").alias("pacf")))
