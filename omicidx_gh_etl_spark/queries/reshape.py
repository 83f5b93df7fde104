"""Reshape / sequence analytics operators: unpivot (melt), positional
explode (ordinality), gaps-and-islands, interval coalescing, and the
built-in dynamic session-window operator.

These extend the reference's explode/union surface (SURVEY §2.7-2.8)
with the wide→long and run-detection shapes a training-data pipeline
needs (per-measure profiling, activity streaks, coverage spans).

Same parity rules as queries/base.py. Scale notes are per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import register
from .tables import load_events, load_table

# --------------------------------------------------------------------------
# Unpivot / melt (wide → long)
# --------------------------------------------------------------------------


@register(
    "unpivot_measures",
    """
    WITH long AS (
      SELECT measure, val
      FROM lineitem
      UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
    )
    SELECT measure,
           count(*) AS n,
           sum(CAST(val AS DECIMAL(18,2))) AS total,
           round(CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
             AS avg_val
    FROM long GROUP BY measure
    """,
    tags=("reshape", "olap"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt four numeric measure columns into (measure, val) long form,
    then profile each measure in one pass.

    Scale: unpivot is a map-side stack (no shuffle, no data copy beyond
    the projection) followed by a 4-group aggregate — the plan is one
    scan however many measures are melted, vs N scans for N per-column
    profiles. The avg is derived from the exact DECIMAL total so the
    double division happens once on an exact value (parity rule 1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    total = F.sum(F.col("val").cast("decimal(18,2)")).alias("total")
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        total,
        F.round(F.col("total").cast("double") / F.col("n"), 4).alias("avg_val"),
    )


# --------------------------------------------------------------------------
# Positional explode (UNNEST ... WITH ORDINALITY)
# --------------------------------------------------------------------------


@register(
    "posexplode_token_positions",
    r"""
    WITH toks AS (
      SELECT generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1)
               AS ordinal,
             unnest(regexp_split_to_array(lower(text), '\s+')) AS token
      FROM documents)
    SELECT ordinal, token, count(*) AS n
    FROM toks
    WHERE ordinal <= 3 AND token <> ''
    GROUP BY ordinal, token
    """,
    tags=("F3", "reshape"),
)
def posexplode_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: token + its 1-based ordinal within the
    document, aggregated to leading-position token frequencies.

    The ordinal is the information plain ``explode`` drops; DuckDB's
    equivalent is ``unnest`` zipped with ``generate_subscripts``
    (reference unnests are position-blind: geometadb/gse_gpl.sql:10).
    Scale: posexplode is generated per-row in the scan stage (no
    shuffle); the position filter lands *before* the aggregate, so only
    3 tokens per document reach the shuffle regardless of document
    length.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("pos", "token")
    )
    return (
        toks.filter((F.col("pos") < 3) & (F.col("token") != ""))
        .select((F.col("pos") + 1).cast("bigint").alias("ordinal"), "token")
        .groupBy("ordinal", "token")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Gaps and islands (consecutive-run detection)
# --------------------------------------------------------------------------


@register(
    "gaps_islands_active_days",
    """
    WITH days AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    numbered AS (
      SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM days),
    islands AS (
      SELECT user_id, day - rn AS grp, count(*) AS len
      FROM numbered GROUP BY user_id, day - rn)
    SELECT user_id,
           count(*) AS n_islands,
           max(len) AS longest_run,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
    tags=("sequence", "windows"),
)
def gaps_islands_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days via
    the day − row_number() constant-group trick, then streak stats.

    Scale: one shuffle on user_id serves the window AND both
    aggregations (same partitioning key flows through, no re-exchange);
    the DISTINCT day projection collapses arbitrarily many events per
    day to ≤1 row before the window sees them.
    """
    from ..operators.sequences import consecutive_islands

    ev = load_events(spark, sf_dir)
    days = ev.select("user_id", F.expr("ts_us div 86400000000").alias("day"))
    islands = consecutive_islands(days, ["user_id"], "day")
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("island_len").alias("longest_run"),
        F.sum("island_len").alias("active_days"),
    )


# --------------------------------------------------------------------------
# Interval coalescing (merge overlapping spans)
# --------------------------------------------------------------------------

_IV_ORACLE = """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT)
               AS e
      FROM events),
    win AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS is_start
      FROM win),
    grouped AS (
      SELECT user_id, s, e,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS gid
      FROM flagged),
    merged AS (
      SELECT user_id, gid, min(s) AS ms, max(e) AS me
      FROM grouped GROUP BY user_id, gid)
    SELECT user_id,
           count(*) AS n_spans,
           CAST(sum(me - ms) AS BIGINT) AS covered_us,
           max(me - ms) AS longest_span_us
    FROM merged GROUP BY user_id
"""


@register("interval_coalesce_user_spans", _IV_ORACLE, tags=("sequence", "windows"))
def interval_coalesce_user_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce overlapping per-user activity intervals
    [ts, ts + value seconds] into disjoint spans, then span stats.

    A span starts where an interval's start exceeds the running max end
    of everything before it — the standard cumulative-max merge.
    Duration arithmetic goes through DECIMAL (value has 2dp) so both
    engines compute identical BIGINT micros (double→int casts round
    differently across engines).

    Scale: like gaps_islands, a single user_id shuffle feeds both
    windows and both aggregates; state per user is O(1) in the windows
    (running max / running sum), so skewed users cost sort time, not
    memory blowup.
    """
    ev = load_events(spark, sf_dir)
    iv = ev.selectExpr(
        "user_id",
        "ts_us AS s",
        "ts_us + cast(cast(value as decimal(18,2)) * 1000000 as bigint) AS e",
    )
    from ..operators.sequences import coalesce_intervals

    merged = coalesce_intervals(iv, ["user_id"], "s", "e")
    return merged.groupBy("user_id").agg(
        F.expr("count(*)").alias("n_spans"),
        F.expr("sum(me - ms)").alias("covered_us"),
        F.expr("max(me - ms)").alias("longest_span_us"),
    )


# --------------------------------------------------------------------------
# Built-in dynamic session windows (batch use of F.session_window)
# --------------------------------------------------------------------------


# One oracle for BOTH session_window surfaces (batch builtin here,
# the watermarked stream in streaming_ops.py) — the "same oracle" claim
# in their docstrings is enforced by sharing this constant.
SESSION_WINDOW_ORACLE = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
    grouped AS (
      SELECT user_id, ts_us,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS gid
      FROM flagged)
    SELECT user_id,
           min(ts_us) AS session_start_us,
           max(ts_us) + 1800000000 AS session_end_us,
           count(*) AS n_events
    FROM grouped GROUP BY user_id, gid
    """


@register(
    "session_window_builtin",
    SESSION_WINDOW_ORACLE,
    tags=("windows", "streaming-twin"),
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic session windows via the built-in ``session_window``
    operator (gap 30 min) — the native engine primitive behind
    streaming sessionization, exercised in batch.

    Semantics pinned by the oracle: a session is extended while the
    next event lands strictly inside [last_ts, last_ts + gap); window
    end = last event + gap. (``sessionize_events`` builds the same
    thing manually with lag/sum — this is the one-operator form, and
    the only form available under a streaming watermark.)

    Scale: session_window aggregates hash-partition on user_id and
    merge overlapping windows per key in one pass — no window-function
    sort-the-world, state bounded by open sessions per key.
    """
    ev = load_events(spark, sf_dir)
    sess = ev.groupBy(
        "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
    ).agg(F.count("*").alias("n_events"))
    return sess.select(
        "user_id",
        F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
        F.unix_micros(F.col("w.end").cast("timestamp")).alias("session_end_us"),
        "n_events",
    )


# --------------------------------------------------------------------------
# Time-series densification (calendar spine, zero-fill)
# --------------------------------------------------------------------------


@register(
    "timeseries_densify_daily",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS total_value
      FROM events GROUP BY 1),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds)
    SELECT s.day,
           coalesce(d.n_events, 0) AS n_events,
           coalesce(d.total_value, 0) AS total_value
    FROM spine s LEFT JOIN daily d USING (day)
    """,
    tags=("sequence", "reshape"),
)
def timeseries_densify_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify a daily time series: generate the full calendar spine
    between min and max day (``sequence`` + explode) and left-join the
    observed aggregates, zero-filling gaps.

    Missing days silently vanish from plain GROUP BY output — trend /
    moving-average math downstream needs the zeros. Scale: the spine is
    tiny (days, not events) and broadcast to the join; the events table
    is aggregated BEFORE joining, so the spine join touches |days|
    rows, never |events|.
    """
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.expr("ts_us div 86400000000").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
    )
    spine = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0).cast("decimal(18,2)")).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Percent-of-total (ratio_to_report window)
# --------------------------------------------------------------------------


@register(
    "percent_of_total_revenue",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name)
    SELECT region, nation, revenue,
           round(CAST(revenue AS DOUBLE) /
                 CAST(sum(revenue) OVER (PARTITION BY region) AS DOUBLE), 6)
             AS region_share
    FROM rev
    """,
    tags=("windows", "olap"),
)
def percent_of_total_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: each nation's share of its region's revenue
    (the ratio_to_report shape — window aggregate over a grouped
    result).

    Scale: the window runs over the AGGREGATED frame (|nations| rows),
    not the fact table, so the sort is trivial; only the constant-size
    dims (nation/region) carry broadcast hints — customer grows with
    the data, so its join strategy is left to the planner/AQE. Shares
    divide two exact DECIMAL sums once, in double, rounded —
    deterministic across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    )
    share = F.round(
        F.col("revenue").cast("double")
        / F.sum("revenue").over(W.partitionBy("region")).cast("double"),
        6,
    )
    return rev.select("region", "nation", "revenue", share.alias("region_share"))


# --------------------------------------------------------------------------
# Bad-record routing (try_cast quarantine)
# --------------------------------------------------------------------------


@register(
    "quarantine_bad_records",
    r"""
    WITH pm AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0
                  THEN regexp_replace(props, '\d+', '"x"', 'g')
                  ELSE props END AS p
      FROM events),
    parsed AS (
      SELECT event_type,
             TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) AS k
      FROM pm)
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM parsed GROUP BY event_type
    """,
    tags=("F11", "etl"),
)
def quarantine_bad_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record routing: extract a typed field with ``try_cast`` and
    split the stream into good rows and a quarantine count instead of
    failing the job (Spark 4 runs ANSI mode — a plain CAST on dirty
    data *throws*; try_cast is the per-row PERMISSIVE escape hatch).

    Dirty records are synthesized deterministically (every 7th event's
    JSON value is type-mangled) so both engines see the same corruption.
    Scale: the routing is a map-side CASE — one pass, no extra scan for
    the quarantine leg; at 100 TB the quarantined rows would also be
    written to a side sink from the same cached projection.

    Reference: encoding-repair / PERMISSIVE handling (SURVEY §2.8 F11,
    nih_reporter.py:125-137).
    """
    ev = load_events(spark, sf_dir)
    pm = ev.withColumn(
        "p",
        F.when(
            F.col("event_id") % 7 == 0,
            F.regexp_replace("props", r"\d+", '"x"'),
        ).otherwise(F.col("props")),
    )
    parsed = pm.withColumn(
        "k", F.expr("try_cast(get_json_object(p, '$.k') as int)")
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_quarantined"),
        F.sum("k").alias("sum_k"),
    )


# --------------------------------------------------------------------------
# Full outer join (two-series reconciliation)
# --------------------------------------------------------------------------


@register(
    "full_outer_daily_reconciliation",
    """
    WITH c AS (
      SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1),
    p AS (
      SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT coalesce(c.day, p.day) AS day,
           coalesce(c.n_clicks, 0) AS n_clicks,
           coalesce(p.n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p ON c.day = p.day
    """,
    tags=("join", "reshape"),
)
def full_outer_daily_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two daily series: days present in
    either the click or the purchase stream, zero-filled on the missing
    side (the only outer-join shape the repo didn't already cover; the
    reference has no outer joins at all, SURVEY §2.3).

    Scale: both inputs are aggregated to |days| rows BEFORE the outer
    join, so the join is trivially small however large the fact stream;
    the two aggregations share one scan of events (Spark reuses the
    exchange under AQE when the filters diverge it falls back to two
    scans of the same cached files — still |events| read once each).
    """
    ev = load_events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000").alias("day")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count("*").alias("n_clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count("*").alias("n_purchases"))
    )
    return c.join(p, "day", "full_outer").select(
        "day",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
    )


# --------------------------------------------------------------------------
# INTERSECT / EXCEPT (set semantics the reference lacks, SURVEY §2.7)
# --------------------------------------------------------------------------


@register(
    "set_intersect_purchasing_clickers",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("U3", "setop"),
)
def set_intersect_purchasing_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): users appearing in both the
    click and purchase streams. Plans as a hash semi-join over the two
    deduplicated sides — same shuffle budget as semi_join_exists but
    with SQL set semantics."""
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "set_except_nonpurchasing_clickers",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("U3", "setop"),
)
def set_except_nonpurchasing_clickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): clickers who never purchased —
    the set-algebra form of the anti join (anti_join_missing is the
    keyed form)."""
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.subtract(buys)


# --------------------------------------------------------------------------
# Quantile binning (ntile) and inter-arrival gaps
# --------------------------------------------------------------------------


@register(
    "ntile_value_quartiles",
    """
    WITH binned AS (
      SELECT event_type, value,
             ntile(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS quartile
      FROM events)
    SELECT event_type, quartile,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,2))) AS total_value,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM binned GROUP BY event_type, quartile
    """,
    tags=("windows", "olap"),
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning: ntile(4) quartiles of value per event
    type with per-bucket boundaries — the quantile-bucketing shape
    behind feature binning and load-balanced range partitioning.

    The window order includes event_id so ties have a total order and
    both engines assign identical buckets. Scale: ntile needs the full
    per-key sort — for global binning at 100 TB prefer
    ``approx_percentile`` boundaries + a map-side bucket join
    (histogram_equi_width is that shape); per-KEY ntile like this
    sorts each key's rows only.
    """
    ev = load_events(spark, sf_dir)
    q = F.ntile(4).over(
        W.partitionBy("event_type").orderBy("value", "event_id")
    )
    return (
        ev.withColumn("quartile", q)
        .groupBy("event_type", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@register(
    "interarrival_gap_stats",
    """
    WITH gaps AS (
      SELECT user_id, event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT event_type,
           count(gap_us) AS n_gaps,
           min(gap_us) AS min_gap_us,
           max(gap_us) AS max_gap_us,
           CAST(sum(gap_us) AS BIGINT) AS total_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    tags=("windows", "sequence"),
)
def interarrival_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival analysis: time between consecutive events of the
    same type per user (lag over the per-entity stream), aggregated to
    per-type gap statistics — burstiness/cadence profiling.

    Scale: one shuffle on (user_id, event_type) for the lag window;
    sums are exact BIGINT micros so no float drift; first events (null
    gap) are excluded in both engines identically.
    """
    ev = load_events(spark, sf_dir)
    lag_ts = F.lag("ts_us").over(
        W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    )
    gaps = ev.withColumn("gap_us", F.col("ts_us") - lag_ts).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("total_gap_us"),
    )


# --------------------------------------------------------------------------
# Cumulative distribution / relative rank windows
# --------------------------------------------------------------------------


@register(
    "percent_rank_order_totals",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey))
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN pct_rank >= 0.99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top_pct,
           round(max(CASE WHEN cume <= 0.5 THEN o_totalprice END), 2)
             AS p50_by_cume
    FROM ranked GROUP BY o_orderpriority
    """,
    tags=("windows", "olap"),
)
def percent_rank_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows: percent_rank + cume_dist per priority
    class, reduced to tail counts and the cume-derived median — the
    empirical-CDF shape behind percentile filtering and calibration.

    Ties carry a key tiebreak so ranks are identical cross-engine;
    ranks are rounded before comparison (float division). Scale: one
    shuffle+sort per priority class; the reduction keeps the output
    at |groups| rows so nothing rank-sized leaves the stage.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pct_rank") >= 0.99, 1).otherwise(0)).alias("n_top_pct"),
        F.round(
            F.max(F.when(F.col("cume") <= 0.5, F.col("o_totalprice"))), 2
        ).alias("p50_by_cume"),
    )


# --------------------------------------------------------------------------
# MAP column explode (F12 twin: attribute map ↔ array-of-structs)
# --------------------------------------------------------------------------


@register(
    "explode_map_attributes",
    """
    WITH kv AS (
      SELECT 'status' AS attr_key, o_orderstatus AS attr_value FROM orders
      UNION ALL
      SELECT 'priority', o_orderpriority FROM orders)
    SELECT attr_key, attr_value, count(*) AS n
    FROM kv GROUP BY attr_key, attr_value
    """,
    tags=("F12", "reshape"),
)
def explode_map_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column round-trip: build a per-row attribute map
    (``create_map``), explode it to (key, value) rows, profile values
    per key — the map↔array-of-structs conversion the reference does
    parser-side for EBI characteristics (SURVEY §2.8 F12,
    ebi_biosample/extract.py:154-159; ``map_from_entries`` is the
    inverse).

    Scale: generated in the scan stage like posexplode — each row
    yields |map| entries map-side; only the (key,value) aggregate
    shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    kv = o.select(
        F.explode(
            F.create_map(
                F.lit("status"), F.col("o_orderstatus"),
                F.lit("priority"), F.col("o_orderpriority"),
            )
        ).alias("attr_key", "attr_value")
    )
    return kv.groupBy("attr_key", "attr_value").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# Native XML parsing (S10 twin: from_xml instead of a Python parser)
# --------------------------------------------------------------------------


@register(
    "xml_native_parse",
    r"""
    WITH x AS (
      SELECT '<rec><acc>O' || o_orderkey || '</acc><status>' || o_orderstatus
             || '</status><total>' || CAST(o_totalprice AS VARCHAR)
             || '</total></rec>' AS xml
      FROM orders),
    parsed AS (
      SELECT regexp_extract(xml, '<acc>([^<]*)</acc>', 1) AS acc,
             regexp_extract(xml, '<status>([^<]*)</status>', 1) AS status,
             CAST(regexp_extract(xml, '<total>([^<]*)</total>', 1) AS DOUBLE)
               AS total
      FROM x)
    SELECT status,
           count(*) AS n,
           sum(CAST(total AS DECIMAL(18,2))) AS total_price,
           min(acc) AS first_acc
    FROM parsed GROUP BY status
    """,
    tags=("S10", "xml"),
)
def xml_native_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML record parsing with Spark 4's ``from_xml``: XML
    payloads (built deterministically so both engines see identical
    documents) are schema-parsed JVM-side into a typed struct — the
    built-in path for the reference's XML-heavy sources (SURVEY §2.1
    S10), complementing ``sources/xml_extract.py``'s mapInPandas UDTF
    which exists for formats needing a real Python parser library.

    The oracle extracts the same fields by regex — pinning that
    from_xml's element extraction and type coercion match. Scale:
    from_xml is a per-row expression (no UDF, no Python), so parsing
    runs inside whole-stage codegen at scan speed.
    """
    o = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<rec><acc>O"), F.col("o_orderkey").cast("string"),
        F.lit("</acc><status>"), F.col("o_orderstatus"),
        F.lit("</status><total>"), F.col("o_totalprice").cast("string"),
        F.lit("</total></rec>"),
    )
    parsed = o.select(
        F.from_xml(xml, "acc string, status string, total double").alias("r")
    )
    return parsed.groupBy(F.col("r.status").alias("status")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("r.total").cast("decimal(18,2)")).alias("total_price"),
        F.min("r.acc").alias("first_acc"),
    )


# --------------------------------------------------------------------------
# Time-weighted average (duration-weighted state aggregation)
# --------------------------------------------------------------------------


@register(
    "time_weighted_avg_value",
    """
    WITH seg AS (
      SELECT user_id, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events)
    SELECT user_id,
           count(dur_us) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS observed_us,
           round(sum(value * dur_us) / sum(dur_us), 4) AS twavg_value
    FROM seg WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
    tags=("windows", "sequence"),
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average: each event's value holds until the next
    event, so the mean weights values by how LONG they were current —
    the correct aggregate for sampled state (sensor readings, account
    balances), where the plain AVG over-counts bursts.

    Hold durations come from one lead() pass per user; the weighted
    sum is exact BIGINT×double with a single rounded division per
    group. Zero-duration segments (simultaneous events) carry no
    weight and are excluded identically in both engines.
    """
    ev = load_events(spark, sf_dir)
    nxt = F.lead("ts_us").over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    seg = ev.withColumn("dur_us", nxt - F.col("ts_us")).filter(
        F.col("dur_us").isNotNull() & (F.col("dur_us") > 0)
    )
    return seg.groupBy("user_id").agg(
        F.count("dur_us").alias("n_segments"),
        F.sum("dur_us").alias("observed_us"),
        F.round(
            F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
        ).alias("twavg_value"),
    )


# --------------------------------------------------------------------------
# Rolling distinct engagement (DAU / WAU)
# --------------------------------------------------------------------------


@register(
    "dau_wau_rolling",
    """
    WITH presence AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM presence),
    contrib AS (
      SELECT user_id, unnest(generate_series(day, day + 6)) AS obs_day
      FROM presence),
    wau AS (
      SELECT obs_day AS day, count(DISTINCT user_id) AS wau
      FROM contrib, bounds WHERE obs_day BETWEEN lo AND hi
      GROUP BY obs_day),
    dau AS (SELECT day, count(*) AS dau FROM presence GROUP BY day)
    SELECT w.day, coalesce(d.dau, 0) AS dau, w.wau,
           round(CAST(coalesce(d.dau, 0) AS DOUBLE) / w.wau, 4) AS stickiness
    FROM wau w LEFT JOIN dau d USING (day)
    """,
    tags=("sequence", "analytics"),
)
def dau_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct engagement: daily active users and trailing
    7-day actives (WAU) per day, plus the DAU/WAU stickiness ratio.

    Distinct counts don't sum, so a window can't roll them up; the
    scalable exact form inverts the window: each (user, day) presence
    CONTRIBUTES to the 7 observation days it falls in (explode of a
    6-long sequence — map-side), then one distinct-aggregate per
    observation day. Work is |presence| × 7, independent of raw event
    volume; the approximate swap-in at extreme scale is a per-day HLL
    sketch union-merged over the trailing window.
    """
    ev = load_events(spark, sf_dir)
    presence = ev.select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")
    ).distinct()
    bounds = presence.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = presence.select(
        "user_id", F.explode(F.sequence("day", F.col("day") + 6)).alias("obs_day")
    )
    wau = (
        contrib.join(F.broadcast(bounds))
        .filter(F.col("obs_day").between(F.col("lo"), F.col("hi")))
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = presence.groupBy("day").agg(F.count("*").alias("dau"))
    return wau.join(dau, "day", "left").select(
        "day",
        F.coalesce("dau", F.lit(0)).alias("dau"),
        "wau",
        F.round(
            F.coalesce("dau", F.lit(0)).cast("double") / F.col("wau"), 4
        ).alias("stickiness"),
    )


# --------------------------------------------------------------------------
# Shannon entropy (behavioral diversity profiling)
# --------------------------------------------------------------------------


@register(
    "entropy_event_mix",
    """
    WITH cnt AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type),
    tot AS (
      SELECT user_id, sum(n) AS total, count(*) AS n_types
      FROM cnt GROUP BY user_id)
    SELECT c.user_id,
           max(t.n_types) AS n_types,
           round(-sum((CAST(c.n AS DOUBLE) / t.total)
                      * log2(CAST(c.n AS DOUBLE) / t.total)), 4) AS entropy_bits
    FROM cnt c JOIN tot t USING (user_id)
    GROUP BY c.user_id
    """,
    tags=("analytics", "quality"),
)
def entropy_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the diversity
    score that separates single-behavior accounts (entropy ≈ 0) from
    varied ones (≈ log₂ of the type count); the same shape scores
    token/domain diversity for corpus curation.

    Exact integer counts feed one double log per (user, type) row —
    deterministic at round(4). One shuffle on (user, type), then the
    per-user rollup reuses the user_id clustering.
    """
    ev = load_events(spark, sf_dir)
    cnt = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_types")
    )
    p = F.col("n").cast("double") / F.col("total")
    return (
        cnt.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n_types").alias("n_types"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
        )
    )
