"""Batch-equivalent window queries over ``events`` (SURVEY §2.6
streaming row).

Structured Streaming twins live in :mod:`trendengine_spark.streaming`
— same window operators (``F.window`` / ``F.session_window``) over a
``readStream`` source with a watermark. The batch forms here are the
oracle-checkable versions: the window math is identical, so a green
CORRECTNESS row on these validates the streaming aggregation logic
(the only streaming-specific extras — watermark eviction, trigger
semantics — are exercised in ``tests/test_streaming.py``).

Alignment notes for the DuckDB oracle:

- Spark ``F.window`` aligns tumbling/sliding windows to the Unix
  epoch; the SQL side reproduces that with integer arithmetic on
  ``epoch_us`` rather than ``time_bucket`` (whose default origin is
  not the epoch).
- Spark ``F.session_window`` starts a new session when the gap is
  ≥ the gap duration (window is half-open ``[start, last+gap)``);
  the SQL gaps-and-islands form uses the same ``>=`` rule on
  microsecond diffs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendengine_spark.queries.base import query, t
from trendengine_spark.sqltext import sql_over_tables

_US = 1_000_000
HOUR_US = 3600 * _US  # folded: 3600 * 1e6 overflows INT32 inline in DuckDB
HALF_US = 1800 * _US


@query(
    "stream_tumbling_window",
    sql=f"""
    SELECT event_type,
           make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS ws,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,10))), 4) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour windows per event_type (epoch-aligned, exactly
    what the streaming twin computes per trigger)."""
    ev = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy("event_type", w)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,10)")), 4)
            .cast("double")
            .alias("total"),
        )
        .select("event_type", F.col("window.start").alias("ws"), "n_events", "total")
    )


@query(
    "stream_sliding_window",
    sql=f"""
    WITH buckets AS (
      SELECT event_type, value,
             make_timestamp((epoch_us(ts) // {HALF_US}) * {HALF_US}) AS b,
             ts
      FROM events
    ), assigned AS (
      SELECT event_type, value, unnest([b, b - INTERVAL 30 MINUTE]) AS ws, ts
      FROM buckets
    )
    SELECT event_type, ws, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,10))) AS DOUBLE) / count(value)
             AS avg_value
    FROM assigned
    WHERE ts >= ws AND ts < ws + INTERVAL 60 MINUTE
    GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark, sf_dir):
    """Sliding windows: 1-hour length, 30-minute slide (each event in
    two windows)."""
    ev = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy("event_type", w)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,10)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
        .select("event_type", F.col("window.start").alias("ws"), "n_events", "avg_value")
    )


@query(
    "stream_session_window",
    sql=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * {_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      -- cumulative sum ordered by the SAME (ts, event_id) total order
      -- as the lag window: with duplicate timestamps per user, a
      -- ts-only ROWS frame would assign tied rows nondeterministically
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,10))), 4) AS DOUBLE) AS total
    FROM s GROUP BY user_id, sess
    """,
)
def stream_session_window(spark, sf_dir):
    """Session windows with a 30-minute inactivity gap per user —
    the real ``session_window`` operator (streaming twin uses the
    identical expression after ``withWatermark``); built through the
    SQL front-end for a single analysis pass (see ``sqltext``)."""
    return sql_over_tables(
        spark,
        sf_dir,
        """
        SELECT user_id,
               session_window.start AS session_start,
               session_window.end AS session_end,
               n_events, total
        FROM (
          SELECT user_id, session_window(ts, '30 minutes') AS session_window,
                 count(1) AS n_events,
                 CAST(round(sum(CAST(value AS DECIMAL(18,10))), 4) AS DOUBLE)
                   AS total
          FROM events
          GROUP BY user_id, session_window(ts, '30 minutes')
        )
        """,
        ("events",),
    )


@query(
    "stream_late_data_policy",
    sql=f"""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT event_type,
           make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS ws,
           count(*) AS n_events
    FROM events, m
    WHERE ts >= mx - INTERVAL 6 HOUR
    GROUP BY 1, 2
    """,
)
def stream_late_data_policy(spark, sf_dir):
    """Watermark semantics in batch form: only events within the
    watermark horizon (max ts − 6h) are aggregated — the batch
    rendering of ``withWatermark('ts', '6 hours')`` state eviction."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    kept = ev.join(F.broadcast(mx)).filter(
        F.col("ts") >= F.col("mx") - F.expr("interval 6 hours")
    )
    return (
        kept.groupBy("event_type", F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("event_type", F.col("window.start").alias("ws"), "n_events")
    )


@query(
    "stream_interval_join",
    sql="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS p_ts,
           round(p.value, 4) AS purchase_value,
           v.event_id AS view_id, v.ts AS v_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def stream_interval_join(spark, sf_dir):
    """Interval-bounded stream-stream join, batch twin (attribution:
    each purchase to same-user views within the last hour). The
    streaming form adds watermarks on both sides so join state is
    evicted past the horizon — tests/test_streaming.py proves
    stream == batch on this exact plan."""
    from trendengine_spark.streaming.joins import interval_join_views_purchases

    ev = t(spark, sf_dir, "events")
    out = interval_join_views_purchases(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    )
    return out.select(
        "user_id", "purchase_id", "p_ts",
        F.round("purchase_value", 4).alias("purchase_value"),
        "view_id", "v_ts",
    )


@query(
    "scd2_user_event_history",
    sql="""
    SELECT user_id, event_type AS state, ts AS valid_from,
           coalesce(lead(ts) OVER w, TIMESTAMP '2100-01-01') AS valid_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    WHERE prev_type IS NULL OR prev_type <> event_type
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_user_event_history(spark, sf_dir):
    """SCD-type-2 interval construction: the per-user event-type
    stream collapses to change rows (lag ≠ current), then each change
    row's validity interval is [its ts, next change's ts), with the
    open row flagged current and closed at the sentinel high date
    (2100-01-01 — the classic 9999-12-31 overflows the nanosecond
    timestamps the pandas-side canonicalizer uses).
    Both windows shuffle ONCE on user_id (same partition key) — the
    standard warehouse dimension-history builder as two window
    passes, no self-join. Ties broken by event_id so the change
    detection is deterministic under equal timestamps."""
    w_dedup = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_lead = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    changes = ev.withColumn(
        "prev_type", F.lag("event_type").over(w_dedup)
    ).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    nxt = F.lead("ts").over(w_lead)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.lit("2100-01-01").cast("timestamp")).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@query(
    "funnel_view_click_purchase",
    sql="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel (view → later click → later
    purchase) via per-stage min-timestamp joins: each stage collapses
    to one row per user BEFORE joining (aggregate-then-join, the d1
    discipline), so every join probes one-row-per-user sides keyed by
    user_id — never the raw event stream against itself. The output
    is the classic 3-number funnel; conversion ratios are left to the
    caller (they'd be exact divisions of these)."""
    ev = t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "stream_dedup_first_event",
    sql="""
    SELECT user_id, event_type, ts, event_id
    FROM (SELECT user_id, event_type, ts, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rnk
          FROM events) r
    WHERE rnk = 1
    """,
)
def stream_dedup_first_event(spark, sf_dir):
    """Batch twin of watermark-bounded streaming dedup
    (``streaming.dedup_within_watermark`` /
    ``dropDuplicatesWithinWatermark``): the first event per
    (user_id, event_type), made deterministic for the oracle by the
    (ts, event_id) order — streaming keeps first-SEEN, which for a
    time-ordered source is the same row. One shuffle keyed by the
    dedup key; the window needs only running-min state per key, the
    batch analog of the streaming operator's one-row-per-key state
    bounded by the watermark horizon
    (``tests/test_streaming.py`` runs the real streaming twin and
    asserts key-set equivalence against this plan)."""
    return sql_over_tables(
        spark,
        sf_dir,
        """
        SELECT user_id, event_type, ts, event_id
        FROM (SELECT user_id, event_type, ts, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rnk
              FROM events) r
        WHERE rnk = 1
        """,
        ("events",),
    )


@query(
    "stream_session_dynamic_gap",
    sql=f"""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CASE WHEN event_type = 'purchase'
                  THEN {HALF_US} ELSE 600 * {_US} END AS gap_us
      FROM events
    ), marked AS (
      SELECT user_id, event_id, t_us, gap_us,
             CASE WHEN max(t_us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY t_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL THEN 1
                  WHEN t_us >= max(t_us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY t_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_s
      FROM g
    ), sess AS (
      SELECT user_id, t_us, gap_us,
             -- event_id tiebreak: a ROWS cumulative sum over a
             -- ts-only order is permutation-unstable under duplicate
             -- timestamps (sid off-by-one between engines)
             CAST(sum(new_s) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM marked
    )
    SELECT user_id,
           make_timestamp(min(t_us)) AS session_start,
           make_timestamp(max(t_us + gap_us)) AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_dynamic_gap(spark, sf_dir):
    """Session windows with a DATA-DEPENDENT gap (purchase events hold
    the session open 30 minutes, everything else 10): Spark's dynamic
    ``session_window(ts, CASE ...)`` — each event contributes the
    interval [ts, ts+gap) and overlapping intervals merge, so the
    session end is max(ts+gap) over its members. The oracle
    reproduces the merge with the gaps-and-islands running-max rule
    (new session when ts ≥ max prior ts+gap — the same half-open
    ``>=`` convention as the fixed-gap twin). One shuffle keyed by
    user_id either way; streaming state per open session only."""
    ev = t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "30 minutes").otherwise(
        "10 minutes"
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "retention_cohorts",
    sql="""
    WITH first AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, date_trunc('day', e.ts) AS d
      FROM events e
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', f.cohort, a.d) AS INT) AS days_since,
           count(DISTINCT a.user_id) AS n_active
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY f.cohort, date_diff('day', f.cohort, a.d)
    """,
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention matrix — the canonical product-analytics
    roll-up: users grouped by first-seen DAY (the test events span a
    single month, so daily cohorts are the non-vacuous granularity;
    the month variant is the same plan), activity counted per
    days-since-cohort offset. Plan: first-seen collapses to one row
    per user (map-side combined min), activity deduplicates to one
    row per (user, day), and the join is user_id-co-partitioned
    before the tiny (cohort × offset) aggregate — the fact table is
    never joined against itself raw. Day arithmetic is integral on
    truncated timestamps, so the offsets match DuckDB exactly."""
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    j = act.join(first, "user_id")
    return (
        j.groupBy(
            F.col("cohort").alias("cohort_day"),
            F.datediff("d", "cohort").cast("int").alias("days_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "stream_interval_left_join",
    sql="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS p_ts,
           round(p.value, 4) AS purchase_value,
           v.event_id AS view_id, v.ts AS v_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def stream_interval_left_join(spark, sf_dir):
    """LEFT OUTER interval stream-stream join, batch twin: every
    purchase emitted, un-attributed ones with null view columns. The
    streaming form is the semantics corner the inner join avoids —
    the null row can only surface after the watermark passes the
    purchase's join horizon (tests/test_streaming.py drives the real
    two-stream outer join and asserts equality with this plan,
    including the null rows)."""
    from trendengine_spark.streaming.joins import (
        interval_left_join_views_purchases,
    )

    ev = t(spark, sf_dir, "events")
    out = interval_left_join_views_purchases(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    )
    return out.select(
        "user_id", "purchase_id", "p_ts",
        F.round("purchase_value", 4).alias("purchase_value"),
        "view_id", "v_ts",
    )


@query(
    "stream_interval_join_capped",
    sql="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, event_id AS view_id, ts AS v_ts
      FROM events WHERE event_type = 'view'
    ), j AS (
      SELECT p.user_id, p.purchase_id, p.p_ts, p.value, v.view_id, v.v_ts,
             row_number() OVER (PARTITION BY p.purchase_id
               ORDER BY v.v_ts DESC, v.view_id DESC) AS rn,
             count(*) OVER (PARTITION BY p.purchase_id) AS n
      FROM p JOIN v ON v.user_id = p.user_id
        AND epoch_ms(v.v_ts) <= epoch_ms(p.p_ts)
        AND epoch_ms(v.v_ts) >= epoch_ms(p.p_ts) - 3600000
    )
    SELECT user_id, purchase_id, p_ts, round(value, 4) AS purchase_value,
           CAST(n AS BIGINT) AS n_views_window, CAST(rn AS INT) AS rn,
           view_id, v_ts
    FROM j WHERE rn <= 3
    UNION ALL
    SELECT p.user_id, p.purchase_id, p.p_ts, round(p.value, 4),
           CAST(0 AS BIGINT), CAST(NULL AS INT),
           CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP)
    FROM p WHERE NOT EXISTS (
      SELECT 1 FROM v WHERE v.user_id = p.user_id
        AND epoch_ms(v.v_ts) <= epoch_ms(p.p_ts)
        AND epoch_ms(v.v_ts) >= epoch_ms(p.p_ts) - 3600000
    )
    """,
)
def stream_interval_join_capped(spark, sf_dir):
    """BOUNDED interval-join twin (r13, VERDICT r12 #3): the exact
    interval join's OUTPUT is inherently superlinear — every
    (purchase, view-within-the-prior-hour) pair, ~n²/window rows as
    event density grows; sf10 died in join state. At 100 TB the
    attribution shape a pipeline actually ships is this one: per
    purchase, the window COUNT (full accounting — nothing silently
    dropped) plus the ≤3 most recent views (capped pairs,
    deterministic order: v_ts DESC, view_id DESC). Output is O(|p|),
    at any density.

    The plan builds NO pair table at all (not even capped-then-
    pruned): views get a per-user sequence number vn (one window);
    each purchase learns V_hi = #views with ts ≤ p_ts and V_lo =
    #views with ts < p_ts−1h from TWO boundary probe rows carried
    through a per-user running ``last(vn)`` (union + one window — the
    as-of-join shape, no range join); then n = V_hi − V_lo and the
    top-3 views are the EQUI-join back on (user_id, vn) for
    vn ∈ {V_hi, V_hi−1, V_hi−2} ∩ (V_lo, ∞) — a 3-row generator per
    purchase. Boundary ties are exact: the hi probe sorts AFTER
    equal-ts views (ts ≤ p_ts inclusive), the lo probe BEFORE
    (ts ≥ p_ts−1h inclusive). Millisecond integers end-to-end.

    The exact form stays declared (`stream_interval_left_join`);
    BASELINE's interval-join cliff note points here."""
    ev = t(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("pv"),
        ms.alias("p_ms"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
        ms.alias("v_ms"),
    )
    wv = Window.partitionBy("user_id").orderBy("v_ms", "view_id")
    vn = v.withColumn("vn", F.row_number().over(wv))
    probes = p.select(
        "user_id",
        "purchase_id",
        F.explode(
            F.array(
                F.struct(
                    (F.col("p_ms") - 3600000).alias("_t"),
                    F.lit(0).alias("_k"),
                ),
                F.struct(F.col("p_ms").alias("_t"), F.lit(2).alias("_k")),
            )
        ).alias("b"),
    ).select(
        "user_id",
        "purchase_id",
        F.col("b._t").alias("_t"),
        F.col("b._k").alias("_k"),
    )
    pid_type = p.schema["purchase_id"].dataType
    uni = probes.withColumn("_vn", F.lit(None).cast("int")).unionByName(
        vn.select(
            "user_id",
            F.lit(None).cast(pid_type).alias("purchase_id"),
            F.col("v_ms").alias("_t"),
            F.lit(1).alias("_k"),
            F.col("vn").alias("_vn"),
        )
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("_t", "_k", F.col("_vn").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = uni.withColumn("_V", F.last("_vn", ignorenulls=True).over(wrun))
    bnd = (
        run.filter(F.col("purchase_id").isNotNull())
        .groupBy("user_id", "purchase_id")
        .agg(
            F.max(
                F.when(F.col("_k") == 2, F.coalesce("_V", F.lit(0)))
            ).alias("v_hi"),
            F.max(
                F.when(F.col("_k") == 0, F.coalesce("_V", F.lit(0)))
            ).alias("v_lo"),
        )
    )
    cand = (
        bnd.select(
            "user_id",
            "purchase_id",
            (F.col("v_hi") - F.col("v_lo")).alias("n"),
            "v_hi",
            "v_lo",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"),
        )
        .withColumn("vn", F.col("v_hi") - F.col("j"))
        .filter(F.col("vn") > F.col("v_lo"))
    )
    hits = cand.join(
        vn.select("user_id", "vn", "view_id", "v_ts"), ["user_id", "vn"]
    ).select(
        "user_id",
        "purchase_id",
        "n",
        (F.col("j") + 1).alias("rn"),
        "view_id",
        "v_ts",
    )
    return p.join(hits, ["user_id", "purchase_id"], "left").select(
        "user_id",
        "purchase_id",
        "p_ts",
        F.round("pv", 4).alias("purchase_value"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_views_window"),
        F.col("rn").cast("int").alias("rn"),
        "view_id",
        "v_ts",
    )


@query(
    "temporal_scd2_lookup",
    sql="""
    WITH hist AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             coalesce(lead(ts) OVER w, TIMESTAMP '2100-01-01') AS valid_to
      FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
      )
      WHERE prev_type IS NULL OR prev_type <> event_type
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT h.state AS state_before_purchase, count(*) AS n_purchases
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN hist h ON p.user_id = h.user_id
               AND h.valid_from < p.ts AND p.ts <= h.valid_to
    GROUP BY h.state
    """,
)
def temporal_scd2_lookup(spark, sf_dir):
    """Temporal (AS-OF state) lookup — the bitemporal-warehouse
    pattern the SCD2 history exists FOR: each purchase joined to the
    user's state interval in force just BEFORE its timestamp (strict
    lower bound excludes the state change the purchase itself starts
    — with an inclusive bound every answer is trivially 'purchase').
    Equi-join on user_id + half-open validity range as the residual:
    one shuffle keyed by user, each probe matching at most one
    interval (a user's very first event has no prior state and drops).
    Reuses the oracle-checked scd2_user_event_history builder, so
    history construction and lookup are verified as a composition."""
    hist = scd2_user_event_history(spark, sf_dir)
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    j = p.join(
        hist,
        (p.p_user == hist.user_id)
        & (hist.valid_from < p.p_ts)
        & (p.p_ts <= hist.valid_to),
    )
    return j.groupBy(F.col("state").alias("state_before_purchase")).agg(
        F.count(F.lit(1)).alias("n_purchases")
    )


@query(
    "stream_user_running_stats",
    sql="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_user_running_stats(spark, sf_dir):
    """Batch twin of the transformWithStateInPandas running-stats
    processor (`streaming/stateful2.py` — Spark 4 stateful API v2:
    named typed state variables per key). Per user: event count,
    exact money in integer cents, max value. The streaming processor
    accumulates the SAME integer cents (SQL ROUND semantics inside
    the Arrow batch), so its final Update-mode row per key equals
    this aggregate bit-for-bit regardless of microbatch boundaries —
    the incremental≡one-shot contract all the streaming twins in
    this module share. The TWS runtime needs google.protobuf (its
    state protocol), which this container cannot install, so the
    live-stream equivalence test skips with that reason and this
    oracle-checked twin carries the correctness evidence."""
    return sql_over_tables(
        spark,
        sf_dir,
        """
        SELECT user_id,
               CAST(count(1) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               round(max(value), 6) AS max_value
        FROM events
        GROUP BY user_id
        """,
        ("events",),
    )
