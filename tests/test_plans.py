"""Physical-plan discipline tests: the properties that make these
queries survive a 100× scale-up are asserted, not hoped for —
pushdown reaches the scan, small dimensions broadcast, aggregation is
partial+final, and nothing falls back to a cartesian product."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from trendengine_spark.queries import REGISTRY


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    p = plan_of(spark, "tpch_q1_pricing_summary")
    scan = next(l for l in p.splitlines() if "FileScan" in l)
    assert "l_shipdate" in p[p.index("DataFilters") :][:200]  # filter reaches scan
    # projection pruning: orderkey/partkey/suppkey not read
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_q1_partial_aggregation(spark):
    p = plan_of(spark, "tpch_q1_pricing_summary")
    assert "partial_sum" in p  # map-side combine before the exchange


def test_dim_join_broadcasts(spark):
    p = plan_of(spark, "join_inner_3way")
    assert "BroadcastHashJoin" in p


def test_topn_uses_take_ordered(spark):
    p = plan_of(spark, "sort_limit_topn")
    assert "TakeOrderedAndProject" in p  # no global sort


def test_no_cartesian_products_anywhere(spark):
    """No declared query may plan a CartesianProduct; the only
    broadcast nested loops allowed are the intentional tiny-side
    ones (query-vector broadcast in similarity search)."""
    # intentional tiny-build-side broadcasts: query vectors (similarity),
    # a 1-row global aggregate (scalar subquery, watermark horizon,
    # the skew profile's 1-row × 1-row roll-up join)
    allowed_bnlj = {
        "sim_cosine_topk",
        "sim_ann_hyperplane",
        "subquery_scalar_avg",
        "stream_late_data_policy",
        "profile_key_skew",
        # 1-row scalar-average broadcast (same shape as
        # subquery_scalar_avg): build side is a global aggregate
        "tpch_q22_global_sales_opportunity",
        # three 1-row global aggregates cross-joined into the final
        # funnel row — every side is a single row by construction
        "funnel_view_click_purchase",
        # r8: 10 packed query codes broadcast against the code scan —
        # the brute-force-over-8-byte-codes probe shape (same class
        # as the query-vector broadcasts above)
        "sim_hamming_topk",
        # r8: 1-row running-sum total broadcast into the quota calc
        # (same shape as the funnel's global aggregates)
        "pipeline_temperature_mixture",
        # r8: 1-row exact-total broadcast into the verify filter of
        # the Misra-Gries heavy-hitter pass
        "profile_heavy_hitters",
        # r9: the same 10-query-code/vector broadcast theta probe as
        # sim_hamming_topk / sim_cosine_topk, composed (stage 1 of
        # the rerank; both rankers of the fusion)
        "sim_two_stage_rerank",
        "sim_rrf_fusion",
        # r9: T(T-1)/2 group-pair rows (T = #event types, bounded by
        # contract) broadcast against the distinct-hash table — the
        # KMV sketch-algebra analog of the HLL sketch pair join
        "approx_user_overlap_kmv",
        # r10 (newly oracle-backed, so newly plan-checked): the
        # adaptive-cut broadcast — a 1-row least(percentile, nth-best)
        # scalar joined onto the scored pairs, same class as
        # subquery_scalar_avg
        "sim_embedding_near_dup",
    }
    offenders = []
    for name in sorted(REGISTRY):
        if REGISTRY[name].sql is None and name not in allowed_bnlj:
            continue  # rows-only UDF queries exercised elsewhere
        try:
            p = plan_of(spark, name)
        except Exception:
            continue
        if "CartesianProduct" in p:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in p and name not in allowed_bnlj:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


def test_d1_is_hash_join_not_nested_loop(spark):
    p = plan_of(spark, "d1_period_pairing")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_canonical_layout_partition_pruning(spark, tmp_path):
    """SURVEY §1.4: observations partitioned by (series_id, year) —
    a year filter must prune partitions at plan time."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "series_id": ["gimms"] * 40,
            "yr": [1990 + i % 4 for i in range(40)],
            "value": [float(i) for i in range(40)],
        }
    )
    path = str(tmp_path / "obs")
    spark.createDataFrame(pdf).write.partitionBy("series_id", "yr").parquet(path)
    df = spark.read.parquet(path).filter(F.col("yr") == 1991)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the year predicate must appear as a partition filter (plan-time
    # pruning), not a data filter; note inputFiles() reflects the
    # pre-pruning relation listing so it can't be used here
    pf = plan[plan.index("PartitionFilters") :][:120]
    assert "yr" in pf and "1991" in pf, pf
    assert df.count() == 10


def test_ivf_probe_join_broadcasts(spark):
    """IVF candidate generation must be a broadcast hash join on the
    cell key (probe side is |queries|·nprobe rows) — a shuffled join
    here would re-partition the whole corpus per search."""
    p = plan_of(spark, "sim_ivf_topk")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_frame_sample_prunes_payload_column(spark):
    """Frame sampling reads only (doc_id, duration) — the media binary
    payload must not reach the mapInPandas scan (at 100 TB the payload
    dominates row size; shipping it through Arrow for a metadata-only
    fan-out would be the bottleneck)."""
    from trendengine_spark.operators.multimodal import (
        attach_fake_video,
        sample_frames,
    )
    from trendengine_spark.tables import load_table

    df = sample_frames(
        attach_fake_video(load_table(spark, SF_SMOKE, "documents")),
        fake=True,
    )
    scan = next(
        l
        for l in df._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan" in l
    )
    assert "text" in scan or "doc_id" in scan  # schema is projected at all
    # n_chars/source/lang are unrelated columns; they must be pruned
    assert "n_chars" not in scan and "source" not in scan


def test_winnow_is_single_pass_no_shuffle(spark):
    """Winnowing fingerprints are a single hashing pass: the only
    Exchange allowed is fan_out's deliberate round-robin widening of
    a degenerate (single-row-group) scan — any hash/range Exchange
    means an accidental shuffle of the full text corpus."""
    p = plan_of(spark, "text_winnow_fingerprints")
    stripped = p.replace("BroadcastExchange", "")
    for line in stripped.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line


def test_percent_rank_has_no_global_window(spark):
    """Global ranking must be the two-pass range-partitioned operator:
    every WindowExec in the plan must be partitioned (on the range
    partition id), never an empty-partition global window that funnels
    all rows to one task (VERDICT r2 item 6)."""
    p = plan_of(spark, "window_percent_rank")
    window_lines = [l for l in p.splitlines() if "windowspecdefinition" in l]
    assert window_lines, "expected a Window node in the plan"
    for line in window_lines:
        assert "_pid" in line, f"unpartitioned global window: {line}"


def test_ranked_global_matches_naive_window(spark):
    """ranked_global's three outputs must equal the single-partition
    window's on a sorted-with-ties input (ties share rank; cume_dist
    is tie-inclusive)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.operators.relational import ranked_global

    df = spark.createDataFrame(
        [(k, v) for k, v in zip(range(100), [i % 7 for i in range(100)])],
        schema="id int, key int",
    )
    got = {
        r["id"]: (r["_rank"], r["_pct_rank"], r["_cume_dist"])
        for r in ranked_global(df, ["key"], num_partitions=8).collect()
    }
    w = Window.orderBy("key")
    want = {
        r["id"]: (r["r"], r["pr"], r["cd"])
        for r in df.select(
            "id",
            F.rank().over(w).alias("r"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    assert got == want


def test_q6_all_filters_reach_scan(spark):
    """TPC-H Q6 is the canonical pushdown probe: shipdate, discount,
    and quantity predicates must all appear in the scan's pushed
    filters — a residual Filter-above-scan on any of them means the
    parquet reader does wasted IO at 100 TB."""
    p = plan_of(spark, "tpch_q6_forecast_revenue")
    pushed = p[p.index("PushedFilters") :][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_ranked_global_has_no_lineage_truncation(spark):
    """The ranked path must not localCheckpoint (VERDICT r4 wrong #5):
    bucket ids are a deterministic function of the key tuple, so the
    plan keeps full lineage — executor loss recomputes instead of
    aborting. Probe: the INPUT's Range scan must survive into the
    physical plan — a localCheckpoint would replace it with a
    materialized-RDD scan. (The tiny broadcast offsets table is a
    driver-local RDD and legitimately appears as ExistingRDD; only the
    input side matters.)"""
    from trendengine_spark.operators.relational import ranked_global

    df = spark.range(1000).withColumnRenamed("id", "key")
    plan = (
        ranked_global(df, ["key"], num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Range (0, 1000" in plan, plan[:800]


def test_ranked_global_ties_multicol_and_timestamps(spark):
    """Boundary literals must work for multi-column keys including
    timestamps, and heavy ties (few distinct keys, many buckets) must
    still produce exact global ranks."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.operators.relational import ranked_global

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i % 3), f"g{i % 2}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, schema="id int, ts timestamp, g string")
    got = {
        r["id"]: (r["_rank"], r["_cume_dist"])
        for r in ranked_global(df, ["ts", "g"], num_partitions=16).collect()
    }
    w = Window.orderBy("ts", "g")
    want = {
        r["id"]: (r["r"], r["cd"])
        for r in df.select(
            "id", F.rank().over(w).alias("r"), F.cume_dist().over(w).alias("cd")
        ).collect()
    }
    assert got == want


def test_ranked_partitions_scales_with_size_estimate(spark):
    """_ranked_partitions must derive the bucket count from the
    optimizer's size estimate, not defaultParallelism: a plan whose
    estimated bytes far exceed maxPartitionBytes must get
    proportionally more buckets than the parallelism floor."""
    from trendengine_spark.operators.relational import _ranked_partitions

    floor = spark.sparkContext.defaultParallelism
    max_bytes = int(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        .lower()
        .removesuffix("b")
    )
    # ~64 bytes/row estimate → pick a row count that dwarfs the floor
    target_parts = floor * 4
    rows = (target_parts * max_bytes) // 64
    big = spark.range(rows).selectExpr("id", "repeat('x', 48) AS pad")
    n = _ranked_partitions(big)
    assert n > floor, f"expected > {floor} buckets, got {n}"


def test_pipeline_query_plans_minimal(spark):
    """pack = exactly one exchange (hash on shard) + one sort;
    stratified sample = zero exchanges (pure filter)."""
    from trendengine_spark.queries import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    pack = (
        qs["pipeline_pack_sequences"](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert pack.count("Exchange") == 1, pack[:600]
    samp = (
        qs["pipeline_stratified_sample"](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in samp, samp[:600]


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """At warehouse scale a selective dim filter should reach the fact
    side BEFORE the shuffle: Spark's runtime bloom filter injects a
    might_contain(...) predicate built from the filtered build side.
    The trigger thresholds are sized for real tables
    (applicationSideScanSizeThreshold defaults to 10GB), so the test
    lowers them to prove the mechanism our 100 TB posture relies on
    is live in this engine build, then restores the session."""
    from trendengine_spark.tables import load_table

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            "o_orderpriority = '1-URGENT' "
            "AND o_orderdate >= TIMESTAMP '1997-06-01'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:800]
        assert "bloom_filter_agg" in plan, plan[:800]
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_range_frame_has_no_global_window(spark):
    """The trailing-range query must run its RANGE window PARTITIONED
    (halo-bucketed trailing_range_aggs), never as a single-task
    global-order WindowExec."""
    p = plan_of(spark, "window_range_frame")
    window_lines = [l for l in p.splitlines() if "windowspecdefinition" in l]
    assert window_lines, "expected a Window node in the plan"
    for line in window_lines:
        assert "_bkt" in line, f"unpartitioned global window: {line}"


def test_plan_digest_counts_and_scale_guard(spark):
    """plan_digest must count join/exchange/window facts correctly on
    known plans, and assert_scale_safe must catch a cartesian and a
    global window while passing clean plans."""
    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trendengine_spark.planinfo import assert_scale_safe, plan_digest
    from trendengine_spark.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")

    d = plan_digest(o.join(F.broadcast(c), o.o_custkey == c.c_custkey))
    assert d["broadcast_joins"] == 1 and d["cartesian_products"] == 0

    filtered = o.filter(F.col("o_orderkey") < 100).select("o_orderkey")
    d2 = plan_digest(filtered)
    assert any("o_orderkey" in s["pushed_filters"] for s in d2["scans"])
    assert_scale_safe(filtered)  # clean plan passes

    cart = o.limit(5).crossJoin(c.limit(5))
    with pytest.raises(AssertionError, match="cartesian|nested-loop"):
        assert_scale_safe(cart)

    gw = o.limit(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    with pytest.raises(AssertionError, match="single-task"):
        assert_scale_safe(gw)
    assert_scale_safe(gw, allow_global_window=True)


def test_observed_metrics_collected_in_same_action(spark):
    """Observation metrics must match a direct aggregate without a
    second scan (collected during the same action)."""
    from pyspark.sql import functions as F

    from trendengine_spark.planinfo import observed_metrics
    from trendengine_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    df, obs = observed_metrics(
        ev.filter(F.col("event_type") == "purchase"),
        rows=F.count(F.lit(1)),
        v_sum=F.round(F.sum(F.col("value").cast("decimal(18,10)")), 4).cast(
            "double"
        ),
    )
    n_action = df.count()
    got = obs.get
    assert got["rows"] == n_action
    want = (
        ev.filter("event_type = 'purchase'")
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,10)")), 4)
            .cast("double")
            .alias("s")
        )
        .collect()[0]["s"]
    )
    assert got["v_sum"] == want


def test_paragraph_dedup_aggregates_not_window(spark):
    """dedup_paragraph_global's kept/copies verdict must come from a
    partial+final hash aggregate on the block hash plus a join-back —
    NOT from a window over PARTITION BY h. A window admits no partial
    aggregation, so a 10^8-copy boilerplate block would land on one
    task; the aggregate absorbs it map-side and AQE can split the
    join-back's probe side (VERDICT r6 task 2)."""
    p = plan_of(spark, "dedup_paragraph_global")
    assert "Window" not in p
    assert "partial_count" in p  # map-side combine on h
    assert "partial_min" in p  # winner selection is aggregated too


def test_epoch_shuffle_single_ranked_pass(spark):
    """pipeline_epoch_shuffle at E epochs must plan ONE range-bucketed
    ranking pipeline (epoch leads the order; per-epoch position is
    arithmetic) — not E per-epoch subplans unioned (r6 shape, linear
    plan growth in E)."""
    p = plan_of(spark, "pipeline_epoch_shuffle")
    assert "Union" not in p
    # exactly one WindowExec, partitioned by the range bucket id
    assert p.count("Window") - p.count("WindowGroupLimit") == 1


def test_gram_moments_partial_final_aggregate(spark):
    """The exact-Gram fit must be ONE partial+final hash aggregate
    (map-side combine absorbs the corpus; the shuffle carries only
    O(groups * d^2) sums) — no window, no join, no second exchange."""
    from trendengine_spark.operators.linmodel import gram_moments
    from trendengine_spark.queries.base import t as _t
    from pyspark.sql import functions as F

    docs = _t(spark, SF_SMOKE, "documents").select(
        "lang", F.col("n_chars").cast("long").alias("x")
    )
    plan = (
        gram_moments(docs, ["x"], ["lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "partial_" in plan.lower() or "partial" in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan
