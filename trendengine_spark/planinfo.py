"""Structured physical-plan introspection.

The scale rules this repo enforces in ``tests/test_plans.py`` (no
cartesian products, filters reaching the scan, dims broadcast, no
single-partition windows) are useful to USERS too — before running a
new query at 100 TB you want the same checks without grepping
``explain()`` text by hand. :func:`plan_digest` parses the executed
plan once into a small dict of facts; :func:`assert_scale_safe` turns
the common rules into one call.

This reads the final (post-AQE-planning) physical plan string — the
same artifact ``df.explain()`` prints — so it works on any DataFrame
with no private APIs beyond ``queryExecution().executedPlan()``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_digest(df: DataFrame) -> dict:
    """Summarize the physical plan into counters + scan details.

    Returns::

        {
          "exchanges": int,            # shuffle exchanges (not broadcast)
          "broadcast_joins": int,
          "sort_merge_joins": int,
          "shuffled_hash_joins": int,
          "nested_loop_joins": int,    # incl. broadcast NL
          "cartesian_products": int,
          "global_windows": int,       # windowspecdefinition with no
                                       # partition column (all-to-one-task)
          "scans": [{"pushed_filters": str, "read_schema": str}, ...],
        }
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def count(pat: str) -> int:
        return sum(1 for l in lines if re.search(pat, l))

    global_windows = 0
    for l in lines:
        if "windowspecdefinition(" not in l:
            continue
        head = l.split("windowspecdefinition(", 1)[1].split(
            "specifiedwindowframe"
        )[0]
        first = head.split(",")[0]
        if head.strip().startswith("specifiedwindowframe") or (
            " ASC" in first or " DESC" in first
        ):
            global_windows += 1

    scans = []
    for l in lines:
        if "PushedFilters" not in l:
            continue
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", l)
        rs = re.search(r"ReadSchema: ([^,]+(?:<[^>]*>)?)", l)
        scans.append(
            {
                "pushed_filters": pf.group(1) if pf else "",
                "read_schema": rs.group(1) if rs else "",
            }
        )

    return {
        "exchanges": count(r"\bExchange (?:hash|range|Single)"),
        "broadcast_joins": count(r"BroadcastHashJoin"),
        "sort_merge_joins": count(r"SortMergeJoin"),
        "shuffled_hash_joins": count(r"ShuffledHashJoin"),
        "nested_loop_joins": count(r"NestedLoopJoin"),
        "cartesian_products": count(r"CartesianProduct"),
        "global_windows": global_windows,
        "scans": scans,
    }


def assert_scale_safe(
    df: DataFrame,
    allow_nested_loop: bool = False,
    allow_global_window: bool = False,
) -> dict:
    """Raise if the plan carries the classic scale-killers (cartesian
    product; nested-loop join unless the caller vouches it is a
    bounded 1-row side; unpartitioned window unless vouched bounded).
    Returns the digest so callers can add their own checks."""
    d = plan_digest(df)
    problems = []
    if d["cartesian_products"]:
        problems.append(f"{d['cartesian_products']} cartesian product(s)")
    if d["nested_loop_joins"] and not allow_nested_loop:
        problems.append(f"{d['nested_loop_joins']} nested-loop join(s)")
    if d["global_windows"] and not allow_global_window:
        problems.append(
            f"{d['global_windows']} unpartitioned (single-task) window(s)"
        )
    if problems:
        raise AssertionError(
            "plan is not scale-safe: " + "; ".join(problems)
        )
    return d


def observed_metrics(df: DataFrame, name: str = "metrics", **aggs):
    """Attach zero-cost pipeline metrics to a DataFrame via Spark's
    Observation API: the aggregates in ``aggs`` are computed DURING
    the next action on the returned frame (inside the same pass — no
    second scan, works on any plan incl. streaming foreachBatch
    batches). Returns ``(df, observation)``; read
    ``observation.get`` after an action completes.

    Example::

        df2, obs = observed_metrics(df, rows=F.count(F.lit(1)),
                                    nulls=F.count_if(F.col("v").isNull()))
        df2.write.parquet(path)
        print(obs.get)   # {'rows': ..., 'nulls': ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in aggs.items()])
    return out, obs
