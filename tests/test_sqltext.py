"""SQL front-end (sqltext.sql_over_tables): view memoization must
never leak data across scale factors, and every call must yield an
independent fresh plan."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from trendengine_spark.queries import all_queries

SF_MID = "/root/testdata/sf0.01"


def test_views_reregister_on_sf_dir_change(spark):
    """The same session queried at two scale factors must see each
    sf_dir's data — the memoized temp views re-register when the
    requested sf_dir changes (a stale view would silently serve the
    previous scale's table)."""
    fn = all_queries()["a1_annual_composite"]
    small = fn(spark, SF_SMOKE).toPandas()
    mid = fn(spark, SF_MID).toPandas()
    again = fn(spark, SF_SMOKE).toPandas()
    # value columns differ across scales (same group keys, different data)
    assert not small["value"].equals(mid["value"])
    # and switching back restores the original result exactly
    assert small.sort_values(["l_returnflag", "yr"]).reset_index(drop=True).equals(
        again.sort_values(["l_returnflag", "yr"]).reset_index(drop=True)
    )


def test_fresh_plan_per_call(spark):
    """Two calls must build independent DataFrames (fresh analysis,
    fresh exprIds) — the bench's no-stage-reuse guarantee."""
    fn = all_queries()["tpch_q3_shipping_priority"]
    df1, df2 = fn(spark, SF_SMOKE), fn(spark, SF_SMOKE)
    assert df1 is not df2
    assert df1._jdf.queryExecution().id() != df2._jdf.queryExecution().id()
    assert df1.count() == df2.count()
