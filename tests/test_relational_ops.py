"""Unit tests for the relational helper operators (as-of join, top-k)
against hand-computed expectations."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from trendengine_spark.operators.relational import asof_join, topk_per_group


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 3],
                "t": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 09:00",
                     "2024-01-01 10:00", "2024-01-01 10:00"]
                ),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "rt": pd.to_datetime(
                    ["2024-01-01 09:30", "2024-01-01 10:30", "2024-01-01 10:00"]
                ),
                "payload": ["a", "b", "c"],
            }
        )
    )
    out = (
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # k=1 @09:00 → no prior; @10:00 → a (09:30); @11:00 → b (10:30)
    assert out.loc[0, "payload"] is None or pd.isna(out.loc[0, "payload"])
    assert out.loc[1, "payload"] == "a"
    assert out.loc[2, "payload"] == "b"
    # k=2 @10:00 → exact-equality match (inclusive)
    assert out.loc[3, "payload"] == "c"
    # k=3 → no right rows at all
    assert pd.isna(out.loc[4, "payload"])


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "t": pd.to_datetime(["2024-01-02", "2024-01-02"])})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rt": pd.to_datetime(["2024-01-01"]), "v": [9.0]})
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", how="inner")
    assert out.count() == 1


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 5 + ["b"] * 2, "v": [5, 3, 9, 1, 7, 2, 8]})
    )
    out = (
        topk_per_group(df, ["g"], [F.desc("v")], k=2)
        .toPandas()
        .sort_values(["g", "rn"])
    )
    assert out[out["g"] == "a"]["v"].tolist() == [9, 7]
    assert out[out["g"] == "b"]["v"].tolist() == [8, 2]


def test_asof_join_rejects_payload_collision(spark):
    import pytest

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-02"]), "v": [1.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rt": pd.to_datetime(["2024-01-01"]), "v": [9.0]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")
