"""te_region Python data source: schema, cadence, pushdown pruning,
golden values, and the acquisition→composite integration path."""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from trendengine_spark.sources import register_sources
from trendengine_spark.sources.region import (
    RegionReader,
    _dates_for_year,
    synthetic_ndvi,
)


@pytest.fixture()
def region_df(spark):
    register_sources(spark)
    return (
        spark.read.format("te_region")
        .option("dataset", "gimms")
        .option("bbox", "0,0,4,4")
        .option("years", "2001,2003")
        .load()
    )


def test_schema_and_counts(region_df):
    assert [f.name for f in region_df.schema.fields] == [
        "series_id", "image_id", "longitude", "latitude", "time", "value",
    ]
    # 8×8 pixels (scale 0.5° over 4°×4°) × 24 bimonthly dates × 3 years
    assert region_df.count() == 8 * 8 * 24 * 3


def test_cadences():
    assert len(_dates_for_year(2001, None)) == 24  # bimonthly
    assert len(_dates_for_year(2001, 16)) == 23  # 16-day MODIS year


def test_exact_filters_after_pruning(region_df):
    filt = region_df.filter(
        (F.col("time") >= F.lit("2002-01-01").cast("timestamp"))
        & (F.col("time") < F.lit("2003-01-01").cast("timestamp"))
    )
    assert filt.count() == 8 * 8 * 24  # exactly one year survives
    bb = region_df.filter((F.col("longitude") >= 2.0) & (F.col("latitude") < 2.0))
    assert bb.count() == 4 * 4 * 24 * 3


def test_pushdown_prunes_partition_grid():
    """Reader-level check: a time range must shrink the tile-year
    grid BEFORE generation (2 tiles × 1 year instead of × 3)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    opts = {"dataset": "gimms", "bbox": "0,0,4,2", "years": "2001,2003",
            "tile_deg": "2.0"}
    r = RegionReader(opts)
    assert len(r.partitions()) == 2 * 1 * 3
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("time",), datetime(2002, 1, 1)),
                LessThan(("time",), datetime(2003, 1, 1)),
            ]
        )
    )
    assert len(r.partitions()) == 2 * 1 * 2  # years 2002..2003 planned
    assert len(leftover) == 2  # exact bounds re-applied by Spark


def test_overfiltered_request_is_empty_not_error():
    """The reference exits with an error page when the request
    over-runs capacity or matches nothing; the engine's contract is
    an empty typed result (SURVEY §4.4)."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    r = RegionReader({"dataset": "gimms", "years": "2001,2002"})
    list(r.pushFilters([GreaterThanOrEqual(("time",), datetime(2010, 1, 1))]))
    assert r.partitions() == []


def test_synthetic_golden_and_range():
    """The synthetic field is a pure function — golden-pin one value
    per dataset and the documented output ranges."""
    v = synthetic_ndvi("gimms", np.array([1.0]), np.array([2.0]), 46)
    expected = 0.25 + 0.35 * math.sin(2 * math.pi * 46 / 365.25 + 0.1) + 0.2 * math.cos(0.1)
    assert v[0] == round(expected, 6)
    lons = np.linspace(-180, 180, 50)
    lats = np.linspace(-60, 80, 50)
    g = synthetic_ndvi("gimms", lons, lats, 200)
    m = synthetic_ndvi("modis", lons, lats, 200)
    assert (-1 <= g).all() and (g <= 1).all()
    assert (-2000 <= m).all() and (m <= 10000).all()


def test_acquisition_to_composite_pipeline(spark, region_df):
    """The reference's acquire→composite flow over the source: one
    annual mean per pixel-year, series count = pixel count."""
    from trendengine_spark.operators.composite import annual_composite

    ann = annual_composite(
        region_df.select("longitude", "latitude", "time", "value"),
        ["longitude", "latitude"],
    )
    rows = ann.groupBy("yr").count().orderBy("yr").collect()
    assert [r["yr"] for r in rows] == [2001, 2002, 2003]
    assert all(r["count"] == 64 for r in rows)


def test_stream_reader_offsets_and_partitions():
    """Offset admission: each latestOffset call admits at most
    dates_per_batch dates; a batch splits into one partition per
    tile; an empty range yields a single empty partition."""
    from trendengine_spark.sources.region import RegionStreamReader

    r = RegionStreamReader(
        {"dataset": "gimms", "bbox": "0,0,4,2", "years": "2001,2001",
         "tile_deg": "2.0", "dates_per_batch": "10"}
    )
    assert r.initialOffset() == {"i": 0}
    assert r.latestOffset() == {"i": 10}
    assert r.latestOffset() == {"i": 20}
    assert r.latestOffset() == {"i": 24}  # capped at 24 bimonthly dates
    assert r.latestOffset() == {"i": 24}
    parts = r.partitions({"i": 0}, {"i": 10})
    assert len(parts) == 2  # one per tile
    assert len(parts[0].dates) == 10
    empty = r.partitions({"i": 24}, {"i": 24})
    assert len(empty) == 1 and empty[0].dates == ()


def test_stream_equals_batch_acquisition(spark, tmp_path):
    """The streamed backfill must reproduce the batch reader's rows
    exactly — same pixels, dates, values — across microbatches."""
    register_sources(spark)
    opts = {"dataset": "gimms", "bbox": "0,0,2,2", "years": "2001,2001"}
    batch = spark.read.format("te_region").options(**opts).load()
    stream = (
        spark.readStream.format("te_region")
        .options(**opts)
        .option("dates_per_batch", "7")
        .load()
    )
    agg = stream.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("region_stream_eq")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM region_stream_eq").collect()[0]
    want = batch.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
    ).collect()[0]
    assert (got.n, got.mean_v) == (want.n, want.mean_v)


def test_pushdown_never_changes_results(spark):
    """Pruning must be conservative: for non-tile-aligned and
    boundary-exact range predicates, the filtered scan must return
    EXACTLY the rows the unfiltered scan would after filtering —
    the r6 review found a version that re-anchored the pixel grid at
    the pushed bound (different coordinates AND values)."""
    register_sources(spark)
    df = (
        spark.read.format("te_region")
        .option("dataset", "gimms")
        .option("bbox", "0,0,4,4")
        .option("years", "2001,2001")
        .load()
    )
    full = df.collect()
    for pred in [
        (F.col("longitude") >= 1.8),          # non-aligned lower bound
        (F.col("longitude") <= 2.0),          # exact boundary pixel kept
        (F.col("latitude") > 0.5) & (F.col("latitude") < 2.5),
        (F.col("longitude") >= 1.8) & (F.col("time") >= F.lit("2001-06-01").cast("timestamp")),
    ]:
        got = sorted(
            (r.longitude, r.latitude, r.time, r.value) for r in df.filter(pred).collect()
        )
        # reference: filter applied to the UNPRUNED full materialization
        import pandas as pd

        fdf = spark.createDataFrame(full, df.schema).filter(pred)
        want = sorted(
            (r.longitude, r.latitude, r.time, r.value) for r in fdf.collect()
        )
        assert got == want and len(got) > 0


def test_versioned_sink_writer_commits_and_appends(spark, tmp_path):
    """te_versioned writer: Spark's job commit publishes one manifest
    per save; append folds previous files; time travel sees each
    commit; empty partitions stage nothing."""
    import pandas as pd

    from trendengine_spark.sources import register_sources
    from trendengine_spark.tablelog import current_version, read_versioned

    register_sources(spark)
    path = str(tmp_path / "vt_sink")

    df1 = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    ).repartition(4)  # > row count: some partitions empty
    df1.write.format("te_versioned").mode("append").save(path)
    assert current_version(path) == 0
    assert {r.k for r in read_versioned(spark, path).collect()} == {1, 2}

    df2 = spark.createDataFrame(pd.DataFrame({"k": [3], "v": ["c"]}))
    df2.write.format("te_versioned").mode("append").save(path)
    assert current_version(path) == 1
    assert {r.k for r in read_versioned(spark, path).collect()} == {1, 2, 3}

    df3 = spark.createDataFrame(pd.DataFrame({"k": [9], "v": ["z"]}))
    df3.write.format("te_versioned").mode("overwrite").save(path)
    assert {r.k for r in read_versioned(spark, path).collect()} == {9}
    # time travel still sees the appended generation
    assert {r.k for r in read_versioned(spark, path, version=1).collect()} == {
        1, 2, 3,
    }
