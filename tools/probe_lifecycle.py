"""Stage decomposition for flagship_lifecycle_pipeline (guide §1):
where does the 1.4 s (r13 warm bench) actually go?

Stages timed separately, same session, min-of-N:
  acquire  = te_region synthesis (40 tile-year InputPartitions) +
             persist + materialize
  commit   = write_versioned_clustered (bounds agg over the cache +
             Morton range-shuffle + staging parquet write + manifest)
  readback = read_versioned AOI (manifest prune) + annual composite +
             PolyTrend applyInPandas + category rollup (noop sink)
  full     = the registry callable end-to-end, for the cross-check

Run: python tools/probe_lifecycle.py [n_reps]

Declined experiment recorded here (r14 session 5): fusing te_region's
one-RecordBatch-per-image-date emission into large concatenated
batches (a guide §4.2 batch-size lever; 960 × 64-row batches → 40)
looked like −29% on the acquire stage in a block-ordered re-run — and
an INTERLEAVED A/B (batch_rows knob, row-hash-identical arms) read A
(per-date) min 1.179 s vs B (fused) min 1.271 s with A ahead in 3 of
5 warm pairs: the block-ordered "win" was ambient drift (the session-4
lesson, reconfirmed). The acquisition cost is the per-partition
Python-source dispatch, not per-batch Arrow IPC; the source keeps the
simple per-date emission.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from trendengine_spark.functions.polytrend import polytrend_groups
    from trendengine_spark.operators.composite import annual_composite
    from trendengine_spark.session import get_spark
    from trendengine_spark.sources import register_sources
    from trendengine_spark.tablelog import (
        read_versioned,
        write_versioned_clustered,
    )

    spark = get_spark(
        app_name="probe_lifecycle",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    sc = spark.sparkContext
    register_sources(spark)

    def acquire():
        return (
            spark.read.format("te_region")
            .option("dataset", "gimms")
            .option("bbox", "0,0,8,8")
            .option("years", "2001,2010")
            .option("tile_deg", "4")
            .load()
            .select("longitude", "latitude", "time", "value")
        )

    path = os.path.join(
        tempfile.gettempdir(),
        f"te_probe_lifecycle_{hashlib.md5(b'probe').hexdigest()[:8]}",
    )

    stage_times: dict[str, list[float]] = {
        "acquire": [], "commit": [], "readback": [], "full": [],
    }
    for i in range(reps):
        shutil.rmtree(path, ignore_errors=True)
        sc.setJobDescription(f"lifecycle probe rep{i}")

        t0 = time.perf_counter()
        obs = acquire()
        obs.persist()
        obs.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        write_versioned_clustered(
            spark, obs, path, ("longitude", "latitude"), num_partitions=16
        )
        obs.unpersist()
        t2 = time.perf_counter()
        aoi = (4.0, 6.0)
        scan = read_versioned(
            spark, path, predicate={"longitude": aoi, "latitude": aoi}
        ).filter(
            (F.col("longitude") >= aoi[0]) & (F.col("longitude") < aoi[1])
            & (F.col("latitude") >= aoi[0]) & (F.col("latitude") < aoi[1])
        )
        ann = annual_composite(scan, ["longitude", "latitude"])
        trends = polytrend_groups(
            ann, ["longitude", "latitude"],
            time_col="period_start", value_col="value",
        )
        out = (
            trends.groupBy("trend_type", "direction")
            .agg(
                F.count("*").cast("long").alias("n_pixels"),
                F.round(F.avg("slope"), 6).alias("avg_slope"),
            )
            .orderBy("trend_type", "direction")
        )
        out.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        stage_times["acquire"].append(t1 - t0)
        stage_times["commit"].append(t2 - t1)
        stage_times["readback"].append(t3 - t2)

        # full registry callable for the cross-check
        from trendengine_spark.queries import all_queries

        fn = all_queries()["flagship_lifecycle_pipeline"]
        t4 = time.perf_counter()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
            "overwrite"
        ).save()
        stage_times["full"].append(time.perf_counter() - t4)

    for k, v in stage_times.items():
        print(
            f"RESULT {k}: min {min(v):.3f}s all {[round(x, 3) for x in v]}",
            flush=True,
        )
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
