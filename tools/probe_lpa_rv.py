"""Interleaved A/B for label_propagation's repartition_votes at a
given scale: reps alternate A (off) / D (on) so ambient drift hits
both variants equally (guide §1 — the box's capacity varies, so
back-to-back blocks confound; interleave instead).

Run: python tools/probe_lpa_rv.py [sf_dir] [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/te_sf1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from probe_tri_lpa import lpa_edges_current, lpa_full
    from trendengine_spark.operators.util import owned_cache_drop
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="probe_lpa_rv")
    sc = spark.sparkContext

    def one(tag, rv):
        owned_cache_drop(spark, "probe")
        spark.catalog.clearCache()
        sc.setJobDescription(f"lpa rv={rv}")
        t0 = time.perf_counter()
        df = lpa_full(spark, lpa_edges_current(spark, sf_dir), rv)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # untimed warm-up of both shapes
    one("warmA", None)
    one("warmD", True)
    ta, td = [], []
    for i in range(pairs):
        ta.append(one("A", None))
        td.append(one("D", True))
        print(
            f"pair {i}: A {ta[-1]:.2f}s  D {td[-1]:.2f}s"
            f"  load {os.getloadavg()[0]:.1f}",
            flush=True,
        )
    print(f"RESULT A(off): min {min(ta):.3f}  all {[round(x,2) for x in ta]}")
    print(f"RESULT D(on):  min {min(td):.3f}  all {[round(x,2) for x in td]}")


if __name__ == "__main__":
    main()
