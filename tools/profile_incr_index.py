"""Decompose dedup_incremental_batch: index write vs probe, and the
signature-pipeline recompute inside write_minhash_index (guide §1).

Run: python tools/profile_incr_index.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from trendengine_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        write_minhash_index,
    )
    from trendengine_spark.queries.base import t
    from trendengine_spark.session import get_spark

    spark = get_spark(
        app_name="profile_incr_index",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    from trendengine_spark.tables import warm_cache

    warm_cache(spark, sf_dir)

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx = os.path.join(tempfile.gettempdir(), "te_profile_incr_idx")

    def tmin(label, fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:55s} {best*1000:8.1f} ms")
        return best

    # full query (write + probe), as the bench samples it
    def full():
        shutil.rmtree(idx, ignore_errors=True)
        write_minhash_index(corpus, idx, family="md5")
        incremental_minhash_dedup(batch, idx, threshold=0.5).write.format(
            "noop"
        ).mode("overwrite").save()
        pool = getattr(spark.sparkContext, "_te_owned_caches", None) or {}
        for key in list(pool):
            pool.pop(key).unpersist(blocking=True)

    tmin("full query (index write + probe)", full)

    # decomposition
    shutil.rmtree(idx, ignore_errors=True)
    tmin("write_minhash_index alone", lambda: write_minhash_index(corpus, idx, family="md5"))

    def probe_only():
        incremental_minhash_dedup(batch, idx, threshold=0.5).write.format(
            "noop"
        ).mode("overwrite").save()
        pool = getattr(spark.sparkContext, "_te_owned_caches", None) or {}
        for key in list(pool):
            pool.pop(key).unpersist(blocking=True)

    tmin("probe alone (index already on disk)", probe_only)

    # the signature pipeline itself, one pass (noop)
    sig = minhash_signatures(corpus, 64, "doc_id", "text", 3, family="md5")
    tmin(
        "minhash_signatures one pass (noop)",
        lambda: sig.write.format("noop").mode("overwrite").save(),
    )


if __name__ == "__main__":
    main()
