"""Interleaved A/B: write_minhash_index with vs without pinning the
signature table across the two writes (guide §1 — same session,
alternating runs, ambient-drift-controlled).

Run: python tools/ab_minhash_index.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import json as _json

    from pyspark.sql import functions as F

    from trendengine_spark.operators.dedup import (
        _band_structs_sql,
        minhash_signatures,
    )
    from trendengine_spark.queries.base import t
    from trendengine_spark.session import get_spark
    from trendengine_spark.tables import warm_cache

    spark = get_spark(
        app_name="ab_minhash_index",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir)

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    idx = os.path.join(tempfile.gettempdir(), "te_ab_idx")
    num_perm, bands, n, family = 64, 16, 3, "md5"

    def build(pin: bool) -> float:
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        sig = minhash_signatures(corpus, num_perm, "doc_id", "text", n, family=family)
        if pin:
            sig = sig.persist()
        view = "_te_ab_sig"
        sig.createOrReplaceTempView(view)
        os.makedirs(idx, exist_ok=True)
        sig.write.mode("overwrite").parquet(os.path.join(idx, "signatures"))
        spark.sql(
            f"SELECT id, bh.band AS band, bh.bucket AS bucket FROM {view} "
            f"LATERAL VIEW explode(array("
            f"{_band_structs_sql(num_perm, bands, family)})) bt AS bh"
        ).write.mode("overwrite").parquet(os.path.join(idx, "bands"))
        with open(os.path.join(idx, "meta.json"), "w") as fh:
            _json.dump({"num_perm": num_perm, "bands": bands, "n": n}, fh)
        if pin:
            n_docs = sig.count()
            sig.unpersist(blocking=True)
        else:
            n_docs = spark.read.parquet(os.path.join(idx, "signatures")).count()
        dt = time.perf_counter() - t0
        assert n_docs > 0
        return dt

    # warm both shapes once (codegen)
    build(False)
    build(True)
    a, b = [], []
    for _ in range(rounds):
        a.append(build(False))
        b.append(build(True))
    print(f"unpinned (two full computes): min {min(a)*1000:7.1f} ms  all {[round(x*1000) for x in a]}")
    print(f"pinned   (cache across writes): min {min(b)*1000:7.1f} ms  all {[round(x*1000) for x in b]}")


if __name__ == "__main__":
    main()
