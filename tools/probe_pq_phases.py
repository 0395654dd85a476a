"""Phase decomposition of sim_pq_topk's Spark side (r14 session 6).

Replicates the query body (queries/llm.py) with a timer around each
phase so the 7.8 s solo wall can be attributed: upos checkpoint, b0
seed collect, the three pivoted Lloyd rounds, the codes pass, and the
final ADC/rerank statement.

Run: python tools/probe_pq_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from trendengine_spark.queries.llm import (
        _PQ_B0_SQL,
        _PQ_CELLS,
        _PQ_K,
        _PQ_POS_SPARK,
        _pq_pivot_round_sql,
        _pq_upos_sql,
    )
    from trendengine_spark.operators.similarity import adaptive_n_cells
    from trendengine_spark.sqltext import sql_over_tables
    from trendengine_spark.session import get_spark
    from trendengine_spark.tables import warm_cache

    spark = get_spark(
        app_name="probe_pq_phases",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir)

    marks: list[tuple[str, float]] = []

    def mark(label: str, t0: float) -> None:
        marks.append((label, time.perf_counter() - t0))

    for rep in range(2):
        marks.clear()
        t0 = time.perf_counter()
        n = sql_over_tables(
            spark, sf_dir, "SELECT count(*) AS n FROM embeddings",
            ("embeddings",),
        ).first()["n"]
        mark("count_n", t0)

        t0 = time.perf_counter()
        upos = sql_over_tables(
            spark,
            sf_dir,
            "WITH " + _pq_upos_sql(_PQ_POS_SPARK, " DIV ")
            + " SELECT * FROM upos",
            ("embeddings",),
        ).localCheckpoint()
        upos.createOrReplaceTempView("te_pq_upos")
        mark("upos_checkpoint", t0)

        t0 = time.perf_counter()
        book_schema = "cell int, sub int, i int, cv bigint"
        prev = "te_pq_b0"
        spark.createDataFrame(
            spark.sql(_PQ_B0_SQL).collect(), book_schema
        ).createOrReplaceTempView(prev)
        mark("b0_seed_collect", t0)

        for r in (1, 2, 3):
            t0 = time.perf_counter()
            rows = spark.sql(
                _pq_pivot_round_sql(prev, _PQ_CELLS, "books")
            ).collect()
            prev = f"te_pq_b{r}"
            spark.createDataFrame(
                rows, book_schema
            ).createOrReplaceTempView(prev)
            mark(f"lloyd_round_{r}", t0)

        t0 = time.perf_counter()
        codes = spark.sql(
            _pq_pivot_round_sql("te_pq_b3", _PQ_CELLS, "codes")
        ).localCheckpoint()
        codes.createOrReplaceTempView("te_pq_codes")
        mark("codes_checkpoint", t0)

        t0 = time.perf_counter()
        k = _PQ_K
        pool = max(4 * k, adaptive_n_cells(n))
        out = spark.sql(f"""
WITH nrm AS (
  SELECT id, CAST(sum(q * q) AS BIGINT) AS n2 FROM te_pq_upos GROUP BY id
),
qdt AS (
  SELECT p.id AS query_id, c.sub, c.cell,
         CAST(sum(p.q * c.cv) AS BIGINT) AS dt
  FROM te_pq_upos p JOIN te_pq_b3 c ON c.sub = p.sub AND c.i = p.i
  WHERE p.id < 10 GROUP BY p.id, c.sub, c.cell
),
adc AS (
  SELECT q5.query_id, cd.id AS vec_id, CAST(sum(q5.dt) AS BIGINT) AS score
  FROM te_pq_codes cd JOIN qdt q5 ON q5.sub = cd.sub AND q5.cell = cd.cell
  WHERE cd.id <> q5.query_id
  GROUP BY q5.query_id, cd.id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rn
    FROM adc) q6 WHERE rn <= {pool}
),
sdot AS (
  SELECT cd.query_id, cd.vec_id, CAST(sum(pq.q * pc.q) AS BIGINT) AS dt
  FROM cand cd
  JOIN te_pq_upos pq ON pq.id = cd.query_id
  JOIN te_pq_upos pc ON pc.id = cd.vec_id AND pc.i = pq.i
  GROUP BY cd.query_id, cd.vec_id
),
ranked AS (
  SELECT s.query_id, s.vec_id,
         CAST(s.dt AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
              * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim,
         row_number() OVER (PARTITION BY s.query_id ORDER BY
           CAST(s.dt AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                * sqrt(CAST(nb.n2 AS DOUBLE))) DESC,
           s.vec_id ASC) AS rn
  FROM sdot s
  JOIN nrm na ON na.id = s.query_id
  JOIN nrm nb ON nb.id = s.vec_id
)
SELECT query_id, vec_id, cos_sim, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {k}
ORDER BY query_id, rn
""")
        out.toArrow()
        mark("final_adc_rerank", t0)

        upos.unpersist()
        codes.unpersist()
        total = sum(s for _, s in marks)
        print(f"--- rep {rep} (total {total:.3f} s)")
        for label, s in marks:
            print(f"  {label:20s} {s:7.3f} s")


if __name__ == "__main__":
    main()
