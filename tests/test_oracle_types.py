"""Authoring guard: every registered oracle SQL must produce only
scalar, non-HUGEINT output columns.

The driver's correctness harness canonicalizes DuckDB results through
pandas (``.df()``): HUGEINT columns silently become float64 and
hash-mismatch Spark's int64 (``"60012.0"`` vs ``"60012"``), and
list/struct/map columns crash its ``sort_values`` canonicalization
with ``TypeError: unhashable type``. Round 5 shipped four such
queries; this sweep fails the suite the moment a new one is declared.

Runs pure DuckDB (no Spark session) — ~1 s for the whole registry.
"""

import duckdb
import pytest

from trendengine_spark.queries import REGISTRY

from tools.check_oracle import describe_offenders

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _oracle_names():
    return sorted(n for n, q in REGISTRY.items() if q.sql is not None)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_sql_emits_driver_safe_types(con, name):
    offenders = describe_offenders(con, REGISTRY[name].sql)
    assert not offenders, (
        f"{name}: oracle SQL emits driver-hostile output columns {offenders} — "
        "CAST integer sums to BIGINT and explode/stringify any array column "
        "(the driver's pandas canonicalizer turns HUGEINT into float64 and "
        "crashes on lists)"
    )


# -- fast-cents idiom split guard (VERDICT r13 #4, incident 0894b24) --
#
# r13's only red-producing accident: a bulk Spark-body rewrite leaked
# the Spark-only fast-cents idiom `CAST(x*100 + 0.5e0 AS BIGINT)`
# (truncating cast = floor on non-negative data — cheap, avoids
# Spark's per-row BigDecimal round(double)) into the SHARED oracle
# constant. DuckDB's CAST(DOUBLE AS BIGINT) rounds-to-nearest, so the
# idiom evaluates one cent off there: oracle SQL must ALWAYS use the
# round() form, and the Spark hot path of the money queries must KEEP
# the fast form (a well-meant "consistency" rewrite in the other
# direction would silently re-pay the 1.7x BigDecimal tax at sf10).

_FAST_CENTS = "0.5e0 AS BIGINT"

#: the 13 money queries whose SPARK side carries the r13 fast-cents
#: rewrite — source-visible via the SQL `0.5e0` literal, the
#: _REV_BP_S constant reference, or the DataFrame-API spelling
#: `+ F.lit(0.5)).cast("long")` (q6/q14/q17)
_FAST_CENTS_SPARK_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
]


def test_no_oracle_sql_uses_spark_fast_cents_idiom():
    offenders = [
        n for n, q in REGISTRY.items() if q.sql and _FAST_CENTS in q.sql
    ]
    assert not offenders, (
        f"oracle SQL for {offenders} contains the Spark-only fast-cents "
        "idiom `+ 0.5e0 AS BIGINT` — DuckDB CAST rounds-to-nearest, so "
        "this evaluates one cent off there (the 0894b24 incident). "
        "Oracle strings must use CAST(round(x*100) AS BIGINT)."
    )


def test_rev_bp_constants_keep_their_engine_split():
    from trendengine_spark.queries import tpch2

    assert "round(" in tpch2._REV_BP and _FAST_CENTS not in tpch2._REV_BP, (
        "_REV_BP is the ORACLE constant — it must keep the round() form "
        "(DuckDB CAST rounds-to-nearest; the fast-cast idiom is one cent "
        "off there: incident 0894b24)"
    )
    assert _FAST_CENTS in tpch2._REV_BP_S, (
        "_REV_BP_S is the Spark hot-path constant — it must keep the "
        "fast-cents cast (round(double) is a per-row BigDecimal op in "
        "Spark, measured ~1.7x on the 60M-row money sum)"
    )


@pytest.mark.parametrize("name", _FAST_CENTS_SPARK_QUERIES)
def test_money_query_spark_side_keeps_fast_cents(name):
    import inspect

    src = inspect.getsource(REGISTRY[name].fn)
    df_api_form = 'F.lit(0.5)).cast("long")'
    assert _FAST_CENTS in src or "_REV_BP_S" in src or df_api_form in src, (
        f"{name}: the Spark side lost the r13 fast-cents rewrite — "
        "reverting to round() re-pays Spark's per-row BigDecimal tax "
        "(sf10 q1 was 3.61 s with round(), 1.09 s with the cast)"
    )
