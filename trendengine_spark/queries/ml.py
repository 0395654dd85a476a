"""Corpus-level model fitting for data curation (quality models).

The reference fits per-series models in R (one pixel at a time,
``/root/reference/TrendEngine/calculations/polytrend.py:291-312``); a
training-data pipeline needs the transposed shape — ONE linear model
over the whole corpus, fitted distributed. `operators/linmodel.py`
does it with the exact-Gram/normal-equations trick: a single
partial+final aggregate pass produces the sufficient statistics, the
bounded (d+1)² solve runs driver-side, and scoring folds the learned
weights into one codegen projection.

Oracle strategy (the `trend_polyfit_coeffs` discipline): the
distributed pass — the part Spark is responsible for — emits exact
BIGINT moment sums over integer features, hash-checkable against
DuckDB computing the same sums from raw text. The float solve is
pinned separately by golden/property tests (exact planted-weight
recovery, partition invariance, numpy Gram equality).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trendengine_spark.operators.linmodel import (
    fit_linear,
    gram_moments,
    score_expr,
)
from trendengine_spark.operators.text import tokens_col
from trendengine_spark.queries.base import query, t

#: DuckDB twin of operators.text.tokens_col (same empty-safe
#: whitespace split the BPE oracle uses).
_DUCK_TOKS = r"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x != '')"


def _doc_features(spark, sf_dir):
    """(doc_id, lang, n_tok, n_uniq, n_chars) — integer features."""
    toks = tokens_col(F.col("text"))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@query(
    "quality_gram_matrix",
    sql=rf"""
    WITH f AS (
      SELECT lang,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tok,
             CAST(len(list_distinct({_DUCK_TOKS})) AS BIGINT) AS n_uniq,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)              AS n_rows,
           CAST(sum(n_tok) AS BIGINT)            AS s_n_tok,
           CAST(sum(n_uniq) AS BIGINT)           AS s_n_uniq,
           CAST(sum(n_chars) AS BIGINT)          AS s_n_chars,
           CAST(sum(n_tok * n_tok) AS BIGINT)    AS g_n_tok_n_tok,
           CAST(sum(n_tok * n_uniq) AS BIGINT)   AS g_n_tok_n_uniq,
           CAST(sum(n_tok * n_chars) AS BIGINT)  AS g_n_tok_n_chars,
           CAST(sum(n_uniq * n_uniq) AS BIGINT)  AS g_n_uniq_n_uniq,
           CAST(sum(n_uniq * n_chars) AS BIGINT) AS g_n_uniq_n_chars,
           CAST(sum(n_chars * n_chars) AS BIGINT) AS g_n_chars_n_chars,
           CAST(sum(n_tok - n_uniq) AS BIGINT)   AS s_repeats
    FROM f GROUP BY lang
    """,
)
def quality_gram_matrix(spark, sf_dir):
    """Per-language sufficient statistics for a document quality
    model, in ONE distributed aggregate pass (`gram_moments`): exact
    BIGINT moment sums of (token count, distinct-token count, char
    count) over every document. These 11 numbers per language are
    everything any least-squares fit over these features needs —
    the corpus is touched once, the shuffle carries O(langs · d²)
    values, and because the features are integers the sums are
    partition-order-exact (hash-stable across engines). The repeat
    count Σ(n_tok − n_uniq) rides along as the quality signal a
    curation gate thresholds on."""
    feats = _doc_features(spark, sf_dir)
    g = gram_moments(feats, ["n_tok", "n_uniq", "n_chars"], ["lang"])
    return g.withColumn(
        "s_repeats", F.col("s_n_tok") - F.col("s_n_uniq")
    )


@query(
    "quality_linear_residual_topk",
    sql=None,
    doc="Per-language linear quality model (predict n_chars from "
    "token stats) fitted in one exact-Gram pass, then the 20 most "
    "anomalous documents by |residual| — the model-based outlier "
    "gate of a curation pipeline. Rows-only (float weights); the "
    "fit math is pinned by exact planted-weight recovery, numpy "
    "Gram equality, and partition-invariance tests "
    "(tests/test_linmodel.py), and the distributed aggregation "
    "underneath is oracle-checked by quality_gram_matrix.",
)
def quality_linear_residual_topk(spark, sf_dir):
    """Fit per-lang n_chars ~ n_tok + n_uniq (one aggregate pass +
    driver-side 3×3 solve), score every document with its language's
    weights as ONE chained-CASE codegen projection (no join, no
    UDF), and return the top 20 by absolute residual (ties broken by
    doc_id). Scales as scan + aggregate + scan: nothing driver-side
    but the per-language Gram rows."""
    feats = _doc_features(spark, sf_dir)
    fits = fit_linear(feats, ["n_tok", "n_uniq"], "n_chars", ["lang"])
    pred = None
    for (lang,), fit in sorted(fits.items()):
        expr = score_expr(fit["weights"], fit["intercept"])
        pred = (
            F.when(F.col("lang") == lang, expr)
            if pred is None
            else pred.when(F.col("lang") == lang, expr)
        )
    scored = feats.withColumn("pred", F.round(pred, 3)).withColumn(
        "residual", F.round(F.col("n_chars") - F.col("pred"), 3)
    )
    return (
        scored.orderBy(F.abs(F.col("residual")).desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id", "lang", "n_tok", "n_uniq", "n_chars",
            "pred", "residual",
        )
    )
