"""Training-data pipeline assembly operators (LLM surface).

Two stages every corpus-to-training-run pipeline needs after cleaning
and dedup, both expressed as single-pass DataFrame plans with exact
integer semantics (so both are DuckDB-oracle-checkable):

- :func:`stratified_sample` — deterministic per-stratum systematic
  sampling: each stratum (e.g. language) keeps a configured fraction,
  selected by a pure function of the row id (``id % den < num``).
  Reproducible across runs/engines by construction — no RNG state, no
  ``sample()`` nondeterminism — which is what a data-mixture spec
  needs ("20% code, 50% en, …" must survive re-execution bit-for-bit).
  One filter, no shuffle; the audit aggregate is one groupBy.
- :func:`pack_concat_chunks` — GPT-style sequence packing: documents
  are concatenated per shard in a deterministic order and the token
  stream is cut into fixed-length sequences; each document reports the
  sequence span [start_seq, end_seq] it lands in (documents straddle
  cut points by design — that is exactly how concat-then-chunk
  training prep behaves). Implementation: one window cumulative sum
  per shard (hash exchange on shard, in-partition sort) + integer
  division. At 100 TB: shard count scales with the cluster, each
  shard's cumsum is an independent partition-local sort — no global
  ordering bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trendengine_spark.operators.text import token_count


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    default_rate: int = 10,
    den: int = 100,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ``rates[stratum]`` (else ``default_rate``) out of every
    ``den`` rows per stratum, selected deterministically by
    ``id % den``. Returns the kept rows with a ``_stratum_rate``
    audit column."""
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return df.withColumn("_stratum_rate", rate).filter(
        F.col(id_col) % den < F.col("_stratum_rate")
    )


def pack_concat_chunks(
    df: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk packing plan: per shard (``id % n_shards``),
    documents are laid out in ``id`` order into one token stream and
    cut every ``seq_len`` tokens. Emits per document: shard, token
    count, stream offset, and the [start_seq, end_seq] span of
    training sequences the document occupies. All integer arithmetic
    (window SUM + div), so the layout is exact and engine-portable."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    toks = df.select(
        F.col(id_col),
        shard,
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = toks.withColumn("end_off", F.sum("n_tokens").over(w))
    start_off = F.col("end_off") - F.col("n_tokens")
    start_seq = F.floor(start_off / seq_len)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        start_off.alias("start_off"),
        start_seq.alias("start_seq"),
        # an empty document occupies no tokens: its span degenerates to
        # its start sequence instead of going negative
        F.when(F.col("n_tokens") > 0, F.floor((F.col("end_off") - 1) / seq_len))
        .otherwise(start_seq)
        .alias("end_seq"),
    )


def weighted_sample(
    df,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    seed: int = 0,
):
    """Weighted random sampling WITHOUT replacement, coordination-free
    (Efraimidis–Spirakis A-ES): each row draws a deterministic uniform
    u from md5(seed, id) and scores key = u^(1/w); the k largest keys
    ARE a weighted sample without replacement — exactly, not
    approximately (ES 2006, Thm 1). The hash-uniform makes the sample
    a pure function of (seed, ids, weights): reproducible across
    engines, partitionings and reruns, no RNG state — the same
    portability contract as the md5 Bernoulli sampler.

    Scale: one narrow projection computes the keys; global top-k is a
    TakeOrdered (per-partition heads + driver merge of k rows), and
    the stratified form is a partitioned rank window — no global sort
    either way. Rows with weight <= 0 are excluded (their key is
    undefined); u is floored away from 0 so pow never returns an
    exact 0 tie-block."""
    from pyspark.sql import Window, functions as F

    w = F.col(weight_col).cast("double")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13) + 2.0)
    scored = df.filter(w > 0).withColumn(
        "_es_key", F.pow(u, F.lit(1.0) / w)
    )
    if strata_col is None:
        return scored.orderBy(
            F.desc("_es_key"), F.col(id_col)
        ).limit(k).drop("_es_key")
    win = Window.partitionBy(strata_col).orderBy(
        F.desc("_es_key"), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Train/validation/test assignment that moves NEAR-DUP CLUSTERS
    atomically (r10) — the production guard against evaluation
    contamination: hashing documents independently puts two
    near-duplicates on opposite sides of the train/test wall, and the
    model is then scored on paraphrases of its own training data.
    Here the split draw is a function of the CLUSTER id (connected
    components over ``pairs``, :func:`~trendengine_spark.operators.
    dedup.dedup_clusters` — min doc id in the component; singletons
    are their own cluster), so every member of a near-dup family
    lands in the same split by construction.

    The draw is the registry's standing md5 convention
    (`pipeline_bernoulli_sample` / `pipeline_hash_sample_per_key`):
    a 60-bit integer from ``md5('split:' || cluster_id)`` compared
    against INTEGER thresholds ``floor(w·2⁶⁰)`` — deterministic, no
    RNG state, engine-portable, and exactly reproducible as the
    corpus grows (a cluster's split never changes when unrelated
    documents arrive).

    Scale: the pair list is the LSH/Jaccard output (bucket-bounded,
    never all-pairs), components are O(log diameter) rounds over
    pairs only, and the final assignment is one broadcast-or-shuffle
    join of docs against the (small) non-singleton cluster map plus
    a codegen hash projection. Returns (id_col, cluster_id, split).

    Pass either ``pairs`` (clusters computed here) or precomputed
    ``clusters`` (an (id, cluster_id) frame, e.g. the registry's
    shared ``jaccard_cluster_labels`` memo — r11, so the split query
    stops rebuilding the pair/CC stage its siblings already built).
    """
    from trendengine_spark.operators.dedup import dedup_clusters

    w_train, w_val, w_test = weights
    if abs(w_train + w_val + w_test - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    if (pairs is None) == (clusters is None):
        raise ValueError("pass exactly one of pairs= or clusters=")
    two60 = 1 << 60
    t_train = int(w_train * two60)
    t_val = int((w_train + w_val) * two60)
    if clusters is None:
        clusters = dedup_clusters(pairs)
    clusters = clusters.withColumnRenamed("id", id_col)
    lab = docs.select(id_col).join(clusters, id_col, "left").select(
        id_col,
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    split = (
        F.when(draw < F.lit(t_train), F.lit("train"))
        .when(draw < F.lit(t_val), F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return lab.select(id_col, "cluster_id", split.alias("split"))
