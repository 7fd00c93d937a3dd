"""Training-data valuation: exact KNN-Shapley over an embedding table.

KNN-Shapley (Jia et al., "Efficient Task-Specific Data Valuation for
Nearest Neighbor Algorithms", VLDB 2019) assigns every training point
its exact Shapley value for a K-NN classifier's accuracy on a validation
point — the closed-form special case that makes Shapley data valuation
tractable. Sorted by distance ascending (d_1 ≤ … ≤ d_n):

    s_n = 1[y_n = y_q] / n
    s_i = s_{i+1} + (1[y_i = y_q] − 1[y_{i+1} = y_q]) / K · min(K, i) / i

which is a SUFFIX SUM of per-rank increments — exactly a window
aggregate with an UNBOUNDED FOLLOWING frame. No iteration, no UDF:

- distances: the same well-distributed pair join as ext/similarity.py
  (broadcast the small validation side);
- per validation point: one ordered window (rank by distance), one
  suffix-sum window over decimal-rounded increments (order-independent
  accumulation — a second engine replays it bit-for-bit);
- final value: decimal mean over validation points per training point.

Scale shape: cost = |train| × |validation| pair scoring, linear in the
corpus for a fixed validation set (the regime data valuation runs in —
you value a 100 TB corpus against a small trusted validation slice);
the per-query window shuffles on query_id, never globally.

Reference parity note: no reference counterpart — training-data-pipeline
scope (curation: drop negative-value points, priority-keep high-value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from assignment_etl_spark.ext.similarity import cosine


def knn_shapley(
    train: DataFrame,
    valid: DataFrame,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    decimal_scale: int = 12,
    round_to: int = 8,
) -> DataFrame:
    """Per-training-point Shapley value for K-NN accuracy on ``valid``.

    Distance is cosine DISsimilarity (1 − cos); ties rank by train id so
    the permutation — and therefore every value — is replayable. Returns
    (id, shapley) where shapley is the decimal mean over validation
    points, rounded to ``round_to``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dec = f"decimal(28,{decimal_scale})"
    q = valid.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("_qy"),
    )
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).alias("_tv"),
        F.col(label_col).alias("_ty"),
    )
    pairs = t.crossJoin(F.broadcast(q)).select(
        "query_id",
        "train_id",
        (F.lit(1.0) - cosine(F.col("_tv"), F.col("_qv"))).alias("_dist"),
        (F.col("_ty") == F.col("_qy")).cast("int").alias("_match"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("_dist").asc(), F.col("train_id")
    )
    ranked = pairs.select(
        "query_id",
        "train_id",
        "_match",
        F.row_number().over(w_rank).alias("_i"),
        F.count(F.lit(1)).over(Window.partitionBy("query_id")).alias("_n"),
        F.lead("_match").over(w_rank).alias("_next_match"),
    )
    # per-rank increment (0 for the last rank, which instead seeds the
    # suffix with s_n); rounded BEFORE the decimal suffix sum so the
    # accumulation is order-independent and engine-exact
    inc = F.when(
        F.col("_next_match").isNull(),
        F.col("_match").cast("double") / F.col("_n"),
    ).otherwise(
        (F.col("_match") - F.col("_next_match")).cast("double")
        / F.lit(float(k))
        * F.least(F.lit(k), F.col("_i")).cast("double")
        / F.col("_i")
    )
    w_suffix = (
        Window.partitionBy("query_id")
        .orderBy(F.col("_i"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    valued = ranked.select(
        "query_id",
        "train_id",
        F.sum(F.round(inc, decimal_scale).cast(dec)).over(w_suffix).alias("_s"),
    )
    return (
        valued.groupBy("train_id")
        .agg(
            F.round(
                (
                    F.sum("_s").cast("double")
                    / F.count(F.lit(1)).cast("double")
                ),
                round_to,
            ).alias("shapley"),
        )
        .withColumnRenamed("train_id", id_col)
    )
