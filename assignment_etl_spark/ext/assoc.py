"""Market-basket association rules: support / confidence / lift over
(basket, item) pairs.

The classic co-occurrence miner (Agrawal & Srikant, VLDB 1994 —
public): which items appear together in the same basket more often
than independence predicts. In the event-stream framing a basket is a
user and an item is an event type — "users who did A also did B" — the
co-behavior surface a product-analytics stack queries constantly.

Scale shape: baskets collapse to DISTINCT (basket, item) first (one
hash aggregate — multiplicity inside a basket is not support), pair
candidates come from a self-join keyed on the basket id, so the work
is Σ_b C(k_b, 2) — bounded by per-basket item counts, not by the
corpus (the A-Priori candidate step as one equi-join; cap wide baskets
upstream the way ops/intervals.py caps long intervals if item vocab is
unbounded). Supports are hash aggregates; the final stats join keys on
single items — one row per item — and broadcasts.

Determinism: all counts exact longs; support/confidence/lift are
single closed-form double expressions over them, rounded once.
lift = n·sup(ab)/(sup(a)·sup(b)) multiplies longs BEFORE dividing —
n·sup ≤ n² overflows int64 past ~3 B baskets, so the products are
decimal(38,0) (the ext/rankstats.py rank-sum policy).

Reference parity note: the reference repo has no co-occurrence
surface; this extends the analytics family (value_counts, PMI
collocations — ext/collocations.py is the TOKEN-level analogue of
exactly this statistic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    round_to: int = 9,
) -> DataFrame:
    """Rules for every ORDERED pair (antecedent → consequent) whose
    pair support count ≥ ``min_pair_support``:
    (antecedent, consequent, n_baskets, sup_a, sup_b, sup_ab,
    support, confidence, lift). NULL baskets/items are excluded.

    support = sup_ab/n, confidence = sup_ab/sup_a,
    lift = n·sup_ab/(sup_a·sup_b) — >1 means co-occurrence beats
    independence."""
    if min_pair_support < 1:
        raise ValueError(
            f"need min_pair_support >= 1, got {min_pair_support}"
        )
    bi = (
        df.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    # four consumers (n_baskets, item supports, both self-join
    # sides) — persist so the raw scan + distinct shuffle run once.
    # Re-A/B'd cache-cold in r13 (the r12 driver run flagged this query
    # 0.80x, but its min-of-3 was warm-biased): persists ON 1.06s sf0.1
    # / 2.44s sf10 vs OFF 1.40s / 5.52s — the persists win 2.3x at sf10,
    # keep them.
    from assignment_etl_spark.caching import scoped_persist

    bi = scoped_persist(bi)
    n = bi.select("basket").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_sup = scoped_persist(bi.groupBy("item").agg(
        F.count(F.lit(1)).alias("sup")
    ))  # joined on both the antecedent and consequent side
    a = bi.select(F.col("basket"), F.col("item").alias("ia"))
    b = bi.select(F.col("basket"), F.col("item").alias("ib"))
    # unordered pair counts once (ia < ib), emitted in both directions
    pairs = (
        a.join(b, on="basket")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= min_pair_support)
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "sup_ab"
        )
    )
    dec = "decimal(38,0)"
    out = (
        both.join(
            item_sup.select(F.col("item").alias("ia"), F.col("sup").alias("sup_a")),
            on="ia",
        )
        .join(
            item_sup.select(F.col("item").alias("ib"), F.col("sup").alias("sup_b")),
            on="ib",
        )
        .crossJoin(F.broadcast(n))
    )
    lift = (
        (F.col("n_baskets").cast(dec) * F.col("sup_ab")).cast("double")
        / (F.col("sup_a").cast(dec) * F.col("sup_b")).cast("double")
    )
    return out.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        F.col("n_baskets").cast("long").alias("n_baskets"),
        F.col("sup_a").cast("long").alias("sup_a"),
        F.col("sup_b").cast("long").alias("sup_b"),
        F.col("sup_ab").cast("long").alias("sup_ab"),
        F.round(F.col("sup_ab") / F.col("n_baskets"), round_to).alias(
            "support"
        ),
        F.round(F.col("sup_ab") / F.col("sup_a"), round_to).alias(
            "confidence"
        ),
        F.round(lift, round_to).alias("lift"),
    )
