"""Incremental aggregate maintenance: keep a grouped-aggregate table
up to date by merging a delta batch's partial aggregates, instead of
recomputing over the full history.

The 100 TB shape: the base table is append-heavy and huge; the aggregate
state is keys × mergeable accumulators (count/sum/min/max — avg and
friends derive at read). Each batch aggregates ONLY the delta (small),
then full-outer-joins it onto the state on the group key and combines
accumulator-wise — the history is never rescanned. This is the manual
form of what a materialized view / Structured Streaming agg maintains;
keeping it an explicit operator makes the state a plain parquet table any
engine can read.

All combine logic is null-safe coalesce arithmetic (a key may exist on
either side only); associativity holds because the accumulators are
sums/counts/extrema — the same reason Spark's own partial aggregation is
correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# accumulator column suffixes per tracked value column
ACCS = ("count", "sum", "min", "max")


def aggregate_batch(df: DataFrame, keys: list[str], values: list[str]) -> DataFrame:
    """Partial-aggregate one batch into mergeable accumulators."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for v in values:
        col = F.col(v)
        aggs += [
            F.count(col).alias(f"{v}_count"),
            F.sum(col.cast("decimal(28,6)")).alias(f"{v}_sum"),
            F.min(col).alias(f"{v}_min"),
            F.max(col).alias(f"{v}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    state: DataFrame, delta: DataFrame, keys: list[str], values: list[str]
) -> DataFrame:
    """Combine two accumulator tables (same schema) key-wise. One shuffle
    of state+delta keys; raw history untouched."""
    s = state.select(*keys, *[F.col(c).alias(f"_s_{c}") for c in state.columns if c not in keys])
    d = delta.select(*keys, *[F.col(c).alias(f"_d_{c}") for c in delta.columns if c not in keys])
    j = s.join(d, on=keys, how="full_outer")

    def add(c: str):
        return (F.coalesce(F.col(f"_s_{c}"), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0))).alias(c)

    out = [add("n_rows")]
    for v in values:
        out.append(add(f"{v}_count"))
        out.append(
            (
                F.coalesce(F.col(f"_s_{v}_sum"), F.lit(0).cast("decimal(28,6)"))
                + F.coalesce(F.col(f"_d_{v}_sum"), F.lit(0).cast("decimal(28,6)"))
            ).alias(f"{v}_sum")
        )
        out.append(F.least(F.col(f"_s_{v}_min"), F.col(f"_d_{v}_min")).alias(f"{v}_min"))
        out.append(F.greatest(F.col(f"_s_{v}_max"), F.col(f"_d_{v}_max")).alias(f"{v}_max"))
    return j.select(*keys, *out)


def finalize(state: DataFrame, values: list[str]) -> DataFrame:
    """Read-side derivations: avg from sum/count (null when count=0)."""
    out = state
    for v in values:
        out = out.withColumn(
            f"{v}_avg",
            F.when(
                F.col(f"{v}_count") > 0,
                (F.col(f"{v}_sum") / F.col(f"{v}_count")).cast("double"),
            ),
        )
    return out


def join_view_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The rows a batch adds to the inner-join view A⋈B, WITHOUT
    recomputing it: Δ(A⋈B) = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB), where
    B_new = B_old ∪ ΔB — the ΔA⋈ΔB cross term lands exactly once (in
    the first leg, never the second). Insert-only streams; updates or
    deletes need retraction records, out of scope here.

    Scale shape: the DELTAS are the batch-sized sides, so they are what
    broadcasts — the bases are scanned (with pruning when partitioning
    correlates with the key) but never shuffled or replicated, and the
    existing view rows are never touched. Broadcasting B_new (the full
    updated dimension) would be the OOM-at-scale inversion the
    plan-audit broadcast rule flags. Set ``broadcast_deltas=False``
    when the deltas are themselves table-sized (backfills, the
    synthetic modulo deltas in the gate) and let AQE pick the
    strategy."""
    b_new = base_b.unionByName(delta_b)
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    return da.join(b_new, on=on).unionByName(base_a.join(db, on=on))


def merge_join_view(
    view: DataFrame,
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """view ∪ Δ(A⋈B): after the merge the view equals
    (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) exactly (tested + oracle-gated)."""
    return view.unionByName(
        join_view_delta(
            base_a, delta_a, base_b, delta_b, on,
            broadcast_deltas=broadcast_deltas,
        )
    )
