"""Kaplan–Meier survival estimation over censored durations.

The standard nonparametric estimator (Kaplan & Meier 1958 — public)
for "how long do users/sessions/components survive" when some subjects
are still alive at observation end (right-censoring) — the correct
replacement for the naive retention curve, which silently treats
censored subjects as churned. Complements the cohort-retention gate
(analytics family) the way ext/rankstats.py complements PSI.

    S(t) = Π_{t_i ≤ t, d_i > 0} (1 − d_i / n_i)

with d_i deaths at distinct time t_i, n_i subjects at risk just before
t_i (censored subjects leave the risk set after their time).

Scale shape — no global sort, no per-subject window: subjects collapse
to ONE row per distinct duration with (deaths, censored) counts (hash
aggregate); everything after runs on that bounded distinct-duration
table via two range exchanges (ops/ids.global_cumsum_multi — two, not
one, because the risk set must be known before the log terms exist):
n_i = N − cum_before(d+c) first, then the product as a cumulative SUM
of per-time log terms. The subject table is scanned exactly once.

Determinism: counts are exact; each log term is one closed-form double
from exact longs, rounded to 9 and cast decimal(18,9) BEFORE the
cumulative sum (the ext/lm.py per-token log policy — the sum is exact
and associative), then exp + round once at the end. A time where the
whole risk set dies (1 − d/n = 0) would be ln(0); those and every
later time get survival 0 exactly, via a cumulative max of the
zero-event indicator on the same exchange."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ops.ids import global_cumsum_multi


def kaplan_meier(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Kaplan–Meier curve: one row per distinct duration with
    (t, n_risk, n_death, n_censor, survival), in duration order.
    ``event_col`` is boolean/int: truthy = the event (death/churn) was
    OBSERVED at ``duration_col``; falsy = censored at that time.
    NULL durations are excluded; NULL event flags count as censored
    (the conservative read). Survival is carried through
    censoring-only times unchanged (their log term is 0)."""
    d = F.col(duration_col)
    e = F.coalesce(F.col(event_col).cast("boolean"), F.lit(False))
    perv = (
        df.filter(d.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.sum(F.when(e, 1).otherwise(0)).alias("n_death"),
            F.sum(F.when(e, 0).otherwise(1)).alias("n_censor"),
        )
        .withColumn("leave", F.col("n_death") + F.col("n_censor"))
    )
    tot = perv.agg(F.coalesce(F.sum("leave"), F.lit(0)).alias("n_total"))
    # log term per distinct time: ln(1 - d/n_risk), rounded → decimal →
    # exact cumulative sum; zero-survival times flagged exactly
    pre = perv.crossJoin(F.broadcast(tot))
    cum = global_cumsum_multi(
        pre,
        [F.asc("t")],
        [("leave", "cum_leave")],
        num_partitions=num_partitions,
    )
    n_risk = F.col("n_total") - (F.col("cum_leave") - F.col("leave"))
    dies_out = (F.col("n_death") > 0) & (F.col("n_death") == n_risk)
    lterm = F.when(
        F.col("n_death") == 0, F.lit(0.0)
    ).when(
        dies_out, F.lit(0.0)  # placeholder; the zero flag takes over
    ).otherwise(
        F.log(F.lit(1.0) - F.col("n_death") / n_risk)
    )
    staged = cum.select(
        "t", "n_death", "n_censor", "n_total",
        n_risk.cast("long").alias("n_risk"),
        F.round(lterm, 9).cast("decimal(18,9)").alias("lt"),
        dies_out.cast("int").alias("z"),
    )
    cum2 = global_cumsum_multi(
        staged,
        [F.asc("t")],
        [("lt", "cum_lt"), ("z", "cum_z")],
        num_partitions=num_partitions,
    )
    surv = F.when(F.col("cum_z") > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("cum_lt").cast("double")), round_to)
    )
    return cum2.select(
        "t", "n_risk", "n_death", "n_censor", surv.alias("survival")
    )
