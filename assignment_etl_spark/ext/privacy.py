"""Privacy auditing for training-data curation: k-anonymity and
l-diversity over quasi-identifier columns, plus suppression enforcement.

A record is k-anonymous w.r.t. a set of quasi-identifiers (the columns an
adversary could link on — region, demographic bucket, coarse location) if
at least k records share its full quasi-identifier combination; a class
is l-diverse if it contains at least l distinct values of a sensitive
column. Both reduce to ONE hash aggregate on the quasi keys — the class
table is tiny relative to the data (bounded by the quasi domain, not row
count), so the audit scales linearly and the per-row flag join broadcasts
class verdicts when the class table is small, or shuffles on the same
quasi keys (co-partitioned with the aggregate) when it isn't.

Reference parity note: the reference repo has no privacy surface; this
module is part of the training-data-pipeline layer built beyond reference
scope (PII detect/redact lives in ext/text.py; this is the linkage-risk
complement).

Typical flow: ``generalize_num`` coarsens numeric identifiers →
``anonymity_classes`` computes class sizes + sensitive diversity →
``anonymity_report`` summarizes violations per k →
``suppress_below_k`` drops rows whose class is too small (the standard
suppression remedy; generalizing further is the alternative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def generalize_num(col: Column | str, width: float) -> Column:
    """Coarsen a numeric column to its bucket floor (e.g. age → decade,
    balance → 1000-wide band) — the generalization step that trades
    precision for larger anonymity classes. Deterministic and
    SQL-replayable: floor(x / width) * width."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / F.lit(width)) * F.lit(width)).cast("double")


def anonymity_classes(
    df: DataFrame,
    quasi: list[str],
    *,
    sensitive: str | None = None,
) -> DataFrame:
    """(quasi..., class_size[, n_sensitive]) — one row per equivalence
    class. One hash aggregate; with ``sensitive`` set, adds the distinct
    sensitive-value count that l-diversity checks against."""
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("n_sensitive"))
    return df.groupBy(*quasi).agg(*aggs)


def anonymity_report(
    df: DataFrame,
    quasi: list[str],
    *,
    ks: list[int] = (2, 5, 10),
    sensitive: str | None = None,
    l: int = 3,
) -> DataFrame:
    """One row per k in ``ks``: how far the table is from k-anonymity
    (and, with ``sensitive``, from l-diversity at the given ``l``).

    Columns: k, n_classes, n_classes_below, n_rows_below[,
    n_classes_low_diversity, n_rows_low_diversity]. The class table is
    aggregated once and fanned out to the |ks| report rows via a tiny
    explode — no per-k rescan of the data."""
    classes = anonymity_classes(df, quasi, sensitive=sensitive)
    fanned = classes.select(
        F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k"),
        "class_size",
        *(["n_sensitive"] if sensitive is not None else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("class_size") < F.col("k"), 1).otherwise(0)).alias(
            "n_classes_below"
        ),
        F.sum(
            F.when(F.col("class_size") < F.col("k"), F.col("class_size")).otherwise(0)
        ).alias("n_rows_below"),
    ]
    if sensitive is not None:
        aggs += [
            F.sum(F.when(F.col("n_sensitive") < l, 1).otherwise(0)).alias(
                "n_classes_low_diversity"
            ),
            F.sum(
                F.when(F.col("n_sensitive") < l, F.col("class_size")).otherwise(0)
            ).alias("n_rows_low_diversity"),
        ]
    return fanned.groupBy("k").agg(*aggs).orderBy("k")


def flag_below_k(df: DataFrame, quasi: list[str], k: int) -> DataFrame:
    """Append ``class_size`` and ``is_k_anonymous`` per row via a count
    window over the quasi keys — one shuffle, no join, keeps every input
    column (the audit-not-mutate shape quality.py uses)."""
    w = Window.partitionBy(*quasi)
    return df.withColumn("class_size", F.count(F.lit(1)).over(w)).withColumn(
        "is_k_anonymous", F.col("class_size") >= k
    )


def suppress_below_k(df: DataFrame, quasi: list[str], k: int) -> DataFrame:
    """Drop rows whose quasi-identifier class has fewer than k members —
    the suppression remedy. Same single-shuffle window as flag_below_k."""
    return (
        flag_below_k(df, quasi, k)
        .filter(F.col("is_k_anonymous"))
        .drop("class_size", "is_k_anonymous")
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float,
    salt: int,
    sensitivity: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Laplace-mechanism noisy group counts — the standard
    differential-privacy release for histograms/marginals (count
    queries have sensitivity 1; noise scale b = sensitivity/ε).

    The noise is DERIVED, not drawn: uniform u ∈ (0,1) from the
    portable hash of the group key + ``salt``, pushed through the
    Laplace inverse CDF −b·sgn(u−½)·ln(1−2|u−½|). That makes the
    release deterministic, engine-replayable, and auditable (gate
    ``dp_noisy_counts_events`` replays it in DuckDB) — but formally DP
    ONLY if the salt is secret and fresh per release: with a public or
    reused salt an adversary can invert the noise. ``salt`` is therefore
    a REQUIRED argument — there is no default an engine could safely
    pick, and a silent salt=0 would let callers ship a fully invertible
    release that still carries an ``epsilon`` column (ADVICE r5).
    Production swaps a CSPRNG-drawn salt per release and keeps the same
    dataflow; the mechanism's shape (one aggregate, one closed-form
    noise expression, true counts never emitted) is what the engine
    owns. The ``epsilon`` column is the NOMINAL budget of the mechanism
    shape, a formal guarantee only under the secret-salt discipline
    above.

    Output: group_cols + (noisy_count, epsilon). The true count column
    is dropped. NULL group values hash as an explicit \\x01 sentinel —
    distinct from the empty string, never silently skipped (concat_ws
    would drop them), and replayed by the oracle with chr(1); chr(0) would collide with '' since its codepoint contributes 0 to the polynomial.
    One hash aggregate; noise is a per-group projection."""
    from assignment_etl_spark.ext.sampling import portable_hash01
    from assignment_etl_spark.ext.sketch import portable_str_hash

    if epsilon <= 0:
        raise ValueError(f"need epsilon > 0, got {epsilon}")
    if sensitivity <= 0:
        # sensitivity 0 would make b = 0 and release the TRUE counts
        # under the noisy_count name; negative would invert the noise
        raise ValueError(f"need sensitivity > 0, got {sensitivity}")
    b = float(sensitivity) / float(epsilon)
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    key = portable_str_hash(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
                for c in group_cols
            ],
        )
    )
    u = portable_hash01(key, salt)
    centered = u - F.lit(0.5)
    noise = F.round(
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered)),
        round_to,
    )
    return counts.select(
        *group_cols,
        F.round(F.col("_n") + noise, round_to).alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
