"""Deterministic sampling for training-data curation.

``df.sample()`` / ``df.sampleBy()`` draw from a per-partition RNG: the
result changes with partitioning, task retries, and engine version — a
reproducibility hazard for any pipeline whose sample feeds a training run.
Everything here is a PURE PROJECTION of row content instead: hash the id,
compare against a threshold. Same row → same decision, any run, any
partitioning, any engine — and the whole operator is one codegen'd filter
(no shuffle, no sampling state), so it costs a scan at 100 TB.

Two operators:

- :func:`stratified_hash_sample` — per-stratum keep-rates (downsample the
  dominant language / source, keep the rare ones), the deterministic
  counterpart of ``sampleBy``.
- :func:`priority_sample` — weighted sampling without replacement via
  Priority Sampling (Duffield, Lund, Thorup, JACM 2007): per row draw
  uniform u from the id hash and set priority = weight / u; the top-k
  priorities are the sample. Transcendental-free by construction — the
  classic Efraimidis–Spirakis key u^(1/w) needs pow(), whose low bits are
  implementation-defined, while IEEE division is correctly rounded and
  therefore bit-identical across engines (the property every cross-engine
  oracle here leans on).

Hashing: the mod-P affine family of assignment_etl_spark/portable.py
(P = 2^31-1) with one xor-shift between the two affine rounds — the
non-linear step matters because affine∘affine is still affine, and a pure
LCG chain would leave consecutive ids on a lattice that correlates
keep-decisions. All arithmetic stays inside int64 (operands < 2^31,
multiplier < 2^31 → products < 2^62) and xor/shift are exact in both
engines. For adversarial inputs (ids chosen to collide) swap in
``F.xxhash64`` — kept out of the default because DuckDB cannot replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from assignment_etl_spark.portable import ADD_B as _B
from assignment_etl_spark.portable import MULT_A as _A
from assignment_etl_spark.portable import PRIME_P as _P
from assignment_etl_spark.portable import XSHIFT as _X


def portable_hash01(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform in (0, 1] from an integral id: affine round,
    xor-shift mix (the non-linearity), affine round, then (h+1)/(P+1).
    Never 0, so it is safe as a divisor. NULL/non-integral inputs yield
    NULL — the frame-level operators validate the id column's type up
    front so that can't silently empty a pipeline."""
    h = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_P))
    h = F.pmod(h * _A + _B, F.lit(_P))
    h = h.bitwiseXOR(F.shiftright(h, _X))
    h = F.pmod(h * _A + _B, F.lit(_P))
    return (h + F.lit(1)).cast("double") / F.lit(float(_P + 1))


def sql_hash01(id_expr: str, salt: int = 0) -> str:
    """DuckDB replica of :func:`portable_hash01` (int64 arithmetic, xor,
    and shifts are engine-independent; the final division is one IEEE
    op)."""
    h1 = f"((({id_expr}) + {salt}) % {_P} + {_P}) % {_P}"
    h2 = f"(({h1}) * {_A} + {_B}) % {_P}"
    h3 = f"xor(({h2}), ({h2}) >> {_X})"
    h4 = f"(({h3}) * {_A} + {_B}) % {_P}"
    return f"CAST(({h4}) + 1 AS DOUBLE) / {float(_P + 1)!r}"


def require_integral_id(df: DataFrame, id_col: str, op: str) -> None:
    """The portable hash needs an integral id: a string id would cast to
    NULL (ANSI off) and silently empty the sample/packing instead of
    erroring. For string ids derive a numeric key first (xxhash64, or a
    portable polynomial hash if a second engine must re-derive it)."""
    dtype = df.schema[id_col].dataType
    if not isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"{op} needs an integral id column; {id_col} is {dtype.simpleString()}"
        )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    stratum_col: str,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Keep each row of stratum s iff hash01(id) <= rates[s].

    Strata absent from ``rates`` are dropped (rate 0), matching
    ``sampleBy``. The filter is a single projection — no shuffle, no
    collected stratum list, so new strata appearing at 100 TB need no
    replan. Expected sample size per stratum is rate × N exactly in
    distribution; for exact-count quotas compose with
    :func:`priority_sample` (uniform weights) per stratum instead.
    """
    require_integral_id(df, id_col, "stratified_hash_sample")
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    u = portable_hash01(F.col(id_col), salt)
    rate = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )[F.col(stratum_col)]
    return df.filter(u <= F.coalesce(rate, F.lit(0.0)))


def priority_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    id_col: str,
    by: list[str] | None = None,
    salt: int = 0,
    priority_out: str = "priority",
) -> DataFrame:
    """Weighted sample without replacement: top-k rows by w / u.

    Global form compiles to TakeOrderedAndProject (per-partition heaps +
    single driver merge of k×partitions rows — no full sort, no shuffle of
    the data). Grouped form (``by``) is one window over a shuffle on the
    group keys. Ties are impossible for distinct ids (u is injective below
    P) but ordering is (priority DESC, id) anyway so the plan is
    deterministic by construction, not by luck.

    Rows with NULL or non-positive weight are excluded — they cannot carry
    sampling mass.
    """
    require_integral_id(df, id_col, "priority_sample")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    pri = (w / portable_hash01(F.col(id_col), salt)).alias(priority_out)
    base = df.filter(w.isNotNull() & (w > 0)).select("*", pri)
    if by:
        win = Window.partitionBy(*by).orderBy(
            F.col(priority_out).desc(), F.col(id_col)
        )
        return (
            base.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    return base.orderBy(F.col(priority_out).desc(), F.col(id_col)).limit(k)


def mixture_sample(
    df: DataFrame,
    targets: dict[str, int],
    *,
    domain_col: str,
    token_col: str,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Down-sample each domain toward a target token budget — the mixture
    step of a training-data pipeline ("this run wants 30B web tokens, 10B
    code tokens, ...").

    Per domain: rate = min(1, target_tokens / domain_tokens), then keep a
    row iff hash01(id, salt) <= rate. Domains absent from ``targets`` are
    dropped (an explicit mixture lists everything it wants). Achieved
    tokens concentrate around the target (hash selection is independent
    of document length); domains already under budget pass through whole
    (rate caps at 1 — never upsampled, matching how mixtures treat
    under-represented sources: reweight at training time, don't duplicate
    rows here).

    Scale: one partial-aggregated groupBy over the corpus for the
    per-domain token totals (output rows = #domains, tiny), a broadcast
    join of the rates, and a filter. Appending a ``mix_rate`` column for
    audit. Deterministic across engines and partitionings — the oracle
    replays it in SQL via :func:`sql_mixture_sample`.
    """
    require_integral_id(df, id_col, "mixture_sample")
    for d, t in targets.items():
        if t < 0:
            raise ValueError(f"target for {d!r} must be >= 0, got {t}")
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(targets.items())],
        f"`{domain_col}` string, _target long",
    )
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("_domain_tokens")
    )
    rates = totals.join(tgt, domain_col).select(
        domain_col,
        F.least(
            F.lit(1.0),
            F.col("_target").cast("double") / F.col("_domain_tokens"),
        ).alias("mix_rate"),
    )
    u = portable_hash01(F.col(id_col), salt)
    return df.join(F.broadcast(rates), domain_col).filter(
        u <= F.col("mix_rate")
    )


def sql_mixture_sample(
    targets: dict[str, int],
    *,
    table: str,
    domain_col: str,
    token_col: str,
    id_col: str,
    salt: int = 0,
) -> str:
    """DuckDB replica of :func:`mixture_sample`: exact BIGINT token
    totals, one IEEE division per domain rate, same hash comparison."""
    values = ", ".join(f"('{k}', {int(v)})" for k, v in sorted(targets.items()))
    return f"""
WITH _tgt({domain_col}, _target) AS (VALUES {values}),
_totals AS (
  SELECT {domain_col}, CAST(sum(CAST({token_col} AS BIGINT)) AS BIGINT) AS _domain_tokens
  FROM {table} GROUP BY 1),
_rates AS (
  SELECT {domain_col},
         least(1.0, CAST(_target AS DOUBLE) / _domain_tokens) AS mix_rate
  FROM _totals JOIN _tgt USING ({domain_col}))
SELECT t.*, mix_rate
FROM {table} t JOIN _rates USING ({domain_col})
WHERE {sql_hash01(f"t.{id_col}", salt)} <= mix_rate
"""


def exact_stratified_sample(
    df: DataFrame,
    quotas: dict[str, int],
    *,
    stratum_col: str,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Exactly min(quota, stratum size) rows per stratum, deterministic.

    Rank rows inside each stratum by (hash01(id), id) — a uniform but
    engine-portable order — and keep rank ≤ quota. One shuffle on the
    stratum key; the per-stratum window sorts only that stratum's rows, so
    skewed strata cost their own size, not a global sort. Strata absent
    from ``quotas`` are dropped, matching stratified_hash_sample. For
    rate-based (expected-size) sampling use stratified_hash_sample — this
    is the exact-count quota variant it documents.
    """
    require_integral_id(df, id_col, "exact_stratified_sample")
    for s, k in quotas.items():
        if k < 0:
            raise ValueError(f"quota for {s!r} must be >= 0, got {k}")
    quota = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(stratum_col)]
    w = Window.partitionBy(stratum_col).orderBy(
        portable_hash01(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.coalesce(quota, F.lit(0)))
        .drop("_rk")
    )


def deterministic_shuffle(df: DataFrame, *, id_col: str, salt: int = 0) -> DataFrame:
    """Global deterministic reshuffle — the "randomize training order"
    step, reproducible across runs, engines, and partitionings.

    Total order by (hash01(id, salt), id): Spark plans orderBy as range
    partitioning (sampled split points) + per-partition sort, so the
    output is globally sorted WITHOUT any single-task bottleneck, and a
    downstream writer preserves the order per output file. Re-shuffling
    for a new epoch is a new salt, not a new algorithm. The id tiebreak
    makes the order total even under hash collisions.
    """
    require_integral_id(df, id_col, "deterministic_shuffle")
    return df.orderBy(
        portable_hash01(F.col(id_col), salt), F.col(id_col)
    )


def negative_samples(
    positives: DataFrame,
    items: DataFrame,
    *,
    user_col: str,
    item_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """≤k deterministic negative (user, item) pairs per user for
    contrastive training: candidate j for a user is the item at index
    portable_hash(user·k + j) mod |items| in item-key order, with
    accidental positives dropped by an anti-join (so a user whose
    candidates all collide with positives yields fewer than k — the
    standard hash-negative trade; raise k or re-salt to compensate).

    Scale shape: the item table rides a scalable global index
    (ops/ids.global_row_number — no single-partition window); the
    candidate join against it is ADAPTIVE — no broadcast hint, so AQE
    converts to broadcast at runtime iff the catalog's actual size is
    under the threshold, and a huge catalog takes a sort-merge join
    that spills instead of OOMing (the r12 memory-pressure sweep
    measured the forced-broadcast variant OOM at sf10 under a 2g heap
    — a 2M-item index pinned on-heap per executor). |items| enters as
    a 1-row broadcast, never a driver scalar. Hash-replayable in SQL.
    """
    from assignment_etl_spark.ext.sketch import portable_hash_int
    from assignment_etl_spark.ops.ids import global_row_number

    # consumed by the |items| broadcast AND the candidate join, and
    # global_row_number itself evaluates its input twice (range-exchange
    # counts + windowed numbering) — persist so the catalog distinct +
    # global index build run once, not up to four times
    from assignment_etl_spark.caching import scoped_persist

    idx = scoped_persist(global_row_number(
        items.select(item_col).distinct(), [item_col], out_col="_idx", start=0
    ))
    n_items = idx.agg(F.count(F.lit(1)).alias("_n"))
    users = positives.select(user_col).distinct()
    cands = (
        users.crossJoin(F.broadcast(n_items))
        .select(
            user_col,
            "_n",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_j"),
        )
        .select(
            user_col,
            F.pmod(
                portable_hash_int(
                    F.col(user_col) * F.lit(k) + F.col("_j"), salt
                ),
                F.col("_n"),
            ).alias("_idx"),
        )
    )
    withitem = cands.join(idx, on="_idx").select(user_col, item_col)
    return withitem.join(
        positives.select(user_col, item_col).distinct(),
        on=[user_col, item_col],
        how="left_anti",
    ).distinct()


def temperature_mixture_sample(
    df: DataFrame,
    *,
    domain_col: str,
    token_col: str,
    id_col: str,
    total_tokens: int,
    alpha: float = 0.7,
    salt: int = 0,
) -> DataFrame:
    """Temperature-flattened mixture sampling: each domain's share of the
    ``total_tokens`` budget is proportional to ``n_d^alpha`` (n_d = the
    domain's token count). ``alpha=1`` reproduces natural proportions;
    ``alpha→0`` approaches uniform across domains — the standard
    knob for boosting low-resource domains/languages without hand-written
    per-domain targets (multilingual-pretraining practice; cf. UNIMAX).

    rate_d = min(1, budget_d / n_d) with budget_d = total · n_d^α / Σn^α;
    row keep is the same deterministic ``hash01(id) ≤ rate`` as
    :func:`mixture_sample` — no upsampling, domains under budget pass
    whole. Rates are rounded to 9 decimals so the pow() ulp across
    engines cannot flip a hash comparison.

    Scale: ONE partial-aggregated groupBy for domain totals; the
    power/normalize arithmetic runs on the #domains-row table (its
    global sum is a scalar over that tiny table, not the corpus); then a
    broadcast rate join + filter. Appends ``mix_rate`` for audit.
    """
    require_integral_id(df, id_col, "temperature_mixture_sample")
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("_n")
    )
    # decimal-sum policy: the weight sum must not depend on which
    # partition each domain row landed in. It rides a window over the
    # domain-bounded totals table — the old 1-row broadcast's build
    # re-evaluated the totals lineage, scanning the corpus twice.
    rates = totals.withColumn(
        "_wsum",
        F.sum(
            F.round(F.pow(F.col("_n").cast("double"), F.lit(alpha)), 6).cast(
                "decimal(28,6)"
            )
        )
        .over(Window.partitionBy())
        .cast("double"),
    ).select(
        domain_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(total_tokens))
                * (F.pow(F.col("_n").cast("double"), F.lit(alpha)) / F.col("_wsum"))
                / F.col("_n"),
            ),
            9,
        ).alias("mix_rate"),
    )
    u = portable_hash01(F.col(id_col), salt)
    return df.join(F.broadcast(rates), domain_col).filter(u <= F.col("mix_rate"))


def sql_temperature_mixture_sample(
    *,
    table: str,
    domain_col: str,
    token_col: str,
    id_col: str,
    total_tokens: int,
    alpha: float = 0.7,
    salt: int = 0,
) -> str:
    """DuckDB replica of :func:`temperature_mixture_sample` (exact BIGINT
    totals; pow/normalize on the domain table; round-9 rate)."""
    return f"""
WITH _totals AS (
  SELECT {domain_col}, CAST(sum(CAST({token_col} AS BIGINT)) AS BIGINT) AS _n
  FROM {table} GROUP BY 1),
_wsum AS (
  SELECT CAST(sum(CAST(round(pow(CAST(_n AS DOUBLE), {alpha!r}), 6)
                       AS DECIMAL(28,6))) AS DOUBLE) AS _wsum
  FROM _totals),
_rates AS (
  SELECT {domain_col},
         round(least(1.0,
                     {float(total_tokens)!r}
                     * (pow(CAST(_n AS DOUBLE), {alpha!r}) / _wsum)
                     / _n), 9) AS mix_rate
  FROM _totals CROSS JOIN _wsum)
SELECT t.*, mix_rate
FROM {table} t JOIN _rates USING ({domain_col})
WHERE {sql_hash01(f"t.{id_col}", salt)} <= mix_rate
"""


def kfold_split(
    df: DataFrame, *, id_col: str, k: int = 5, out: str = "fold"
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    portable bucket of the id in [0, k) — a pure projection (the same
    reproducibility contract as ext/text.hash_split, which this
    generalizes from fixed percent weights to equal folds). Fold f's
    validation set is ``fold == f``; its training set is everything
    else — no materialized copies, each fold is a filter."""
    if k < 2:
        raise ValueError("k must be >= 2")
    require_integral_id(df, id_col, "kfold_split")
    from assignment_etl_spark.ext.text import split_bucket

    return df.withColumn(out, split_bucket(F.col(id_col), k))
