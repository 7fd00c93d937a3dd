"""Portable HyperLogLog: mergeable distinct-count sketches as plain
DataFrames, deterministic across engines.

Spark's ``approx_count_distinct`` is terminal — you get a number, not a
sketch, so you cannot persist per-partition sketches and merge them
later (the shape incremental distinct maintenance needs at 100 TB:
sketch each new partition once, merge register tables, never rescan
history). This module builds the sketch AS a DataFrame of (group, idx,
rho) registers:

- ``hll_sketch``: one projection (portable 31-bit hash → register index
  = low ``p`` bits, rho = leading-zero rank of the top ``31-p`` bits via
  an integer CASE chain — no floating log2, whose floor misbehaves at
  exact powers of two) + one groupBy max. Shuffles ≤ m rows per group.
- ``hll_merge``: union + groupBy max — associative and commutative, so
  partial sketches combine in any order (tested).
- ``hll_cardinality``: the classic estimator with the small-range
  linear-counting correction; absent registers contribute 2^0 = 1 to the
  harmonic sum.

Everything derives from the repo's portable-hash family (portable.py),
so a DuckDB oracle replays the ENTIRE pipeline — hash, register table,
estimator — to the same rounded value: gate-certified, unlike any
engine-native HLL whose hash is implementation-defined.

The quality bar of the LCG+xorshift hash is "uniform enough to sketch
by" (same bar as the split/sample family); adversarial inputs call for
xxhash64 at the cost of oracle replay.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.portable import ADD_B as _B
from assignment_etl_spark.portable import MULT_A as _A
from assignment_etl_spark.portable import PRIME_P as _P
from assignment_etl_spark.portable import XSHIFT as _X

HASH_BITS = 31


def portable_hash_int(id_col: Column, salt: int = 0) -> Column:
    """The integer stage of ext/sampling.portable_hash01 (same constants,
    same rounds, no final division): uniform-ish in [0, P-1], identical
    in any engine with 64-bit integer arithmetic."""
    h = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_P))
    h = F.pmod(h * _A + _B, F.lit(_P))
    h = h.bitwiseXOR(F.shiftright(h, _X))
    h = F.pmod(h * _A + _B, F.lit(_P))
    return h


def _rho(w: Column, maxbits: int) -> Column:
    """Leading-zero rank of ``w`` within a maxbits-wide word, in
    1..maxbits+1 (w == 0 → maxbits+1). Pure integer comparisons."""
    expr = F.lit(maxbits + 1)
    # build the chain from the smallest threshold up so the final
    # expression checks the largest first
    for k in range(maxbits, 0, -1):
        expr = F.when(w >= F.lit(1 << (maxbits - k)), F.lit(k)).otherwise(expr)
    return expr


def sql_rho(w_expr: str, maxbits: int) -> str:
    """DuckDB replica of :func:`_rho` — the same CASE chain."""
    branches = "".join(
        f" WHEN ({w_expr}) >= {1 << (maxbits - k)} THEN {k}"
        for k in range(1, maxbits + 1)
    )
    return f"(CASE{branches} ELSE {maxbits + 1} END)"


def hll_sketch(
    df: DataFrame,
    col: str,
    *,
    by: str | list[str] | None = None,
    p: int = 10,
    salt: int = 0,
) -> DataFrame:
    """Register table (by..., idx, rho) for the distinct count of ``col``
    (integral) per group: sparse — registers never hit are absent."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    by_keys = [by] if isinstance(by, str) else list(by or [])
    m = 1 << p
    maxbits = HASH_BITS - p
    # Same staging as kll_sketch (r13): _rho references its word once
    # per CASE branch, so inlining the hash re-evaluated it ~(HASH_BITS
    # - p)x per row; stage the hash and the shifted word as stored
    # columns so each is computed once. Identical values, fewer evals.
    h = portable_hash_int(F.col(col), salt)
    return (
        df.select(*by_keys, h.alias("_h"))
        .select(
            *by_keys,
            F.pmod(F.col("_h"), F.lit(m)).alias("idx"),
            F.shiftright(F.col("_h"), p).alias("_w"),
        )
        .select(
            *by_keys,
            "idx",
            _rho(F.col("_w"), maxbits).alias("rho"),
        )
        .groupBy(*by_keys, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, *, by: str | list[str] | None = None) -> DataFrame:
    """Merge register tables: union + max per register. Associative and
    commutative — partial sketches combine in any order."""
    by_keys = [by] if isinstance(by, str) else list(by or [])
    return (
        a.unionByName(b)
        .groupBy(*by_keys, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_alpha_m2(p: int) -> float:
    """alpha_m * m^2 as one literal so both engines divide the same
    constant (m >= 128 branch of the standard alpha)."""
    m = 1 << p
    return 0.7213 / (1.0 + 1.079 / m) * m * m


def hll_cardinality(
    registers: DataFrame,
    *,
    p: int = 10,
    by: str | list[str] | None = None,
    round_to: int = 3,
) -> DataFrame:
    """(by..., est) from a register table: harmonic-mean estimator with
    the small-range linear-counting correction (E <= 2.5m and empty
    registers present → m·ln(m/V)). 2^-rho via pow(2, -rho) — exact for
    integral exponents in IEEE doubles, so cross-engine stable; the final
    round absorbs sub-ulp ln/division differences."""
    by_keys = [by] if isinstance(by, str) else list(by or [])
    m = 1 << p
    agg = registers.groupBy(*by_keys).agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("rho")))
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        ).alias("_denom"),
        (F.lit(m) - F.count(F.lit(1))).cast("double").alias("_zeros"),
    )
    raw = F.lit(hll_alpha_m2(p)) / F.col("_denom")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_zeros")),
    ).otherwise(raw)
    return agg.select(*by_keys, F.round(est, round_to).alias("est"))


# ------------------------------------------------------------ Count-Min

CM_SALT_STEP = 7919  # distinct LCG salt per sketch row


def portable_str_hash(col: Column) -> Column:
    """31-ary polynomial over codepoints mod P — the simhash/ngram
    family's string hash (ext/dedup.py), exposed for sketch keys. Empty
    string → 0. Code-point exact: r12 probed Spark's
    ascii(substring(...)) against CPython ord on BMP and ASTRAL chars
    (both return full code points), and the UTF-8 HLL register gate
    (GATES_UTF8 streaming_hll_token_registers) pins the parity on the
    non-ASCII corpus — not just its ASCII slice."""
    poly = F.aggregate(
        F.sequence(F.lit(1), F.length(col)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * 31 + F.ascii(F.substring(col, i, F.lit(1)))) % _P,
    )
    return F.when(F.length(col) == 0, F.lit(0).cast("long")).otherwise(poly)


def _item_hash(df: DataFrame, col: str) -> Column:
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    if isinstance(dtype, T.StringType):
        return portable_str_hash(F.col(col))
    return F.col(col).cast("long")


def _cm_bucket(h: Column, r: int, w: int) -> Column:
    return F.pmod(portable_hash_int(h, salt=r * CM_SALT_STEP), F.lit(w))


def cm_sketch(
    df: DataFrame, col: str, *, w: int = 512, d: int = 4
) -> DataFrame:
    """Count-Min sketch as a DataFrame of (r, bucket, n): d independent
    hash rows of width w. One explode (×d) + one groupBy — the sketch is
    d×w counters no matter how large the input, and `cm_merge` (union +
    sum) composes partial sketches, the mergeable-summary shape for
    incremental frequency maintenance. Estimates only ever OVERcount
    (collisions add), never undercount — the classic CM guarantee."""
    h = _item_hash(df, col)
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_bucket(h, r, w).alias("bucket"))
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_rb"))
        .groupBy(F.col("_rb.r").alias("r"), F.col("_rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge sketches built with the same (w, d): union + sum."""
    return (
        a.unionByName(b).groupBy("r", "bucket").agg(F.sum("n").alias("n"))
    )


def cm_estimate(
    sketch: DataFrame, items: DataFrame, col: str, *, w: int = 512, d: int = 4
) -> DataFrame:
    """items + ``est`` (≥ true count): min over the d rows of each item's
    bucket counter. The sketch side is d×w rows — broadcast it; the join
    never shuffles the items."""
    h = _item_hash(items, col)
    keyed = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cm_bucket(h, r, w).alias("bucket")
                    )
                    for r in range(d)
                ]
            )
        ).alias("_rb"),
    ).select(col, F.col("_rb.r").alias("r"), F.col("_rb.bucket").alias("bucket"))
    joined = keyed.join(F.broadcast(sketch), on=["r", "bucket"], how="left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def hll_sliding_cardinality(
    df: DataFrame,
    *,
    ts_col: str,
    col: str,
    bucket_seconds: int,
    window_buckets: int,
    p: int = 10,
    round_to: int = 3,
) -> DataFrame:
    """(end_bucket, est): distinct count of ``col`` over the trailing
    ``window_buckets`` time buckets ending at each populated bucket —
    the sliding-distinct problem (daily 7-day-active users) solved the
    mergeable way: sketch each bucket ONCE in a single data pass, then
    fan each bucket's ≤2^p registers to the window ends it serves (a
    bounded ×window explode of the REGISTER table, never the data) and
    max-merge per end. Cost after the one pass is
    O(buckets × window × 2^p) register rows, independent of row count —
    the reason warehouses precompute HLL sketches per partition. Ends
    are restricted to populated buckets (callers wanting empty-bucket
    ends can re-seed with an explicit spine)."""
    bucket = F.floor(
        F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)
    ).cast("long")
    regs = hll_sketch(
        df.withColumn("_bucket", bucket), col, by="_bucket", p=p
    )
    ends = regs.select(
        F.explode(
            F.sequence(
                F.col("_bucket"), F.col("_bucket") + F.lit(window_buckets - 1)
            )
        ).alias("end_bucket"),
        "idx",
        "rho",
    )
    real = regs.select(F.col("_bucket").alias("end_bucket")).distinct()
    merged = (
        ends.join(F.broadcast(real), on="end_bucket", how="left_semi")
        .groupBy("end_bucket", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_cardinality(
        merged, p=p, by="end_bucket", round_to=round_to
    ).orderBy("end_bucket")


def cm_join_size_estimate(a: DataFrame, b: DataFrame) -> DataFrame:
    """1-row (est): estimated inner-equi-join cardinality
    |A ⋈_k B| = Σ_k cnt_A(k)·cnt_B(k) from two Count-Min sketches built
    with the same (w, d) on the join key — the bucket-wise dot product
    per hash row, then min over rows. Collisions only ADD cross terms,
    so like the point estimate this never undercounts. This is the
    sketch-based cardinality input a join planner wants at 100 TB:
    persist per-table key sketches as d×w tables, estimate any join size
    by joining two tiny sketches — no data scan at plan time."""
    pa = a.select("r", "bucket", F.col("n").alias("n_a"))
    pb = b.select("r", "bucket", F.col("n").alias("n_b"))
    per_row = (
        pa.join(pb, on=["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).alias("dot"))
    )
    return per_row.agg(F.min("dot").alias("est"))


# ------------------------------------------------------------ Bloom

BLOOM_SALT_STEP = 104729  # distinct LCG salt per hash round (≠ CM's step)
WORD_BITS = 62  # bits packed per int64 word; 62 keeps every mask and
# every bit_or of masks strictly positive (< 2^62), so Spark and DuckDB
# never disagree about sign-bit shifts


def _bloom_pos(h: Column, r: int, m_bits: int) -> Column:
    return F.pmod(portable_hash_int(h, salt=r * BLOOM_SALT_STEP), F.lit(m_bits))


def _bloom_word_mask(pos: Column) -> tuple[Column, Column]:
    word = F.floor(pos / F.lit(WORD_BITS)).cast("int")
    mask = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.pmod(pos, F.lit(WORD_BITS)).cast("int"),
    )
    return word, mask


def bloom_build(
    df: DataFrame, col: str, *, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Bloom filter as a DataFrame of (word, bits): k portable hash
    rounds set k bits in an m_bits-wide bitmap packed 62 bits per int64
    word via a ``bit_or`` aggregate. One projection + one ≤⌈m/62⌉-row
    groupBy no matter how large the build side — the mergeable-summary
    shape (``bloom_merge`` = union + bit_or) that lets a 1000-executor
    job build per-partition filters and OR them on the driver side of a
    runtime-filter exchange. No false negatives ever; false-positive
    rate ≈ (1 − e^(−k·n/m))^k."""
    h = _item_hash(df, col)
    entries = []
    for r in range(k):
        word, mask = _bloom_word_mask(_bloom_pos(h, r, m_bits))
        entries.append(F.struct(word.alias("word"), mask.alias("mask")))
    return (
        df.select(F.explode(F.array(*entries)).alias("_wm"))
        .groupBy(F.col("_wm.word").alias("word"))
        .agg(F.bit_or(F.col("_wm.mask")).alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge filters built with the same (m_bits, k): union + bit_or —
    associative and commutative, the same incremental-maintenance
    contract as ``hll_merge``/``cm_merge``."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_prune(
    df: DataFrame, col: str, sketch: DataFrame, *, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` MIGHT be in the set the
    sketch was built from (supersets the exact semi-join; drops only
    guaranteed non-members). The sketch collapses to ONE row holding a
    word→bits map, crossJoin-broadcast to every task, so membership is a
    pure codegen projection — the fact table is never shuffled and never
    joined row-per-row, exactly the runtime-filter shape that cuts
    shuffle volume ahead of a big join at 100 TB. Absent words read as
    0 via coalesce, so an empty build side prunes everything."""
    one = sketch.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("_bloom")
    )
    h = _item_hash(df, col)
    cond = F.lit(True)
    for r in range(k):
        word, mask = _bloom_word_mask(_bloom_pos(h, r, m_bits))
        bits = F.coalesce(
            F.element_at(F.col("_bloom"), word), F.lit(0).cast("long")
        )
        cond = cond & (bits.bitwiseAND(mask) == mask)
    return df.crossJoin(F.broadcast(one)).filter(cond).drop("_bloom")


def hll_intersection_estimate(
    a: DataFrame,
    b: DataFrame,
    *,
    p: int = 10,
    round_to: int = 3,
) -> DataFrame:
    """1-row (est_a, est_b, est_union, est_intersection) by
    inclusion-exclusion over UNGROUPED register tables: |A∩B| ≈ |A| +
    |B| − |A∪B|, where the union sketch is the lossless hll_merge. The
    classic HLL set-operation estimate — error grows with the symmetric
    difference, so treat small intersections as directional. All three
    cardinalities ride the same portable estimator, so the whole row is
    engine-replayable."""
    ea = hll_cardinality(a, p=p, round_to=round_to).select(
        F.col("est").alias("est_a")
    )
    eb = hll_cardinality(b, p=p, round_to=round_to).select(
        F.col("est").alias("est_b")
    )
    eu = hll_cardinality(hll_merge(a, b), p=p, round_to=round_to).select(
        F.col("est").alias("est_union")
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), round_to
            ).alias("est_intersection"),
        )
    )


# ------------------------------------------------- KLL-class rank sketch

KLL_MAX_LEVEL = 20  # 2^20 ≈ 1M-to-1 top sampling rate; raise for > ~10^12
# rows per sketch group (the trim search never needs a level whose
# expected survivor count is below cap)


def _kll_level(h: Column, max_level: int) -> Column:
    """Deterministic compactor level: the leading-zero rank of the
    31-bit portable hash (the HLL-certified ``_rho``), minus one and
    capped — P(ℓ ≥ L) ≈ 2^-L. NOT trailing-zero divisibility: this
    LCG's LOW bits are lattice-structured on small consecutive-id
    ranges (measured: ids 0..999 yield no hash divisible by 4), while
    the leading-zero rank is geometric at every input size tested —
    the same end of the word HLL sketches from."""
    return F.least(_rho(h, HASH_BITS) - F.lit(1), F.lit(max_level))


def sql_kll_level(h_expr: str, max_level: int) -> str:
    """DuckDB replica of :func:`_kll_level` — the same rho CASE chain,
    minus one, capped."""
    return f"LEAST({sql_rho(h_expr, HASH_BITS)} - 1, {max_level})"


def _kll_trim(items: DataFrame, cap: int, max_level: int) -> DataFrame:
    """Trim (lvl, value, trim) rows to the lowest complete level whose
    survivor count fits ``cap``: h* = max(max input trim, min h with
    |{lvl ≥ h}| ≤ cap). Counts below the max input trim are truncated
    (those items are gone) and must not be consulted — taking the max
    restores order-independence (see kll_merge's associativity note)."""
    agg = items.agg(
        F.coalesce(F.max("trim"), F.lit(0)).alias("_m"),
        *[
            F.sum(F.when(F.col("lvl") >= h, 1).otherwise(0)).alias(f"_s{h}")
            for h in range(max_level + 1)
        ],
    )
    first_fit = F.lit(max_level)
    for h in range(max_level, -1, -1):
        first_fit = F.when(
            F.coalesce(F.col(f"_s{h}"), F.lit(0)) <= cap, F.lit(h)
        ).otherwise(first_fit)
    hstar = agg.select(F.greatest(F.col("_m"), first_fit).alias("_hstar"))
    return (
        items.crossJoin(F.broadcast(hstar))
        .filter(F.col("lvl") >= F.col("_hstar"))
        .select("lvl", "value", F.col("_hstar").alias("trim"))
    )


def kll_sketch(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    cap: int = 2048,
    max_level: int = KLL_MAX_LEVEL,
    salt: int = 0,
) -> DataFrame:
    """Mergeable rank/quantile sketch as a DataFrame of
    ``(lvl, value, trim)`` rows — the KLL-CLASS summary (Karnin, Lang &
    Liberty 2016) re-derived for order-independent determinism: levels
    are assigned by the portable hash of ``id_col`` (hierarchical
    Bernoulli "level sampling", P(lvl ≥ h) ≈ 2^-h) instead of by KLL's
    sequential compaction, which is inherently order-dependent and so
    cannot be both deterministic and merge-associative across arbitrary
    partitionings. The trade, documented honestly: retained-sample rank
    error is the Bernoulli-sample bound ε ≈ sqrt(ln(2/δ) / (2·m)) for
    m ≈ cap/2..cap survivors (DKW) — O(1/ε²) space where true KLL pays
    O((1/ε)·√log(1/δ)) — bought back as: identical sketch from ANY
    partitioning/merge order (property-tested), DuckDB-replayable
    (gate-certified), and one-pass buildable per partition.

    The retained rows are the complete level-h* Bernoulli sample of the
    input (h* = the sketch-wide ``trim``), each representing ~2^h* rows.
    Hash rides ``id_col`` (a unique-ish row id), NEVER the value —
    hashing values would retain duplicate values all-or-nothing and
    correlate the sample with the quantity being estimated.

    Build cost: one aggregate over the data (max_level+1 conditional
    sums choosing h*) + one filtered scan. NULL values are excluded.
    At 100 TB: sketch per partition/day with the same (cap, max_level,
    salt), persist the ≤cap-row outputs, kll_merge them — history is
    never rescanned (the HLL/CM incremental-maintenance contract)."""
    if cap < 2:
        raise ValueError(f"need cap >= 2, got {cap}")
    if not 1 <= max_level <= 62:
        raise ValueError(f"need 1 <= max_level <= 62, got {max_level}")
    # Stage the hash as a stored column before the level chain: _rho
    # references its argument once per CASE branch, so the inlined form
    # re-evaluated the 4-round portable hash ~31x per row (r13, guide
    # §1.2 — same expression-duplication class as detect_language).
    # CollapseProject keeps the staging (non-cheap producer, >1 use);
    # values are identical, only the evaluation count changes.
    h = portable_hash_int(F.col(id_col), salt)
    items = (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("_h"), F.col(col).alias("value"))
        .select(
            _kll_level(F.col("_h"), max_level).alias("lvl"),
            F.col("value"),
            F.lit(0).alias("trim"),
        )
    )
    return _kll_trim(items, cap, max_level)


def kll_merge(
    a: DataFrame, b: DataFrame, *, cap: int = 2048,
    max_level: int = KLL_MAX_LEVEL,
) -> DataFrame:
    """Merge two sketches built with the same (cap, max_level, salt):
    union + re-trim. ASSOCIATIVE and COMMUTATIVE (property-tested), by
    this argument: the merged trim is
    h* = min h ≥ max(input trims) with |{lvl ≥ h}| ≤ cap, and counts at
    h ≥ max(input trims) are complete (every input retained everything
    at or above its own trim); induction over any merge tree gives the
    same final h* as the flat union — hence the same retained set,
    since {lvl ≥ h*} survives every intermediate trim ≤ h*."""
    return _kll_trim(a.unionByName(b), cap, max_level)


def kll_quantiles(
    sketch: DataFrame,
    qs: list[float],
    *,
    round_to: int = 6,
) -> DataFrame:
    """(q, est) rows from a sketch: est is the q-quantile of the
    retained sample (continuous interpolation — Spark ``percentile`` ≡
    DuckDB ``quantile_cont``, the certified equivalence), one row per
    requested q in input order. All survivors carry equal weight
    (2^trim), so the sample quantile IS the estimator; rank error obeys
    the DKW bound in :func:`kll_sketch`'s docstring. Empty sketch →
    NULL estimates. Runs on the ≤cap-row sketch — never the data."""
    if not qs:
        raise ValueError("need at least one quantile in qs")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    agg = sketch.agg(
        *[
            F.round(
                F.percentile(F.col("value"), F.lit(float(q))), round_to
            ).alias(f"_q{i}")
            for i, q in enumerate(qs)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"), F.col(f"_q{i}").alias("est")
            )
            for i, q in enumerate(qs)
        ]
    )
    return agg.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.q").alias("q"), F.col("_p.est").alias("est")
    )


def kll_rank(
    sketch: DataFrame,
    values: list[float],
    *,
    round_to: int = 3,
) -> DataFrame:
    """(value, rank_est) rows: estimated COUNT of source rows ≤ value,
    one row per probe in input order — the inverse query to
    :func:`kll_quantiles` (rank ↔ quantile). Each survivor represents
    2^trim source rows, so rank_est = |{retained ≤ v}| · 2^trim — one
    aggregate over the ≤cap-row sketch, never the data. Empty sketch →
    0 estimates.

    Error note: unlike quantiles (self-normalizing — the Bernoulli
    count fluctuation cancels), the ABSOLUTE rank inherits the
    sample-count variance on top of the DKW shape error: sd ≈
    sqrt(N·F(v)·2^trim). For a CDF with the plain DKW bound, divide by
    :func:`kll_n_estimate` (same survivor set — the common factor
    cancels); keep an exact mergeable row count alongside the sketch
    when absolute ranks must be tight."""
    if not values:
        raise ValueError("need at least one probe value")
    agg = sketch.agg(
        F.coalesce(F.max("trim"), F.lit(0)).alias("_t"),
        *[
            F.sum(
                F.when(F.col("value") <= F.lit(float(v)), 1).otherwise(0)
            ).alias(f"_c{i}")
            for i, v in enumerate(values)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(v)).alias("value"),
                F.round(
                    F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("double")
                    * F.pow(F.lit(2.0), F.col("_t").cast("double")),
                    round_to,
                ).alias("rank_est"),
            )
            for i, v in enumerate(values)
        ]
    )
    return agg.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.value").alias("value"), F.col("_p.rank_est").alias("rank_est")
    )


def kll_n_estimate(sketch: DataFrame, *, round_to: int = 3) -> DataFrame:
    """1-row (n_est): estimated source row count = survivors · 2^trim —
    the sketch's own scale factor (exact when trim = 0: nothing was
    sampled away). Mostly a diagnostic; pair the sketch with an exact
    count column when the true N matters (counts merge by addition)."""
    return sketch.agg(
        F.round(
            F.count(F.lit(1)).cast("double")
            * F.pow(F.lit(2.0), F.coalesce(F.max("trim"), F.lit(0)).cast("double")),
            round_to,
        ).alias("n_est")
    )


def cm_heavy_hitters(
    df: DataFrame, col: str, *, min_count: int, w: int = 512, d: int = 4
) -> DataFrame:
    """EXACT heavy hitters (value, n) with n ≥ ``min_count``, found with
    a Count-Min candidate filter — the standard sketch-guided two-pass
    at 100 TB: pass 1 sketches every row into d×w counters; pass 2
    re-scans, keeps only rows whose OWN CM estimate clears the
    threshold (the estimate never undercounts, so the survivors are a
    SUPERSET of the true heavy hitters — no false negatives), and
    exactly counts just that subset, then applies the threshold to the
    exact counts. The point is pass-2 state: exact-counting everything
    needs one counter per distinct value; counting only the
    sketch-approved candidates bounds the aggregate by the heavy-hitter
    count plus CM's collision false positives (min over d rows of
    ~Poisson(N/w) overcounts).

    The filter itself is a pure codegen projection: the d×w sketch
    collapses to a one-row flat map (key r·w+bucket), crossJoin-
    broadcast like bloom_prune — no explode, no row join, the fact
    table is never shuffled before the threshold cut. Deterministic and
    oracle-replayable end to end (portable hashes, exact counts)."""
    if min_count < 1:
        raise ValueError(f"need min_count >= 1, got {min_count}")
    sketch = cm_sketch(df, col, w=w, d=d)
    one = sketch.groupBy().agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("r").cast("long") * w + F.col("bucket")).alias("k"),
                    F.col("n").alias("v"),
                )
            )
        ).alias("_cm")
    )
    h = _item_hash(df, col)
    est = None
    for r in range(d):
        n_r = F.coalesce(
            F.element_at(
                F.col("_cm"),
                F.lit(r).cast("long") * w + _cm_bucket(h, r, w),
            ),
            F.lit(0).cast("long"),
        )
        est = n_r if est is None else F.least(est, n_r)
    return (
        df.crossJoin(F.broadcast(one))
        .filter(est >= F.lit(min_count))
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(min_count))
    )
