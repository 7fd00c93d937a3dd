"""Johnson–Lindenstrauss sign-random projection for embedding columns.

The standard pre-ANN dimensionality reduction: project d_in-dim
vectors onto d_out ≪ d_in coordinates using a ±1 sign matrix scaled by
1/√d_out (Achlioptas '01 — the database-friendly JL construction: signs
instead of Gaussians, same distance-preservation guarantee, and the
matrix never has to be stored — it is re-derived from a hash). Shrinks
every downstream cosine/ANN pass (ext/similarity.py,
ext/nndescent.py) by d_in/d_out in both compute and shuffle bytes at a
bounded distortion cost.

Design choices for the 100 TB dataflow:

- The sign matrix is DERIVED, not sampled: entry (i, j) comes from the
  repo's portable integer hash of i·d_out + j (+salt) — both engines
  and every executor re-derive the identical matrix from three ints
  (d_in, d_out, salt); nothing is broadcast, stored, or drawn on the
  driver.
- Projection is a pure column expression: for each output dim, a fold
  over the input array with per-term rounding + decimal accumulation
  (the repo's decimal-sum policy) — so the projected vectors are
  bit-identical in any engine and under any partitioning, and the
  whole operator is one narrow map (no shuffle, no UDF, no Python).
- Cost is O(d_in · d_out) per row as generated codegen; for very wide
  (d_in · d_out ≳ 10⁴) matrices prefer a Pandas-UDF matmul — this
  expression form targets the ANN-prep regime (64→8/16) where staying
  JVM-side wins.

Reference parity note: the reference has no embedding surface; this
extends the ANN family (gate ``jl_project_embeddings``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.portable import ADD_B, MULT_A, PRIME_P, XSHIFT


def _mix(x: int) -> int:
    v = x % PRIME_P
    v = (v * MULT_A + ADD_B) % PRIME_P
    v ^= v >> XSHIFT
    v = (v * MULT_A + ADD_B) % PRIME_P
    return v


def jl_sign_matrix(d_in: int, d_out: int, salt: int = 0) -> list[list[int]]:
    """d_out rows × d_in cols of ±1, derived from the portable hash —
    identical in any language that reproduces the integer mix."""
    return [
        [
            1 if _mix(i * d_out + j + salt) % 2 == 0 else -1
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def project_vector(
    vec: Column,
    signs: list[list[int]],
    *,
    decimal_scale: int = 9,
    round_to: int = 6,
    unroll: bool = False,
) -> Column:
    """array<double> of len(signs) projected coordinates: for each
    output dim, Σ_i vec[i]·sign_ji (per-term rounded, decimal-summed —
    order-exact) scaled by 1/√d_out — the JL scaling that makes the
    projection an expected isometry (E‖Px‖² = ‖x‖²), rounded to
    ``round_to``.

    ``unroll=True`` emits the sum as an explicit term chain instead of
    the ``aggregate``/``zip_with`` fold — the Lloyd-unroll treatment
    (ext/kmeans.squared_l2) applied to this module's fold site after
    an sf10 A/B (SCALE.md r11): 10.34s → 7.60s on 200k×64→8 (the win
    is smaller than Lloyd's 3.3× because decimal arithmetic dominates
    either way). Values are EXACTLY equal: the chain replicates the
    fold's (acc + term).cast(dec) sequence and decimal addition is
    exact, so the oracle replay is unaffected. The same A/B measured
    the mmr relevance stage and the kcenter min-distance fold SLOWER
    unrolled (0.61→0.74s, 1.70→2.65s) — those keep their folds."""
    dec = f"decimal(28,{decimal_scale})"
    scale = math.sqrt(len(signs))
    dims = []
    for row in signs:
        if unroll:
            acc: Column = F.lit(0).cast(dec)
            for i, s in enumerate(row):
                term = F.round(vec[i] * F.lit(s), decimal_scale).cast(dec)
                acc = (acc + term).cast(dec)
        else:
            acc = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(s) for s in row]),
                    lambda x, s: F.round(x * s, decimal_scale).cast(dec),
                ),
                F.lit(0).cast(dec),
                lambda a, x: (a + x).cast(dec),
            )
        dims.append(F.round(acc.cast("double") / F.lit(scale), round_to))
    return F.array(*dims)


def project_embeddings(
    df: DataFrame,
    *,
    d_in: int,
    d_out: int,
    vec_col: str = "embedding",
    out_col: str = "projected",
    salt: int = 0,
    round_to: int = 6,
    unroll: bool | None = None,
) -> DataFrame:
    """Add ``out_col``: the d_out-dim JL projection of ``vec_col``.
    ``d_in`` is explicit (no driver peek at the data); rows whose
    vector is NULL get a NULL projection, and a vector whose actual
    length differs from ``d_in`` raises at execution time — zip_with
    would otherwise NULL-pad the mismatch and silently poison every
    coordinate of the fold.

    ``unroll=None`` (default) applies the size-gated Lloyd-unroll
    decision (ext/kmeans): large inputs by base-scan plan stats emit
    the codegen term chain (sf10 A/B: 1.36× — SCALE.md r11), small
    inputs keep the fold, whose plans build faster. Values identical
    either way (decimal arithmetic is exact)."""
    if d_out < 1 or d_in < 1:
        raise ValueError(f"need d_in, d_out >= 1, got {d_in}, {d_out}")
    if d_out > d_in:
        raise ValueError(f"d_out {d_out} > d_in {d_in}: not a reduction")
    if unroll is None:
        from assignment_etl_spark.ext.kmeans import UNROLL_MIN_BYTES, _stats_bytes

        unroll = _stats_bytes(df) >= UNROLL_MIN_BYTES
    signs = jl_sign_matrix(d_in, d_out, salt)
    # the length guard wraps the INPUT array, not the projected output:
    # branching on the full d_in·d_out projection expression was
    # measured 3× slower (the when-chain defeats common-subexpression
    # reuse across the d_out folds); guarding the source array is one
    # cheap branch evaluated before the folds consume it
    src = F.col(vec_col)
    checked = F.when(
        src.isNull() | (F.size(src) == d_in),
        F.transform(src, lambda x: x.cast("double")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"project_embeddings: declared d_in={d_in} but "),
                F.lit("vector has length "),
                F.size(src).cast("string"),
            )
        ).cast("array<double>")
    )
    return df.withColumn(
        out_col,
        F.when(
            src.isNotNull(),
            project_vector(checked, signs, round_to=round_to, unroll=unroll),
        ),
    )
