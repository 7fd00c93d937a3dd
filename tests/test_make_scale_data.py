"""Regression tests for the scale-data amplifier (tools/make_scale_data):
the round-8 int32 overflow — `_rep (int) × 100M (int literal)` wrapped
negative at rep ≥ 22 with ANSI off, so factor-100 amplification produced
negative/colliding-looking ids and `vec_id < 8` matched 84,008 rows at
sf10 (a 16.8B-pair join artifact in the IVF scale sweep)."""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from tools.make_scale_data import OFF, _rebase, _rep  # noqa: E402


def test_rebase_factor_100_stays_nonnegative_and_distinct(spark):
    base = spark.range(50).select(F.col("id").alias("k"))
    out = _rebase(_rep(base, 100), ["k"]).drop("_rep")
    stats = out.agg(
        F.min("k").alias("mn"),
        F.max("k").alias("mx"),
        F.countDistinct("k").alias("nd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats.mn >= 0, "int32 wraparound regression: negative ids"
    assert stats.mx == 49 + 99 * OFF
    assert stats.nd == stats.n == 5000


def test_rebase_output_type_is_long(spark):
    base = spark.range(3).select(F.col("id").cast("long").alias("k"))
    out = _rebase(_rep(base, 30), ["k"])
    assert dict(out.dtypes)["k"] == "bigint"


def test_affine_alphabets_distinct_per_rep_and_rot_compatible():
    """The per-copy substitution must be a DISTINCT bijection for every
    rep (the rot-only predecessor wrapped at 26 and made 74% of a
    factor-100 corpus exact cross-copy duplicates — SCALE.md r9), and
    must reproduce the old pure rotations for rep < 26 so factor <= 26
    corpora are bit-identical across generator versions."""
    import string

    from tools.make_scale_data import _AFFINE_UNITS, _affine_alphabet

    az = string.ascii_lowercase
    n = 26 * len(_AFFINE_UNITS)  # 312 supported reps
    alphabets = [_affine_alphabet(r) for r in range(n)]
    assert len(set(alphabets)) == n, "substitution repeats within range"
    for a in alphabets:
        assert sorted(a) == sorted(az), "not a bijection"
    for k in range(26):  # old generator compatibility
        assert alphabets[k] == az[k:] + az[:k]


def test_sub_text_factor_100_produces_distinct_cross_copy_text(spark):
    """End-to-end: amplify one document to 100 copies and require all
    100 texts distinct (the wrap regression made rotation classes of
    ~4 copies share text verbatim). Also pins the r10 two-stage
    (rotation∘multiplication) form against the single-stage affine map
    character for character."""
    from tools.make_scale_data import _affine_alphabet, _rep, _sub_text

    base_text = "the quick brown fox jumps over the lazy dog"
    base = spark.createDataFrame([(base_text,)], "text string")
    rows = (
        _sub_text(_rep(base, 100), "text", F.col("_rep"), 100)
        .select("_rep", "text")
        .collect()
    )
    assert len({r.text for r in rows}) == 100
    import string

    az = string.ascii_lowercase
    for r in rows:
        table = str.maketrans(az, _affine_alphabet(r._rep))
        assert r.text == base_text.translate(table), r._rep


def test_emb_perturb_distinct_per_rep_and_stable_below_13(spark):
    """The embedding amplifier twin of the affine-cipher test (ADVICE
    r9): the per-copy offset vector must be DISTINCT for every rep to
    312 (the old rep % 13 coefficient gave ~8 exact duplicate copies
    per vector at factor 100), and reps < 13 must reproduce the old
    formula's values exactly."""
    from tools.make_scale_data import _emb_perturb, _rep

    dim = 64
    base = spark.createDataFrame(
        [([0.0] * dim,)], "embedding array<float>"
    )
    rows = (
        _rep(base, 312)
        .withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x, i: _emb_perturb(F.col("_rep"), x, i)
            ),
        )
        .select("_rep", "embedding")
        .collect()
    )
    vecs = {r._rep: tuple(r.embedding) for r in rows}
    assert len(set(vecs.values())) == 312, "perturbation repeats within range"
    # reps < 13: bit-identical to the OLD formula (evaluated here as the
    # pre-r10 expression) — the affine-cipher compatibility contract
    old_rows = (
        _rep(base, 13)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("_rep") % 13).cast("float")
                * F.lit(0.003)
                * ((i % 7) - 3).cast("float"),
            ),
        )
        .select("_rep", "embedding")
        .collect()
    )
    for r in old_rows:
        assert vecs[r._rep] == tuple(r.embedding), r._rep


def test_customer_names_distinct_per_rep(spark):
    """The fuzzy-linkage wrap (r10): amplified customer names must be
    distinct per copy (derived from the rebased key), with rep 0
    bit-identical to the source."""
    from tools.make_scale_data import OFF, _rebase, _rep
    import tools.make_scale_data as M

    base = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(5)],
        "c_custkey long, c_name string",
    )
    cust = _rebase(_rep(base, 40), ["c_custkey"])
    cust = cust.withColumn(
        "c_name",
        F.when(F.col("_rep") == 0, F.col("c_name")).otherwise(
            F.concat(
                F.lit("Customer#"),
                F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
            )
        ),
    )
    rows = cust.collect()
    names = [r.c_name for r in rows]
    assert len(set(names)) == len(names) == 200
    for r in rows:
        if r._rep == 0:
            assert r.c_name == f"Customer#{r.c_custkey:09d}"
        else:
            assert r.c_name.endswith(str(r.c_custkey))


def test_offset_coprime_to_small_powers_of_ten():
    """The r10 offset-divisibility wrap: OFF must not be ≡ 0 modulo the
    small power-of-ten moduli sweep workloads key on (suffix-6 blocks,
    mod-1000 lattices), or every copy lands on its original's slice."""
    from math import gcd

    from tools.make_scale_data import OFF

    for m in (10, 100, 1000, 10_000, 100_000, 1_000_000):
        assert OFF % m != 0, m
    assert gcd(OFF, 10**6) == 1
    # the low-order residue must STRIDE the slice space, not nudge it:
    # rep-shifts of a ~15k-value base key space must spread across the
    # 10^6 suffix slice within a few reps (the 100000007 regression:
    # OFF % 1e6 == 7 left blocks ~factor deep)
    assert OFF % 1_000_000 >= 100_000


import pytest


@pytest.mark.parametrize("factor", [30, 1000])
def test_amplified_output_distributional_invariants(spark, tmp_path, factor):
    """ONE generic invariant over the generated output itself (VERDICT
    r10 ask #4) — the property all four historical amplifier bugs
    violated, asserted per table at a factor in the wrap regime (> 26;
    the 1000 case is VERDICT r11 ask #2's pre-flight for the sf100
    sweep — the amplifier's first outing beyond the affine group's 312
    maps, exercising the σ-scrambler stage):

    1. every rebased key column holds exactly factor × base distinct
       values (copies are disjoint — catches verbatim copies and any
       arithmetic wrap that collides them);
    2. the distinct values of every rebased key STRIDE the low-order
       slice space: no 10^6-residue class holds more than a birthday-
       bound handful of distinct key values (catches OFF ≡ 0 mod 10^k —
       all copies on the original's slice — AND the OFF ≡ 7 nudge,
       where copies stayed inside the base key span and suffix blocks
       ran ~factor deep);
    3. every amplified content column is per-copy distinct: distinct
       count ≥ 0.999 × factor × base distinct (catches the rot-cipher
       wrap's 74%-duplicate corpus, the rep % 13 embedding wrap, and
       verbatim names).
    """
    from pyspark.sql import functions as F

    from tools.make_scale_data import (
        CONTENT_COLS,
        REBASED_KEYS,
        amplify,
        stride_cluster_allowance,
    )

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "amp")
    amplify(spark, factor, out, src=src)

    for table, keys in REBASED_KEYS.items():
        base = spark.read.parquet(f"{src}/{table}.parquet")
        amp = spark.read.parquet(f"{out}/{table}.parquet")
        for k in keys:
            nd_base = base.select(k).distinct().count()
            vals = amp.select(k).distinct()
            nd = vals.count()
            assert nd == factor * nd_base, (table, k, nd, nd_base)
            lo, hi = base.agg(F.min(k), F.max(k)).collect()[0]
            assert amp.agg(F.min(k)).collect()[0][0] >= 0, (table, k)
            hot = (
                vals.groupBy((F.col(k) % 1_000_000).alias("slice"))
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            # expected max residue-class load = birthday handful PLUS
            # the exact arithmetic-progression clustering the stride
            # implies for this table's base key span (three-distance:
            # OFF·81 ≡ 17 mod 10^6, so a span-W base admits ~W/17
            # lag-81k stacks — at factor 1000 over sf0.001 customers
            # that is 1+8 = 9, measured AND predicted). A wrapped OFF
            # drives the allowance toward `factor`; the cap rejects it.
            allowance = stride_cluster_allowance(factor, int(hi - lo))
            assert allowance <= max(6, factor // 10), (
                f"{table}.{k}: stride clustering {allowance} approaches "
                f"factor {factor} — OFF no longer strides this span"
            )
            bound = max(6, 6 * -(-nd // 1_000_000)) + allowance
            # hot ≤ bound also bounds downstream suffix-block depth
            # everywhere (occupied slices ≥ nd / hot), so no separate
            # occupancy check is needed; the OFF ≡ 7 'nudge' class is
            # rejected by test_offset_coprime_to_small_powers_of_ten
            # and by the allowance cap above
            assert hot <= bound, (
                f"{table}.{k}: {hot} distinct key values share one "
                f"mod-10^6 slice (bound {bound}) — copy-wrap regression"
            )

    for table, cols in CONTENT_COLS.items():
        base = spark.read.parquet(f"{src}/{table}.parquet")
        amp = spark.read.parquet(f"{out}/{table}.parquet")
        for c in cols:
            nd_base = base.select(c).distinct().count()
            nd = amp.select(c).distinct().count()
            assert nd >= 0.999 * factor * nd_base, (table, c, nd, nd_base)
            assert nd <= factor * nd_base, (table, c, nd, nd_base)


def test_composed_alphabets_distinct_to_factor_4056():
    """r12 σ-scrambler stage: the composed map σ^(rep//312) ∘ affine
    must be a DISTINCT bijection for every rep the pipeline claims to
    support (312·13 = 4056), with reps < 312 bit-identical to the
    affine-only generator (σ^0 = identity) so every existing sf1/sf10
    directory stays reproducible. σ itself must not be affine, or the
    "distinct cosets" composition argument collapses."""
    import string

    from tools.make_scale_data import (
        _affine_alphabet,
        _composed_alphabet,
        _SIGMA,
    )

    az = string.ascii_lowercase
    n = 312 * 13
    alphabets = [_composed_alphabet(r) for r in range(n)]
    assert len(set(alphabets)) == n, "composed substitution wraps"
    for a in alphabets[:312] + alphabets[::97]:
        assert sorted(a) == sorted(az), "not a bijection"
    for r in range(312):
        assert alphabets[r] == _affine_alphabet(r), r
    affine_maps = {_affine_alphabet(r) for r in range(312)}
    assert _SIGMA not in affine_maps, "σ must lie outside the affine group"


def test_sub_text_factor_1000_matches_composed_alphabet(spark):
    """End-to-end three-stage pipeline at factor 1000: every copy's
    text must equal the single-table `_composed_alphabet` substitution
    (the ground truth), and all 1000 texts must be distinct."""
    from tools.make_scale_data import _composed_alphabet, _rep, _sub_text

    base_text = "the quick brown fox jumps over the lazy dog"
    base = spark.createDataFrame([(base_text,)], "text string")
    rows = (
        _sub_text(_rep(base, 1000), "text", F.col("_rep"), 1000)
        .select("_rep", "text")
        .collect()
    )
    assert len({r.text for r in rows}) == 1000
    import string

    az = string.ascii_lowercase
    for r in rows:
        table = str.maketrans(az, _composed_alphabet(r._rep))
        assert r.text == base_text.translate(table), r._rep
