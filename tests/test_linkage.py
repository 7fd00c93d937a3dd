"""Blocked fuzzy join (ops/linkage.py): within-block matching, distance
threshold, blocking trade-offs, block profiling."""

from pyspark.sql import functions as F

from assignment_etl_spark.ops.linkage import (
    block_prefix_length,
    block_profile,
    block_suffix,
    fuzzy_join,
)


def _frames(spark):
    clean = spark.createDataFrame(
        [(1, "alpha-0001"), (2, "gamma-0002"), (3, "delta-0003")],
        "c_id long, c_name string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "alpha-0001"),   # exact
            (11, "gama-0002"),    # 1 deletion
            (12, "delt-0003"),    # 1 deletion
            (13, "omega-0009"),   # no counterpart
        ],
        "d_id long, d_name string",
    )
    return clean, dirty


def test_fuzzy_join_suffix_block(spark):
    clean, dirty = _frames(spark)
    got = fuzzy_join(
        dirty,
        clean,
        "d_name",
        "c_name",
        left_block=block_suffix("d_name", 5),
        right_block=block_suffix("c_name", 5),
        max_dist=1,
    )
    pairs = {(r.d_id, r.c_id, r.dist) for r in got.collect()}
    assert pairs == {(10, 1, 0), (11, 2, 1), (12, 3, 1)}


def test_max_dist_zero_is_exact(spark):
    clean, dirty = _frames(spark)
    got = fuzzy_join(
        dirty, clean, "d_name", "c_name",
        left_block=block_suffix("d_name", 5),
        right_block=block_suffix("c_name", 5),
        max_dist=0,
    )
    assert {r.d_id for r in got.collect()} == {10}


def test_blocking_excludes_cross_block_pairs(spark):
    # 'zlpha-9999' is distance 1 from nothing in its block: blocking is a
    # recall trade-off, documented — the pair (alpha-0001, alpha-9999)
    # would be within dist 4 but lands in another block and is never
    # compared.
    clean = spark.createDataFrame([(1, "alpha-0001")], "c_id long, c_name string")
    dirty = spark.createDataFrame([(9, "alpha-9999")], "d_id long, d_name string")
    got = fuzzy_join(
        dirty, clean, "d_name", "c_name",
        left_block=block_suffix("d_name", 5),
        right_block=block_suffix("c_name", 5),
        max_dist=4,
    )
    assert got.count() == 0


def test_prefix_length_block(spark):
    df = spark.createDataFrame(
        [("customer-x",), ("customer-xy",), ("supplier-a",)], "s string"
    )
    blocks = {
        r.b for r in df.select(block_prefix_length("s", 4, length_width=4).alias("b")).collect()
    }
    # 'customer-x' (10) and 'customer-xy' (11) share floor(len/4)=2 → same block
    assert blocks == {"cust|2", "supp|2"}


def test_block_profile_quadratic_audit(spark):
    df = spark.createDataFrame([("a",)] * 4 + [("b",)] * 2, "s string")
    prof = block_profile(df, F.col("s")).first()
    assert prof.n_blocks == 2
    assert prof.max_block == 4
    assert prof.sum_sq == 16 + 4


def test_fingerprint_key_normalizes(spark):
    from assignment_etl_spark.ops.linkage import fingerprint_key

    df = spark.createDataFrame(
        [("Smith, John",), ("john SMITH!",), ("John  Smith Smith",), ("Jane Smith",)],
        "s string",
    )
    keys = [r.k for r in df.select(fingerprint_key("s").alias("k")).collect()]
    assert keys[0] == keys[1] == keys[2] == "john smith"
    assert keys[3] == "jane smith"


def test_fingerprint_clusters(spark):
    from assignment_etl_spark.ops.linkage import fingerprint_clusters

    df = spark.createDataFrame(
        [("ACME Corp",), ("corp, acme",), ("ACME Corp",), ("Widget Inc",)],
        "name string",
    )
    got = {r.fp_key: (r.n_records, r.n_distinct_values)
           for r in fingerprint_clusters(df, "name").collect()}
    assert got["acme corp"] == (3, 2)  # two spellings, one cluster
    assert got["inc widget"] == (1, 1)


def test_fuzzy_join_max_block_guard(spark):
    """r10 hot-block guard: a degenerate block (mass-duplicated value)
    is excluded from the join under max_block; selective blocks link
    exactly as before."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ops.linkage import block_suffix, fuzzy_join

    clean_rows = [(i, f"Entity#{i:06d}") for i in range(20)]
    clean_rows += [(100 + j, "Entity#dupdup") for j in range(50)]  # hot block
    dirty_rows = [(i, f"Entity#{i:06d}".replace("#", "-")) for i in range(20)]
    dirty_rows += [(100 + j, "Entity-dupdup") for j in range(50)]
    clean = spark.createDataFrame(clean_rows, "c_key long, c_nm string")
    dirty = spark.createDataFrame(dirty_rows, "d_key long, d_nm string")
    kw = dict(
        left_block=block_suffix("d_nm", 6),
        right_block=block_suffix("c_nm", 6),
        max_dist=1,
    )
    uncapped = fuzzy_join(dirty, clean, "d_nm", "c_nm", **kw)
    capped = fuzzy_join(dirty, clean, "d_nm", "c_nm", max_block=10, **kw)
    # hot block: 50x50 pairs uncapped, zero capped
    assert uncapped.filter(F.col("c_nm") == "Entity#dupdup").count() == 2500
    assert capped.filter(F.col("c_nm") == "Entity#dupdup").count() == 0
    # selective blocks identical
    sel_u = sorted(
        (r.d_key, r.c_key)
        for r in uncapped.filter(F.col("c_nm") != "Entity#dupdup").collect()
    )
    sel_c = sorted(
        (r.d_key, r.c_key)
        for r in capped.filter(F.col("c_nm") != "Entity#dupdup").collect()
    )
    assert sel_u == sel_c == [(i, i) for i in range(20)]


def test_fuzzy_join_audited_reports_excluded_blocks(spark):
    """r11: the capped run's recall trade lands in data — one LOG_SCHEMA
    row per excluded block with both sides' sizes in the reason; the
    pairs output is identical to fuzzy_join with the same cap."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ops.linkage import (
        block_suffix,
        fuzzy_join,
        fuzzy_join_audited,
    )
    from assignment_etl_spark.schemas import LOG_COLUMNS

    clean_rows = [(i, f"Entity#{i:06d}") for i in range(20)]
    clean_rows += [(100 + j, "Entity#dupdup") for j in range(50)]
    # a block hot on the LEFT side only (absent from clean entirely)
    dirty_rows = [(i, f"Entity#{i:06d}".replace("#", "-")) for i in range(20)]
    dirty_rows += [(100 + j, "Entity-dupdup") for j in range(50)]
    dirty_rows += [(200 + j, "Entity-lonely") for j in range(15)]
    clean = spark.createDataFrame(clean_rows, "c_key long, c_nm string")
    dirty = spark.createDataFrame(dirty_rows, "d_key long, d_nm string")
    kw = dict(
        left_block=block_suffix("d_nm", 6),
        right_block=block_suffix("c_nm", 6),
        max_dist=1,
    )
    pairs, logs = fuzzy_join_audited(
        dirty, clean, "d_nm", "c_nm", max_block=10, **kw
    )
    assert logs.columns == LOG_COLUMNS
    got = {r.original_value: r.reason for r in logs.collect()}
    assert got == {
        "dupdup": "hot_block_excluded n_left=50 n_right=50",
        "lonely": "hot_block_excluded n_left=15 n_right=0",
    }
    assert logs.select("column_name").distinct().collect()[0][0] == "d_nm"
    ref = fuzzy_join(dirty, clean, "d_nm", "c_nm", max_block=10, **kw)
    assert sorted((r.d_key, r.c_key) for r in pairs.collect()) == sorted(
        (r.d_key, r.c_key) for r in ref.collect()
    )


def test_fuzzy_join_audited_logs_union_into_stream(spark):
    """The audit rows ride the standard log-union path (quality.union_logs)."""
    from assignment_etl_spark.ops.linkage import block_suffix, fuzzy_join_audited
    from assignment_etl_spark.ops.quality import empty_logs, union_logs

    clean = spark.createDataFrame(
        [(i, "same") for i in range(9)], "c_key long, c_nm string"
    )
    dirty = spark.createDataFrame(
        [(i, "same") for i in range(9)], "d_key long, d_nm string"
    )
    _, logs = fuzzy_join_audited(
        dirty, clean, "d_nm", "c_nm",
        left_block=block_suffix("d_nm", 4),
        right_block=block_suffix("c_nm", 4),
        max_block=5,
        filename="linkage_demo",
    )
    merged = union_logs(empty_logs(spark), logs)
    row = merged.collect()[0]
    assert row.filename == "linkage_demo"
    assert row.reason == "hot_block_excluded n_left=9 n_right=9"


def test_hot_blocks_null_key_merges_into_one_row(spark):
    """ADVICE r11: a NULL block key (null match column) hot on BOTH
    sides must produce ONE merged audit row, not two misleading
    half-rows (n_left=N/n_right=0 and the mirror) — the full outer
    join is null-safe now."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ops.linkage import (
        _hot_blocks,
        BLOCK_COL,
        fuzzy_join_audited,
    )

    clean_rows = [(i, f"Entity#{i:06d}") for i in range(10)]
    clean_rows += [(100 + j, None) for j in range(20)]
    dirty_rows = [(i, f"Entity-{i:06d}") for i in range(10)]
    dirty_rows += [(200 + j, None) for j in range(30)]
    clean = spark.createDataFrame(clean_rows, "c_key long, c_nm string")
    dirty = spark.createDataFrame(dirty_rows, "d_key long, d_nm string")
    lb = F.substring(F.col("d_nm"), -6, 6)
    rb = F.substring(F.col("c_nm"), -6, 6)
    hot = _hot_blocks(
        dirty.withColumn(BLOCK_COL, lb), clean.withColumn(BLOCK_COL, rb), 5
    ).collect()
    assert len(hot) == 1
    row = hot[0]
    assert row[BLOCK_COL] is None
    assert (row.n_left, row.n_right) == (30, 20)
    # and through the audited join: one log row, selective pairs intact
    pairs, logs = fuzzy_join_audited(
        dirty, clean, "d_nm", "c_nm",
        left_block=lb, right_block=rb, max_block=5, max_dist=1,
    )
    lrows = logs.collect()
    assert len(lrows) == 1
    assert lrows[0].reason == "hot_block_excluded n_left=30 n_right=20"
    assert sorted((r.d_key, r.c_key) for r in pairs.collect()) == [
        (i, i) for i in range(10)
    ]


def test_fuzzy_join_audited_evaluates_hot_blocks_once(spark, monkeypatch):
    """VERDICT r11 ask #5: the audited join computes the hot-block
    aggregates ONCE — one _hot_blocks frame feeds both the log branch
    and the exclusion set (previously each branch built its own)."""
    from assignment_etl_spark.ops import linkage

    calls = []
    real = linkage._hot_blocks

    def counting(l, r, max_block):
        calls.append(max_block)
        return real(l, r, max_block)

    monkeypatch.setattr(linkage, "_hot_blocks", counting)
    clean = spark.createDataFrame(
        [(i, f"Entity#{i:06d}") for i in range(10)], "c_key long, c_nm string"
    )
    dirty = spark.createDataFrame(
        [(i, f"Entity-{i:06d}") for i in range(10)], "d_key long, d_nm string"
    )
    pairs, logs = linkage.fuzzy_join_audited(
        dirty, clean, "d_nm", "c_nm",
        left_block=linkage.block_suffix("d_nm", 6),
        right_block=linkage.block_suffix("c_nm", 6),
        max_block=5,
    )
    assert pairs.count() == 10 and logs.count() == 0
    assert calls == [5]
