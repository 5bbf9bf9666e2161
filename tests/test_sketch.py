"""Engine-portable HLL sketches (operators/sketch.py): exact mergeability
(the reason sketches exist) and estimation accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.sketch import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _vals(spark, lo, hi, tag="g"):
    return spark.range(lo, hi).select(
        F.lit(tag).alias("g"), F.col("id").alias("v")
    )


def test_merge_of_parts_equals_sketch_of_union_exactly(spark):
    """sketch(A) ⊎ sketch(B) == sketch(A ∪ B), register-for-register —
    including OVERLAPPING parts (idempotent max), the property that lets
    daily sketches fold into arbitrary windows without recounts."""
    a = _vals(spark, 0, 3000)
    b = _vals(spark, 2000, 6000)  # overlaps a on [2000, 3000)
    union = a.unionByName(b)
    sa = hll_sketch(a, ["g"], "v", p=10).collect()[0]["registers"]
    sb = hll_sketch(b, ["g"], "v", p=10).collect()[0]["registers"]
    su = hll_sketch(union, ["g"], "v", p=10).collect()[0]["registers"]
    merged = spark.createDataFrame(
        [(sa, sb)], "ra array<int>, rb array<int>"
    ).select(hll_merge(F.col("ra"), F.col("rb")).alias("m")).collect()[0]["m"]
    assert merged == su


def test_estimate_accuracy_and_linear_counting(spark):
    # 6000 true distinct at p=10 (m=1024): expect within ~5 std errors
    df = _vals(spark, 0, 6000)
    est = (
        hll_sketch(df, ["g"], "v", p=10)
        .select(hll_estimate(F.col("registers"), p=10).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - 6000) / 6000 < 0.17  # 1.04/sqrt(1024) ≈ 3.3% 1σ
    # tiny cardinality rides the linear-counting branch and stays tight
    small = _vals(spark, 0, 40)
    est_s = (
        hll_sketch(small, ["g"], "v", p=10)
        .select(hll_estimate(F.col("registers"), p=10).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est_s - 40) <= 3


def test_sketch_grouped_and_duplicates_ignored(spark):
    rows = [("a", i % 50) for i in range(5000)] + [("b", i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r["e"]
        for r in hll_sketch(df, ["g"], "v", p=10)
        .select("g", hll_estimate(F.col("registers"), p=10).alias("e"))
        .collect()
    }
    assert abs(out["a"] - 50) <= 4  # duplicates don't inflate
    assert abs(out["b"] - 500) / 500 < 0.15


def test_p_validation(spark):
    df = _vals(spark, 0, 10)
    with pytest.raises(ValueError, match="p must be"):
        hll_sketch(df, ["g"], "v", p=2)


def test_cm_never_underestimates_and_is_tight_for_heavies(spark):
    from rust_cdc_validator_spark.operators.sketch import (
        cm_estimate,
        cm_sketch,
    )

    rows = (
        [("g", "hot") for _ in range(500)]
        + [("g", "warm") for _ in range(50)]
        + [("g", f"cold{i}") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    sk = cm_sketch(df, ["g"], "v", d=4, w=256)
    probes = spark.createDataFrame(
        [("hot", 500), ("warm", 50), ("cold7", 1), ("absent", 0)],
        "v string, truth long",
    )
    got = {
        r["v"]: (r["est"], r["truth"])
        for r in probes.crossJoin(sk.drop("g"))
        .select("v", "truth", cm_estimate(F.col("counters"), F.col("v")).alias("est"))
        .collect()
    }
    for v, (est, truth) in got.items():
        assert est >= truth, (v, est, truth)
    # heavy hitters are tight: max overestimate ~ N/w = 750/256 < 3 per row
    assert got["hot"][0] - 500 <= 12
    assert got["warm"][0] - 50 <= 12


def test_cm_merge_of_disjoint_parts_equals_union_sketch(spark):
    from rust_cdc_validator_spark.operators.sketch import cm_merge, cm_sketch

    a = spark.createDataFrame(
        [("g", f"t{i % 20}") for i in range(300)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"t{i % 35}") for i in range(400)], "g string, v string"
    )
    sa = cm_sketch(a, ["g"], "v").collect()[0]["counters"]
    sb = cm_sketch(b, ["g"], "v").collect()[0]["counters"]
    su = cm_sketch(a.unionByName(b), ["g"], "v").collect()[0]["counters"]
    merged = (
        spark.createDataFrame([(sa, sb)], "ra array<bigint>, rb array<bigint>")
        .select(cm_merge(F.col("ra"), F.col("rb")).alias("m"))
        .collect()[0]["m"]
    )
    assert merged == su


def test_cm_weighted_and_validation(spark):
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.sketch import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame(
        [("g", "x", 10), ("g", "x", 5), ("g", "y", 2)],
        "g string, v string, wt long",
    )
    sk = cm_sketch(df, ["g"], "v", weight_col="wt")
    est = (
        sk.select(cm_estimate(F.col("counters"), F.lit("x")).alias("e"))
        .collect()[0]["e"]
    )
    assert est >= 15
    with _pytest.raises(ValueError, match="16\\^4"):
        cm_sketch(df, ["g"], "v", w=100)
    with _pytest.raises(ValueError, match="fanout"):
        cm_sketch(df, ["g"], "v", fanout="zip")


def test_cm_fanout_forms_bit_identical(spark):
    """The union and explode fan-outs are pure physics — same counters,
    bit for bit, weighted and unweighted, grouped and global (r11 bisect
    of the orders_join_size_sketch regression: the forms differ only in
    task shape, never in output)."""
    from rust_cdc_validator_spark.operators.sketch import cm_sketch

    df = spark.createDataFrame(
        [(g, f"v{i % 37}", i % 5 + 1) for g in ("a", "b") for i in range(200)],
        "g string, v string, wt long",
    )
    for kwargs in ({}, {"weight_col": "wt"}):
        u = cm_sketch(df, ["g"], "v", fanout="union", **kwargs).collect()
        e = cm_sketch(df, ["g"], "v", fanout="explode", **kwargs).collect()
        assert {r["g"]: r["counters"] for r in u} == {
            r["g"]: r["counters"] for r in e
        }
    gu = cm_sketch(df, [], "v", fanout="union").collect()[0]["counters"]
    ge = cm_sketch(df, [], "v", fanout="explode").collect()[0]["counters"]
    assert gu == ge


def test_hll_pairwise_intersection_disjoint_vs_identical(spark):
    """Inclusion–exclusion over merged registers: disjoint segments
    estimate ~zero overlap, identical segments estimate ~full overlap."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    rows = (
        [("a", i) for i in range(500)]
        + [("b", i) for i in range(500, 1000)]  # disjoint from a
        + [("c", i) for i in range(500)]  # identical to a
    )
    df = spark.createDataFrame(rows, "seg string, uid long")
    sk = hll_sketch(df, ["seg"], "uid", p=10)
    one = {r["seg"]: r["registers"] for r in sk.collect()}
    pair = spark.createDataFrame(
        [("a", one["a"], "b", one["b"]), ("a", one["a"], "c", one["c"])],
        "sa string, ra array<int>, sb string, rb array<int>",
    )
    est = pair.select(
        "sb",
        (
            hll_estimate(F.col("ra"), 10)
            + hll_estimate(F.col("rb"), 10)
            - hll_estimate(hll_merge(F.col("ra"), F.col("rb")), 10)
        ).alias("inter"),
    )
    got = {r["sb"]: r["inter"] for r in est.collect()}
    assert abs(got["b"]) < 50  # disjoint: ~0 (±sketch noise at p=10)
    assert abs(got["c"] - 500) < 50  # identical: ~500


def test_cm_join_size_exact_when_no_collisions(spark):
    """With keys << w buckets, the inner product estimates the join size
    nearly exactly; estimate never undershoots the true size."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import cm_join_size, cm_sketch

    a = spark.createDataFrame([(k,) for k in range(20) for _ in range(3)], "k long")
    b = spark.createDataFrame([(k,) for k in range(10, 30)], "k long")
    true_size = a.join(b, "k").count()  # keys 10..19, 3 rows each = 30
    assert true_size == 30
    sa = cm_sketch(a, [], "k").select(F.col("counters").alias("ca"))
    sb = cm_sketch(b, [], "k").select(F.col("counters").alias("cb"))
    est = sa.crossJoin(sb).select(
        cm_join_size(F.col("ca"), F.col("cb")).alias("e")
    ).first()["e"]
    assert est >= true_size  # cross terms only ever add
    assert est <= true_size + 20  # 40 keys in 256 buckets: tiny collision tail


def test_cm_join_size_disjoint_keys_near_zero(spark):
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import cm_join_size, cm_sketch

    a = spark.createDataFrame([(k,) for k in range(50)], "k long")
    b = spark.createDataFrame([(k,) for k in range(1000, 1050)], "k long")
    sa = cm_sketch(a, [], "k").select(F.col("counters").alias("ca"))
    sb = cm_sketch(b, [], "k").select(F.col("counters").alias("cb"))
    est = sa.crossJoin(sb).select(
        cm_join_size(F.col("ca"), F.col("cb")).alias("e")
    ).first()["e"]
    assert 0 <= est <= 60  # min-over-rows suppresses collision noise


def test_cm_join_size_planted_overflow_raises(spark):
    """Two ~10¹²-row-per-key sides at w=256: the counter dot product
    passes int64, which must raise (decimal accumulation + asserted
    narrowing), never wrap silently into a bogus plan-time size."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import cm_join_size

    d, w = 4, 256
    big = 4 * 10**12  # per-counter count; 256 × big² ≈ 4.1e36 ≫ 2^63
    arr = F.array(*[F.lit(big).cast("long")] * (d * w))
    df = spark.range(1).select(arr.alias("ca"), arr.alias("cb"))
    with pytest.raises(Exception, match="exceeds int64"):
        df.select(cm_join_size(F.col("ca"), F.col("cb")).alias("e")).collect()


def test_cm_join_size_large_but_representable_is_exact(spark):
    """Just below the guard: products that overflow naive int64 MULTIPLY
    terms but whose total fits in int64 come back exact via the decimal
    path (a long×long accumulation would have wrapped)."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import cm_join_size

    d, w = 4, 256
    big = 4 * 10**9  # one nonzero counter per row: dot = 1.6e19? no — see below
    # put the mass in ONE bucket per row: dot product = big² = 1.6e19 > 2^63?
    # 2^63 ≈ 9.22e18, so use 3e9 → 9e18 < 2^63 yet 3e9×3e9 overflows
    # int32 and stresses the decimal multiply path.
    big = 3 * 10**9
    one_hot = F.array(
        *[
            (F.lit(big) if i % w == 0 else F.lit(0)).cast("long")
            for i in range(d * w)
        ]
    )
    df = spark.range(1).select(one_hot.alias("ca"), one_hot.alias("cb"))
    got = df.select(
        cm_join_size(F.col("ca"), F.col("cb")).alias("e")
    ).first()["e"]
    assert got == big * big


# ---------------------------------------------------------------------------
# Key Bloom join pruning (r9)
# ---------------------------------------------------------------------------

def test_bloom_prune_no_false_negatives_and_low_fp(spark):
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import bloom_prune, key_bloom

    keys = spark.range(500).select((F.col("id") * 7).alias("k"))
    bloom = key_bloom(keys, "k")
    probe = spark.range(20000).select(F.col("id").alias("k"))
    kept = bloom_prune(probe, "k", bloom)
    kept_set = {r["k"] for r in kept.collect()}
    true_set = {i * 7 for i in range(500)}
    assert true_set <= kept_set  # NO false negatives, ever
    fp = len(kept_set - true_set)
    non_members = 20000 - len([k for k in true_set if k < 20000])
    # n=500, m=65536, k=4 -> theoretical fp ~ (1-exp(-4*500/65536))^4 ~ 8e-7;
    # allow generous slack
    assert fp / non_members < 0.01, f"{fp} false positives"


def test_bloom_prune_plan_is_broadcast_only(spark):
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import bloom_prune, key_bloom

    keys = spark.range(100).select(F.col("id").alias("k"))
    bloom = key_bloom(keys, "k")
    probe = spark.range(5000).select(F.col("id").alias("k"))
    plan = (
        bloom_prune(probe, "k", bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_key_bloom_validations(spark):
    from pyspark.sql import functions as F

    import pytest as _pytest

    from rust_cdc_validator_spark.operators.sketch import bloom_prune, key_bloom

    df = spark.range(5).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="k must be"):
        key_bloom(df, "k", k=0)
    with _pytest.raises(ValueError, match="k must be"):
        bloom_prune(df, "k", key_bloom(df, "k"), k=0)
    with _pytest.raises(ValueError, match="buckets must be"):
        key_bloom(df, "k", buckets=0)
    with _pytest.raises(ValueError, match="built with buckets=1"):
        bloom_prune(df, "k", key_bloom(df, "k"), buckets=8)
    with _pytest.raises(ValueError, match="n_buckets"):
        bloom_prune(df, "k", key_bloom(df, "k").drop("n_buckets"))


def test_bucketed_bloom_holds_fp_rate_at_1e5_keys(spark):
    """VERDICT r9 #3: a single 64 Kbit filter saturates at n=10^5 keys
    (~99% FP — useless); routing keys across 32 per-bucket filters holds
    the FP rate while keeping zero false negatives and the same
    broadcast-only probe plan."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import bloom_prune, key_bloom

    n = 100_000
    keys = spark.range(n).select((F.col("id") * 3).alias("k"))
    probe = spark.range(60_000).select((F.col("id") + 1_000_000).alias("k"))
    member_probe = spark.range(2_000).select((F.col("id") * 3).alias("k"))

    flat = key_bloom(keys, "k")  # saturated
    flat_fp = bloom_prune(probe, "k", flat).count() / 60_000
    assert flat_fp > 0.5  # the documented failure mode past ~1e4 keys

    bucketed = key_bloom(keys, "k", buckets=32)
    assert bucketed.count() <= 32 * 2048  # still a broadcastable relation
    fp = bloom_prune(probe, "k", bucketed, buckets=32).count() / 60_000
    assert fp < 0.02, f"bucketed FP rate {fp}"
    # no false negatives through the bucket routing
    assert bloom_prune(member_probe, "k", bucketed, buckets=32).count() == 2_000
    # probe plan still exchange-free on the big side
    plan = (
        bloom_prune(probe, "k", bucketed, buckets=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_bloom_prune_buckets_embedded_and_mismatch_raises(spark):
    """r11 (r10 advice): the build's buckets value is embedded in the
    relation (n_buckets constant column) — bloom_prune derives it by
    default (no contract to get wrong), and an explicit value is
    exact-compared so BOTH mismatch directions (fewer AND more than the
    build) fail loudly instead of silently mis-routing probes into
    false negatives."""
    import pytest
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import bloom_prune, key_bloom

    keys = spark.range(5_000).select(F.col("id").alias("k"))
    bucketed = key_bloom(keys, "k", buckets=32).localCheckpoint(eager=True)
    probe = spark.range(100).select(F.col("id").alias("k"))
    # no buckets argument: derived from the relation — no false negatives
    assert bloom_prune(probe, "k", bucketed).count() == 100
    # explicit matching value also works
    assert bloom_prune(probe, "k", bucketed, buckets=32).count() == 100
    # both mismatch directions raise, including the built-with-MORE
    # case the r10 max(bkt) guard could silently pass
    with pytest.raises(ValueError, match="built with buckets=32"):
        bloom_prune(probe, "k", bucketed, buckets=8)
    with pytest.raises(ValueError, match="built with buckets=32"):
        bloom_prune(probe, "k", bucketed, buckets=64)
    flat = key_bloom(keys, "k").localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="built with buckets=1"):
        bloom_prune(probe, "k", flat, buckets=32)


def test_bloom_flag_matches_prune(spark):
    """bloom_flag is the audit form of bloom_prune: rows with the flag
    true are exactly the pruned output, every input row survives, and
    the mismatch contract is shared."""
    import pytest
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.sketch import (
        bloom_flag,
        bloom_prune,
        key_bloom,
    )

    keys = spark.range(300).select((F.col("id") * 11).alias("k"))
    bloom = key_bloom(keys, "k").localCheckpoint(eager=True)
    probe = spark.range(5000).select(F.col("id").alias("k"))
    flagged = bloom_flag(probe, "k", bloom)
    assert flagged.count() == 5000  # nothing dropped
    passed = {r["k"] for r in flagged.filter("bloom_hit").collect()}
    pruned = {r["k"] for r in bloom_prune(probe, "k", bloom).collect()}
    assert passed == pruned
    with pytest.raises(ValueError, match="built with buckets=1"):
        bloom_flag(probe, "k", bloom, buckets=16)


def test_bloom_flag_rebalance_identical_results(spark):
    """The rebalance knob is a pure physical hint: flags identical to
    the un-rebalanced form, partition count actually changes, and a
    non-positive value raises."""
    from rust_cdc_validator_spark.operators.sketch import bloom_flag, key_bloom

    keys = spark.createDataFrame([(i,) for i in range(0, 200, 3)], "kk long")
    bloom = key_bloom(keys, "kk").localCheckpoint(eager=True)
    probe = spark.createDataFrame([(i,) for i in range(200)], "k long")
    plain = {
        (r["k"], r["bloom_hit"]) for r in bloom_flag(probe, "k", bloom).collect()
    }
    reb = bloom_flag(probe, "k", bloom, rebalance=8)
    assert {(r["k"], r["bloom_hit"]) for r in reb.collect()} == plain
    assert reb.rdd.getNumPartitions() == 8
    with pytest.raises(ValueError, match="rebalance"):
        bloom_flag(probe, "k", bloom, rebalance=0)


def test_kmv_sketch_exact_below_k_and_estimates(spark):
    from rust_cdc_validator_spark.operators.sketch import kmv_sketch

    # group 'small' has 50 distinct values -> exact; 'big' has 5000 -> est
    rows = [("small", i) for i in range(50)] * 3 + [
        ("big", i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in kmv_sketch(df, ["g"], "v", k=256).collect()}
    assert got["small"]["est"] == 50.0
    assert not got["small"]["saturated"]
    assert len(got["small"]["hashes"]) == 50
    assert got["big"]["saturated"]
    assert len(got["big"]["hashes"]) == 256
    assert got["big"]["est"] == pytest.approx(5000, rel=0.25)
    # hashes are the k smallest, ascending
    hs = got["big"]["hashes"]
    assert hs == sorted(hs)
    with pytest.raises(ValueError, match="k must"):
        kmv_sketch(df, ["g"], "v", k=4)


def test_kmv_sketch_partition_invariant(spark):
    from rust_cdc_validator_spark.operators.sketch import kmv_sketch

    rows = [("g", i) for i in range(3000)]
    df1 = spark.createDataFrame(rows, "g string, v long").repartition(1)
    df16 = spark.createDataFrame(rows, "g string, v long").repartition(16)
    a = kmv_sketch(df1, ["g"], "v", k=64).collect()[0]
    b = kmv_sketch(df16, ["g"], "v", k=64).collect()[0]
    assert a["hashes"] == b["hashes"]
    assert a["est"] == b["est"]


def test_kmv_pair_overlap_set_algebra(spark):
    from rust_cdc_validator_spark.operators.sketch import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    # A = 0..59, B = 40..99: |A|=60 |B|=60 |A∩B|=20 |A∪B|=100 — all
    # below k, so every estimate is EXACT
    rows = [("A", i) for i in range(60)] + [("B", i) for i in range(40, 100)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, ["g"], "v", k=256)
    r = kmv_pair_overlap(sk, "g", k=256).collect()[0]
    assert (r["ga"], r["gb"]) == ("A", "B")
    assert r["est_a_r"] == 60.0 and r["est_b_r"] == 60.0
    assert r["est_union_r"] == 100.0
    assert r["est_intersect_r"] == 20.0
    assert r["est_a_minus_b_r"] == 40.0
    assert r["est_b_minus_a_r"] == 40.0


def test_kmv_pair_overlap_saturated_estimates(spark):
    from rust_cdc_validator_spark.operators.sketch import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    # big overlapping sets: A = 0..3999, B = 2000..5999
    rows = [("A", i) for i in range(4000)] + [
        ("B", i) for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, ["g"], "v", k=256)
    r = kmv_pair_overlap(sk, "g", k=256).collect()[0]
    assert r["est_union_r"] == pytest.approx(6000, rel=0.25)
    assert r["est_intersect_r"] == pytest.approx(2000, rel=0.45)
    assert r["est_a_minus_b_r"] == pytest.approx(2000, rel=0.45)
    # inclusion-exclusion consistency of the theta estimators:
    # the three disjoint parts sum to everything both sketches see
    total = (
        r["est_intersect_r"] + r["est_a_minus_b_r"] + r["est_b_minus_a_r"]
    )
    assert total == pytest.approx(6000, rel=0.3)
