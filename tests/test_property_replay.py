"""Property-based pinning of replay semantics (SURVEY.md §5): for ANY
sequenced change log, net_effect == the reference's sequential apply."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_cdc_validator_spark.operators.replay import net_effect

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from rust_cdc_validator_spark.session import get_spark
        _spark = get_spark("hypothesis", shuffle_partitions=4)
    return _spark


ops = st.sampled_from(["I", "U", "D"])
keys = st.integers(min_value=0, max_value=6)
vals = st.integers(min_value=-100, max_value=100)
changes = st.lists(st.tuples(keys, ops, vals), min_size=0, max_size=60)


def sequential_apply(log):
    state = {}
    for key, op, val in log:
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return {k: v for k, v in state.items()}


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(changes)
def test_net_effect_equals_sequential_apply(log):
    spark = _get_spark()
    rows = [(k, op, v, i) for i, (k, op, v) in enumerate(log)]
    df = spark.createDataFrame(rows, "id int, Op string, val int, _seq long") \
        if rows else spark.createDataFrame([], "id int, Op string, val int, _seq long")
    got = {r["id"]: r["val"] for r in net_effect(df, ["id"]).collect()}
    assert got == sequential_apply(log)


def test_scd2_asof_diff_equals_two_asof_materializations(spark):
    """Property: the ONE-pass temporal diff must equal the definitional
    form — materialize the history AS OF t1 and AS OF t2 independently
    and full-outer-compare — on randomized I/U/D change logs."""
    import random

    from rust_cdc_validator_spark.operators.replay import (
        scd2_asof,
        scd2_asof_diff,
        scd2_history,
    )

    rng = random.Random(42)
    keys = [f"k{i}" for i in range(30)]
    log, seq = [], 0
    for _ in range(150):
        seq += 1
        k = rng.choice(keys)
        op = rng.choice(["I", "U", "U", "D"])
        val = None if rng.random() < 0.1 else round(rng.uniform(0, 100), 2)
        log.append((k, val, op, seq))
    df = spark.createDataFrame(log, "pk string, v double, Op string, _seq long")
    hist = scd2_history(df, ["pk"])

    t1, t2 = 40, 110
    diff = {
        r["pk"]: (r["change_type"], r["v_t1"], r["v_t2"])
        for r in scd2_asof_diff(hist, ["pk"], t1, t2, ["v"]).collect()
    }

    s1 = {r["pk"]: r["v"] for r in scd2_asof(hist, t1).collect()}
    s2 = {r["pk"]: r["v"] for r in scd2_asof(hist, t2).collect()}
    expected = {}
    for k in set(s1) | set(s2):
        if k not in s1:
            ct = "added"
        elif k not in s2:
            ct = "removed"
        elif s1[k] != s2[k] and not (s1[k] is None and s2[k] is None):
            ct = "changed"
        else:
            ct = "unchanged"
        expected[k] = (ct, s1.get(k), s2.get(k))

    assert diff == expected
    # the randomized log must actually exercise every transition class
    assert {v[0] for v in expected.values()} >= {
        "added", "removed", "changed", "unchanged",
    }


# ---------------------------------------------------------------------------
# Partial-image net effect (r12): for ANY sequenced partial-image change log,
# net_effect_partial == the sequential column-merging apply with delete
# fencing that a row-at-a-time consumer would run.
# ---------------------------------------------------------------------------

maybe_vals = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
partial_changes = st.lists(
    st.tuples(keys, ops, maybe_vals, maybe_vals), min_size=0, max_size=60
)


def sequential_partial_apply(log):
    """Row-at-a-time partial-image consumer: I/U merge the non-null columns
    into current state (I after a delete starts fresh); D drops the key."""
    state = {}
    for key, op, a, b in log:
        if op == "D":
            state.pop(key, None)
            continue
        cur = state.get(key, (None, None))
        state[key] = (
            a if a is not None else cur[0],
            b if b is not None else cur[1],
        )
    return state


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(partial_changes)
def test_net_effect_partial_equals_sequential_apply(log):
    from rust_cdc_validator_spark.operators.replay import net_effect_partial

    spark = _get_spark()
    schema = "id int, Op string, a int, b int, _seq long"
    rows = [(k, op, a, b, i) for i, (k, op, a, b) in enumerate(log)]
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = {
        r["id"]: (r["a"], r["b"])
        for r in net_effect_partial(df, ["id"]).collect()
    }
    assert got == sequential_partial_apply(log)
