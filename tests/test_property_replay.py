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
