"""Property-based pinning of the Kaplan–Meier estimator (SURVEY.md §5
model): for ANY subject/date multiset, the distributed estimator equals
a sequential pure-python product-limit reference — risk sets, event and
censoring counts, and the survival curve (to the same 6-decimal round),
including the events-before-censorings tie rule and the exact-zero
tail."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_cdc_validator_spark.operators.timeseries import kaplan_meier

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from rust_cdc_validator_spark.session import get_spark
        _spark = get_spark("hypothesis", shuffle_partitions=4)
    return _spark


subjects = st.integers(min_value=0, max_value=5)
days = st.integers(min_value=0, max_value=40)
events = st.lists(st.tuples(subjects, days), min_size=1, max_size=40)

_BASE = dt.date(2024, 1, 1)


def km_reference(rows, horizon_day):
    """Sequential product-limit reference."""
    by_subj = defaultdict(set)
    for u, d in rows:
        by_subj[u].add(d)
    obs = []  # (duration, is_event)
    for u, ds in by_subj.items():
        sorted_ds = sorted(ds)
        for a, b in zip(sorted_ds, sorted_ds[1:]):
            obs.append((b - a, 1))
        obs.append((horizon_day - sorted_ds[-1], 0))
    agg = defaultdict(lambda: [0, 0])  # dur -> [events, censored]
    for dur, ev in obs:
        if ev:
            agg[dur][0] += 1
        else:
            agg[dur][1] += 1
    out = {}
    total = len(obs)
    seen = 0
    logsum = 0.0
    dead = False
    for dur in sorted(agg):
        d, c = agg[dur]
        n_risk = total - seen
        if d >= n_risk:
            dead = True
        if dead:
            surv_out = 0.0
        else:
            # mirror the operator's exp-of-running-log-sum exactly
            logsum += math.log(1.0 - d / n_risk)
            surv_out = round(math.exp(logsum), 6)
        out[dur] = (n_risk, d, c, surv_out)
        seen += d + c
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events)
def test_kaplan_meier_matches_sequential_reference(rows):
    spark = _get_spark()
    # NOTE: per-subject same-day duplicates are legal input (gap 0 events)
    dedup = sorted(set(rows))
    horizon_day = max(d for _, d in dedup)
    df = spark.createDataFrame(
        [(u, (_BASE + dt.timedelta(days=d)).isoformat()) for u, d in dedup],
        "u int, d string",
    )
    got = {
        r["t_days"]: (
            r["n_risk"], r["n_events"], r["n_censored"], r["survival"]
        )
        for r in kaplan_meier(df, "u", "d").collect()
    }
    want = km_reference(dedup, horizon_day)
    assert got == want, (dedup, got, want)
