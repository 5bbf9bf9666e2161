"""Isotonic calibration (r12): the catalog's minimax formulation
(fit_i = max_{j<=i} min_{k>=i} weightedMean(y, bins j..k)) must equal the
sequential weighted Pool-Adjacent-Violators fit — the closed form PAVA
converges to (Robertson, Wright & Dykstra 1988, Thm 1.4.4). The catalog
query uses minimax because it is bounded-join SQL both engines replay;
this file proves the equivalence so the oracle check really is checking
isotonic regression, plus the isotonic-fit invariants on real data."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def pava_per_bin(pos, n):
    """PAVA fit expanded back to one value per input bin (exact Fractions)."""
    pools = []  # (sum_pos, sum_n, n_bins)
    for p, w in zip(pos, n):
        pools.append((Fraction(p), Fraction(w), 1))
        while len(pools) >= 2:
            p2, w2, c2 = pools[-1]
            p1, w1, c1 = pools[-2]
            if p1 / w1 <= p2 / w2:
                break
            pools[-2:] = [(p1 + p2, w1 + w2, c1 + c2)]
    out = []
    for p, w, c in pools:
        out.extend([p / w] * c)
    return out


def minimax_per_bin(pos, n):
    """The catalog query's formulation, in exact arithmetic."""
    b = len(pos)
    pre_p = [0]
    pre_n = [0]
    for p, w in zip(pos, n):
        pre_p.append(pre_p[-1] + p)
        pre_n.append(pre_n[-1] + w)

    def mean(j, k):  # inclusive bin span
        return Fraction(pre_p[k + 1] - pre_p[j], pre_n[k + 1] - pre_n[j])

    out = []
    for i in range(b):
        best = None
        for j in range(i + 1):
            worst = min(mean(j, k) for k in range(i, b))
            best = worst if best is None or worst > best else best
        out.append(best)
    return out


bins_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),  # n
        st.integers(min_value=0, max_value=30),  # pos (clamped to n below)
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(bins_strategy)
def test_minimax_equals_pava(bins):
    n = [w for w, _ in bins]
    pos = [min(p, w) for w, p in bins]
    assert minimax_per_bin(pos, n) == pava_per_bin(pos, n)


def test_catalog_isotonic_fit_invariants(spark):
    """On sf0.001 events: the fitted curve is non-decreasing, pool means
    are preserved (every maximal constant run's fit equals its pooled
    rate), and the Spark fit equals sequential PAVA on the same bins."""
    from rust_cdc_validator_spark.queries import QUERIES

    rows = sorted(
        QUERIES["events_isotonic_calibration"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["bin"],
    )
    fits = [r["fit_r"] for r in rows]
    assert fits == sorted(fits)  # isotonic
    exact = pava_per_bin([r["pos"] for r in rows], [r["n"] for r in rows])
    for r, e in zip(rows, exact):
        assert abs(r["fit_r"] - float(e)) < 1e-6
    # mean preservation per maximal constant run
    i = 0
    while i < len(rows):
        j = i
        while j + 1 < len(rows) and fits[j + 1] == fits[i]:
            j += 1
        pool_pos = sum(r["pos"] for r in rows[i : j + 1])
        pool_n = sum(r["n"] for r in rows[i : j + 1])
        assert abs(fits[i] - pool_pos / pool_n) < 1e-5
        i = j + 1
