"""Pairwise association rules over (basket, item) relations — the
pair-level core of A-priori market-basket analysis (Agrawal & Srikant
1994): which items co-occur more than chance, as support / confidence /
lift rules.

Spark-first shape: the quadratic step is the per-basket pair fan-out,
expressed as a self-equi-join of the DISTINCT (basket, item) relation on
the basket key with an ``item_a < item_b`` canonical filter — the same
bounded pattern the co-trade graph builders use (queries.py triangles).
Pair counts, item margins, and the basket total all re-aggregate from
relations no wider than (key, count); nothing ever collects. The top-k
orders by the DOUBLE lift expression n_pair·n_baskets/(n_ante·n_cons)
with a (antecedent, consequent) tie-break, and the SQL oracle replays
the identical arithmetic — float-for-float the same ordering key, so
the cut is engine-portable (r10 verdict: the docstring previously
claimed an integer ordering key the code no longer uses).

Scale guardrail: one pathological basket of B items fans out B²/2 pairs;
``max_basket_size`` drops baskets beyond the cap BEFORE the join (the
standard basket-analysis hygiene — a basket with thousands of items
carries no association signal anyway), making worst-case fan-out
baskets × cap².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


#: per-row overhead (object headers, hash-relation slots) on top of the
#: MEASURED key bytes when sizing the frequent-items broadcast — the key
#: length itself comes from the data (r10 advice: a fixed per-row
#: constant under-sizes long URL/shingle keys, and F.broadcast OVERRIDES
#: the threshold, so an under-estimate forces broadcasts past the limit
#: the user configured)
_ITEM_ROW_OVERHEAD = 64


def _prune_infrequent(
    kept: DataFrame, items: DataFrame, min_pair_count: int
) -> DataFrame:
    """A-priori downward closure (Agrawal & Srikant 1994, the candidate-
    generation prune): an item occurring in fewer than ``min_pair_count``
    baskets cannot appear in any surviving pair (a pair's count is
    bounded by either item's margin), so drop its rows BEFORE the
    quadratic basket self-join. On heavy-tailed item distributions — most
    of a real corpus — the rare-item mass dominates the fan-out this
    removes. Semantics-exact: surviving pairs and their counts are
    untouched (both their items are frequent and no basket row they share
    is dropped).

    The prune must not cost a shuffle: a plain semi-join would exchange
    the whole basket relation on the ITEM key (a shuffle the query never
    needed — the self-join exchanges on the basket key), so the frequent
    set is broadcast whenever it fits the session's own threshold,
    keeping the basket relation's only exchange the basket-keyed one.
    The gate is ONE job over the (checkpointed, vocab-sized) margins
    relation — count AND mean key length in the same aggregate, so the
    broadcast is sized from the DATA (2 bytes per measured string char —
    in-memory strings are UTF-16-ish — plus per-row overhead), not a
    fixed per-row constant that long URL/shingle keys would blow
    through. Past the threshold the shuffle semi-join is the honest
    fallback — at that vocab size the rare-item mass it removes dwarfs
    the exchange."""
    from rust_cdc_validator_spark.operators.graph import _parse_bytes

    frequent = items.filter(
        F.col("_ni") >= min_pair_count
    ).select("_i")
    threshold = _parse_bytes(
        kept.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10m"
        )
    )
    probe = frequent.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length(F.col("_i").cast("string"))).alias("len"),
    ).first()
    est_bytes = int(probe["n"]) * (
        _ITEM_ROW_OVERHEAD + 2.0 * float(probe["len"] or 0.0)
    )
    if 0 < est_bytes <= threshold:
        frequent = F.broadcast(frequent)
    return kept.join(frequent, "_i", "left_semi")


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    top_k: int = 100,
    max_basket_size: int = 1000,
) -> DataFrame:
    """Top-``top_k`` pairwise rules by lift. Returns BOTH directions of
    each surviving pair — (antecedent, consequent, n_pair, support,
    confidence, lift) — since confidence is asymmetric while support and
    lift are not. ``min_pair_count`` screens the unstable low-support
    tail; ties in lift break on (antecedent, consequent)."""
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    if max_basket_size < 2:
        raise ValueError("max_basket_size must be >= 2")
    bi = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    sizes = bi.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
    kept = bi.join(
        sizes.filter(F.col("_sz") <= max_basket_size).select("_b"), "_b"
    )
    # Materialize the basket relation ONCE: nb, the item margins, and
    # BOTH sides of the pair self-join read it — without the cut each
    # reference replays the distinct + size-filter join (the A-priori
    # prune's extra reference measured 1.9× the query at sf0.1 before
    # this). The margins relation is vocab-sized and feeds three
    # consumers (prune gate, antecedent and consequent joins), so it is
    # cut too.
    kept = kept.localCheckpoint(eager=True)
    nb = kept.agg(F.count_distinct(F.col("_b")).alias("_nb"))
    items = (
        kept.groupBy("_i")
        .agg(F.count(F.lit(1)).cast("long").alias("_ni"))
        .localCheckpoint(eager=True)
    )
    pruned = _prune_infrequent(kept, items, min_pair_count)
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(b, "_b")
        .filter(F.col("a._i") < F.col("b._i"))
        .groupBy(F.col("a._i").alias("_x"), F.col("b._i").alias("_y"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    # both rule directions in ONE pass (explode, not unionAll — the union
    # form evaluates the quadratic self-join + pair aggregation twice)
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_x").alias("antecedent"),
                    F.col("_y").alias("consequent"),
                    F.col("n_pair"),
                ),
                F.struct(
                    F.col("_y").alias("antecedent"),
                    F.col("_x").alias("consequent"),
                    F.col("n_pair"),
                ),
            )
        ).alias("_r")
    ).select("_r.antecedent", "_r.consequent", "_r.n_pair")
    na = items.select(F.col("_i").alias("antecedent"), F.col("_ni").alias("_na"))
    nc = items.select(F.col("_i").alias("consequent"), F.col("_ni").alias("_nc"))
    lift = (
        F.col("n_pair").cast("double")
        * F.col("_nb")
        / (F.col("_na") * F.col("_nc"))
    )
    return (
        both.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            lift.alias("_lift"),
            (F.col("n_pair").cast("double") / F.col("_nb")).alias("_sup"),
            (F.col("n_pair").cast("double") / F.col("_na")).alias("_conf"),
        )
        .orderBy(F.col("_lift").desc(), "antecedent", "consequent")
        .limit(top_k)
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round("_sup", 6).alias("support"),
            F.round("_conf", 6).alias("confidence"),
            F.round("_lift", 6).alias("lift"),
        )
    )
