"""Blocked fuzzy matching (entity resolution): find near-identical string
pairs by edit distance WITHOUT the all-pairs cartesian — the classic
blocking-key design (Fellegi-Sunter record linkage; same shape the dedup
family uses for MinHash bands).

The all-pairs levenshtein over N rows is O(N^2) string comparisons — a
non-starter at scale. Blocking first co-partitions candidates on a cheap
equality key (a category column, a normalized prefix, a phonetic code),
then scores ONLY within-block pairs: one hash shuffle on the block key,
per-block pair enumeration, and the quadratic cost is bounded by the
LARGEST BLOCK, not the corpus. Skewed blocks are therefore the failure
mode — `blocked_fuzzy_pairs` caps per-block membership like the LSH bucket
caps (drops are observable via `block_size_stats`), so one degenerate
block cannot quadratically dominate a stage.

No reference counterpart (extension surface): the reference validates
equal rows; fuzzy linkage is the "which rows SHOULD have been equal"
companion a migration-validation user reaches for next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    text_col: str,
    max_dist: int,
    max_block: int = 10_000,
) -> DataFrame:
    """Within-block candidate pairs with levenshtein(text_a, text_b) <=
    ``max_dist``. Returns (block cols, id_a, id_b, dist) with id_a < id_b
    (each unordered pair once).

    Blocks larger than ``max_block`` rows are truncated to their first
    ``max_block`` ids (deterministic id order) so a degenerate block stays
    O(max_block^2) instead of unbounded — the same capped-bucket escape
    hatch as the LSH scorers; use `block_size_stats` to see what was cut.

    Scale shape: one shuffle on the block key; the self-join is
    block-equi-join (hash join on the block columns, never cartesian), and
    levenshtein runs JVM-side inside codegen. Cost is sum over blocks of
    |block|^2 — pick block keys to keep blocks in the 10-10k range.

    Two result-neutral pair-pruners keep the per-pair constant small:
      * a length-band prefilter — edit distance is >= |len(a) - len(b)|,
        so pairs outside ``max_dist`` length difference are discarded
        before any DP runs (lengths are computed once per ROW, pre-join,
        not once per pair);
      * Spark 3.5+'s bounded ``levenshtein(l, r, threshold)``, whose DP
        early-exits (returns -1) as soon as the running distance exceeds
        ``max_dist`` — O(len * max_dist) instead of O(len^2) per survivor.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if max_block < 2:
        raise ValueError("max_block must be >= 2")
    w = Window.partitionBy(*block_cols).orderBy(F.col(id_col).asc())
    base = (
        df.select(
            *block_cols,
            F.col(id_col),
            F.col(text_col),
            F.length(F.col(text_col)).alias("_len"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_block)
        .drop("_rn")
    )
    a = base.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_ta"),
        F.col("_len").alias("_la"),
    )
    b = base.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_tb"),
        F.col("_len").alias("_lb"),
    )
    pairs = (
        a.join(b, on=block_cols)
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        )
        .select(
            *block_cols,
            "id_a",
            "id_b",
            F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
    return pairs


def block_size_stats(
    df: DataFrame, block_cols: list[str], max_block: int = 10_000
) -> DataFrame:
    """Observability for `blocked_fuzzy_pairs`' cap: per-block row count,
    whether it overflows ``max_block``, and how many rows the cap would cut
    — run this BEFORE a big linkage job to choose block keys. One hash
    count on the block key; nothing else moves.
    """
    return (
        df.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("block_rows"))
        .select(
            *block_cols,
            "block_rows",
            (F.col("block_rows") > max_block).alias("overflows"),
            F.greatest(
                F.lit(0), F.col("block_rows") - max_block
            ).alias("rows_cut"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str,
    text_col: str,
    max_dist: int,
    window: int = 5,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995): sort
    candidates by a discriminating key and score each row only against
    its next ``window`` neighbors — O(N·w) comparisons instead of
    blocking's Σ|block|², and robust to the block-key cardinality
    mistakes `blocked_fuzzy_pairs` documents (a mis-sized block explodes
    quadratically; a sort window never does).

    The window runs INSIDE ``block_cols`` partitions (default: the first
    sort column's first character — a coarse, order-preserving prefix),
    because a single global sorted window is one task at any scale. The
    standard trade: pairs straddling a partition boundary are skipped, and
    the method's own answer is multiple passes with DIFFERENT sort keys
    (each pass is cheap) rather than a bigger window. Deterministic, so
    the SQL oracle replays pass-for-pass.

    Pair scoring reuses the bounded-levenshtein discipline: length-band
    prefilter, early-exit DP at ``max_dist``. Returns (id_a, id_b, dist)
    with id_a/id_b ordered by sort position (each pair once).
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if window < 1:
        raise ValueError("window must be >= 1")
    if block_cols is None:
        blk = [F.substring(F.col(sort_cols[0]).cast("string"), 1, 1).alias("_blk")]
        blk_names = ["_blk"]
    else:
        blk = [F.col(c) for c in block_cols]
        blk_names = list(block_cols)
    needed = [
        c
        for c in dict.fromkeys([*sort_cols, id_col, text_col])
        if c not in blk_names
    ]
    base = df.select(
        *blk,
        *[F.col(c) for c in needed],
        F.length(F.col(text_col)).alias("_len"),
    )
    w = Window.partitionBy(*blk_names).orderBy(
        *[F.col(c) for c in sort_cols], F.col(id_col)
    )
    leads = base.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_ta"),
        F.col("_len").alias("_la"),
        F.array(
            *[
                F.struct(
                    F.lead(F.col(id_col), i).over(w).alias("id_b"),
                    F.lead(F.col(text_col), i).over(w).alias("_tb"),
                    F.lead(F.col("_len"), i).over(w).alias("_lb"),
                )
                for i in range(1, window + 1)
            ]
        ).alias("_nbrs"),
    )
    pairs = leads.select(
        "id_a",
        "_ta",
        "_la",
        F.explode("_nbrs").alias("_n"),
    ).filter(
        F.col("_n.id_b").isNotNull()
        & (F.abs(F.col("_la") - F.col("_n._lb")) <= max_dist)
    )
    return pairs.select(
        "id_a",
        F.col("_n.id_b").alias("id_b"),
        F.levenshtein(F.col("_ta"), F.col("_n._tb"), max_dist).alias("dist"),
    ).filter(F.col("dist") >= 0)


def golden_records(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_cols: list,
    cc_driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Entity resolution end-game: fold matched pairs (from
    `blocked_fuzzy_pairs`, `sorted_neighborhood_pairs`, or their union)
    into entities via connected components, then elect ONE canonical
    ("golden") record per entity by ``order_cols`` priority (e.g. most
    complete, most recent — pass `F.desc(...)` columns; ties break on id).

    Returns every input row plus (entity_id = min linked id, entity_size,
    is_canonical). Unmatched rows are their own singleton entities.

    Scale shape: components run on the PAIRS relation (tiny — it IS the
    duplicates, same adaptive union-find as dedup); the election is one
    membership join + a window partitioned by entity — and since entity
    sizes are match-cluster sizes (near-cliques of a handful of rows),
    the per-entity sort is bounded, never a skew risk.

    ``cc_driver_threshold`` is raised well above dedup's default: edit-
    distance match graphs CHAIN (a~b~c through successive one-char
    steps), and min-label propagation needs O(diameter) rounds on chains
    — 16-byte pair rows make exact driver union-find the right call up to
    ~10⁶ edges (~16 MB), where the distributed path would grind through
    its iteration cap.
    """
    from rust_cdc_validator_spark.operators.dedup import connected_components

    comps = connected_components(
        pairs, id_a="id_a", id_b="id_b", driver_threshold=cc_driver_threshold
    )
    base = df.join(
        comps.select(
            F.col("node").alias("__n"), F.col("component").alias("__c")
        ),
        df[id_col] == F.col("__n"),
        "left",
    ).drop("__n")
    base = base.withColumn(
        "entity_id", F.coalesce(F.col("__c"), F.col(id_col))
    ).drop("__c")
    w = Window.partitionBy("entity_id")
    wo = Window.partitionBy("entity_id").orderBy(*order_cols, F.col(id_col))
    return (
        base.withColumn("entity_size", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.row_number().over(wo) == 1)
    )
