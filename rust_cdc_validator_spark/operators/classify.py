"""Distributed multinomial Naive Bayes (Manning, Raghavan & Schütze, IIR
ch. 13) for corpus labeling: fit token-given-label log-likelihoods with
add-alpha smoothing in two aggregations, score any document set with one
explode + broadcast join + keyed sum. The classic cheap quality/language/
domain classifier an LLM-data pipeline trains on a labeled slice and
applies to the full corpus (the fastText-style filtering step of CCNet /
Gopher, reduced to its pure-SQL core).

Engine-portable scoring (the repo's exact-decimal discipline): every
per-token log-likelihood is rounded to 12 decimals AT FIT TIME and stored
as DECIMAL(20,12), so a document's score is an EXACT decimal sum —
order-free, partition-free, and bit-identical between Spark and a SQL
oracle. Argmax over exact decimals with a label tie-break is therefore
deterministic everywhere; no double-accumulation noise can flip a
prediction. (The 1e-12 quantization perturbs scores by less than 1e-9
per kilotoken — the measured top-2 margin on the test corpus is ~1e-3.)

Spark shape: fit is two groupBys over the exploded token relation plus a
1-row vocabulary aggregate (broadcast-cross-joined into the smoothing
expression — never collected). Scoring explodes test docs ONCE,
cross-joins the per-label stats (|labels| rows, broadcast), left-joins
the likelihood table on (token, label), and sums per (doc, label); the
argmax is one partitioned window. At 100 TB: the likelihood model is
O(vocab × labels) rows — broadcast when small (the common case for
word-level models), shuffle-joined on token otherwise; the score pass
touches each token exactly once and combines map-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "NaiveBayesModel",
    "naive_bayes_fit",
    "naive_bayes_score",
    "roc_auc",
]

#: decimal places for the fit-time log quantization — 12 keeps ~1e-9
#: cumulative error per kilotoken while making sums exact in any engine
_LOG_SCALE = 12


@dataclass(frozen=True)
class NaiveBayesModel:
    """The fitted model as two relations (never driver-side arrays):

    * ``likelihoods``: (label, token, log_lik DECIMAL(20,12)) — add-alpha
      smoothed ln P(token|label) for every token SEEN with that label;
    * ``label_stats``: (label, log_prior, log_default, n_docs) —
      ln P(label), the unseen-token fallback ln(alpha / (tokens_l +
      alpha·V)), and the training doc count per label.
    """

    likelihoods: DataFrame
    label_stats: DataFrame


def naive_bayes_fit(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    alpha: float = 1.0,
    delimiter: str = " ",
) -> NaiveBayesModel:
    """Fit multinomial NB with add-``alpha`` smoothing over whitespace
    tokens. Two shuffles: (label, token) counts, then per-label totals;
    the vocabulary size enters the smoothing denominator as a 1-row
    in-plan aggregate (crossJoin broadcast), so nothing collects."""
    if alpha <= 0.0:
        raise ValueError("alpha must be positive")
    tok = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.col(text_col), delimiter)).alias("token"),
    ).filter(F.col("token") != "")
    tl = (
        tok.groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
        # vocab×labels-sized; THREE consumers (likelihoods, per-label
        # totals, vocabulary size) would each re-run the corpus token
        # aggregation without the cut
        .localCheckpoint(eager=True)
    )
    label_tok = tl.groupBy("label").agg(F.sum("_c").alias("_tot"))
    vocab = tl.agg(
        F.count_distinct("token").cast("double").alias("_v")
    )
    dec = f"decimal(20,{_LOG_SCALE})"
    likelihoods = (
        tl.join(label_tok, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "token",
            F.round(
                F.log(
                    (F.col("_c") + F.lit(alpha))
                    / (F.col("_tot") + F.lit(alpha) * F.col("_v"))
                ),
                _LOG_SCALE,
            )
            .cast(dec)
            .alias("log_lik"),
        )
    )
    n_total = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    label_stats = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(n_total))
        .join(label_tok, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.round(F.log(F.col("n_docs") / F.col("_n")), _LOG_SCALE)
            .cast(dec)
            .alias("log_prior"),
            F.round(
                F.log(
                    F.lit(alpha)
                    / (F.col("_tot") + F.lit(alpha) * F.col("_v"))
                ),
                _LOG_SCALE,
            )
            .cast(dec)
            .alias("log_default"),
            "n_docs",
        )
    )
    return NaiveBayesModel(likelihoods=likelihoods, label_stats=label_stats)


def naive_bayes_score(
    docs: DataFrame,
    model: NaiveBayesModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = " ",
    keep_scores: bool = False,
) -> DataFrame:
    """Predict the max-posterior label per document. Returns
    (``id_col``, predicted, score) — ``score`` the exact-decimal log
    posterior (unnormalized) of the winning label; with ``keep_scores``
    every (doc, label, score) row survives for calibration work.

    Ties break on the SMALLER label — with exact-decimal scores the
    (score DESC, label ASC) order is a total order both engines agree
    on. Documents whose token set is empty score prior-only (they keep
    a row: the cross join is against label_stats, not the token
    relation)."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), delimiter)
        ).alias("token"),
    ).filter(F.col("token") != "")
    stats = F.broadcast(model.label_stats)
    lik = F.broadcast(
        model.likelihoods.select(
            F.col("label").alias("_ll_label"),
            F.col("token").alias("_ll_token"),
            "log_lik",
        )
    )
    per_label = (
        tok.crossJoin(stats)
        .join(
            lik,
            (F.col("token") == F.col("_ll_token"))
            & (F.col("label") == F.col("_ll_label")),
            "left",
        )
        .groupBy("_id", "label", "log_prior")
        .agg(
            F.sum(F.coalesce(F.col("log_lik"), F.col("log_default"))).alias(
                "_tok_sum"
            )
        )
        .select(
            "_id",
            "label",
            (F.col("log_prior") + F.col("_tok_sum")).alias("score"),
        )
    )
    # prior-only rows keep empty-token docs scoreable
    empty = (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .filter(
            F.coalesce(F.trim(F.col("_t")), F.lit("")) == ""
        )
        .crossJoin(stats)
        .select(
            "_id", "label", F.col("log_prior").cast(per_label.schema["score"].dataType).alias("score")
        )
    )
    scored = per_label.unionByName(empty)
    if keep_scores:
        return scored.select(
            F.col("_id").alias(id_col), "label", "score"
        )
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), "label")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("predicted"),
            "score",
        )
    )


def roc_auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """ROC-AUC of a binary classifier from its scores, as the Mann-
    Whitney U statistic with midrank tie handling (Hanley & McNeil
    1982): AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Returns a
    1-row (n_pos, n_neg, auc) frame. ``label_col`` must be boolean or
    0/1.

    Spark shape: scores collapse to DISTINCT-score buckets first
    (groupBy → (score, n_pos, n_neg)), then one prefix scan over the
    bucket relation accumulates negatives-below — the quadratic
    pos×neg comparison reduced to O(distinct scores). The numerator
    stays INTEGER throughout (doubled to absorb the ½ tie term:
    2U = Σ_b n_pos_b · (2·cum_neg_below + n_neg_b)) and the only double
    arithmetic is the final division — bit-portable across engines,
    whatever the score type.

    The prefix scan orders by score over the bucket relation in a
    single-partition window — the documented bounded-relation pattern
    (operators/layout.py prefix scans): buckets number at most
    |distinct scores|, already aggregated, typically thousands, never
    the row count of ``scored``. At 100 TB the bucket groupBy is the
    only fact-sized shuffle.
    """
    buckets = (
        scored.select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_s")
        .agg(
            F.sum("_y").alias("_np"),
            F.sum(1 - F.col("_y")).alias("_nn"),
        )
    )
    w = (
        Window.orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_bucket = buckets.select(
        "_np",
        "_nn",
        (F.sum("_nn").over(w) - F.col("_nn")).alias("_cum_below"),
    )
    return per_bucket.agg(
        F.sum("_np").alias("n_pos"),
        F.sum("_nn").alias("n_neg"),
        (
            F.sum(
                F.col("_np") * (2 * F.col("_cum_below") + F.col("_nn"))
            ).cast("double")
            / (2.0 * F.sum("_np") * F.sum("_nn"))
        ).alias("auc"),
    )
