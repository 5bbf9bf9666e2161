"""Naive Bayes (operators/classify.py): equivalence against a driver-side
reference with the same add-alpha smoothing and 12-decimal quantization,
unseen-token fallback, empty-doc prior-only scoring, and validation."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from rust_cdc_validator_spark.operators.classify import (
    naive_bayes_fit,
    naive_bayes_score,
)

TRAIN = [
    (1, "spark shuffle join shuffle", "eng"),
    (2, "join plan spark", "eng"),
    (3, "datos tabla datos filtro", "spa"),
    (4, "tabla filtro datos", "spa"),
]
TEST = [
    (10, "spark join"),
    (11, "datos datos filtro"),
    (12, "spark datos"),       # mixed: decided by frequency weights
    (13, ""),                  # empty: prior-only
]


def _q12(x: float) -> Decimal:
    return Decimal(f"{round(x, 12):.12f}")


def _reference():
    """Driver-side NB with identical rounding discipline."""
    counts, totals, docs_per = {}, {}, {}
    vocab = set()
    for _, text, lab in TRAIN:
        docs_per[lab] = docs_per.get(lab, 0) + 1
        for t in text.split():
            counts[(lab, t)] = counts.get((lab, t), 0) + 1
            totals[lab] = totals.get(lab, 0) + 1
            vocab.add(t)
    v = float(len(vocab))
    lik = {
        k: _q12(math.log((c + 1.0) / (totals[k[0]] + v)))
        for k, c in counts.items()
    }
    n = float(len(TRAIN))
    prior = {l: _q12(math.log(d / n)) for l, d in docs_per.items()}
    default = {l: _q12(math.log(1.0 / (totals[l] + v))) for l in totals}

    def score(text, lab):
        s = prior[lab]
        for t in text.split():
            s += lik.get((lab, t), default[lab])
        return s

    preds = {}
    for did, text in TEST:
        best = min(
            prior,
            key=lambda l: (-score(text, l), l),
        )
        preds[did] = (best, score(text, best))
    return lik, prior, default, preds


def test_fit_values_match_reference(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    model = naive_bayes_fit(docs)
    lik, prior, default, _ = _reference()
    got_lik = {
        (r["label"], r["token"]): r["log_lik"]
        for r in model.likelihoods.collect()
    }
    assert got_lik == lik
    stats = {r["label"]: r for r in model.label_stats.collect()}
    for lab in prior:
        assert stats[lab]["log_prior"] == prior[lab]
        assert stats[lab]["log_default"] == default[lab]
    assert stats["eng"]["n_docs"] == 2


def test_score_predictions_and_empty_doc(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    model = naive_bayes_fit(docs)
    out = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in naive_bayes_score(test, model).collect()
    }
    _, _, _, preds = _reference()
    assert set(out) == set(preds)
    for did, (lab, sc) in preds.items():
        assert out[did][0] == lab
        assert out[did][1] == sc
    # the empty doc picked the larger-prior label; equal priors -> min label
    assert out[13][0] == "eng"


def test_keep_scores_has_all_label_rows(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    model = naive_bayes_fit(docs)
    rows = naive_bayes_score(test, model, keep_scores=True).collect()
    assert len(rows) == len(TEST) * 2  # every (doc, label) pair scored


def test_alpha_validation(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    with pytest.raises(ValueError, match="alpha"):
        naive_bayes_fit(docs, alpha=0.0)


# ------------------------------------------------------------- ROC-AUC


def _auc_reference(pairs):
    """O(P*N) driver-side AUC with midrank ties."""
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    u = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    return len(pos), len(neg), u / (len(pos) * len(neg))


def test_auc_matches_bruteforce_with_ties(spark):
    import random

    from rust_cdc_validator_spark.operators.classify import roc_auc

    random.seed(3)
    pairs = [
        (random.random() < 0.4, float(random.randrange(20)) / 4.0)
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(bool(y), s) for y, s in pairs], "label boolean, score double"
    )
    row = roc_auc(df).collect()[0]
    n_pos, n_neg, want = _auc_reference(pairs)
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["auc"] == pytest.approx(want, abs=1e-12)


def test_auc_perfect_and_random_and_inverted(spark):
    from rust_cdc_validator_spark.operators.classify import roc_auc

    perfect = spark.createDataFrame(
        [(True, 2.0), (True, 3.0), (False, 0.0), (False, 1.0)],
        "label boolean, score double",
    )
    assert roc_auc(perfect).collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(True, 0.0), (False, 1.0)], "label boolean, score double"
    )
    assert roc_auc(inverted).collect()[0]["auc"] == 0.0
    all_tied = spark.createDataFrame(
        [(True, 1.0), (False, 1.0), (True, 1.0)],
        "label boolean, score double",
    )
    assert roc_auc(all_tied).collect()[0]["auc"] == 0.5
