"""Classifier parity + determinism tests (reference classification.py).

Pins: sigmoid clipping, BCE, balanced class weights inside GD, the seeded
70/30 split over canonically sorted pairs, threshold sweep tie-breaking, and
the scaler-folding identity used by the distributed scorer.
"""

from __future__ import annotations

import numpy as np
import pytest

from entity_resolution_pipeline_spark.config import ClassifierConfig
from entity_resolution_pipeline_spark.operators.classify import (
    LRModel,
    binary_cross_entropy,
    evaluate,
    roc_auc,
    sigmoid,
    train_lr,
    train_test_split,
    tune_threshold,
)


def test_sigmoid_clip():
    assert sigmoid(np.array([0.0]))[0] == 0.5
    assert sigmoid(np.array([1000.0]))[0] == pytest.approx(1.0)
    assert sigmoid(np.array([-1000.0]))[0] == pytest.approx(0.0, abs=1e-30)


def test_bce_clip_no_inf():
    val = binary_cross_entropy(np.array([1.0]), np.array([0.0]))
    assert np.isfinite(val) and val > 30  # -log(1e-15) ≈ 34.5


def test_split_deterministic_and_ratio():
    X = np.arange(100, dtype=np.float64).reshape(50, 2)
    y = (np.arange(50) % 2).astype(np.float64)
    ids = [f"p{i:02d}" for i in range(50)]
    cfg = ClassifierConfig()
    a = train_test_split(X, y, ids, cfg)
    b = train_test_split(X, y, ids, cfg)
    assert np.array_equal(a[0], b[0]) and a[2] == b[2]
    assert len(a[0]) == 35 and len(a[3]) == 15


def test_train_lr_separable():
    rng = np.random.RandomState(0)
    n = 400
    X = rng.randn(n, 2)
    y = (X[:, 0] + X[:, 1] > 0).astype(np.float64)
    w, b = train_lr(X, y, ClassifierConfig(max_iterations=300))
    probs = sigmoid(X @ w + b)
    m = evaluate(y, probs, 0.5)
    assert m["f1"] > 0.95
    assert m["roc_auc"] > 0.99


def test_roc_auc_perfect_and_random():
    y = np.array([0, 0, 1, 1], dtype=np.float64)
    assert roc_auc(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert roc_auc(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert roc_auc(y, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5


def test_tune_threshold_prefers_higher_on_tie():
    # perfectly separated at any t in (0.4, 0.6] → sweep should pick the
    # highest grid point with max F1
    y = np.array([0.0, 0.0, 1.0, 1.0])
    p = np.array([0.2, 0.4, 0.6, 0.9])
    cfg = ClassifierConfig()
    t = tune_threshold(y, p, cfg)
    assert t == pytest.approx(0.6)


def test_scaler_folding_identity():
    # scorer folds (x-μ)/σ into w' = w/σ, b' = b - Σ wμ/σ; verify identity
    rng = np.random.RandomState(1)
    X = rng.randn(10, 3) * 5 + 2
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    w = rng.randn(3)
    b = 0.3
    z_scaled = ((X - mu) / sd) @ w + b
    w_eff = w / sd
    b_eff = b - np.dot(w, mu / sd)
    z_folded = X @ w_eff + b_eff
    assert np.allclose(z_scaled, z_folded)
