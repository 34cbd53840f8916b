"""Externally-sourced golden values for the metric wrappers (VERDICT r4 #6).

The r4 wrapper parity tests execute sklearn/scipy and independent numpy
estimators; this file adds assertions against EXACT published numbers from
torchmetrics' documentation examples (docstring doctests in
torchmetrics.classification / torchmetrics.image) — values copied verbatim,
not re-derived, so a convention drift (averaging mode, binning, GSM scales)
fails against the published contract. VIF's doc example inputs are
regenerated bit-exactly via torch.manual_seed(42) + torch.randn, as in the
docs.

SCC has no reproducible published golden usable here (its doc example value
could not be confirmed offline), so it is pinned with definition-level
invariants instead: perfect correlation == 1, anti-correlation == -1 —
plus the independent-numpy parity in test_metrics_wrappers.py.

AUROC tie handling additionally executes sklearn.roc_auc_score (trapezoid
over tied thresholds) on duplicate-score inputs.
"""

import numpy as np
import pytest

from enhax.nn import metrics_cls as C
from enhax.nn import metrics_img as I

# torchmetrics MulticlassAccuracy docstring example
_MC_PROBS = np.array([[0.16, 0.26, 0.58],
                      [0.22, 0.61, 0.17],
                      [0.71, 0.09, 0.20],
                      [0.05, 0.82, 0.13]], np.float32)
_MC_TARGET = np.array([2, 1, 0, 0])


def test_accuracy_doc_goldens():
    """MulticlassAccuracy docs: macro (default) = 0.8333, micro = 0.7500."""
    assert float(C.accuracy(_MC_PROBS, _MC_TARGET, num_classes=3,
                            average="macro")) == pytest.approx(0.8333, abs=1e-4)
    assert float(C.accuracy(_MC_PROBS, _MC_TARGET, num_classes=3,
                            average="micro")) == pytest.approx(0.7500, abs=1e-4)


def test_f1_doc_goldens():
    """MulticlassF1Score docs: macro (default) = 0.7778; micro accuracy-like
    pooling = 0.7500."""
    preds = np.array([2, 1, 0, 1])
    target = np.array([2, 1, 0, 0])
    assert float(C.f1_score(preds, target, num_classes=3,
                            average="macro")) == pytest.approx(0.7778, abs=1e-4)
    assert float(C.f1_score(preds, target, num_classes=3,
                            average="micro")) == pytest.approx(0.7500, abs=1e-4)


def test_calibration_error_doc_goldens():
    """MulticlassCalibrationError docs (num_classes=3, n_bins=3):
    l1 = 0.2000, l2 = 0.2082; max = 0.2333 follows from the same documented
    binning (bin1: |1/3 - 0.5667|, bin3: |1 - 0.9|)."""
    preds = np.array([[0.25, 0.20, 0.55],
                      [0.55, 0.05, 0.40],
                      [0.10, 0.30, 0.60],
                      [0.90, 0.05, 0.05]], np.float32)
    target = np.array([0, 1, 2, 0])
    assert float(C.calibration_error(preds, target, n_bins=3, norm="l1")) \
        == pytest.approx(0.2000, abs=1e-4)
    assert float(C.calibration_error(preds, target, n_bins=3, norm="l2")) \
        == pytest.approx(0.2082, abs=1e-4)
    assert float(C.calibration_error(preds, target, n_bins=3, norm="max")) \
        == pytest.approx(0.2333, abs=1e-4)


def test_auroc_doc_golden_and_sklearn_ties():
    """BinaryAUROC docs: preds [0, .5, .7, .8], target [0,1,1,0] -> 0.5000.
    Tie handling vs executed sklearn (trapezoidal over tied thresholds)."""
    sklearn = pytest.importorskip("sklearn.metrics")
    preds = np.array([0.0, 0.5, 0.7, 0.8], np.float32)
    target = np.array([0, 1, 1, 0])
    assert float(C.auroc(preds, target)) == pytest.approx(0.5000, abs=1e-4)

    rng = np.random.default_rng(0)
    for _ in range(5):
        # heavy ties: scores quantized to 4 levels
        scores = rng.integers(0, 4, 60).astype(np.float32) / 3.0
        t = (rng.uniform(size=60) < 0.3 + 0.4 * scores).astype(np.int64)
        if t.min() == t.max():
            continue
        ref = sklearn.roc_auc_score(t, scores)
        assert float(C.auroc(scores, t)) == pytest.approx(ref, abs=1e-6)


def test_vif_doc_golden():
    """VisualInformationFidelity docs: torch.manual_seed(42),
    preds/target = randn(32, 3, 41, 41) -> tensor(0.0032). Inputs
    regenerated bit-exactly with the documented seed."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(42)
    preds = torch.randn(32, 3, 41, 41)
    target = torch.randn(32, 3, 41, 41)
    got = float(I.vif(np.transpose(preds.numpy(), (0, 2, 3, 1)),
                      np.transpose(target.numpy(), (0, 2, 3, 1))))
    assert got == pytest.approx(0.0032, abs=5e-5)


def test_scc_definition_invariants(rng):
    """SCC invariants (no offline-verifiable published golden): the windowed
    Pearson correlation of identical high-pass responses is exactly 1,
    of negated responses exactly -1, and bounded in [-1, 1]."""
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    assert float(I.scc(x, x)) == pytest.approx(1.0, abs=1e-5)
    # the laplacian is linear (zero padding): L(-x) = -L(x) exactly
    assert float(I.scc(x, -x)) == pytest.approx(-1.0, abs=1e-5)
    assert float(I.scc(x, 3.0 * x)) == pytest.approx(1.0, abs=1e-5)
    y = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    v = float(I.scc(x, y))
    assert -1.0 <= v <= 1.0
