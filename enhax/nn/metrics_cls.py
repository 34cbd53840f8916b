"""Classification metrics in pure JAX.

Rebuild of reference ``src/mon/nn/metric/classification.py:42-90``, which
registers 23 torchmetrics.classification wrappers. Here each metric is a
pure function over ``(preds, target)`` — preds either integer labels
``(N,)`` or scores/logits ``(N, C)`` (argmaxed to labels where labels are
needed) — with torchmetrics' documented semantics and sklearn-executed
parity tests (``tests/test_metrics_wrappers.py``; torchmetrics itself is
not installed in this image, sklearn computes the same estimators).

Averaging follows torchmetrics: ``micro`` pools TP/FP/FN over classes,
``macro`` means the per-class scores, ``weighted`` weights per-class scores
by support, ``none`` returns the per-class vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from enhax.constants import METRICS

__all__ = [
    "accuracy", "auroc", "average_precision", "calibration_error",
    "cohen_kappa", "confusion_matrix", "dice", "exact_match", "f1_score",
    "fbeta_score", "hamming_distance", "hinge_loss", "jaccard_index",
    "matthews_corr_coef", "precision", "precision_recall_curve", "recall",
    "roc", "specificity", "stat_scores",
]


def _as_labels(preds):
    preds = jnp.asarray(preds)
    return jnp.argmax(preds, axis=-1) if preds.ndim == 2 else preds


def _num_classes(preds, target, num_classes):
    if num_classes is not None:
        return int(num_classes)
    preds = jnp.asarray(preds)
    if preds.ndim == 2:
        return int(preds.shape[-1])
    raise ValueError("num_classes is required when preds are labels")


@METRICS.register(name="confusion_matrix")
def confusion_matrix(preds, target, num_classes: int | None = None,
                     normalize: str | None = None):
    """(C, C) count matrix, rows = true class (torchmetrics convention)."""
    c = _num_classes(preds, target, num_classes)
    p = _as_labels(preds).astype(jnp.int32)
    t = jnp.asarray(target).astype(jnp.int32)
    idx = t * c + p
    cm = jnp.bincount(idx, length=c * c).reshape(c, c).astype(jnp.float32)
    if normalize == "true":
        cm = cm / jnp.clip(cm.sum(axis=1, keepdims=True), 1e-12)
    elif normalize == "pred":
        cm = cm / jnp.clip(cm.sum(axis=0, keepdims=True), 1e-12)
    elif normalize == "all":
        cm = cm / jnp.clip(cm.sum(), 1e-12)
    return cm


@METRICS.register(name="stat_scores")
def stat_scores(preds, target, num_classes: int | None = None):
    """Per-class (tp, fp, tn, fn, support), shape (C, 5)."""
    cm = confusion_matrix(preds, target, num_classes)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    tn = cm.sum() - tp - fp - fn
    support = cm.sum(axis=1)
    return jnp.stack([tp, fp, tn, fn, support], axis=1)


def _average(per_class, support, average: str):
    if average == "none" or average is None:
        return per_class
    if average == "macro":
        return jnp.mean(per_class)
    if average == "weighted":
        return jnp.sum(per_class * support) / jnp.clip(support.sum(), 1e-12)
    raise ValueError(f"unknown average {average!r}")


@METRICS.register(name="accuracy", aliases=["top_k_accuracy"])
def accuracy(preds, target, top_k: int = 1, num_classes: int | None = None,
             average: str = "micro"):
    """Top-k accuracy. ``average='micro'`` (the classify-eval convention);
    ``macro``/``weighted``/``none`` follow per-class recall pooling."""
    preds = jnp.asarray(preds)
    t = jnp.asarray(target).astype(jnp.int32)
    if top_k > 1:
        if preds.ndim != 2:
            raise ValueError("top_k > 1 needs (N, C) scores")
        topk = jax.lax.top_k(preds, top_k)[1]
        hit = jnp.any(topk == t[:, None], axis=1)
        return jnp.mean(hit.astype(jnp.float32))
    if average == "micro":
        return jnp.mean((_as_labels(preds) == t).astype(jnp.float32))
    s = stat_scores(preds, target, num_classes)
    per_class = s[:, 0] / jnp.clip(s[:, 4], 1e-12)  # recall per class
    return _average(per_class, s[:, 4], average)


def _prf(preds, target, num_classes, average, beta=1.0, which="f"):
    s = stat_scores(preds, target, num_classes)
    tp, fp, _tn, fn, support = (s[:, i] for i in range(5))
    if average == "micro":
        tp, fp, fn = tp.sum(), fp.sum(), fn.sum()
        support = None
    prec = tp / jnp.clip(tp + fp, 1e-12)
    rec = tp / jnp.clip(tp + fn, 1e-12)
    if which == "p":
        out = prec
    elif which == "r":
        out = rec
    else:
        b2 = beta * beta
        out = (1 + b2) * prec * rec / jnp.clip(b2 * prec + rec, 1e-12)
    if average == "micro":
        return out
    return _average(out, support, average)


@METRICS.register(name="precision")
def precision(preds, target, num_classes: int | None = None,
              average: str = "macro"):
    return _prf(preds, target, num_classes, average, which="p")


@METRICS.register(name="recall")
def recall(preds, target, num_classes: int | None = None,
           average: str = "macro"):
    return _prf(preds, target, num_classes, average, which="r")


@METRICS.register(name="f1_score")
def f1_score(preds, target, num_classes: int | None = None,
             average: str = "macro"):
    return _prf(preds, target, num_classes, average, beta=1.0)


@METRICS.register(name="f_beta_score", aliases=["fbeta_score"])
def fbeta_score(preds, target, beta: float = 1.0,
                num_classes: int | None = None, average: str = "macro"):
    return _prf(preds, target, num_classes, average, beta=beta)


@METRICS.register(name="specificity")
def specificity(preds, target, num_classes: int | None = None,
                average: str = "macro"):
    s = stat_scores(preds, target, num_classes)
    tp, fp, tn, fn, support = (s[:, i] for i in range(5))
    if average == "micro":
        return tn.sum() / jnp.clip(tn.sum() + fp.sum(), 1e-12)
    spec = tn / jnp.clip(tn + fp, 1e-12)
    return _average(spec, support, average)


@METRICS.register(name="jaccard_index")
def jaccard_index(preds, target, num_classes: int | None = None,
                  average: str = "macro"):
    s = stat_scores(preds, target, num_classes)
    tp, fp, _tn, fn, support = (s[:, i] for i in range(5))
    if average == "micro":
        return tp.sum() / jnp.clip((tp + fp + fn).sum(), 1e-12)
    jac = tp / jnp.clip(tp + fp + fn, 1e-12)
    return _average(jac, support, average)


@METRICS.register(name="dice")
def dice(preds, target, num_classes: int | None = None,
         average: str = "micro"):
    """Dice coefficient = F1 (2TP / (2TP + FP + FN))."""
    return _prf(preds, target, num_classes, average, beta=1.0)


@METRICS.register(name="hamming_distance")
def hamming_distance(preds, target):
    """Fraction of wrong labels (1 - micro accuracy for multiclass)."""
    p = _as_labels(preds)
    t = jnp.asarray(target)
    return jnp.mean((p != t).astype(jnp.float32))


@METRICS.register(name="exact_match")
def exact_match(preds, target):
    """Multilabel/multidim exact-match ratio: every position correct.

    preds/target: (N, ...) label arrays; rows must match entirely.
    """
    p = jnp.asarray(preds).reshape(jnp.asarray(preds).shape[0], -1)
    t = jnp.asarray(target).reshape(p.shape)
    return jnp.mean(jnp.all(p == t, axis=1).astype(jnp.float32))


@METRICS.register(name="cohen_kappa")
def cohen_kappa(preds, target, num_classes: int | None = None):
    cm = confusion_matrix(preds, target, num_classes)
    n = cm.sum()
    po = jnp.diag(cm).sum() / n
    pe = jnp.sum(cm.sum(axis=0) * cm.sum(axis=1)) / (n * n)
    return (po - pe) / jnp.clip(1.0 - pe, 1e-12)


@METRICS.register(name="matthews_corr_coef")
def matthews_corr_coef(preds, target, num_classes: int | None = None):
    """Generalized (multiclass) MCC from the confusion matrix."""
    cm = confusion_matrix(preds, target, num_classes)
    t_k = cm.sum(axis=1)  # true occurrences
    p_k = cm.sum(axis=0)  # predicted occurrences
    c = jnp.diag(cm).sum()
    n = cm.sum()
    cov_ytyp = c * n - jnp.dot(t_k, p_k)
    cov_ypyp = n * n - jnp.dot(p_k, p_k)
    cov_ytyt = n * n - jnp.dot(t_k, t_k)
    denom = jnp.sqrt(cov_ypyp * cov_ytyt)
    return jnp.where(denom > 0, cov_ytyp / jnp.clip(denom, 1e-12), 0.0)


# -- threshold-free (score-based) metrics -----------------------------------

def _binary_roc_points(scores, target):
    """(fpr, tpr) arrays at each distinct threshold, descending scores."""
    scores = jnp.asarray(scores).astype(jnp.float32)
    t = jnp.asarray(target).astype(jnp.float32)
    order = jnp.argsort(-scores)
    t_sorted = t[order]
    tps = jnp.cumsum(t_sorted)
    fps = jnp.cumsum(1.0 - t_sorted)
    p = jnp.clip(t.sum(), 1e-12)
    n = jnp.clip((1.0 - t).sum(), 1e-12)
    tpr = jnp.concatenate([jnp.zeros(1), tps / p])
    fpr = jnp.concatenate([jnp.zeros(1), fps / n])
    thr = jnp.concatenate([jnp.array([jnp.inf]), scores[order]])
    return fpr, tpr, thr


@METRICS.register(name="roc")
def roc(preds, target):
    """Binary ROC curve: (fpr, tpr, thresholds)."""
    return _binary_roc_points(preds, target)


def _binary_auroc(scores, target):
    """Rank-based AUROC (Mann-Whitney U with tie correction)."""
    scores = jnp.asarray(scores).astype(jnp.float64)
    t = jnp.asarray(target).astype(jnp.float64)
    # average ranks (ties share the mean rank), 1-indexed
    sorted_s = jnp.sort(scores)
    left = jnp.searchsorted(sorted_s, scores, side="left")
    right = jnp.searchsorted(sorted_s, scores, side="right")
    ranks = (left + right + 1) / 2.0
    n_pos = t.sum()
    n_neg = t.shape[0] - n_pos
    u = ranks.dot(t) - n_pos * (n_pos + 1) / 2.0
    return (u / jnp.clip(n_pos * n_neg, 1e-12)).astype(jnp.float32)


@METRICS.register(name="auroc")
def auroc(preds, target, num_classes: int | None = None,
          average: str = "macro"):
    """Binary AUROC for (N,) scores; one-vs-rest macro for (N, C) scores."""
    preds = jnp.asarray(preds)
    if preds.ndim == 1:
        return _binary_auroc(preds, target)
    c = _num_classes(preds, target, num_classes)
    t = jnp.asarray(target)
    aucs = jnp.stack([_binary_auroc(preds[:, k], (t == k)) for k in range(c)])
    if average == "none" or average is None:
        return aucs
    return jnp.mean(aucs)


def _binary_average_precision(scores, target):
    scores = jnp.asarray(scores).astype(jnp.float32)
    t = jnp.asarray(target).astype(jnp.float32)
    order = jnp.argsort(-scores)
    t_sorted = t[order]
    tps = jnp.cumsum(t_sorted)
    fps = jnp.cumsum(1.0 - t_sorted)
    prec = tps / jnp.clip(tps + fps, 1e-12)
    rec = tps / jnp.clip(t.sum(), 1e-12)
    rec_prev = jnp.concatenate([jnp.zeros(1), rec[:-1]])
    # step-function integration: sum precision * recall increments
    return jnp.sum(prec * (rec - rec_prev))


@METRICS.register(name="average_precision")
def average_precision(preds, target, num_classes: int | None = None,
                      average: str = "macro"):
    preds = jnp.asarray(preds)
    if preds.ndim == 1:
        return _binary_average_precision(preds, target)
    c = _num_classes(preds, target, num_classes)
    t = jnp.asarray(target)
    aps = jnp.stack([_binary_average_precision(preds[:, k], (t == k))
                     for k in range(c)])
    if average == "none" or average is None:
        return aps
    return jnp.mean(aps)


@METRICS.register(name="precision_recall_curve")
def precision_recall_curve(preds, target):
    """Binary PR curve: (precision, recall, thresholds), ascending recall cut."""
    scores = jnp.asarray(preds).astype(jnp.float32)
    t = jnp.asarray(target).astype(jnp.float32)
    order = jnp.argsort(-scores)
    t_sorted = t[order]
    tps = jnp.cumsum(t_sorted)
    fps = jnp.cumsum(1.0 - t_sorted)
    prec = tps / jnp.clip(tps + fps, 1e-12)
    rec = tps / jnp.clip(t.sum(), 1e-12)
    return prec, rec, scores[order]


@METRICS.register(name="calibration_error")
def calibration_error(preds, target, n_bins: int = 15, norm: str = "l1"):
    """Expected (l1) / RMS (l2) / maximum (max) calibration error over
    equal-width confidence bins (torchmetrics CalibrationError semantics;
    golden-valued against its published doc example in
    tests/test_metrics_golden.py). preds: (N, C) probabilities or (N,)
    confidences of the positive class."""
    preds = jnp.asarray(preds).astype(jnp.float32)
    t = jnp.asarray(target)
    if preds.ndim == 2:
        conf = jnp.max(preds, axis=1)
        correct = (jnp.argmax(preds, axis=1) == t).astype(jnp.float32)
    else:
        # binary: confidence of the predicted class (max(p, 1-p))
        conf = jnp.where(preds >= 0.5, preds, 1.0 - preds)
        correct = ((preds >= 0.5).astype(jnp.int32) == t).astype(jnp.float32)
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    bin_idx = jnp.clip(jnp.digitize(conf, edges[1:-1]), 0, n_bins - 1)
    counts = jnp.zeros(n_bins).at[bin_idx].add(1.0)
    conf_sum = jnp.zeros(n_bins).at[bin_idx].add(conf)
    acc_sum = jnp.zeros(n_bins).at[bin_idx].add(correct)
    nonzero = counts > 0
    gap = jnp.abs(acc_sum - conf_sum) / jnp.clip(counts, 1.0)
    if norm == "max":
        return jnp.max(jnp.where(nonzero, gap, 0.0))
    w = counts / jnp.clip(counts.sum(), 1e-12)
    if norm == "l2":
        return jnp.sqrt(jnp.sum(w * gap * gap))
    if norm != "l1":
        raise ValueError(f"unknown calibration norm {norm!r}")
    return jnp.sum(w * gap)


@METRICS.register(name="precision_at_fixed_recall")
def precision_at_fixed_recall(preds, target, min_recall: float = 0.5):
    """(best precision with recall >= min_recall, the threshold achieving
    it) — torchmetrics PrecisionAtFixedRecall semantics, binary."""
    prec, rec, thr = precision_recall_curve(preds, target)
    ok = rec >= min_recall
    masked = jnp.where(ok, prec, -1.0)
    i = jnp.argmax(masked)
    return masked[i], thr[i]


@METRICS.register(name="recall_at_fixed_precision")
def recall_at_fixed_precision(preds, target, min_precision: float = 0.5):
    """(best recall with precision >= min_precision, its threshold)."""
    prec, rec, thr = precision_recall_curve(preds, target)
    ok = prec >= min_precision
    masked = jnp.where(ok, rec, -1.0)
    i = jnp.argmax(masked)
    return masked[i], thr[i]


@METRICS.register(name="specificity_at_sensitivity")
def specificity_at_sensitivity(preds, target, min_sensitivity: float = 0.5):
    """(best specificity with sensitivity/TPR >= min_sensitivity, its
    threshold) from the ROC curve."""
    fpr, tpr, thr = _binary_roc_points(preds, target)
    ok = tpr >= min_sensitivity
    masked = jnp.where(ok, 1.0 - fpr, -1.0)
    i = jnp.argmax(masked)
    return masked[i], thr[i]


@METRICS.register(name="hinge_loss")
def hinge_loss(preds, target, squared: bool = False):
    """Multiclass hinge loss (Crammer-Singer): mean of
    max(0, 1 + max_{j != y} s_j - s_y); binary for (N,) scores with
    {0, 1} targets."""
    preds = jnp.asarray(preds).astype(jnp.float32)
    t = jnp.asarray(target)
    if preds.ndim == 1:
        margin = 1.0 - (2.0 * t.astype(jnp.float32) - 1.0) * preds
    else:
        n = preds.shape[0]
        true_s = preds[jnp.arange(n), t]
        masked = preds.at[jnp.arange(n), t].set(-jnp.inf)
        margin = 1.0 + jnp.max(masked, axis=1) - true_s
    loss = jnp.maximum(margin, 0.0)
    if squared:
        loss = loss ** 2
    return jnp.mean(loss)
