"""Executed parity for the metric wrapper sets (VERDICT r3 item 4).

The reference registers torchmetrics wrappers
(src/mon/nn/metric/{classification,regression,nominal,image}.py).
torchmetrics is not installed in this image, so parity executes the same
estimators from sklearn/scipy (identical definitions) and, for the image
set, independently-written numpy implementations of the published formulas
(sewar-style VIF-p, Wang-Bovik UIQI, Yim-Bovik PSNR-B...).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from enhax.nn import metrics_cls as C
from enhax.nn import metrics_img as I
from enhax.nn import metrics_nom as NM
from enhax.nn import metrics_reg as R


@pytest.fixture
def cls_data(rng):
    n, c = 200, 5
    logits = rng.normal(size=(n, c)).astype(np.float32)
    target = rng.integers(0, c, size=n)
    return logits, target


@pytest.fixture
def bin_data(rng):
    n = 300
    scores = rng.uniform(0, 1, n).astype(np.float32)
    target = (rng.uniform(0, 1, n) < scores * 0.7 + 0.15).astype(np.int64)
    return scores, target


# -- classification vs sklearn ------------------------------------------------

def test_accuracy_micro_and_topk(cls_data):
    from sklearn.metrics import accuracy_score, top_k_accuracy_score
    logits, t = cls_data
    np.testing.assert_allclose(
        float(C.accuracy(logits, t)),
        accuracy_score(t, logits.argmax(1)), atol=1e-6)
    np.testing.assert_allclose(
        float(C.accuracy(logits, t, top_k=3)),
        top_k_accuracy_score(t, logits, k=3, labels=np.arange(5)), atol=1e-6)


@pytest.mark.parametrize("average", ["micro", "macro", "weighted"])
def test_precision_recall_f1(cls_data, average):
    from sklearn.metrics import (f1_score, fbeta_score, precision_score,
                                 recall_score)
    logits, t = cls_data
    p = logits.argmax(1)
    lb = np.arange(5)
    np.testing.assert_allclose(
        float(C.precision(logits, t, average=average)),
        precision_score(t, p, average=average, labels=lb,
                        zero_division=0), atol=1e-5)
    np.testing.assert_allclose(
        float(C.recall(logits, t, average=average)),
        recall_score(t, p, average=average, labels=lb,
                     zero_division=0), atol=1e-5)
    np.testing.assert_allclose(
        float(C.f1_score(logits, t, average=average)),
        f1_score(t, p, average=average, labels=lb, zero_division=0),
        atol=1e-5)
    np.testing.assert_allclose(
        float(C.fbeta_score(logits, t, beta=2.0, average=average)),
        fbeta_score(t, p, beta=2.0, average=average, labels=lb,
                    zero_division=0), atol=1e-5)


def test_confusion_matrix_and_stats(cls_data):
    from sklearn.metrics import confusion_matrix
    logits, t = cls_data
    np.testing.assert_array_equal(
        np.asarray(C.confusion_matrix(logits, t)),
        confusion_matrix(t, logits.argmax(1), labels=np.arange(5)))
    s = np.asarray(C.stat_scores(logits, t))
    assert s[:, :4].sum() == 200 * 5  # tp+fp+tn+fn per class sums to N
    np.testing.assert_array_equal(s[:, 4], np.bincount(t, minlength=5))


def test_cohen_kappa_mcc_jaccard(cls_data):
    from sklearn.metrics import (cohen_kappa_score, jaccard_score,
                                 matthews_corrcoef)
    logits, t = cls_data
    p = logits.argmax(1)
    np.testing.assert_allclose(float(C.cohen_kappa(logits, t)),
                               cohen_kappa_score(t, p), atol=1e-5)
    np.testing.assert_allclose(float(C.matthews_corr_coef(logits, t)),
                               matthews_corrcoef(t, p), atol=1e-5)
    np.testing.assert_allclose(
        float(C.jaccard_index(logits, t, average="macro")),
        jaccard_score(t, p, average="macro", labels=np.arange(5),
                      zero_division=0), atol=1e-5)


def test_hamming_exact_match(cls_data):
    from sklearn.metrics import hamming_loss
    logits, t = cls_data
    p = logits.argmax(1)
    np.testing.assert_allclose(float(C.hamming_distance(logits, t)),
                               hamming_loss(t, p), atol=1e-6)
    multi = np.stack([p, t], axis=1)
    em = float(C.exact_match(multi, np.stack([t, t], axis=1)))
    np.testing.assert_allclose(em, np.mean(p == t), atol=1e-6)


def test_binary_auroc_ap_curves(bin_data):
    from sklearn.metrics import (average_precision_score,
                                 precision_recall_curve, roc_auc_score,
                                 roc_curve)
    s, t = bin_data
    np.testing.assert_allclose(float(C.auroc(s, t)),
                               roc_auc_score(t, s), atol=1e-5)
    np.testing.assert_allclose(float(C.average_precision(s, t)),
                               average_precision_score(t, s), atol=1e-5)
    fpr, tpr, _ = C.roc(s, t)
    sk_fpr, sk_tpr, _ = roc_curve(t, s, drop_intermediate=False)
    # same curve: compare trapezoid areas
    np.testing.assert_allclose(np.trapezoid(np.asarray(tpr), np.asarray(fpr)),
                               np.trapezoid(sk_tpr, sk_fpr), atol=1e-5)
    prec, rec, _ = C.precision_recall_curve(s, t)
    sk_p, sk_r, _ = precision_recall_curve(t, s)
    assert abs(float(prec[-1]) - sk_p[0]) < 1e-5  # full-recall precision


def test_multiclass_auroc_ovr(cls_data):
    from scipy.special import softmax
    from sklearn.metrics import roc_auc_score
    logits, t = cls_data
    probs = softmax(logits, axis=1)
    np.testing.assert_allclose(
        float(C.auroc(probs, t)),
        roc_auc_score(t, probs, multi_class="ovr", average="macro",
                      labels=np.arange(5)), atol=1e-5)


def test_hinge_loss(cls_data):
    from sklearn.metrics import hinge_loss
    logits, t = cls_data
    np.testing.assert_allclose(
        float(C.hinge_loss(logits, t)),
        hinge_loss(t, logits, labels=np.arange(5)), atol=1e-5)


def test_calibration_error_golden(rng):
    """ECE vs a hand-binned numpy implementation (binary convention:
    confidence = max(p, 1-p), accuracy = (p >= .5) == y)."""
    n = 400
    p = rng.uniform(0, 1, n).astype(np.float32)
    y = (rng.uniform(0, 1, n) < p).astype(np.int64)
    conf = np.where(p >= 0.5, p, 1 - p)
    correct = ((p >= 0.5).astype(np.int64) == y).astype(np.float32)
    bins = np.clip(np.digitize(conf, np.linspace(0, 1, 16)[1:-1]), 0, 14)
    ece = 0.0
    for b in range(15):
        m = bins == b
        if m.sum():
            ece += m.mean() * abs(correct[m].mean() - conf[m].mean())
    got = float(C.calibration_error(p, y))
    np.testing.assert_allclose(got, ece, atol=1e-5)
    # multiclass path: perfect one-hot predictions -> zero ECE
    onehot = np.eye(4, dtype=np.float32)[y % 4]
    assert float(C.calibration_error(onehot, y % 4)) < 1e-6


# -- regression vs sklearn/scipy ----------------------------------------------

def test_regression_sklearn_parity(rng):
    from sklearn.metrics import (d2_tweedie_score, explained_variance_score,
                                 mean_absolute_percentage_error,
                                 mean_squared_log_error, r2_score)
    from scipy.stats import kendalltau, pearsonr, spearmanr
    t = rng.uniform(0.1, 2.0, 150).astype(np.float64)
    p = t + rng.normal(0, 0.3, 150)
    p = np.abs(p) + 0.01
    np.testing.assert_allclose(float(R.explained_variance(p, t)),
                               explained_variance_score(t, p), atol=1e-5)
    np.testing.assert_allclose(float(R.r2_score(p, t)),
                               r2_score(t, p), atol=1e-5)
    np.testing.assert_allclose(float(R.pearson_corr_coef(p, t)),
                               pearsonr(p, t).statistic, atol=1e-5)
    np.testing.assert_allclose(float(R.spearman_corr_coef(p, t)),
                               spearmanr(p, t).statistic, atol=1e-5)
    np.testing.assert_allclose(float(R.kendall_rank_corr_coef(p, t)),
                               kendalltau(p, t).statistic, atol=1e-5)
    np.testing.assert_allclose(
        float(R.mean_absolute_percentage_error(p, t)),
        mean_absolute_percentage_error(t, p), rtol=1e-5)
    np.testing.assert_allclose(float(R.mean_squared_log_error(p, t)),
                               mean_squared_log_error(t, p), rtol=1e-5)
    # Tweedie deviance (sklearn exposes D2; compare raw deviance via its
    # internals) — poisson and gamma powers
    from sklearn.metrics import mean_poisson_deviance, mean_gamma_deviance
    np.testing.assert_allclose(float(R.tweedie_deviance_score(p, t, power=1)),
                               mean_poisson_deviance(t, p), rtol=1e-4)
    np.testing.assert_allclose(float(R.tweedie_deviance_score(p, t, power=2)),
                               mean_gamma_deviance(t, p), rtol=1e-4)


def test_regression_closed_forms(rng):
    t = rng.normal(size=100)
    p = t + rng.normal(0, 0.5, 100)
    np.testing.assert_allclose(float(R.log_cosh_error(p, t)),
                               np.mean(np.log(np.cosh(p - t))), atol=1e-5)
    np.testing.assert_allclose(float(R.minkowski_distance(p, t, p=3.0)),
                               (np.sum(np.abs(p - t) ** 3)) ** (1 / 3),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(R.relative_squared_error(p, t)),
        np.sum((t - p) ** 2) / np.sum((t - t.mean()) ** 2), rtol=1e-5)
    np.testing.assert_allclose(
        float(R.symmetric_mean_absolute_percentage_error(p, t)),
        2 * np.mean(np.abs(p - t) / (np.abs(p) + np.abs(t))), rtol=1e-4)
    np.testing.assert_allclose(
        float(R.weighted_mean_absolute_percentage_error(p, t)),
        np.sum(np.abs(p - t)) / np.sum(np.abs(t)), rtol=1e-5)
    # concordance: closed form
    ccc = 2 * np.cov(p, t, bias=True)[0, 1] / (
        np.var(p) + np.var(t) + (p.mean() - t.mean()) ** 2)
    np.testing.assert_allclose(float(R.concordance_corr_coef(p, t)), ccc,
                               rtol=1e-5)
    a = rng.normal(size=(8, 16))
    b = rng.normal(size=(8, 16))
    cos = np.mean([np.dot(x, y) / np.linalg.norm(x) / np.linalg.norm(y)
                   for x, y in zip(a, b)])
    np.testing.assert_allclose(float(R.cosine_similarity(a, b)), cos,
                               rtol=1e-5)
    # KL between rows of softmaxed distributions
    from scipy.special import softmax
    from scipy.stats import entropy
    pp = softmax(rng.normal(size=(6, 10)), axis=1)
    qq = softmax(rng.normal(size=(6, 10)), axis=1)
    np.testing.assert_allclose(float(R.kl_divergence(pp, qq)),
                               np.mean([entropy(r, s)
                                        for r, s in zip(pp, qq)]), rtol=1e-4)


# -- nominal vs scipy ----------------------------------------------------------

def test_nominal_scipy_parity(rng):
    from scipy.stats import chi2_contingency
    from scipy.stats.contingency import association
    x = rng.integers(0, 4, 500)
    y = (x + rng.integers(0, 3, 500)) % 4
    ct = np.zeros((4, 4), np.int64)
    for a, b in zip(x, y):
        ct[a, b] += 1
    np.testing.assert_allclose(
        float(NM.cramers_v(x, y, bias_correction=False, num_classes=4)),
        association(ct, method="cramer", correction=False), atol=1e-5)
    np.testing.assert_allclose(
        float(NM.tschuprows_t(x, y, bias_correction=False, num_classes=4)),
        association(ct, method="tschuprow", correction=False), atol=1e-5)
    np.testing.assert_allclose(
        float(NM.pearsons_contingency_coefficient(x, y, num_classes=4)),
        association(ct, method="pearson", correction=False), atol=1e-5)
    # theils_u golden: U(x|y) from entropies
    def _h(p):
        p = p[p > 0]
        return -(p * np.log(p)).sum()
    n = ct.sum()
    hx = _h(ct.sum(1) / n)
    hxy = _h((ct / n).reshape(-1))
    hy = _h(ct.sum(0) / n)
    np.testing.assert_allclose(float(NM.theils_u(x, y, num_classes=4)),
                               (hx - (hxy - hy)) / hx, atol=1e-5)
    chi2 = chi2_contingency(ct, correction=False).statistic
    assert abs(chi2 / n - float(NM.cramers_v(x, y, False, 4)) ** 2
               * min(3, 3)) < 1e-4


def test_fleiss_kappa_golden():
    # Fleiss 1971 worked example (14 raters, 10 subjects, 5 categories)
    table = np.array([
        [0, 0, 0, 0, 14], [0, 2, 6, 4, 2], [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0], [2, 2, 8, 1, 1], [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0], [2, 5, 3, 2, 2], [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7]])
    np.testing.assert_allclose(float(NM.fleiss_kappa(table)), 0.2099, atol=2e-4)


# -- image metrics vs independent numpy references -----------------------------

@pytest.fixture
def img_pair(rng):
    # bounded away from 0 so channel vectors never vanish (SAM's arccos)
    t = rng.uniform(0.05, 1, (2, 48, 48, 3)).astype(np.float32)
    p = np.clip(t + rng.normal(0, 0.08, t.shape), 0.01, 1).astype(np.float32)
    return p, t


def test_total_variation(img_pair):
    p, _ = img_pair
    ref = np.mean([np.abs(np.diff(im, axis=0)).sum()
                   + np.abs(np.diff(im, axis=1)).sum() for im in p])
    np.testing.assert_allclose(float(I.total_variation(p)), ref, rtol=1e-5)


def test_sam(img_pair):
    p, t = img_pair
    dot = (p * t).sum(-1)
    den = np.linalg.norm(p, axis=-1) * np.linalg.norm(t, axis=-1)
    ref = np.arccos(np.clip(dot / den, -1, 1)).mean()
    np.testing.assert_allclose(float(I.spectral_angle_mapper(p, t)), ref,
                               rtol=1e-4)


def test_ergas_rase(img_pair):
    p, t = img_pair
    vals = []
    for pi, ti in zip(p, t):
        rmse2 = ((pi - ti) ** 2).mean(axis=(0, 1))
        mu = ti.mean(axis=(0, 1))
        vals.append(100 * 4 * np.sqrt(np.mean(rmse2 / mu**2)))
    np.testing.assert_allclose(float(I.ergas(p, t)), np.mean(vals), rtol=1e-4)
    vals = []
    for pi, ti in zip(p, t):
        rmse2 = ((pi - ti) ** 2).mean(axis=(0, 1))
        vals.append(100 / ti.mean() * np.sqrt(rmse2.mean()))
    np.testing.assert_allclose(float(I.rase(p, t)), np.mean(vals), rtol=1e-4)


def test_rmse_sw(img_pair):
    p, t = img_pair
    se = (p - t) ** 2
    acc = []
    for n in range(2):
        for i in range(48 - 7):
            for j in range(48 - 7):
                acc.append(np.sqrt(se[n, i:i + 8, j:j + 8].mean(axis=(0, 1))))
    np.testing.assert_allclose(float(I.rmse_sw(p, t)), np.mean(acc), rtol=1e-4)


def test_uiqi_perfect_and_formula(img_pair):
    p, t = img_pair
    assert float(I.uiqi(t, t)) > 0.999
    v = float(I.uiqi(p, t))
    assert 0 < v < 1
    # UIQI == SSIM with C1=C2=0 (construction check)
    from enhax.nn.metrics import _ssim_components
    m, _ = _ssim_components(jnp.asarray(p), jnp.asarray(t), 1.0, 11, 1.5,
                            (0.0, 0.0))
    np.testing.assert_allclose(v, float(m.mean()), rtol=1e-5)


def test_scc_properties(img_pair):
    p, t = img_pair
    assert float(I.scc(t, t)) > 0.999
    assert float(I.scc(p, t)) < float(I.scc(t, t))
    # uncorrelated noise images -> near zero
    rng2 = np.random.default_rng(7)
    a = rng2.uniform(0, 1, (1, 48, 48, 1)).astype(np.float32)
    b = rng2.uniform(0, 1, (1, 48, 48, 1)).astype(np.float32)
    assert abs(float(I.scc(a, b))) < 0.1


def test_psnrb_vs_psnr(img_pair):
    from enhax.nn.metrics import psnr
    p, t = img_pair
    # no blocking artifacts: BEF ~ 0 for smooth noise, psnrb <= psnr
    v_b = float(I.psnrb(p, t))
    v = float(psnr(jnp.asarray(p), jnp.asarray(t)))
    assert v_b <= v + 1e-4
    # inject blockiness: quantize 8x8 blocks of the prediction
    blocky = p.copy()
    blocky = blocky[:, : 48 // 8 * 8, : 48 // 8 * 8]
    bm = blocky.reshape(2, 6, 8, 6, 8, 3).mean(axis=(2, 4), keepdims=True)
    blocky = np.broadcast_to(bm, (2, 6, 8, 6, 8, 3)).reshape(2, 48, 48, 3)
    tb = t[:, :48, :48]
    assert float(I.psnrb(blocky, tb)) < float(psnr(jnp.asarray(blocky),
                                                   jnp.asarray(tb)))


def _vifp_numpy(ref, dist, sigma_nsq=2.0):
    """Independent numpy VIF-p: Sheikh-Bovik GSM formula with the same
    VALID-window spec as enhax (scipy.signal convolution vs enhax's manual
    slice-sums — independent code paths, shared published formula)."""
    from scipy.signal import convolve2d
    eps = 1e-10
    num = den = 0.0
    for scale in range(1, 5):
        N = 2 ** (4 - scale + 1) + 1
        coords = np.arange(N, dtype=np.float64) - N // 2
        g1 = np.exp(-coords**2 / (2 * (N / 5.0) ** 2))
        g1 = (g1 / g1.sum()).astype(np.float32)
        k2d = np.outer(g1, g1)

        def gf(x):
            return convolve2d(x, k2d, mode="valid")

        if scale > 1:
            ref = gf(ref)[::2, ::2]
            dist = gf(dist)[::2, ::2]
        mu1, mu2 = gf(ref), gf(dist)
        mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = gf(ref * ref) - mu1s
        s2 = gf(dist * dist) - mu2s
        s12 = gf(ref * dist) - mu12
        s1[s1 < 0] = 0
        s2[s2 < 0] = 0
        g = s12 / (s1 + eps)
        sv = s2 - g * s12
        g[s1 < eps] = 0
        sv[s1 < eps] = s2[s1 < eps]
        s1[s1 < eps] = 0
        g[s2 < eps] = 0
        sv[s2 < eps] = 0
        sv[g < 0] = s2[g < 0]
        g[g < 0] = 0
        sv[sv <= eps] = eps
        num += np.sum(np.log10(1 + g * g * s1 / (sv + sigma_nsq)))
        den += np.sum(np.log10(1 + s1 / sigma_nsq))
    return num / den


def test_vif_parity(rng):
    t = (rng.uniform(0, 255, (96, 96))).astype(np.float32)
    # smooth the reference so it has real structure
    from scipy.ndimage import gaussian_filter
    t = gaussian_filter(t, 2.0).astype(np.float32)
    p = np.clip(t + rng.normal(0, 8, t.shape), 0, 255).astype(np.float32)
    ref_v = _vifp_numpy(t.astype(np.float64), p.astype(np.float64))
    got = float(I.vif(p[None, :, :, None], t[None, :, :, None]))
    np.testing.assert_allclose(got, ref_v, rtol=1e-3)
    assert float(I.vif(t[None, :, :, None], t[None, :, :, None])) > 0.99


def test_distortion_indices(img_pair):
    p, t = img_pair
    # identical images: zero spectral distortion
    assert float(I.spectral_distortion_index(t, t)) < 1e-5
    assert float(I.spectral_distortion_index(p, t)) > 0
    pan = t.mean(axis=-1, keepdims=True)
    d_s_same = float(I.spatial_distortion_index(
        t, t, pan, pan_lr=pan))
    assert d_s_same < 1e-5


# -- registry count (VERDICT r3 done-condition: METRICS >= 40) -----------------

def test_metric_registry_count():
    import enhax  # noqa: F401
    from enhax.constants import METRICS
    assert len(METRICS) >= 60


def test_eval_step_logs_top1_top5(rng):
    """Classify val path logs both accuracies (VERDICT r3 item 4 tail)."""
    import flax.linen as nn
    import jax

    from enhax.models.base import Model
    from enhax.train.trainer import make_eval_step

    class TinyCls(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.mean(axis=(1, 2))
            return {"logits": nn.Dense(10)(x)}

    m = Model(name="tiny_cls", arch="test", module=TinyCls(),
              out_key="logits")
    batch = {"image": jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)),
                                  dtype=jnp.float32),
             "class_id": jnp.asarray(rng.integers(0, 10, 8))}
    v = m.init(jax.random.PRNGKey(0), batch)
    metrics = make_eval_step(m)(v, batch)
    assert "acc_top1" in metrics and "acc_top5" in metrics
    assert 0.0 <= float(metrics["acc_top1"]) <= float(metrics["acc_top5"]) <= 1.0


def test_threshold_curve_metrics(bin_data):
    """precision@recall / recall@precision / specificity@sensitivity: the
    constraint is met and the value matches a numpy scan of the curve."""
    from sklearn.metrics import precision_recall_curve as sk_prc, roc_curve
    s, t = bin_data
    p_at_r, thr = C.precision_at_fixed_recall(s, t, min_recall=0.6)
    sk_p, sk_r, sk_t = sk_prc(t, s)
    best = max(p for p, r in zip(sk_p, sk_r) if r >= 0.6)
    np.testing.assert_allclose(float(p_at_r), best, atol=1e-5)

    r_at_p, _ = C.recall_at_fixed_precision(s, t, min_precision=0.6)
    cand = [r for p, r in zip(sk_p, sk_r) if p >= 0.6]
    np.testing.assert_allclose(float(r_at_p), max(cand), atol=1e-5)

    spec, _ = C.specificity_at_sensitivity(s, t, min_sensitivity=0.7)
    fpr, tpr, _ = roc_curve(t, s, drop_intermediate=False)
    best_spec = max(1 - f for f, tp in zip(fpr, tpr) if tp >= 0.7)
    np.testing.assert_allclose(float(spec), best_spec, atol=1e-5)


# -- MiFID + PPL (the last two reference metric names) -------------------------

def test_mifid_memorization_penalty(rng):
    """MiFID feature math vs an independent numpy reference: memorized
    (copied) features divide FID by a tiny penalty; disjoint sets clamp
    the penalty to 1 so MiFID == FID."""
    from enhax.nn.fid import (cosine_memorization_distance,
                              fid_from_features, mifid_from_features)
    real = rng.normal(size=(64, 16)).astype(np.float64)
    far = rng.normal(loc=5.0, size=(64, 16)).astype(np.float64)

    # independent reference of the penalty
    def ref_penalty(f, r, eps=0.1):
        fn = f / np.sqrt((f * f).sum(1))[:, None]
        rn = r / np.sqrt((r * r).sum(1))[:, None]
        mins = [min(1.0 - abs(float(fi @ rj)) for rj in rn) for fi in fn]
        m = float(np.mean(mins))
        return m if m < eps else 1.0

    np.testing.assert_allclose(
        cosine_memorization_distance(far, real), ref_penalty(far, real),
        atol=1e-12)
    # copied features: penalty ~ 0 -> MiFID explodes vs FID
    copied = real + rng.normal(scale=1e-6, size=real.shape)
    pen = cosine_memorization_distance(copied, real)
    assert pen == pytest.approx(ref_penalty(copied, real), abs=1e-12)
    assert pen < 1e-6
    assert mifid_from_features(copied, real) > fid_from_features(copied, real)
    # far-away features: penalty clamps to 1 -> MiFID == FID
    assert cosine_memorization_distance(far, real) == 1.0
    np.testing.assert_allclose(mifid_from_features(far, real),
                               fid_from_features(far, real), rtol=1e-12)


def test_perceptual_path_length_lerp(rng):
    """PPL over a linear generator with L2 similarity has a closed form:
    d(t, t+eps) = ||G(z_t) - G(z_t+eps)|| = eps * ||W (z1 - z0)||, so every
    distance equals ||W dz|| / eps."""
    import jax

    w = jnp.asarray(rng.normal(size=(6, 12)).astype(np.float32))

    def gen(z):
        return (z @ w).reshape(z.shape[0], 2, 2, 3)

    def l2(a, b):
        return jnp.sqrt(((a - b) ** 2).sum(axis=(1, 2, 3)))

    eps = 1e-2
    mean, std, dists = I.perceptual_path_length(
        gen, z_size=6, similarity=l2, num_samples=32, batch_size=8,
        epsilon=eps, lower_discard=None, upper_discard=None,
        key=jax.random.PRNGKey(3))
    k0, k1, _ = jax.random.split(jax.random.PRNGKey(3), 3)
    z0 = jax.random.normal(k0, (32, 6))
    z1 = jax.random.normal(k1, (32, 6))
    expect = np.linalg.norm(np.asarray((z1 - z0) @ w), axis=1) * eps \
        / (eps ** 2)
    np.testing.assert_allclose(dists, expect, rtol=2e-3)
    np.testing.assert_allclose(mean, expect.mean(), rtol=2e-3)

    # quantile discard drops the extremes
    m2, _, d2 = I.perceptual_path_length(
        gen, z_size=6, similarity=l2, num_samples=32, batch_size=8,
        epsilon=eps, lower_discard=0.1, upper_discard=0.9,
        key=jax.random.PRNGKey(3))
    kept = d2[(d2 >= np.quantile(d2, 0.1)) & (d2 <= np.quantile(d2, 0.9))]
    np.testing.assert_allclose(m2, kept.mean(), rtol=1e-5)


def test_perceptual_path_length_slerp_unit_circle():
    """slerp between orthogonal unit vectors traces the unit circle, so an
    identity generator + L2 similarity gives d ~ arc length eps (constant
    speed) for every sample."""
    import jax

    def gen(z):
        return z.reshape(z.shape[0], 1, 1, 2)

    def l2(a, b):
        return jnp.sqrt(((a - b) ** 2).sum(axis=(1, 2, 3)))

    eps = 1e-3
    # force orthogonal unit endpoints by monkey-feeding via the PRNG is
    # fragile; instead check _slerp directly plus a smoke run
    from enhax.nn.metrics_img import _slerp
    z0 = jnp.asarray([[1.0, 0.0]])
    z1 = jnp.asarray([[0.0, 1.0]])
    for t in (0.0, 0.25, 0.5):
        a = np.asarray(_slerp(z0, z1, jnp.asarray([[t]])))
        b = np.asarray(_slerp(z0, z1, jnp.asarray([[t + eps]])))
        np.testing.assert_allclose(np.linalg.norm(a), 1.0, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(b - a), (np.pi / 2) * eps, rtol=1e-3)
    mean, _, dists = I.perceptual_path_length(
        gen, z_size=2, similarity=l2, num_samples=16, batch_size=8,
        interpolation="slerp", epsilon=eps, lower_discard=None,
        upper_discard=None, key=jax.random.PRNGKey(0))
    assert np.isfinite(dists).all() and (dists > 0).all()


def test_metric_longform_aliases_resolve():
    """Reference name-for-name parity: every torchmetrics long-form name the
    reference registers (nn/metric/image.py:63-83 et al.) resolves here."""
    import enhax  # noqa: F401
    from enhax.constants import METRICS
    for name in [
        "peak_signal_noise_ratio", "structural_similarity_index_measure",
        "multiscale_ssim", "multiscale_structural_similarity_index_measure",
        "learned_perceptual_image_patch_similarity",
        "error_relative_global_dimensionless_synthesis",
        "peak_signal_noise_ratio_with_blocked_effect",
        "relative_average_spectral_error",
        "root_mean_squared_error_using_sliding_window",
        "spatial_correlation_coefficient", "universal_image_quality_index",
        "visual_information_fidelity",
        "memorization_informed_frechet_inception_distance",
        "perceptual_path_length",
    ]:
        assert name in METRICS, name
