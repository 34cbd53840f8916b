"""Nominal (categorical-association) metrics in pure JAX.

Rebuild of reference ``src/mon/nn/metric/nominal.py:25-36`` (5 registered
torchmetrics.nominal wrappers). Inputs are integer category arrays; all
statistics flow through the contingency table. Parity tests execute the
textbook estimators in numpy/scipy (``tests/test_metrics_wrappers.py``).

Bias correction for Cramer's V / Tschuprow's T follows Bergsma 2013 —
the torchmetrics default (``bias_correction=True``).
"""

from __future__ import annotations

import jax.numpy as jnp

from enhax.constants import METRICS

__all__ = ["cramers_v", "fleiss_kappa", "pearsons_contingency_coefficient",
           "theils_u", "tschuprows_t"]


def _contingency(x, y, nx=None, ny=None):
    x = jnp.asarray(x).astype(jnp.int32).reshape(-1)
    y = jnp.asarray(y).astype(jnp.int32).reshape(-1)
    nx = int(nx) if nx is not None else int(x.max()) + 1
    ny = int(ny) if ny is not None else int(y.max()) + 1
    idx = x * ny + y
    return jnp.bincount(idx, length=nx * ny).reshape(nx, ny).astype(jnp.float32)


def _chi2(ct):
    n = ct.sum()
    expected = ct.sum(axis=1, keepdims=True) * ct.sum(axis=0, keepdims=True) / n
    mask = expected > 0
    return jnp.sum(jnp.where(mask, (ct - expected) ** 2
                             / jnp.clip(expected, 1e-12), 0.0))


@METRICS.register(name="cramers_v")
def cramers_v(preds, target, bias_correction: bool = True,
              num_classes: int | None = None):
    ct = _contingency(preds, target, num_classes, num_classes)
    n = ct.sum()
    r, k = ct.shape
    phi2 = _chi2(ct) / n
    if bias_correction:
        phi2 = jnp.maximum(0.0, phi2 - (k - 1) * (r - 1) / (n - 1))
        r = r - (r - 1) ** 2 / (n - 1)
        k = k - (k - 1) ** 2 / (n - 1)
    return jnp.sqrt(phi2 / jnp.clip(jnp.minimum(r - 1, k - 1), 1e-12))


@METRICS.register(name="tschuprows_t")
def tschuprows_t(preds, target, bias_correction: bool = True,
                 num_classes: int | None = None):
    ct = _contingency(preds, target, num_classes, num_classes)
    n = ct.sum()
    r, k = ct.shape
    phi2 = _chi2(ct) / n
    if bias_correction:
        phi2 = jnp.maximum(0.0, phi2 - (k - 1) * (r - 1) / (n - 1))
        r = r - (r - 1) ** 2 / (n - 1)
        k = k - (k - 1) ** 2 / (n - 1)
    return jnp.sqrt(phi2 / jnp.clip(jnp.sqrt((r - 1) * (k - 1)), 1e-12))


@METRICS.register(name="pearsons_contingency_coefficient")
def pearsons_contingency_coefficient(preds, target,
                                     num_classes: int | None = None):
    ct = _contingency(preds, target, num_classes, num_classes)
    chi2 = _chi2(ct)
    n = ct.sum()
    return jnp.sqrt(chi2 / (chi2 + n))


@METRICS.register(name="theils_u")
def theils_u(preds, target, num_classes: int | None = None):
    """Uncertainty coefficient U(preds | target): how much knowing ``target``
    reduces the entropy of ``preds``."""
    ct = _contingency(preds, target, num_classes, num_classes)
    n = ct.sum()
    px = ct.sum(axis=1) / n
    pxy = ct / n

    def _entropy(p):
        return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.clip(p, 1e-12)), 0.0))

    h_x = _entropy(px)
    py = ct.sum(axis=0) / n
    # conditional entropy H(X|Y) = H(X,Y) - H(Y)
    h_xy = _entropy(pxy.reshape(-1))
    h_y = _entropy(py)
    u = (h_x - (h_xy - h_y)) / jnp.clip(h_x, 1e-12)
    return jnp.where(h_x > 0, u, 1.0)


@METRICS.register(name="fleiss_kappa")
def fleiss_kappa(ratings):
    """Fleiss' kappa over an (N_subjects, N_categories) count matrix
    (entry [i, j] = number of raters assigning category j to subject i)."""
    r = jnp.asarray(ratings).astype(jnp.float32)
    n_sub, _ = r.shape
    n_rater = r[0].sum()
    p_j = r.sum(axis=0) / (n_sub * n_rater)
    p_i = (jnp.sum(r * r, axis=1) - n_rater) / (n_rater * (n_rater - 1))
    p_bar = jnp.mean(p_i)
    p_e = jnp.sum(p_j ** 2)
    return (p_bar - p_e) / jnp.clip(1.0 - p_e, 1e-12)
