"""Regression metrics in pure JAX.

Rebuild of reference ``src/mon/nn/metric/regression.py:37-76``, which
registers 20 torchmetrics.regression wrappers. Pure functions over
``(preds, target)`` arrays (any shape; flattened unless stated), with
sklearn/scipy-executed parity tests in ``tests/test_metrics_wrappers.py``.

``mae``/``mse``/``rmse`` live in enhax.nn.metrics (registered there); this
module registers the long-form aliases the reference also exposes.
"""

from __future__ import annotations

import jax.numpy as jnp

from enhax.constants import METRICS
from enhax.nn.metrics import mae as _mae, mse as _mse

__all__ = [
    "concordance_corr_coef", "cosine_similarity", "explained_variance",
    "kendall_rank_corr_coef", "kl_divergence", "log_cosh_error",
    "mean_absolute_percentage_error", "mean_squared_log_error",
    "minkowski_distance", "pearson_corr_coef", "r2_score",
    "relative_squared_error", "spearman_corr_coef",
    "symmetric_mean_absolute_percentage_error", "tweedie_deviance_score",
    "weighted_mean_absolute_percentage_error",
]

METRICS.register(name="mean_absolute_error", obj=_mae)
METRICS.register(name="mean_squared_error", obj=_mse)


def _flat(a):
    return jnp.asarray(a).astype(jnp.float32).reshape(-1)


@METRICS.register(name="explained_variance")
def explained_variance(preds, target):
    p, t = _flat(preds), _flat(target)
    return 1.0 - jnp.var(t - p) / jnp.clip(jnp.var(t), 1e-12)


@METRICS.register(name="r2_score")
def r2_score(preds, target):
    p, t = _flat(preds), _flat(target)
    ss_res = jnp.sum((t - p) ** 2)
    ss_tot = jnp.sum((t - t.mean()) ** 2)
    return 1.0 - ss_res / jnp.clip(ss_tot, 1e-12)


@METRICS.register(name="pearson_corr_coef")
def pearson_corr_coef(preds, target):
    p, t = _flat(preds), _flat(target)
    pc = p - p.mean()
    tc = t - t.mean()
    return jnp.sum(pc * tc) / jnp.clip(
        jnp.sqrt(jnp.sum(pc**2) * jnp.sum(tc**2)), 1e-12)


def _average_ranks(x):
    """scipy.stats.rankdata(method='average'): ties share the mean rank."""
    sorted_x = jnp.sort(x)
    left = jnp.searchsorted(sorted_x, x, side="left")
    right = jnp.searchsorted(sorted_x, x, side="right")
    return (left + right + 1) / 2.0


@METRICS.register(name="spearman_corr_coef")
def spearman_corr_coef(preds, target):
    p, t = _flat(preds), _flat(target)
    return pearson_corr_coef(_average_ranks(p), _average_ranks(t))


@METRICS.register(name="kendall_rank_corr_coef")
def kendall_rank_corr_coef(preds, target):
    """Kendall's tau-b (tie-corrected, the scipy/torchmetrics default).
    O(N^2) pairwise — metric-sized inputs only."""
    p, t = _flat(preds), _flat(target)
    dp = jnp.sign(p[:, None] - p[None, :])
    dt = jnp.sign(t[:, None] - t[None, :])
    iu = jnp.triu_indices(p.shape[0], k=1)
    dp, dt = dp[iu], dt[iu]
    concordant_minus_discordant = jnp.sum(dp * dt)
    n_pairs = dp.shape[0]
    ties_p = jnp.sum(dp == 0)
    ties_t = jnp.sum(dt == 0)
    denom = jnp.sqrt((n_pairs - ties_p) * (n_pairs - ties_t))
    return concordant_minus_discordant / jnp.clip(denom, 1e-12)


@METRICS.register(name="concordance_corr_coef")
def concordance_corr_coef(preds, target):
    p, t = _flat(preds), _flat(target)
    mp_, mt = p.mean(), t.mean()
    vp, vt = jnp.var(p), jnp.var(t)
    cov = jnp.mean((p - mp_) * (t - mt))
    return 2.0 * cov / jnp.clip(vp + vt + (mp_ - mt) ** 2, 1e-12)


@METRICS.register(name="cosine_similarity")
def cosine_similarity(preds, target, reduction: str = "mean"):
    """Row-wise cosine similarity over (N, D) arrays."""
    p = jnp.asarray(preds).astype(jnp.float32)
    t = jnp.asarray(target).astype(jnp.float32)
    if p.ndim == 1:
        p, t = p[None], t[None]
    num = jnp.sum(p * t, axis=-1)
    den = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1)
    sim = num / jnp.clip(den, 1e-12)
    if reduction == "sum":
        return jnp.sum(sim)
    if reduction in (None, "none"):
        return sim
    return jnp.mean(sim)


@METRICS.register(name="kl_divergence")
def kl_divergence(p, q, log_prob: bool = False):
    """Mean KL(p || q) over rows of (N, D) distributions."""
    p = jnp.asarray(p).astype(jnp.float32)
    q = jnp.asarray(q).astype(jnp.float32)
    if p.ndim == 1:
        p, q = p[None], q[None]
    if log_prob:
        kl = jnp.sum(jnp.exp(p) * (p - q), axis=-1)
    else:
        kl = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12))
                          - jnp.log(jnp.clip(q, 1e-12))), axis=-1)
    return jnp.mean(kl)


@METRICS.register(name="log_cosh_error")
def log_cosh_error(preds, target):
    d = _flat(preds) - _flat(target)
    # numerically stable log(cosh(d)) = |d| + log1p(exp(-2|d|)) - log 2
    return jnp.mean(jnp.abs(d) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(d)))
                    - jnp.log(2.0))


@METRICS.register(name="mean_absolute_percentage_error")
def mean_absolute_percentage_error(preds, target):
    p, t = _flat(preds), _flat(target)
    return jnp.mean(jnp.abs(p - t) / jnp.clip(jnp.abs(t), 1.17e-6))


@METRICS.register(name="symmetric_mean_absolute_percentage_error")
def symmetric_mean_absolute_percentage_error(preds, target):
    p, t = _flat(preds), _flat(target)
    return 2.0 * jnp.mean(jnp.abs(p - t)
                          / jnp.clip(jnp.abs(p) + jnp.abs(t), 1.17e-6))


@METRICS.register(name="weighted_mean_absolute_percentage_error")
def weighted_mean_absolute_percentage_error(preds, target):
    p, t = _flat(preds), _flat(target)
    return jnp.sum(jnp.abs(p - t)) / jnp.clip(jnp.sum(jnp.abs(t)), 1.17e-6)


@METRICS.register(name="mean_squared_log_error")
def mean_squared_log_error(preds, target):
    p, t = _flat(preds), _flat(target)
    return jnp.mean((jnp.log1p(p) - jnp.log1p(t)) ** 2)


@METRICS.register(name="minkowski_distance")
def minkowski_distance(preds, target, p: float = 2.0):
    x, t = _flat(preds), _flat(target)
    return jnp.sum(jnp.abs(x - t) ** p) ** (1.0 / p)


@METRICS.register(name="relative_squared_error")
def relative_squared_error(preds, target, squared: bool = True):
    p, t = _flat(preds), _flat(target)
    rse = jnp.sum((t - p) ** 2) / jnp.clip(jnp.sum((t - t.mean()) ** 2), 1e-12)
    return rse if squared else jnp.sqrt(rse)


@METRICS.register(name="tweedie_deviance_score")
def tweedie_deviance_score(preds, target, power: float = 0.0):
    """Mean Tweedie deviance; power 0 = MSE*2/... (gaussian), 1 = poisson,
    2 = gamma (sklearn mean_*_deviance parity)."""
    p, t = _flat(preds), _flat(target)
    if power == 0:
        dev = (t - p) ** 2
    elif power == 1:
        dev = 2.0 * (t * jnp.log(jnp.clip(t, 1e-12) / jnp.clip(p, 1e-12))
                     - t + p)
    elif power == 2:
        dev = 2.0 * (jnp.log(jnp.clip(p, 1e-12) / jnp.clip(t, 1e-12))
                     + t / jnp.clip(p, 1e-12) - 1.0)
    else:
        dev = 2.0 * (
            jnp.clip(t, 0) ** (2 - power) / ((1 - power) * (2 - power))
            - t * p ** (1 - power) / (1 - power)
            + p ** (2 - power) / (2 - power))
    return jnp.mean(dev)
