"""Frechet Inception Distance (FID) on the native InceptionV3 zoo model.

Rebuild of the FID surface of the reference's pyiqa-backed eval harness
(project/runml/metric.py:81-86). Activations come from enhax's own
InceptionV3 (models/classify/inception.py, torchvision-parity arch) at
the pool3 (pre-logits GAP, 2048-d) layer; supply converted torchvision
weights locally for calibrated values (same stance as LPIPS/NIQE).

``frechet_distance`` is the closed form
    |mu1 - mu2|^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2})
with the matrix square root computed host-side via scipy (the standard
implementation); ``fid_from_features`` and ``fid`` wrap it.
"""

from __future__ import annotations

import numpy as np

from enhax.constants import METRICS


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    import scipy.linalg
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64)
    cov2 = np.asarray(cov2, np.float64)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(feats1, feats2) -> float:
    """FID between two activation sets (N, D) / (M, D)."""
    f1 = np.asarray(feats1, np.float64)
    f2 = np.asarray(feats2, np.float64)
    mu1, mu2 = f1.mean(0), f2.mean(0)
    c1 = np.cov(f1, rowvar=False)
    c2 = np.cov(f2, rowvar=False)
    return frechet_distance(mu1, c1, mu2, c2)


def inception_features(images, variables=None, batch_size: int = 8):
    """Pre-logits InceptionV3 pooled features for (N, H, W, 3) in [0,1].

    Random-init unless torchvision-converted ``variables`` are supplied.
    """
    import jax
    import jax.numpy as jnp

    from enhax.models.base import build_model

    model = build_model("inception_v3")
    x = jnp.asarray(images)
    x = jax.image.resize(
        x, (x.shape[0], 299, 299, 3), "bilinear", antialias=False)
    x = x * 2.0 - 1.0  # torchvision inception transform_input domain
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0),
                               {"image": x[:1]})
    feats = []
    for i in range(0, x.shape[0], batch_size):
        out = model.apply(variables, {"image": x[i:i + batch_size]})
        feats.append(np.asarray(out.get("features", out["logits"])))
    return np.concatenate(feats, axis=0)


@METRICS.register(name="fid")
def fid(input, target, variables=None, **_):
    """FID between two image sets (N, H, W, 3) in [0, 1]."""
    f1 = inception_features(np.asarray(input), variables)
    f2 = inception_features(np.asarray(target), variables)
    return fid_from_features(f1, f2)


def cosine_memorization_distance(fake_feats, real_feats,
                                 cosine_distance_eps: float = 0.1) -> float:
    """MiFID memorization penalty.

    Mean over fake features of the minimum cosine distance
    ``1 - |cos(f, r)|`` to any real (training) feature, thresholded: a
    mean distance >= ``cosine_distance_eps`` means "no memorization" and
    clamps the penalty to 1 (torchmetrics MiFID semantics; all-zero
    feature rows are dropped before normalization).
    """
    f = np.asarray(fake_feats, np.float64)
    r = np.asarray(real_feats, np.float64)
    f = f[np.abs(f).sum(axis=1) != 0]
    r = r[np.abs(r).sum(axis=1) != 0]
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    r = r / np.linalg.norm(r, axis=1, keepdims=True)
    d = 1.0 - np.abs(f @ r.T)
    mean_min = float(d.min(axis=1).mean())
    return mean_min if mean_min < cosine_distance_eps else 1.0


def mifid_from_features(fake_feats, real_feats,
                        cosine_distance_eps: float = 0.1) -> float:
    """Memorization-informed FID between two activation sets."""
    fid_value = fid_from_features(fake_feats, real_feats)
    penalty = cosine_memorization_distance(fake_feats, real_feats,
                                           cosine_distance_eps)
    return fid_value / (penalty + 1e-15)


@METRICS.register(name="mifid",
                  aliases=["memorization_informed_frechet_inception_distance"])
def mifid(input, target, variables=None,
          cosine_distance_eps: float = 0.1, **_):
    """Memorization-informed FID (reference nn/metric/image.py:47,66 wraps
    torchmetrics MemorizationInformedFrechetInceptionDistance): FID divided
    by the thresholded mean min cosine distance from generated to training
    features, penalizing generators that memorize the training set."""
    f1 = inception_features(np.asarray(input), variables)
    f2 = inception_features(np.asarray(target), variables)
    return mifid_from_features(f1, f2, cosine_distance_eps)
