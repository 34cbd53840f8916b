"""Pallas kernel correctness tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhax.kernels import fused_curve_apply, fused_curve_upsample_apply
from enhax.models.llie.zero_dce import apply_curves


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.uniform(0, 0.5, (2, 16, 32, 3)).astype(np.float32))


def test_fused_curve_matches_reference(img, rng):
    curves = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32, 24)).astype(np.float32))
    ref = apply_curves(img, curves, num_iters=8, shared=False)
    out = fused_curve_apply(img, curves, num_iters=8, shared=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_curve_shared(img, rng):
    curves = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32, 3)).astype(np.float32))
    ref = apply_curves(img, curves, num_iters=8, shared=True)
    out = fused_curve_apply(img, curves, num_iters=8, shared=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_curve_upsample_matches_resize_path(rng):
    """In-tile bilinear upsample + curve loop == jax.image.resize + loop."""
    from enhax.ops.resize import resize
    scale = 4
    img = jnp.asarray(rng.uniform(0, 0.5, (1, 32, 64, 3)).astype(np.float32))
    curves_lr = jnp.asarray(rng.uniform(-1, 1, (1, 8, 16, 3)).astype(np.float32))
    curves_hr = resize(curves_lr, (32, 64), method="bilinear")
    ref = apply_curves(img, curves_hr, num_iters=8, shared=True)
    out = fused_curve_upsample_apply(img, curves_lr, num_iters=8, scale=scale,
                                     interpret=True)
    # the kernel's H-phase interpolation reads image-level edge-clamped
    # prev/next row views, so the whole array (borders included) must match
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_curve_jit_compatible(img, rng):
    curves = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32, 3)).astype(np.float32))
    f = jax.jit(lambda x, r: fused_curve_apply(x, r, 8, True, interpret=True))
    out = f(img, curves)
    assert np.all(np.isfinite(np.asarray(out)))
