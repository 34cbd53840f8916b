"""Loss toolkit tests: registry coverage + golden/property checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enhax  # registers everything
from enhax.constants import LOSSES


@pytest.fixture
def imgs(rng):
    x = jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 3)).astype(np.float32))
    return x, y


CORE_LOSSES = [
    "l1_loss", "l2_loss", "charbonnier_loss", "smooth_l1_loss",
    "spatial_consistency_loss", "exposure_control_loss", "color_constancy_loss",
    "total_variation_loss", "psnr_loss", "ssim_loss", "ms_ssim_loss",
    "gradient_loss", "grayscale_loss", "edge_loss", "edge_constancy_loss",
    "edge_charbonnier_loss", "color_loss", "histogram_loss", "std_loss",
    "contradict_channel_loss", "channel_consistency_loss",
    "channel_ratio_consistency_loss", "brightness_constancy_loss",
    "perceptual_loss",
]


def test_all_core_losses_registered():
    for name in CORE_LOSSES:
        assert name in LOSSES, name


@pytest.mark.parametrize("name", [n for n in CORE_LOSSES if n != "ms_ssim_loss"])
def test_loss_runs_and_is_finite(name, imgs):
    x, y = imgs
    fn = LOSSES.build(name)
    out = fn(x, y)
    assert np.all(np.isfinite(np.asarray(out))), name


def test_l1_zero_on_identical(imgs):
    x, _ = imgs
    assert float(LOSSES.build("l1_loss")(x, x)) == 0.0


def test_charbonnier_eps_floor(imgs):
    x, _ = imgs
    out = float(LOSSES.build("charbonnier_loss", eps=1e-3)(x, x))
    np.testing.assert_allclose(out, 1e-3, rtol=1e-5)


def test_tv_loss_golden():
    # x with a single step edge: hand-computable
    x = jnp.zeros((1, 2, 2, 1)).at[:, :, 1, :].set(1.0)
    # h_tv = 0 (rows identical); w_tv = 2 * 1^2 = 2; count_h = 1*2*1=2, count_w = 2*1*1=2
    # loss = 2 * (0/2 + 2/2) / 1 = 2
    out = float(LOSSES.build("total_variation_loss")(x))
    np.testing.assert_allclose(out, 2.0, rtol=1e-6)


def test_exposure_loss_golden():
    x = jnp.full((1, 16, 16, 3), 0.1)
    out = float(LOSSES.build("exposure_control_loss", patch_size=16, mean_val=0.6)(x))
    np.testing.assert_allclose(out, 0.25, rtol=1e-5)


def test_color_constancy_zero_for_gray():
    x = jnp.full((1, 8, 8, 3), 0.5)
    out = float(LOSSES.build("color_constancy_loss")(x))
    assert out < 1e-5


def test_spatial_consistency_zero_when_equal(imgs):
    x, _ = imgs
    out = float(LOSSES.build("spatial_consistency_loss")(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


@pytest.mark.parametrize("num_regions", [4, 8, 16, 24])
def test_spatial_consistency_region_counts(num_regions, imgs):
    x, y = imgs
    fn = LOSSES.build("spatial_consistency_loss", num_regions=num_regions)
    out = float(fn(x, y))
    assert np.isfinite(out) and out > 0


def test_psnr_loss_decreases_with_similarity(imgs):
    x, y = imgs
    fn = LOSSES.build("psnr_loss")
    far = float(fn(x, y))
    near = float(fn(x, x + 0.01))
    assert near < far  # log-mse is lower when closer


def test_ssim_loss_zero_when_equal(imgs):
    x, _ = imgs
    out = float(LOSSES.build("ssim_loss")(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_zero_dce_composite_loss_differentiable(imgs):
    """The full Zero-DCE loss must be differentiable w.r.t. its inputs."""
    x, _ = imgs
    spa = LOSSES.build("spatial_consistency_loss")
    exp = LOSSES.build("exposure_control_loss")
    col = LOSSES.build("color_constancy_loss")
    tva = LOSSES.build("total_variation_loss")

    def total(enh, adj, inp):
        return (spa(enh, inp) + 10.0 * exp(enh) + 5.0 * col(enh) + 200.0 * tva(adj))

    g = jax.grad(total)(x, x * 0.5, x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_losses_jit_compatible(imgs):
    x, y = imgs
    fn = jax.jit(LOSSES.build("charbonnier_loss"))
    out = float(fn(x, y))
    assert np.isfinite(out)


def test_bilateral_smooth_loss_edge_aware(rng):
    """Smooth guide -> strong penalty on target gradients; edged guide ->
    weights collapse and the same target costs less."""
    from enhax.constants import LOSSES
    fn = LOSSES.build("bilateral_smooth_loss")
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    flat_guide = jnp.full((1, 16, 16, 3), 0.5, jnp.float32)
    edgy_guide = jnp.asarray(
        (rng.uniform(0, 1, (1, 16, 16, 3)) > 0.5).astype(np.float32))
    assert float(fn(flat_guide, tgt)) > float(fn(edgy_guide, tgt))
    # smooth target under a flat guide costs ~0
    assert float(fn(flat_guide, jnp.zeros_like(tgt))) == pytest.approx(0.0)


def test_bilateral_smooth_loss_grad(rng):
    from enhax.constants import LOSSES
    fn = LOSSES.build("bilateral_smooth_loss")
    guide = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    g = jax.grad(lambda t: fn(guide, t))(guide)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_retinexnet_smooth_matches_torch_formula(rng):
    """retinexnet's smoothness term == the reference's torch math
    (model.py:240-260: 2x2 forward-difference conv pad 1, 3x3 avg-pool
    pad 1 count_include_pad, BT.601 luma). The reference class itself
    hardcodes .cuda() so it cannot execute here; this reimplements its
    exact ops in torch."""
    import pytest as _pytest
    torch = _pytest.importorskip("torch")
    import torch.nn.functional as F

    from enhax.models.llie.retinexnet import _smooth

    def ref_smooth(I, R):  # noqa: E741
        kx = torch.tensor([[0.0, 0.0], [-1.0, 1.0]]).view(1, 1, 2, 2)
        ky = kx.transpose(2, 3)

        def grad(t, k):
            return torch.abs(F.conv2d(t, k, stride=1, padding=1))

        def ave(t, k):
            return F.avg_pool2d(grad(t, k), kernel_size=3, stride=1,
                                padding=1)

        r = (0.299 * R[:, 0] + 0.587 * R[:, 1] + 0.114 * R[:, 2])[:, None]
        return torch.mean(grad(I, kx) * torch.exp(-10 * ave(r, kx))
                          + grad(I, ky) * torch.exp(-10 * ave(r, ky)))

    illu = rng.uniform(0, 1, (2, 12, 14, 1)).astype(np.float32)
    refl = rng.uniform(0, 1, (2, 12, 14, 3)).astype(np.float32)
    want = float(ref_smooth(torch.from_numpy(illu.transpose(0, 3, 1, 2)),
                            torch.from_numpy(refl.transpose(0, 3, 1, 2))))
    got = float(_smooth(jnp.asarray(illu), jnp.asarray(refl)))
    assert abs(got - want) < 1e-6, (got, want)
