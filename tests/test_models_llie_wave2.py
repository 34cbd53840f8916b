"""Forward/loss smoke tests for the second LLIE wave + dehaze + retouch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enhax
from enhax.models.base import build_model


@pytest.fixture
def dp(rng):
    return {"image": jnp.asarray(rng.uniform(0.02, 0.4, (1, 64, 64, 3)).astype(np.float32)),
            "ref_image": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))}


def _smoke(name, dp, needs_ref=False, **kw):
    m = build_model(name, **kw)
    inputs = {k: dp[k] for k in ("image", "ref_image") if needs_ref or k == "image"}
    params = m.init(jax.random.PRNGKey(0), inputs)
    out = m.apply(params, inputs)
    assert out[m.out_key].shape == dp["image"].shape, name
    assert np.all(np.isfinite(np.asarray(out[m.out_key]))), name
    loss, _ = m.forward_loss(params, dp)
    assert np.isfinite(float(loss)), name
    return m, params, out


def test_colie(dp):
    _smoke("colie_re", dp, down_size=32)


def test_rrdnet(dp):
    _smoke("rrdnet_re", dp)


def test_psenet(dp):
    _smoke("psenet", dp, base_number=8)


def test_rsfnet(dp):
    _smoke("rsfnet", dp, factors=3, num_iters=2)


def test_zero_ig(dp):
    _smoke("zero_ig_re", dp, num_channels=16, embed_channels=16)


def test_hvi_cidnet(dp):
    _smoke("hvi_cidnet_re", dp, channels=(8, 8, 16, 32), needs_ref=True)


def test_lyt_net(dp):
    _smoke("lyt_net_re", dp, filters=16, needs_ref=True)


def test_llunetpp(dp):
    _smoke("llunet++_re", dp, filters=(8, 16, 32), needs_ref=True)


def test_lllinet(dp):
    _smoke("lllinet", dp, filters=(8, 8, 16, 16, 32), needs_ref=True)
    _smoke("lllinet_hvi", dp, filters=(8, 8, 16, 16, 32), needs_ref=True)


def test_zero_mie(dp):
    _smoke("zero_mie", dp, down_size=32, hidden_channels=32)


def test_zero_mie_ms_with_depth(dp, rng):
    m = build_model("zero_mie_ms", down_size=32, hidden_channels=32)
    params = m.init(jax.random.PRNGKey(0), {"image": dp["image"]})
    out = m.apply(params, {"image": dp["image"]})
    assert out["enhanced"].shape == dp["image"].shape


def test_zid(dp):
    m = build_model("zid", image_size=(64, 64))
    inputs = {"image": dp["image"]}
    params = m.init(jax.random.PRNGKey(0), inputs)
    out = m.apply(params, inputs)
    assert out["enhanced"].shape == dp["image"].shape
    loss, _ = m.forward_loss(params, inputs)
    assert np.isfinite(float(loss))


def test_neurop(dp):
    m, params, out = _smoke("neurop_re", dp, base_nf=16, encode_nf=8, needs_ref=True)
    assert "val_ex" in out


def test_zoo_size():
    """Model registry should now cover the major reference families."""
    assert len(enhax.MODELS) >= 35, sorted(enhax.MODELS.keys())
    for arch in ("zero_dce", "gcenet", "colie", "zero_mie", "hvi_cidnet",
                 "lyt_net", "llunetpp", "lllinet", "psenet", "rrdnet",
                 "rsfnet", "zero_ig", "zsn2n", "tv_denoise", "zid", "hinet",
                 "nafnet", "restormer", "uformer", "mprnet", "zero_restore",
                 "neurop"):
        assert arch in enhax.MODELS.archs, arch


def test_psenet_pseudo_gt_selects_bright(rng):
    """Dark input -> per-pixel argmax picks brightened gamma references."""
    from enhax.models.llie.psenet import good_looking_score, pseudo_gt
    dark = jnp.asarray(rng.uniform(0, 0.15, (2, 32, 32, 3)).astype(np.float32))
    gt = pseudo_gt(dark, jax.random.PRNGKey(0))
    assert gt.shape == dark.shape
    assert float(gt.mean()) > float(dark.mean())
    assert np.all(np.isfinite(np.asarray(gt)))
    # score map shape and well-exposedness preference
    s_dark = good_looking_score(dark)
    s_mid = good_looking_score(jnp.clip(dark + 0.4, 0, 1))
    assert s_dark.shape == (2, 32, 32, 1)
    assert float(s_mid.mean()) > float(s_dark.mean())


def test_psenet_pseudo_gt_includes_prev_output(rng):
    """A prev_output that dominates the good-looking score (max saturation,
    high local contrast, mid exposure) must win the per-pixel argmax."""
    from enhax.models.llie.psenet import pseudo_gt
    dark = jnp.asarray(rng.uniform(0, 0.1, (1, 32, 32, 3)).astype(np.float32))
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    checker = ((ii + jj) % 2).astype(np.float32)
    prev = np.zeros((1, 32, 32, 3), np.float32)
    prev[0, ..., 0] = checker  # saturation ~1, strong contrast, mean ~0.17
    gt_with = pseudo_gt(dark, jax.random.PRNGKey(0), prev_output=jnp.asarray(prev))
    gt_wo = pseudo_gt(dark, jax.random.PRNGKey(0))
    frac = float(jnp.mean(jnp.all(jnp.isclose(gt_with, prev, atol=1e-6), axis=-1)))
    assert frac > 0.5  # majority of pixels taken from prev_output
    assert not np.allclose(np.asarray(gt_with), np.asarray(gt_wo))


def test_retinexformer(dp):
    _smoke("retinexformer", dp, n_feat=8, num_blocks=(1, 1, 1))


def test_sci(dp):
    m, params, out = _smoke("sci", dp)
    # enhanced = x / illu[stage 0], clipped
    assert out["illu"].shape[0] == 3


def test_ruas(dp):
    _smoke("ruas", dp)


def test_uretinexnet(dp):
    m = build_model("uretinexnet")
    params = m.init(jax.random.PRNGKey(0), {"image": dp["image"]})
    out = m.apply(params, {"image": dp["image"]})
    assert out["enhanced"].shape == dp["image"].shape
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))


def test_pairlie(dp):
    m, params, out = _smoke("pairlie", dp)
    assert out["illumination"].shape[-1] == 1


def test_snr(dp):
    _smoke("snr", dp, nf=16, front_rbs=1, back_rbs=1, n_layers=1)


def test_zero_mie_hsv(dp):
    m, params, out = _smoke("zero_mie_hsv", dp, down_size=32)
    assert out["illu_lr"].shape[-1] == 1  # V-channel residual


def test_zero_mie_hsv_d(dp):
    _smoke("zero_mie_hsv_d", dp, down_size=32)


def test_zero_mie_hsv_roundtrip_identity(dp):
    # with a zero residual the HSV round trip must reproduce the input
    # (up to the guided-filter smoothing + max-normalization)
    import enhax.ops.color as color
    img = np.asarray(dp["image"])
    hsv = color.rgb_to_hsv(jnp.asarray(img))
    back = color.hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-5)


def test_llflow(dp):
    # tiny config; forward (reverse flow) + NLL both finite
    m = build_model("llflow", nf=8, nb=1, gc=4, K=1)
    img = dp["image"][:, :32, :32]
    params = m.init(jax.random.PRNGKey(0), {"image": img})
    out = m.apply(params, {"image": img})
    assert out["enhanced"].shape == img.shape
    assert np.isfinite(np.asarray(out["enhanced"])).all()
    loss, _ = m.forward_loss(params, {"image": img, "ref_image": img})
    assert np.isfinite(float(loss))


def test_llflow_squeeze_roundtrip():
    from enhax.models.llie.llflow import squeeze2d, unsqueeze2d
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(unsqueeze2d(squeeze2d(x, 2), 2)),
                               np.asarray(x))


def test_enlightengan(dp):
    m = build_model("enlightengan")
    params = m.init(jax.random.PRNGKey(0), {"image": dp["image"]})
    out = m.apply(params, {"image": dp["image"]})
    assert out["enhanced"].shape == dp["image"].shape
    assert np.isfinite(np.asarray(out["enhanced"])).all()


def test_retinexnet(dp):
    _smoke("retinexnet", dp, needs_ref=True)


def test_zero_didce(dp):
    _smoke("zero_didce", dp)


def test_sgz(dp):
    _smoke("sgz", dp, scale_factor=4)


@pytest.mark.slow
def test_dccnet(dp):
    _smoke("dccnet", dp, base=8, needs_ref=True)


@pytest.mark.slow
def test_utvnet(dp):
    _smoke("utvnet", dp, needs_ref=True)


def test_fourllie(dp):
    _smoke("fourllie", dp, nf=8, needs_ref=True)


def test_wakeup_darkness(dp, rng):
    m, params, _ = _smoke("wakeup_darkness", dp)
    # with explicit sem/depth priors (1-ch depth broadcast)
    depth = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    out = m.apply(params, {"image": dp["image"], "sem": dp["image"],
                           "depth": depth})
    assert np.isfinite(np.asarray(out["enhanced"])).all()


def test_nerco(dp):
    m = build_model("nerco", ngf=16, n_blocks=2)
    params = m.init(jax.random.PRNGKey(0), {"image": dp["image"]})
    out = m.apply(params, {"image": dp["image"]})
    e = np.asarray(out["enhanced"])
    assert e.shape == dp["image"].shape and np.isfinite(e).all()


@pytest.mark.slow
def test_mtfe(dp):
    _smoke("mtfe", dp, needs_ref=True)


def test_lime_and_pie(dp):
    for name in ("lime", "pie"):
        m = build_model(name)
        params = m.init(jax.random.PRNGKey(0), {"image": dp["image"]})
        out = m.apply(params, {"image": dp["image"]})
        e = np.asarray(out["enhanced"])
        assert e.shape == dp["image"].shape and np.isfinite(e).all(), name
        # classical enhancers must brighten a dark input
        assert e.mean() > np.asarray(dp["image"]).mean(), name


@pytest.mark.slow
def test_quadprior(dp):
    # 32-channel floor: the SD blocks use GroupNorm(32) like the reference
    m = build_model("quadprior", model_channels=32, context_dim=8,
                    vae_ch=32, num_heads=2, steps=3, context_len=4)
    params = m.init(jax.random.PRNGKey(0), {"image": dp["image"]})
    out = m.apply(params, {"image": dp["image"]})
    e = np.asarray(out["enhanced"])
    assert e.shape == dp["image"].shape and np.isfinite(e).all()
