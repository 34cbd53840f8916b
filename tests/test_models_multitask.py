"""Multitask restoration model tests (HINet/NAFNet/Restormer/Uformer/MPRNet/ZeroRestore)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enhax
from enhax.models.base import build_model


@pytest.fixture
def pair(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    return {"image": x, "ref_image": y}


def _fwd(name, dp, **kw):
    m = build_model(name, **kw)
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["enhanced"].shape == dp["image"].shape
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))
    return m, params, out


def test_hinet_forward_and_loss(pair):
    m, params, out = _fwd("hinet_re", pair, num_channels=8, depth=3,
                          in_pos_right=2)
    assert "stage1" in out
    loss, _ = m.forward_loss(params, pair)
    assert np.isfinite(float(loss))


def test_nafnet_forward_and_loss(pair):
    m, params, out = _fwd("nafnet", pair, width=8, middle_blk_num=1,
                          enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    loss, _ = m.forward_loss(params, pair)
    assert np.isfinite(float(loss))


def test_nafnet_remat_grad_parity(pair):
    """remat=True (per-block rematerialization for the HBM-bound train
    step, tools/roofline.py) must be a pure scheduling change: identical
    loss and gradients to the plain module."""
    kw = dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
              dec_blk_nums=(1, 1))
    m0 = build_model("nafnet", **kw)
    m1 = build_model("nafnet", remat=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), pair)

    def loss_of(m):
        return lambda p: jnp.mean(jnp.abs(
            m.module.apply({"params": p}, pair["image"])["enhanced"]
            - pair["ref_image"]))

    l0, g0 = jax.value_and_grad(loss_of(m0))(v["params"])
    l1, g1 = jax.value_and_grad(loss_of(m1))(v["params"])
    assert float(l0) == float(l1)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-6


def test_nafnet_tlc_differs_from_global(pair):
    """TLC local stats must differ from global-pool stats on non-uniform input."""
    kw = dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    m_g = build_model("nafnet", **kw)
    m_l = build_model("nafnet_local", tlc_window=8, **kw)
    params = m_g.init(jax.random.PRNGKey(0), pair)
    # beta/gamma init to zero makes NAFBlocks identity; enable them so the
    # attention path (where TLC lives) actually contributes
    params = jax.tree_util.tree_map_with_path(
        lambda kp, v: jnp.ones_like(v)
        if any(str(getattr(k, "key", "")) in ("beta", "gamma") for k in kp) else v,
        params)
    out_g = m_g.apply(params, pair)
    out_l = m_l.apply(params, pair)  # same params, different pooling
    diff = float(jnp.mean(jnp.abs(out_g["enhanced"] - out_l["enhanced"])))
    assert diff > 1e-6


def test_restormer_forward_and_loss(pair):
    m, params, out = _fwd("restormer", pair, dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement=1, heads=(1, 1, 2, 2))
    loss, _ = m.forward_loss(params, pair)
    assert np.isfinite(float(loss))


def test_uformer_forward(rng):
    dp = {"image": jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))}
    m = build_model("uformer_t")
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["enhanced"].shape == dp["image"].shape


def test_mprnet_forward_and_loss(pair):
    m, params, out = _fwd("mprnet", pair, channels=16, s_unet=8,
                          s_ors=8, num_cab=2)
    assert "stage1" in out and "stage2" in out
    loss, _ = m.forward_loss(params, pair)
    assert np.isfinite(float(loss))


def test_zero_restore_forward_and_loss(pair):
    dp = {"image": pair["image"]}
    m = build_model("zero_restore_llie")
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["enhanced"].shape == dp["image"].shape
    # reference expand_as: trans/atm are broadcast to image shape
    assert out["trans"].shape == dp["image"].shape
    loss, _ = m.forward_loss(params, dp)
    assert np.isfinite(float(loss))


def test_all_multitask_registered():
    for name in ("hinet_re", "nafnet", "nafnet_local", "restormer",
                 "uformer_re", "uformer_t", "uformer_s", "uformer_b",
                 "uformer_noshift", "mprnet", "zero_restore_llie",
                 "zero_restore_dehaze", "zero_restore_uie"):
        assert name in enhax.MODELS, name


def test_airnet_forward_and_loss(pair):
    m, params, out = _fwd("airnet", pair, n_feats=8, n_groups=1, n_blocks=1)
    assert "degradation" in out
    loss, _ = m.forward_loss(params, pair)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_adair_forward_and_loss(pair):
    m, params, out = _fwd("adair", pair, dim=8, num_blocks=(1, 1, 1, 1),
                          num_refinement=1, fre_n=8)
    loss, _ = m.forward_loss(params, pair)
    assert np.isfinite(float(loss))
