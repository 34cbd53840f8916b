"""Fused NAFBlock Pallas kernels == the flax NAFBlock, bit-close.

Interpret mode on CPU; the same kernels compile on TPU (bench_all's
nafnet rows run them)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enhax.kernels.box import box_mean_fast
from enhax.kernels.nafblock import nafblock_fast, nafnet_fast_apply
from enhax.models.base import build_model
from enhax.models.multitask.nafnet import NAFBlock
from enhax.ops.filtering import box_filter


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_box_mean_matches_box_filter(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, 8)).astype(np.float32))
    ref = box_filter(x, radius=5)
    got = box_mean_fast(x, radius=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shift", [0.05, 0.5])
@pytest.mark.parametrize("tlc", [None, 8])
def test_nafblock_fast_matches_flax(rng, tlc, shift):
    """shift=0.05 exercises near-init params; shift=0.5 exercises
    trained-weight O(1) beta/gamma/biases, where an edge-row
    dwconv-padding bug once hid under the small-params tolerance
    (r3 review finding)."""
    c = 8
    blk = NAFBlock(c, tlc_window=tlc)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, c)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(
        lambda a: a + shift * np.float32(1.0), v["params"])
    ref = np.asarray(blk.apply({"params": p}, x))
    got = np.asarray(nafblock_fast(x, p, tlc, interpret=True))
    err = np.abs(got - ref)
    scale = max(1.0, float(np.abs(ref).max()))
    # tolerance floor: this CPU XLA build runs f32 convs with ~bf16
    # accumulation (measured ~3e-3 vs exact math; the kernel matches a
    # numpy-exact conv to 0.0 — see r3 PERF notes), and
    # jax.default_matmul_precision does not reach conv_general_dilated
    assert err.max() <= max(6e-3, 2e-6 * scale), (err.max(), scale)
    # image-edge rows get the dwconv's SAME zero padding — they must be
    # as tight as the interior, not systematically worse
    interior = max(float(err[:, 1:-1].max()), 1e-6 * scale)
    assert err[:, 0].max() <= 2 * interior
    assert err[:, -1].max() <= 2 * interior


@pytest.mark.slow
def test_nafnet_fast_apply_matches_model(rng):
    m = build_model("nafnet_local", width=8, middle_blk_num=1,
                    enc_blk_nums=(1, 1), dec_blk_nums=(1, 1), tlc_window=8)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), {"image": x})
    ref = m.apply(v, {"image": x})["enhanced"]
    got = nafnet_fast_apply(v, x, width=8, enc_blk_nums=(1, 1),
                            middle_blk_num=1, dec_blk_nums=(1, 1),
                            tlc_window=8, interpret=True)["enhanced"]
    # see tolerance note in test_nafblock_fast_matches_flax
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=1e-3)


@pytest.mark.parametrize("tlc", [None, 8])
def test_nafblock_fused_grad_matches_flax(rng, tlc):
    """The fused block's custom VJP (Pallas fwd / lowered-XLA bwd,
    VERDICT r3 #3) must reproduce the flax NAFBlock gradients for both
    the input and every parameter."""
    from enhax.kernels.nafblock import nafblock_fused

    c = 8
    blk = NAFBlock(c, tlc_window=tlc)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, c)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(lambda a: a + np.float32(0.05), v["params"])

    def loss_ref(xx, pp):
        return jnp.sum(blk.apply({"params": pp}, xx) ** 2)

    def loss_fused(xx, pp):
        return jnp.sum(nafblock_fused(xx, pp, tlc, True) ** 2)

    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    assert jax.tree_util.tree_structure(gp) == jax.tree_util.tree_structure(gp_ref)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-3, atol=5e-3)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp)[0],
            jax.tree_util.tree_flatten_with_path(gp_ref)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-3,
                                   err_msg=str(ka))


def test_nafnet_fast_apply_differentiable(rng):
    """The full hybrid fast apply is differentiable end to end: grads flow
    through fused and XLA stages and match the flax model's grads."""
    import jax as _jax

    from enhax.kernels.nafblock import nafnet_fast_apply

    m = build_model("nafnet", width=8, middle_blk_num=1,
                    enc_blk_nums=(1,), dec_blk_nums=(1,))
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    v = m.init(_jax.random.PRNGKey(0), {"image": x})

    def loss_fast(vv):
        out = nafnet_fast_apply(vv, x, width=8, middle_blk_num=1,
                                enc_blk_nums=(1,), dec_blk_nums=(1,),
                                fused_max_c=64, interpret=True)
        return jnp.mean(out["enhanced"] ** 2)

    def loss_flax(vv):
        return jnp.mean(m.apply(vv, {"image": x})["enhanced"] ** 2)

    g_fast = _jax.grad(loss_fast)(v)
    g_flax = _jax.grad(loss_flax)(v)
    assert _jax.tree_util.tree_structure(g_fast) == \
        _jax.tree_util.tree_structure(g_flax)
    for (ka, a), (kb, b) in zip(
            _jax.tree_util.tree_flatten_with_path(g_fast)[0],
            _jax.tree_util.tree_flatten_with_path(g_flax)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-3, err_msg=str(ka))
