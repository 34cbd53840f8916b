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
