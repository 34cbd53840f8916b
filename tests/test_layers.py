"""Layer library + INR stack shape/property tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhax.nn import inr, layers


@pytest.fixture
def x(key):
    return jax.random.uniform(key, (2, 16, 16, 8))


def _init_apply(mod, x, **kw):
    params = mod.init(jax.random.PRNGKey(0), x, **kw)
    return mod.apply(params, x, **kw), params


def test_conv_block(x):
    out, _ = _init_apply(layers.ConvBlock(features=12), x)
    assert out.shape == (2, 16, 16, 12)
    assert float(jnp.min(out)) >= 0.0  # relu


def test_dsconv_param_count_smaller_than_conv(x):
    ds = layers.DSConv(features=16)
    full = layers.ConvBlock(features=16, act=None)
    p_ds = ds.init(jax.random.PRNGKey(0), x)
    p_full = full.init(jax.random.PRNGKey(0), x)
    n = lambda p: sum(int(np.prod(a.shape)) for a in jax.tree.leaves(p))
    assert n(p_ds) < n(p_full)
    out = ds.apply(p_ds, x)
    assert out.shape == (2, 16, 16, 16)


def test_bsconv(x):
    out, _ = _init_apply(layers.BSConv(features=16), x)
    assert out.shape == (2, 16, 16, 16)


def test_ffconv(x):
    out, _ = _init_apply(layers.FFConv(features=16), x)
    assert out.shape == (2, 16, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_instance_norm_stats(x):
    mod = layers.InstanceNorm2d(affine=False)
    out, _ = _init_apply(mod, x)
    m = jnp.mean(out, axis=(1, 2))
    v = jnp.var(out, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-3)


def test_layer_norm_2d(x):
    out, _ = _init_apply(layers.LayerNorm2d(), x)
    np.testing.assert_allclose(np.asarray(jnp.mean(out, axis=-1)), 0.0, atol=1e-5)


@pytest.mark.parametrize("cls", [layers.SqueezeExcite, layers.ECA, layers.CBAM,
                                 layers.SimAM])
def test_attention_blocks_preserve_shape(cls, x):
    out, _ = _init_apply(cls(), x)
    assert out.shape == x.shape


def test_window_attention(key):
    x = jax.random.uniform(key, (1, 16, 16, 32))
    mod = layers.WindowAttention(dim=32, num_heads=4, window_size=8)
    out, _ = _init_apply(mod, x)
    assert out.shape == x.shape


def test_window_attention_shifted(key):
    x = jax.random.uniform(key, (1, 16, 16, 32))
    mask = layers.make_shift_attn_mask(16, 16, 8, 4)
    mod = layers.WindowAttention(dim=32, num_heads=4, window_size=8, shift=4)
    params = mod.init(jax.random.PRNGKey(0), x, mask=mask)
    out = mod.apply(params, x, mask=mask)
    assert out.shape == x.shape


def test_pixel_shuffle_roundtrip(key):
    x = jax.random.uniform(key, (2, 8, 8, 16))
    up = layers.pixel_shuffle(x, 2)
    assert up.shape == (2, 16, 16, 4)
    back = layers.pixel_unshuffle(up, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_boundary_aware_prior(key):
    img = jnp.zeros((1, 16, 16, 1)).at[:, :, 8:, :].set(1.0)
    prior = layers.boundary_aware_prior(img, eps=0.05)
    assert prior.shape == img.shape
    assert float(jnp.sum(prior)) > 0  # edge detected
    assert set(np.unique(np.asarray(prior))) <= {0.0, 1.0}


def test_lfa_moe(key):
    """size= resizes + projects every expert (reference moe.py contract:
    without size, inputs must already share shape)."""
    feats = [jax.random.uniform(key, (1, 16, 16, 8)),
             jax.random.uniform(key, (1, 8, 8, 16))]
    mod = layers.LayeredFeatureAggregation(features=12, size=16)
    params = mod.init(jax.random.PRNGKey(0), feats)
    out = mod.apply(params, feats)
    assert out.shape == (1, 16, 16, 12)


# --- INR -------------------------------------------------------------------

@pytest.mark.parametrize("ltype", ["sine", "finer", "gauss", "gabor", "relu"])
def test_inr_layer_types(ltype):
    net = inr.INRNet(hidden_features=32, hidden_layers=1, out_features=3,
                     layer_type=ltype)
    coords = inr.coordinate_grid(8, 8)
    params = net.init(jax.random.PRNGKey(0), coords)
    out = net.apply(params, coords)
    assert out.shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pemlp():
    net = inr.INRNet(hidden_features=32, hidden_layers=1, out_features=1,
                     layer_type="relu", use_pe=True, n_freqs=4)
    coords = inr.coordinate_grid(4, 4)
    params = net.init(jax.random.PRNGKey(0), coords)
    assert net.apply(params, coords).shape == (16, 1)


def test_inr_can_overfit_tiny_image(key):
    """A SIREN must fit a tiny image in a few hundred steps (per-image mode)."""
    import optax
    img = jax.random.uniform(key, (8, 8, 3))
    coords = inr.coordinate_grid(8, 8)
    target = img.reshape(-1, 3)
    net = inr.INRNet(hidden_features=64, hidden_layers=1, out_features=3,
                     layer_type="sine", final_activation="sigmoid")
    params = net.init(jax.random.PRNGKey(1), coords)
    tx = optax.adam(1e-3)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return jnp.mean((net.apply(p, coords) - target) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state, loss

    loss0 = None
    for i in range(200):
        params, state, loss = step(params, state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 * 0.2


def test_coordinate_grid_range():
    g = inr.coordinate_grid(5, 7, flatten=False)
    assert g.shape == (5, 7, 2)
    assert float(g.min()) == -1.0 and float(g.max()) == 1.0


def test_context_window_features():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    f = inr.context_window_features(x, window=1)
    assert f.shape == (1, 4, 4, 9)
    # center tap equals the pixel itself
    np.testing.assert_allclose(np.asarray(f[..., 4]), np.asarray(x[..., 0]))


@pytest.mark.parametrize("c", [8, 96])
def test_dwconv3x3_impls_equivalent(c, rng):
    """shift and conv lowerings share params and agree to float precision,
    so the auto channel-threshold switch can never change results."""
    x = jnp.asarray(rng.uniform(-1, 1, (2, 9, 11, c)).astype(np.float32))
    m_s = layers.DWConv3x3(c, impl="shift")
    m_c = layers.DWConv3x3(c, impl="conv")
    v = m_s.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 1, c)
    y_s = m_s.apply(v, x)
    y_c = m_c.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_c),
                               atol=2e-6, rtol=1e-5)


def test_layered_feature_aggregation_reference_parity(rng):
    """First-party LFA MoE (nn/modules/moe.py:26-77, executed): per-expert
    resize+1x1, concat, conv-predicted per-pixel softmax gate, channel i
    weighting expert i. Batch 1 only — upstream's ``r[i] * w[:, i]``
    broadcast requires it."""
    import pytest as _pytest
    torch = _pytest.importorskip("torch")

    import jax

    from enhax.convert import refload
    from enhax.convert.torch_weights import convert_state_dict
    from enhax.nn.layers import LayeredFeatureAggregation

    if not refload.reference_available():
        _pytest.skip("reference tree not present")
    mod = refload.load_first_party("nn/modules/moe.py")

    torch.manual_seed(0)
    net = mod.LayeredFeatureAggregation(in_channels=[8, 12], out_channels=6,
                                        size=16)
    net.eval()
    f0 = torch.rand(1, 8, 8, 8)
    f1 = torch.rand(1, 12, 16, 16)
    with torch.no_grad():
        ref = net([f0, f1]).numpy().transpose(0, 2, 3, 1)

    m = LayeredFeatureAggregation(features=6, size=16)
    feats = [jnp.asarray(f0.numpy().transpose(0, 2, 3, 1)),
             jnp.asarray(f1.numpy().transpose(0, 2, 3, 1))]
    template = m.init(jax.random.PRNGKey(0), feats)
    name_map = {"linears.0": "proj0", "linears.1": "proj1", "conv": "gate"}
    params, report = convert_state_dict(net.state_dict(), template,
                                        name_map=name_map, strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, unmatched[:5]
    got = np.asarray(m.apply(params, feats))
    np.testing.assert_allclose(got, ref, atol=2e-5)
