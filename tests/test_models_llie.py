"""Model forward + train-step tests for the LLIE families."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import enhax
from enhax.models.base import build_model


@pytest.fixture
def datapoint(rng):
    return {
        "image": jnp.asarray(rng.uniform(0, 0.3, (1, 32, 32, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)),
    }


def test_zero_dce_registered():
    assert "zero_dce_re" in enhax.MODELS
    assert "zero_dce++_re" in enhax.MODELS
    assert "zero_dcepp_re" in enhax.MODELS  # alias
    assert "zero_dce" in enhax.MODELS.archs


def test_zero_dce_forward(datapoint):
    m = build_model("zero_dce_re")
    params = m.init(jax.random.PRNGKey(0), datapoint)
    out = m.apply(params, datapoint)
    assert out["enhanced"].shape == (1, 32, 32, 3)
    assert out["adjust"].shape == (1, 32, 32, 24)  # 8 iters x 3 ch
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))


def test_zero_dce_param_count(datapoint):
    """Reference Zero-DCE is ~79K params (BASELINE.md config 1)."""
    m = build_model("zero_dce_re")
    params = m.init(jax.random.PRNGKey(0), datapoint)
    n = m.param_count(params)
    assert 75_000 < n < 85_000, n


def test_zero_dcepp_shared_curve(datapoint):
    m = build_model("zero_dce++_re", scale_factor=2.0)
    params = m.init(jax.random.PRNGKey(0), datapoint)
    out = m.apply(params, datapoint)
    assert out["adjust"].shape == (1, 32, 32, 3)  # single shared curve
    assert out["enhanced"].shape == (1, 32, 32, 3)


def test_zero_dce_loss_and_grads(datapoint):
    m = build_model("zero_dce_re")
    params = m.init(jax.random.PRNGKey(0), datapoint)
    loss, outputs = m.forward_loss(params, datapoint)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: m.forward_loss(p, datapoint)[0])(params)
    gnorm = optax.global_norm(grads)
    assert float(gnorm) > 0


def test_zero_dce_train_overfit(datapoint):
    """One-batch overfit: loss must drop (end-to-end training slice)."""
    from enhax.train import Trainer
    m = build_model("zero_dce_re", num_channels=8)
    tr = Trainer(m, {"optimizer": {"name": "adam", "lr": 1e-3}}, max_epochs=1)
    state = tr.init_state(datapoint)
    step = tr._train_step
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        state, metrics = step(state, datapoint, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_gcenet_forward(datapoint):
    m = build_model("gcenet")
    params = m.init(jax.random.PRNGKey(0), datapoint)
    out = m.apply(params, datapoint)
    assert out["enhanced"].shape == (1, 32, 32, 3)
    assert out["adjust"].shape == (1, 32, 32, 3)


def test_gcenet_no_depth(datapoint):
    m = build_model("gcenet", use_depth=False)
    dp = {"image": datapoint["image"]}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["enhanced"].shape == (1, 32, 32, 3)


def test_gcenet_zsn2n_loss(datapoint):
    m = build_model("gcenet_zsn2n")
    params = m.init(jax.random.PRNGKey(0), datapoint)
    loss, out = m.forward_loss(params, datapoint)
    assert np.isfinite(float(loss))


def test_zsn2n_forward_and_loss(datapoint):
    m = build_model("zsn2n")
    dp = {"image": datapoint["image"]}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["enhanced"].shape == dp["image"].shape
    loss, _ = m.forward_loss(params, dp)
    assert np.isfinite(float(loss))


def test_tv_denoise(datapoint):
    m = build_model("tv_denoise", num_iters=10)
    noisy = jnp.clip(datapoint["image"] +
                     0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                             datapoint["image"].shape), 0, 1)
    dp = {"image": noisy}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    # denoised should be smoother
    tv = lambda x: float(jnp.mean(jnp.abs(x[..., 1:, :, :] - x[..., :-1, :, :])))
    assert tv(out["enhanced"]) < tv(noisy)


def test_datapoint_contract(datapoint):
    m = build_model("zero_dce_re")
    with pytest.raises(ValueError, match="requires datapoint key"):
        m.assert_datapoint({"wrong": 1})
    m.assert_datapoint(datapoint)
