"""End-to-end learning quality: training must improve PSNR vs doing nothing.

The only in-repo-verifiable quality target (BASELINE.md): enhancement models
must actually enhance. Synthetic protocol: darken clean images with a gamma
curve, train Zero-DCE with its zero-reference loss, and require the enhanced
held-out images to be closer to the clean originals than the dark inputs are.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhax.models.base import build_model
from enhax.nn.metrics import psnr
from enhax.train import Trainer


def _make_data(rng, n, size=32):
    # piecewise-smooth "scenes" so SPA/TV losses have structure to work with
    clean = []
    for _ in range(n):
        base = rng.uniform(0.3, 0.9, (3,))
        img = np.ones((size, size, 3), np.float32) * base
        for _ in range(4):
            y, x = rng.integers(0, size - 8, 2)
            img[y : y + 8, x : x + 8] = rng.uniform(0.2, 1.0, (3,))
        clean.append(img)
    clean = np.stack(clean).astype(np.float32)
    dark = np.clip(clean**2.8 * 0.7, 0, 1).astype(np.float32)  # gamma darkening
    return dark, clean


def test_zero_dce_training_improves_psnr(rng):
    dark, clean = _make_data(rng, n=8)
    test_dark, test_clean = _make_data(np.random.default_rng(99), n=4)

    m = build_model("zero_dce_re", num_channels=16)
    tr = Trainer(m, {"optimizer": {"name": "adam", "lr": 1e-3},
                     "grad_clip_norm": 0.1},
                 max_epochs=30, log_every_n_steps=1000)
    state = tr.fit(lambda: [{"image": dark}])

    out = m.apply(state.params, {"image": jnp.asarray(test_dark)})
    enhanced = jnp.clip(out["enhanced"], 0, 1)
    psnr_before = float(psnr(jnp.asarray(test_dark), jnp.asarray(test_clean)))
    psnr_after = float(psnr(enhanced, jnp.asarray(test_clean)))
    # zero-reference training must brighten toward the clean target
    assert psnr_after > psnr_before + 1.0, (psnr_before, psnr_after)


def test_supervised_training_improves_psnr(rng):
    """Supervised HINet-tiny overfits a paired set and generalizes the mapping."""
    dark, clean = _make_data(rng, n=8)
    m = build_model("hinet_re", num_channels=8, depth=2, in_pos_right=1)
    tr = Trainer(m, {"optimizer": {"name": "adam", "lr": 2e-3}},
                 max_epochs=40, log_every_n_steps=1000)
    state = tr.fit(lambda: [{"image": dark, "ref_image": clean}])
    out = m.apply(state.params, {"image": jnp.asarray(dark)})
    enhanced = jnp.clip(out["enhanced"], 0, 1)
    psnr_before = float(psnr(jnp.asarray(dark), jnp.asarray(clean)))
    psnr_after = float(psnr(enhanced, jnp.asarray(clean)))
    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)


def test_trainer_init_state_and_fit_with_batch_stats(rng):
    """Trainer.fit on a BatchNorm model: init_state must work (it reads
    self.precision whenever params carry batch_stats — ADVICE r3 high) and
    the running stats must update on the f32 plain-loss path."""
    import flax.linen as nn
    import optax

    from enhax.models.base import Model

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = nn.Conv(3, (3, 3), padding="SAME")(x)
            return {"enhanced": x}

    m = Model(name="tiny_bn", arch="test", module=TinyBN(),
              loss_fn=lambda out, dp: optax.l2_loss(
                  out["enhanced"], dp["ref_image"]).mean())
    dark, clean = _make_data(rng, n=4, size=16)
    tr = Trainer(m, {"optimizer": {"name": "adam", "lr": 1e-3}},
                 max_epochs=2, log_every_n_steps=1000)
    # exercises init_state directly (state=None path)
    state = tr.fit(lambda: [{"image": dark, "ref_image": clean}])
    assert "batch_stats" in state.params
    mean = state.params["batch_stats"]["BatchNorm_0"]["mean"]
    assert float(jnp.abs(mean).max()) > 0  # running stats actually updated
    # optimizer state covers trainable leaves only (no batch_stats)
    flat = jax.tree_util.tree_leaves(state.opt_state)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat if hasattr(l, "shape"))
    # EMA on a BN model: buffers are copied, not blended (ADVICE r3 low)
    tr2 = Trainer(m, {"optimizer": {"name": "adam", "lr": 1e-3}},
                  max_epochs=1, log_every_n_steps=1000, ema_decay=0.9)
    st2 = tr2.fit(lambda: [{"image": dark, "ref_image": clean}])
    np.testing.assert_array_equal(
        np.asarray(st2.ema["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(st2.params["batch_stats"]["BatchNorm_0"]["mean"]))
