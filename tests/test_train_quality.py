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
