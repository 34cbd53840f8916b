"""Activation-diff parity harness tests + HINet block conversion parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from enhax.convert.parity import (  # noqa: E402
    assert_parity, compare_activations, flax_activations, torch_activations,
)
from enhax.convert.torch_weights import convert_state_dict  # noqa: E402


class TorchBlock(tnn.Module):
    """Independent torch double-conv block (HINet UNetConvBlock shape)."""

    def __init__(self, cin=3, cout=8):
        super().__init__()
        self.conv_1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.conv_2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        self.identity = tnn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        y = F.leaky_relu(self.conv_1(x), 0.2)
        y = F.leaky_relu(self.conv_2(y), 0.2)
        return y + self.identity(x)


def test_activation_diff_detects_parity(rng):
    from flax import linen as nn

    class FlaxBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.leaky_relu(nn.Conv(8, (3, 3), name="conv_1")(x), 0.2)
            y = nn.leaky_relu(nn.Conv(8, (3, 3), name="conv_2")(y), 0.2)
            return y + nn.Conv(8, (1, 1), name="identity")(x)

    tm = TorchBlock()
    tm.eval()
    x = rng.uniform(0, 1, (1, 3, 12, 12)).astype(np.float32)

    fm = FlaxBlock()
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params, report = convert_state_dict(tm.state_dict(), template)
    assert not [r for r in report if "unmatched" in r]

    t_acts = torch_activations(tm, x)
    f_acts = flax_activations(fm, params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    rows = compare_activations(t_acts, f_acts)
    assert len(rows) >= 3
    assert_parity(rows, atol=1e-5)


def test_activation_diff_catches_mismatch(rng):
    """Corrupt one weight: the harness must localize the failure."""
    from flax import linen as nn

    class FlaxBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.leaky_relu(nn.Conv(8, (3, 3), name="conv_1")(x), 0.2)
            y = nn.leaky_relu(nn.Conv(8, (3, 3), name="conv_2")(y), 0.2)
            return y + nn.Conv(8, (1, 1), name="identity")(x)

    tm = TorchBlock()
    tm.eval()
    x = rng.uniform(0, 1, (1, 3, 12, 12)).astype(np.float32)
    fm = FlaxBlock()
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params, _ = convert_state_dict(tm.state_dict(), template)
    # corrupt conv_2
    params = jax.tree_util.tree_map_with_path(
        lambda kp, v: v + 0.5 if any(getattr(k, "key", "") == "conv_2" for k in kp) else v,
        params)
    rows = compare_activations(torch_activations(tm, x),
                               flax_activations(fm, params,
                                                jnp.asarray(x.transpose(0, 2, 3, 1))))
    worst = rows[0]
    assert worst["max_abs_err"] > 0.01
    assert "conv_2" in worst["layer"] or worst["layer"] == ""  # localized
    with pytest.raises(AssertionError):
        assert_parity(rows, atol=1e-4)
