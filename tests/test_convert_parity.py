"""Torch->JAX weight conversion + numerical parity tests.

The torch side builds the public Zero-DCE architecture independently (7
convs, U-skips, tanh curves — per the Zero-DCE paper) so converted outputs
can be compared bit-close against the enhax forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from enhax.convert.torch_weights import convert_state_dict, torch_to_flax_array  # noqa: E402
from enhax.models.base import build_model  # noqa: E402


class TorchDCE(tnn.Module):
    """Independent torch Zero-DCE (paper architecture) for parity checking."""

    def __init__(self, ch=32, n_iter=8):
        super().__init__()
        self.n_iter = n_iter
        self.e_conv1 = tnn.Conv2d(3, ch, 3, 1, 1)
        self.e_conv2 = tnn.Conv2d(ch, ch, 3, 1, 1)
        self.e_conv3 = tnn.Conv2d(ch, ch, 3, 1, 1)
        self.e_conv4 = tnn.Conv2d(ch, ch, 3, 1, 1)
        self.e_conv5 = tnn.Conv2d(ch * 2, ch, 3, 1, 1)
        self.e_conv6 = tnn.Conv2d(ch * 2, ch, 3, 1, 1)
        self.e_conv7 = tnn.Conv2d(ch * 2, 3 * n_iter, 3, 1, 1)

    def forward(self, x):
        x1 = F.relu(self.e_conv1(x))
        x2 = F.relu(self.e_conv2(x1))
        x3 = F.relu(self.e_conv3(x2))
        x4 = F.relu(self.e_conv4(x3))
        x5 = F.relu(self.e_conv5(torch.cat([x3, x4], 1)))
        x6 = F.relu(self.e_conv6(torch.cat([x2, x5], 1)))
        r = torch.tanh(self.e_conv7(torch.cat([x1, x6], 1)))
        y = x
        for i in range(self.n_iter):
            ri = r[:, i * 3:(i + 1) * 3]
            y = y + ri * (y * y - y)
        return y, r


def test_torch_to_flax_array_conv():
    a = np.arange(2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3)  # OIHW
    out = torch_to_flax_array("w", a, (3, 3, 3, 2))  # HWIO
    assert out.shape == (3, 3, 3, 2)
    np.testing.assert_array_equal(out[0, 0, :, 0], a[0, :, 0, 0])


def test_torch_to_flax_array_linear():
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = torch_to_flax_array("w", a, (3, 2))
    np.testing.assert_array_equal(out, a.T)


def test_zero_dce_conversion_parity(rng):
    tm = TorchDCE()
    tm.eval()
    x = rng.uniform(0, 0.5, (1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_t, r_t = tm(torch.from_numpy(x))

    m = build_model("zero_dce_re")
    dp = {"image": jnp.asarray(x.transpose(0, 2, 3, 1))}
    template = m.init(jax.random.PRNGKey(0), dp)
    params, report = convert_state_dict(tm.state_dict(), template)
    unmatched = [r for r in report if "unmatched" in r]
    assert not unmatched, unmatched

    out = m.apply(params, dp)
    y_j = np.asarray(out["enhanced"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y_j, y_t.numpy(), atol=2e-5)


def test_partial_conversion_reports_unused(rng):
    """Extra torch entries are reported, not fatal (intersection semantics)."""
    tm = TorchDCE()
    sd = dict(tm.state_dict())
    sd["classifier.weight"] = torch.zeros(10, 5)
    m = build_model("zero_dce_re")
    dp = {"image": jnp.zeros((1, 16, 16, 3))}
    template = m.init(jax.random.PRNGKey(0), dp)
    params, report = convert_state_dict(sd, template)
    assert any("unused torch entry: classifier.weight" in r for r in report)


class TorchBNBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv2d(3, 8, 3, 1, 1, bias=False)
        self.bn = tnn.BatchNorm2d(8)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def test_batchnorm_stats_conversion(rng):
    """Running mean/var must convert into flax batch_stats (eval parity)."""
    from flax import linen as nn

    class FlaxBNBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), use_bias=False, name="conv")(x)
            x = nn.BatchNorm(use_running_average=True, name="bn")(x)
            return nn.relu(x)

    tm = TorchBNBlock()
    # give BN non-trivial running stats
    tm.train()
    with torch.no_grad():
        for _ in range(5):
            tm(torch.from_numpy(rng.uniform(0, 1, (4, 3, 8, 8)).astype(np.float32)))
    tm.eval()
    x = rng.uniform(0, 1, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    fm = FlaxBNBlock()
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params, report = convert_state_dict(tm.state_dict(), template)
    assert not [r for r in report if "unmatched" in r], report
    y_f = np.asarray(fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(y_f.transpose(0, 3, 1, 2), y_t, atol=1e-5)
