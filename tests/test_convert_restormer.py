"""Restormer block torch->flax conversion parity (MDTA + GDFN)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from enhax.convert.torch_weights import convert_state_dict


class TMDTA(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.temperature = tnn.Parameter(torch.ones(heads, 1, 1))
        self.qkv = tnn.Conv2d(dim, dim * 3, 1, bias=False)
        self.qkv_dw = tnn.Conv2d(dim * 3, dim * 3, 3, 1, 1, groups=dim * 3, bias=False)
        self.project_out = tnn.Conv2d(dim, dim, 1, bias=False)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv_dw(self.qkv(x))
        q, k, v = qkv.chunk(3, dim=1)
        hd = c // self.heads
        def heads(t):
            return t.reshape(b, self.heads, hd, h * w)
        q, k, v = heads(q), heads(k), heads(v)
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        out = attn @ v
        out = out.reshape(b, c, h, w)
        return self.project_out(out)


class TGDFN(tnn.Module):
    def __init__(self, dim, expansion=2.0):
        super().__init__()
        hidden = int(dim * expansion)
        self.project_in = tnn.Conv2d(dim, hidden * 2, 1, bias=False)
        self.dwconv = tnn.Conv2d(hidden * 2, hidden * 2, 3, 1, 1,
                                 groups=hidden * 2, bias=False)
        self.project_out = tnn.Conv2d(hidden, dim, 1, bias=False)

    def forward(self, x):
        a, b = self.dwconv(self.project_in(x)).chunk(2, dim=1)
        return self.project_out(F.gelu(a) * b)


def _nhwc(a):
    return jnp.asarray(a.transpose(0, 2, 3, 1))


def test_mdta_conversion_parity(rng):
    from enhax.models.multitask.restormer import MDTA
    tm = TMDTA(16, 4)
    tm.eval()
    x = rng.uniform(0, 1, (1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()
    fm = MDTA(16, 4)
    template = fm.init(jax.random.PRNGKey(0), _nhwc(x))
    params, report = convert_state_dict(tm.state_dict(), template)
    assert not [r for r in report if "unmatched" in r], report[:6]
    y_f = np.asarray(fm.apply(params, _nhwc(x)))
    np.testing.assert_allclose(y_f.transpose(0, 3, 1, 2), y_t, atol=2e-5)


def test_gdfn_conversion_parity(rng):
    from enhax.models.multitask.restormer import GDFN
    tm = TGDFN(16, 2.0)
    tm.eval()
    x = rng.uniform(0, 1, (1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()
    fm = GDFN(16, 2.0)
    template = fm.init(jax.random.PRNGKey(0), _nhwc(x))
    params, report = convert_state_dict(tm.state_dict(), template)
    assert not [r for r in report if "unmatched" in r], report[:6]
    y_f = np.asarray(fm.apply(params, _nhwc(x)))
    np.testing.assert_allclose(y_f.transpose(0, 3, 1, 2), y_t, atol=2e-5)
