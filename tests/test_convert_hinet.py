"""HINet torch->flax conversion parity (full two-stage model)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from enhax.convert.torch_weights import convert_state_dict
from enhax.models.base import build_model


class TBlock(tnn.Module):
    """Independent torch HIN conv block matching the published architecture."""

    def __init__(self, cin, cout, downsample, use_csff=False, use_hin=False):
        super().__init__()
        self.downsample_flag = downsample
        self.use_hin = use_hin
        self.use_csff = use_csff
        self.identity = tnn.Conv2d(cin, cout, 1, 1, 0)
        self.conv_1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.conv_2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        if use_hin:
            self.norm = tnn.InstanceNorm2d(cout // 2, affine=True)
        if downsample and use_csff:
            self.csff_enc = tnn.Conv2d(cout, cout, 3, 1, 1)
            self.csff_dec = tnn.Conv2d(cout, cout, 3, 1, 1)
        if downsample:
            self.down = tnn.Conv2d(cout, cout, 4, 2, 1, bias=False)

    def forward(self, x, enc=None, dec=None):
        y = self.conv_1(x)
        if self.use_hin:
            y1, y2 = torch.chunk(y, 2, dim=1)
            y = torch.cat([self.norm(y1), y2], dim=1)
        y = F.leaky_relu(y, 0.2)
        y = F.leaky_relu(self.conv_2(y), 0.2)
        y = y + self.identity(x)
        if enc is not None and dec is not None:
            y = y + self.csff_enc(enc) + self.csff_dec(dec)
        if self.downsample_flag:
            return self.down(y), y
        return y


def test_hin_block_conversion_parity(rng):
    """One HIN block (with instance norm) converts bit-close."""
    from enhax.models.multitask.hinet import HINConvBlock
    tm = TBlock(3, 8, downsample=False, use_hin=True)
    tm.eval()
    x = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    fm = HINConvBlock(8, downsample=False, use_hin=True)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params, report = convert_state_dict(tm.state_dict(), template)
    unmatched = [r for r in report if "unmatched" in r]
    assert not unmatched, unmatched
    y_f = np.asarray(fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(y_f.transpose(0, 3, 1, 2), y_t, atol=1e-5)


def test_hin_block_downsample_csff_parity(rng):
    from enhax.models.multitask.hinet import HINConvBlock
    tm = TBlock(8, 8, downsample=True, use_csff=True, use_hin=True)
    tm.eval()
    x = rng.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32)
    enc = rng.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32)
    dec = rng.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        yd_t, y_t = tm(torch.from_numpy(x), torch.from_numpy(enc),
                       torch.from_numpy(dec))

    fm = HINConvBlock(8, downsample=True, use_csff=True, use_hin=True)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    template = fm.init(jax.random.PRNGKey(0), nhwc(x), nhwc(enc), nhwc(dec))
    params, report = convert_state_dict(tm.state_dict(), template)
    assert not [r for r in report if "unmatched" in r]
    yd_f, y_f = fm.apply(params, nhwc(x), nhwc(enc), nhwc(dec))
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(yd_f).transpose(0, 3, 1, 2), yd_t.numpy(),
                               atol=1e-5)
