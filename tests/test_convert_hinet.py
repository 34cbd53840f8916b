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


class TorchHINet(tnn.Module):
    """Independent full two-stage HINet (published architecture, depth=3)."""

    def __init__(self, c=8, depth=3):
        super().__init__()
        self.depth = depth
        self.conv_01 = tnn.Conv2d(3, c, 3, 1, 1)
        self.conv_02 = tnn.Conv2d(3, c, 3, 1, 1)
        self.down_path_1 = tnn.ModuleList()
        self.down_path_2 = tnn.ModuleList()
        prev = c
        for i in range(depth):
            down = (i + 1) < depth
            self.down_path_1.append(TBlock(prev, (2**i) * c, down, use_hin=True))
            self.down_path_2.append(TBlock(prev, (2**i) * c, down,
                                           use_csff=down, use_hin=True))
            prev = (2**i) * c
        self.up_path_1 = tnn.ModuleList()
        self.up_path_2 = tnn.ModuleList()
        self.skip_conv_1 = tnn.ModuleList()
        self.skip_conv_2 = tnn.ModuleList()
        for i in reversed(range(depth - 1)):
            self.up_path_1.append(TUp(prev, (2**i) * c))
            self.up_path_2.append(TUp(prev, (2**i) * c))
            self.skip_conv_1.append(tnn.Conv2d((2**i) * c, (2**i) * c, 3, 1, 1))
            self.skip_conv_2.append(tnn.Conv2d((2**i) * c, (2**i) * c, 3, 1, 1))
            prev = (2**i) * c
        self.sam12 = TSAM(prev)
        self.cat12 = tnn.Conv2d(prev * 2, prev, 1, 1, 0)
        self.last = tnn.Conv2d(prev, 3, 3, 1, 1)

    def forward(self, x):
        x1 = self.conv_01(x)
        encs, decs = [], []
        for i, down in enumerate(self.down_path_1):
            if (i + 1) < self.depth:
                x1, up = down(x1)
                encs.append(up)
            else:
                x1 = down(x1)
        for i, up in enumerate(self.up_path_1):
            x1 = up(x1, self.skip_conv_1[i](encs[-i - 1]))
            decs.append(x1)
        sam_feats, y1 = self.sam12(x1, x)
        x2 = self.conv_02(x)
        x2 = self.cat12(torch.cat([x2, sam_feats], 1))
        blocks = []
        for i, down in enumerate(self.down_path_2):
            if (i + 1) < self.depth:
                x2, up = down(x2, encs[i], decs[-i - 1])
                blocks.append(up)
            else:
                x2 = down(x2)
        for i, up in enumerate(self.up_path_2):
            x2 = up(x2, self.skip_conv_2[i](blocks[-i - 1]))
        return self.last(x2) + x, y1


class TUp(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = tnn.ConvTranspose2d(cin, cout, 2, 2, bias=True)
        self.conv_block = TBlock(cin, cout, False)

    def forward(self, x, bridge):
        y = self.up(x)
        return self.conv_block(torch.cat([y, bridge], 1))


class TSAM(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 3, 1, 1)
        self.conv2 = tnn.Conv2d(c, 3, 3, 1, 1)
        self.conv3 = tnn.Conv2d(3, c, 3, 1, 1)

    def forward(self, x, x_img):
        x1 = self.conv1(x)
        img = self.conv2(x) + x_img
        return x1 * torch.sigmoid(self.conv3(img)) + x, img


def test_full_hinet_conversion_parity(rng):
    """Full two-stage HINet converts end-to-end with the published-name map."""
    from enhax.convert.mappings import hinet_name_map
    from enhax.models.base import build_model

    tm = TorchHINet(c=8, depth=3)
    tm.eval()
    x = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        y2_t, y1_t = tm(torch.from_numpy(x))

    m = build_model("hinet_re", num_channels=8, depth=3, in_pos_right=2)
    dp = {"image": jnp.asarray(x.transpose(0, 2, 3, 1))}
    template = m.init(jax.random.PRNGKey(0), dp)
    params, report = convert_state_dict(
        tm.state_dict(), template, name_map=hinet_name_map(depth=3), strict=True)
    unmatched = [r for r in report if "unmatched" in r]
    assert not unmatched, unmatched[:8]

    out = m.apply(params, dp)
    np.testing.assert_allclose(
        np.asarray(out["enhanced"]).transpose(0, 3, 1, 2), y2_t.numpy(), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out["stage1"]).transpose(0, 3, 1, 2), y1_t.numpy(), atol=5e-5)
