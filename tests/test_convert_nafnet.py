"""NAFNet torch->flax full-model conversion parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from enhax.convert.mappings import nafnet_name_map
from enhax.convert.torch_weights import convert_state_dict
from enhax.models.base import build_model


class TLayerNorm2d(tnn.Module):
    """NAFNet's channel LayerNorm (weight/bias over C)."""

    def __init__(self, c):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(c))
        self.bias = tnn.Parameter(torch.zeros(c))

    def forward(self, x):
        mu = x.mean(1, keepdim=True)
        var = x.var(1, keepdim=True, unbiased=False)
        y = (x - mu) / torch.sqrt(var + 1e-6)
        return y * self.weight[None, :, None, None] + self.bias[None, :, None, None]


class TNAFBlock(tnn.Module):
    def __init__(self, c, dw=2, ffn=2):
        super().__init__()
        d = c * dw
        self.norm1 = TLayerNorm2d(c)
        self.conv1 = tnn.Conv2d(c, d, 1)
        self.conv2 = tnn.Conv2d(d, d, 3, 1, 1, groups=d)
        self.sca = tnn.Conv2d(d // 2, d // 2, 1)
        self.conv3 = tnn.Conv2d(d // 2, c, 1)
        self.norm2 = TLayerNorm2d(c)
        self.conv4 = tnn.Conv2d(c, c * ffn, 1)
        self.conv5 = tnn.Conv2d(c * ffn // 2, c, 1)
        self.beta = tnn.Parameter(torch.zeros(1, c, 1, 1))
        self.gamma = tnn.Parameter(torch.zeros(1, c, 1, 1))

    @staticmethod
    def sg(x):
        a, b = x.chunk(2, dim=1)
        return a * b

    def forward(self, x):
        y = self.norm1(x)
        y = self.conv2(self.conv1(y))
        y = self.sg(y)
        y = y * self.sca(torch.nn.functional.adaptive_avg_pool2d(y, 1))
        y = self.conv3(y)
        x = x + y * self.beta
        y = self.norm2(x)
        y = self.sg(self.conv4(y))
        y = self.conv5(y)
        return x + y * self.gamma


class TNAFNet(tnn.Module):
    def __init__(self, width=8, enc=(1, 1), mid=1, dec=(1, 1)):
        super().__init__()
        self.intro = tnn.Conv2d(3, width, 3, 1, 1)
        self.ending = tnn.Conv2d(width, 3, 3, 1, 1)
        self.encoders = tnn.ModuleList()
        self.downs = tnn.ModuleList()
        c = width
        for n in enc:
            self.encoders.append(tnn.ModuleList([TNAFBlock(c) for _ in range(n)]))
            self.downs.append(tnn.Conv2d(c, c * 2, 2, 2))
            c *= 2
        self.middle_blks = tnn.ModuleList([TNAFBlock(c) for _ in range(mid)])
        self.ups = tnn.ModuleList()
        self.decoders = tnn.ModuleList()
        for n in dec:
            self.ups.append(tnn.ModuleList([tnn.Conv2d(c, c * 2, 1, bias=False)]))
            c //= 2
            self.decoders.append(tnn.ModuleList([TNAFBlock(c) for _ in range(n)]))

    def forward(self, x):
        inp = x
        y = self.intro(x)
        skips = []
        for blocks, down in zip(self.encoders, self.downs):
            for b in blocks:
                y = b(y)
            skips.append(y)
            y = down(y)
        for b in self.middle_blks:
            y = b(y)
        for i, (up, blocks) in enumerate(zip(self.ups, self.decoders)):
            y = up[0](y)
            y = torch.nn.functional.pixel_shuffle(y, 2)
            y = y + skips[-(i + 1)]
            for b in blocks:
                y = b(y)
        return self.ending(y) + inp


def test_full_nafnet_conversion_parity(rng):
    tm = TNAFNet(width=8, enc=(1, 1), mid=1, dec=(1, 1))
    tm.eval()
    x = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    m = build_model("nafnet", width=8, middle_blk_num=1,
                    enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    dp = {"image": jnp.asarray(x.transpose(0, 2, 3, 1))}
    template = m.init(jax.random.PRNGKey(0), dp)
    nm = nafnet_name_map(enc_blk_nums=(1, 1), middle_blk_num=1,
                         dec_blk_nums=(1, 1))
    params, report = convert_state_dict(tm.state_dict(), template,
                                        name_map=nm, strict=True)
    unmatched = [r for r in report if "unmatched" in r]
    assert not unmatched, unmatched[:8]
    out = m.apply(params, dp)
    np.testing.assert_allclose(
        np.asarray(out["enhanced"]).transpose(0, 3, 1, 2), y_t, atol=5e-5)
