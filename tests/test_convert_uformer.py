"""Uformer/Swin WindowAttention torch->flax conversion parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from enhax.convert.torch_weights import convert_state_dict
from enhax.nn.layers import WindowAttention


class TWindowAttention(tnn.Module):
    """Swin-convention window MSA over an already-partitioned window batch."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.rel_pos_bias = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
        diff = coords[:, :, None] - coords[:, None, :] + (ws - 1)
        self.register_buffer("idx", diff[0] * (2 * ws - 1) + diff[1])

    def forward(self, x):  # x: (B, N=ws*ws, C)
        B, N, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        attn = attn + self.rel_pos_bias[self.idx].permute(2, 0, 1)[None]
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


def test_window_attention_conversion_parity(rng):
    dim, heads, ws = 16, 4, 4
    tm = TWindowAttention(dim, heads, ws)
    tm.eval()
    # one image = one window (8x8 with ws=4 -> 4 windows handled identically)
    x_img = rng.uniform(0, 1, (1, ws, ws, dim)).astype(np.float32)
    x_tokens = torch.from_numpy(x_img.reshape(1, ws * ws, dim))
    with torch.no_grad():
        y_t = tm(x_tokens).numpy().reshape(1, ws, ws, dim)

    fm = WindowAttention(dim, heads, window_size=ws)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_img))
    params, report = convert_state_dict(tm.state_dict(), template)
    assert not [r for r in report if "unmatched" in r], report[:6]
    y_f = np.asarray(fm.apply(params, jnp.asarray(x_img)))
    np.testing.assert_allclose(y_f, y_t, atol=2e-5)
