"""Reference-executed parity for the full Depth Pro architecture.

Runs the vendored DepthProEncoder / MultiresConvDecoder / FOVNetwork
(mon_extra/vision/depth/depth_pro/src/depth_pro/network/) at the REAL
pyramid geometry (1536 -> 5x5+3x3+1 patches of 384, g=24 feature grids,
merge paddings 3/6) with a tiny timm-style DINOv2 ViT backbone (the real
backbone is timm's vit_large_patch14_dinov2, which only differs in
dims), and asserts the enhax DepthProModule reproduces canonical inverse
depth + fov end-to-end after weight conversion.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from enhax.constants import MODELS  # noqa: E402
from enhax.convert import refload  # noqa: E402
from enhax.convert.torch_weights import convert_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refload.reference_available(), reason="reference tree not present")


class _Attn(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1) * hd ** -0.5).softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(y)


class _LayerScale(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = torch.nn.Parameter(torch.full((dim,), 1e-5))

    def forward(self, x):
        return x * self.gamma


class _Mlp(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim, dim * 4)
        self.fc2 = torch.nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class _Block(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attn(dim, heads)
        self.ls1 = _LayerScale(dim)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)
        self.ls2 = _LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class _PatchEmbed(torch.nn.Module):
    def __init__(self, dim, patch, img_size):
        super().__init__()
        self.img_size = (img_size, img_size)
        self.patch_size = (patch, patch)
        self.proj = torch.nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class MiniViT(torch.nn.Module):
    """timm-naming DINOv2-style ViT (the interface DepthProEncoder uses:
    embed_dim, patch_embed.img_size/patch_size, blocks for hooks)."""

    def __init__(self, dim=32, depth=2, heads=2, patch=16, img_size=384):
        super().__init__()
        self.embed_dim = dim
        self.patch_embed = _PatchEmbed(dim, patch, img_size)
        g = img_size // patch
        self.cls_token = torch.nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, g * g + 1, dim) * 0.02)
        self.blocks = torch.nn.ModuleList(
            [_Block(dim, heads) for _ in range(depth)])
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        y = self.patch_embed(x)
        cls = self.cls_token.expand(y.shape[0], -1, -1)
        y = torch.cat([cls, y], dim=1) + self.pos_embed
        for blk in self.blocks:
            y = blk(y)
        return self.norm(y)


def _vit_map(prefix_t, prefix_f):
    return {f"{prefix_t}.patch_embed.proj.": f"{prefix_f}.patch_embed.",
            f"{prefix_t}.cls_token": f"{prefix_f}.cls_token",
            f"{prefix_t}.pos_embed": f"{prefix_f}.pos_embed",
            f"{prefix_t}.norm.": f"{prefix_f}.norm.",
            f"{prefix_t}.blocks.0.": f"{prefix_f}.block0.",
            f"{prefix_t}.blocks.1.": f"{prefix_f}.block1."}


@pytest.mark.slow
def test_depth_pro_reference_parity():
    import jax
    import jax.numpy as jnp

    enc_m = refload.load_vendored("vision/depth/depth_pro/src",
                                  "depth_pro.network.encoder")
    dec_m = refload.load_vendored("vision/depth/depth_pro/src",
                                  "depth_pro.network.decoder")
    fov_m = refload.load_vendored("vision/depth/depth_pro/src",
                                  "depth_pro.network.fov")

    DIM, DEPTH, HEADS = 32, 2, 2
    DIMS_ENC = [16, 16, 32, 32]
    DEC = 16
    torch.manual_seed(0)
    patch_vit = MiniViT(DIM, DEPTH, HEADS)
    image_vit = MiniViT(DIM, DEPTH, HEADS)
    fov_vit = MiniViT(DIM, DEPTH, HEADS)
    encoder = enc_m.DepthProEncoder(
        dims_encoder=DIMS_ENC, patch_encoder=patch_vit,
        image_encoder=image_vit, hook_block_ids=[0, 1],
        decoder_features=DEC)
    decoder = dec_m.MultiresConvDecoder(dims_encoder=[DEC] + DIMS_ENC,
                                        dim_decoder=DEC)
    head = torch.nn.Sequential(
        torch.nn.Conv2d(DEC, DEC // 2, 3, padding=1),
        torch.nn.ConvTranspose2d(DEC // 2, DEC // 2, 2, stride=2),
        torch.nn.Conv2d(DEC // 2, 32, 3, padding=1),
        torch.nn.ReLU(True),
        torch.nn.Conv2d(32, 1, 1),
        torch.nn.ReLU(),
    )
    fov = fov_m.FOVNetwork(num_features=DEC, fov_encoder=fov_vit)
    for m_ in (encoder, decoder, head, fov):
        m_.eval()

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 1536, 1536, 3)).astype(np.float32)
    xt = torch.from_numpy((img * 2 - 1).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        encodings = encoder(xt)
        feats, lowres = decoder(encodings)
        canon = head(feats)
        fov_deg = fov(xt, lowres)
    ref_inv = canon.numpy()[:, 0]
    ref_fov = float(fov_deg.reshape(-1)[0])

    sd = {}
    for p, m_ in (("encoder.", encoder), ("decoder.", decoder),
                  ("head.", head), ("fov.", fov)):
        sd.update({p + k: v for k, v in m_.state_dict().items()})

    # name map
    nm = {}
    for vit_name in ("patch_encoder", "image_encoder"):
        nm.update(_vit_map(f"encoder.{vit_name}", f"encoder.{vit_name}"))
    nm.update(_vit_map("fov.encoder.0", "fov_encoder"))
    nm["fov.encoder.1."] = "fov_proj."
    nm["fov.downsample.0."] = "fov_down."
    nm["fov.head.0."] = "fov_head0."
    nm["fov.head.2."] = "fov_head1."
    nm["fov.head.4."] = "fov_head2."
    for name, ups in (("upsample_latent0", 3), ("upsample_latent1", 2),
                      ("upsample0", 1), ("upsample1", 1), ("upsample2", 1)):
        nm[f"encoder.{name}.0."] = f"encoder.{name}.proj."
        for u in range(ups):
            nm[f"encoder.{name}.{u + 1}."] = f"encoder.{name}.up{u}."
    for i in range(5):
        nm[f"decoder.convs.{i}."] = f"decoder.conv{i}."
        nm[f"decoder.fusions.{i}."] = f"decoder.fusion{i}."
    nm["head.0."] = "head0."
    nm["head.1."] = "head1."
    nm["head.2."] = "head2."
    nm["head.4."] = "head4."
    nm["*.attn.qkv."] = ".qkv."
    nm["*.attn.proj."] = ".proj."
    nm["*.mlp.fc1."] = ".fc1."
    nm["*.mlp.fc2."] = ".fc2."
    nm["*.ls1.gamma"] = ".ls1"
    nm["*.ls2.gamma"] = ".ls2"
    nm["*.residual.1."] = ".conv1."
    nm["*.residual.3."] = ".conv2."

    model = MODELS.build("depth_pro", vit_dim=DIM, vit_depth=DEPTH,
                         vit_heads=HEADS, backbone_size=384, patch=16,
                         decoder_features=DEC, dims_encoder=tuple(DIMS_ENC),
                         hook_ids=(0, 1))
    dp = {"image": jnp.asarray(img)}
    template = model.init(jax.random.PRNGKey(0), dp)
    params, report = convert_state_dict(sd, template, name_map=nm,
                                        strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, f"unconverted leaves: {unmatched[:12]}"
    out = model.apply(params, dp)
    got_inv = np.asarray(out["inverse_depth"])[..., 0]
    got_fov = float(out["fov_deg"][0])
    # compare canonical inverse depth pre-fov-scaling: undo the W/f_px scale
    f_px = 0.5 * 1536 / np.tan(0.5 * np.deg2rad(got_fov))
    got_canon = got_inv / (1536 / f_px)
    assert abs(ref_fov - got_fov) <= 1e-3, (ref_fov, got_fov)
    err = float(np.max(np.abs(ref_inv - got_canon)))
    assert err <= 1e-3, f"depth_pro canonical inv depth max err {err:.2e}"


@pytest.mark.slow
def test_mobile_sam_tinyvit_reference_parity():
    """Vendored TinyViT-5M (MobileSAM image encoder) vs enhax, through
    patch-embed/MBConv/window-attention stages + SAM neck. timm is not
    installed; its DropPath/to_2tuple/trunc_normal_ are stubbed (all are
    identity at eval)."""
    import types as _types
    import jax
    import jax.numpy as jnp
    from enhax.convert.mappings import tinyvit_name_map
    from enhax.models.segment.mobile_sam import TinyViT

    timm = _types.ModuleType("timm")
    timm.models = _types.ModuleType("timm.models")
    layers = _types.ModuleType("timm.models.layers")

    class _DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.DropPath = _DropPath
    layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    layers.trunc_normal_ = lambda t, std=0.02: t.data.normal_(0, std)
    registry = _types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    stubs = {"timm": timm, "timm.models": timm.models,
             "timm.models.layers": layers, "timm.models.registry": registry}
    tv = refload.load_vendored("vision/segment/mobile_sam",
                               "mobile_sam.modeling.tiny_vit_sam",
                               extra_stubs=stubs)
    torch.manual_seed(0)
    net = tv.TinyViT(img_size=128, in_chans=3, num_classes=0,
                     embed_dims=[64, 128, 160, 320], depths=[2, 2, 6, 2],
                     num_heads=[2, 4, 5, 10], window_sizes=[7, 7, 14, 7],
                     drop_path_rate=0.0)
    # give the zero-init attention biases signal BEFORE eval() — eval
    # caches the expanded bias (tiny_vit_sam.py:252-259)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "attention_biases" in name:
                p.add_(torch.randn_like(p) * 0.1)
    net.eval()
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        # forward_features hard-codes the img1024 64x64 grid
        # (tiny_vit_sam.py:610); run the stages + neck directly
        y = net.patch_embed(x)
        for layer in net.layers:
            y = layer(y)
        b, L, c = y.shape
        g = int(L ** 0.5)
        y = y.view(b, g, g, c).permute(0, 3, 1, 2)
        ref = net.neck(y).numpy().transpose(0, 2, 3, 1)

    fmod = TinyViT()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    template = fmod.init(jax.random.PRNGKey(0), xj)
    params, report = convert_state_dict(net.state_dict(), template,
                                        name_map=tinyvit_name_map(),
                                        strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, f"unconverted: {unmatched[:10]}"
    got = np.asarray(fmod.apply(params, xj))
    err = float(np.max(np.abs(ref - got)))
    assert err <= 1e-3, f"tinyvit max err {err:.2e}"
