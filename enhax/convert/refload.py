"""Import the reference's own torch model code for ground-truth parity tests.

Round-1 parity tests compared enhax against hand-written torch mirrors; if
the mirror and the flax model shared a misreading, parity passed while being
wrong. This module imports the reference's *actual* code so conversion
parity is grounded in reference-executed forwards:

  * ``load_vendored``: sys.path-isolated import of a vendored repo module
    (e.g. NAFNet ``basicsr.models.archs.NAFNet_arch`` from
    mon_extra/vision/enhance/multitask/nafnet/). Several vendored repos ship
    packages with the same name (``basicsr`` x3), so each load purges the
    package from ``sys.modules`` before and after.
  * ``load_first_party``: import a ``src/mon/vision/...`` model file under a
    stubbed ``mon`` package (console/Path/registries/losses faked, layers
    proxied to ``torch.nn``), so the reference's model ``forward`` runs
    without dragging in its full runtime.

Read-only usage of PUBLIC reference code for verification; nothing is
copied into enhax.
"""

from __future__ import annotations

import importlib
import importlib.util
import pathlib
import sys
import types
import typing

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.is_dir()


def _purge(top: str) -> None:
    for k in [k for k in sys.modules if k == top or k.startswith(top + ".")]:
        del sys.modules[k]


def _external_stubs() -> dict:
    """Stub modules for third-party deps the vendored repos import at module
    scope but that this image doesn't ship (torchvision). Only the names the
    arch files' import chains actually touch are provided."""
    stubs = {}
    try:
        importlib.import_module("torchvision")
    except ImportError:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        utils = types.ModuleType("torchvision.utils")
        utils.make_grid = lambda *a, **k: None
        utils.save_image = lambda *a, **k: None
        models = types.ModuleType("torchvision.models")
        models.__getattr__ = lambda name: None
        transforms = types.ModuleType("torchvision.transforms")
        transforms.__getattr__ = lambda name: type(name, (), {})
        tv.utils = utils
        tv.models = models
        tv.transforms = transforms
        stubs.update({"torchvision": tv, "torchvision.utils": utils,
                      "torchvision.models": models,
                      "torchvision.transforms": transforms})
    try:
        importlib.import_module("lightning")
    except ImportError:
        lt = types.ModuleType("lightning")
        pt = types.ModuleType("lightning.pytorch")
        ut = types.ModuleType("lightning.pytorch.utilities")
        ty = types.ModuleType("lightning.pytorch.utilities.types")
        ty.STEP_OUTPUT = typing.Any
        ut.types = ty
        pt.utilities = ut
        lt.pytorch = pt
        stubs.update({"lightning": lt, "lightning.pytorch": pt,
                      "lightning.pytorch.utilities": ut,
                      "lightning.pytorch.utilities.types": ty})
    try:
        importlib.import_module("cv2.ximgproc")
    except ImportError:
        import cv2 as _cv2
        import numpy as _np

        def _guided_filter_color(guide, src, radius, eps):
            """He et al. color guided filter — the algorithm behind
            cv2.ximgproc.guidedFilter (contrib module absent here).
            guide: HxWx3 float32, src: HxW float32."""
            r = radius
            box = lambda img: _cv2.boxFilter(img, -1, (2 * r + 1, 2 * r + 1))
            I = guide.astype(_np.float32)
            p = src.astype(_np.float32)
            mean_I = box(I)
            mean_p = box(p)
            corr_Ip = box(I * p[..., None])
            cov_Ip = corr_Ip - mean_I * mean_p[..., None]
            h, w = p.shape
            var = _np.empty((h, w, 3, 3), _np.float32)
            for i in range(3):
                for j in range(3):
                    var[..., i, j] = box(I[..., i] * I[..., j]) \
                        - mean_I[..., i] * mean_I[..., j]
            A = var + eps * _np.eye(3, dtype=_np.float32)
            a = _np.linalg.solve(A, cov_Ip[..., None])[..., 0]
            b = mean_p - _np.sum(a * mean_I, axis=-1)
            return (_np.sum(box(a) * I, axis=-1) + box(b)).astype(_np.float32)

        xi = types.ModuleType("cv2.ximgproc")
        xi.guidedFilter = lambda guide, src, radius, eps: \
            _guided_filter_color(guide, src, radius, eps)
        stubs["cv2.ximgproc"] = xi

    try:
        importlib.import_module("fvcore")
    except ImportError:
        fv = types.ModuleType("fvcore")
        fv.__path__ = []
        fvnn = types.ModuleType("fvcore.nn")
        fvnn.parameter_count = lambda model: {
            "": sum(p.numel() for p in model.parameters())}
        fvnn.FlopCountAnalysis = lambda *a, **k: None
        fv.nn = fvnn
        stubs.update({"fvcore": fv, "fvcore.nn": fvnn})
    # small leaf deps imported at module scope by vendored utils chains
    for name in ("lmdb", "natsort", "thop", "kornia"):
        try:
            importlib.import_module(name)
        except ImportError:
            m = types.ModuleType(name)
            if name == "natsort":
                m.natsorted = sorted
            m.__getattr__ = lambda attr: None
            stubs[name] = m
    return stubs


def make_ultralytics_tal_stub():
    """Behavioral stub of ultralytics.yolo.utils.tal (tal.py:246-270) — the
    vendored chain's real __init__ needs matplotlib (absent here); these two
    functions are all the Detect head imports."""
    import torch

    tal = types.ModuleType("ultralytics.yolo.utils.tal")

    def make_anchors(feats, strides, grid_cell_offset=0.5):
        anchor_points, stride_tensor = [], []
        dtype = feats[0].dtype
        for i, stride in enumerate(strides):
            _, _, h, w = feats[i].shape
            sx = torch.arange(end=w, dtype=dtype) + grid_cell_offset
            sy = torch.arange(end=h, dtype=dtype) + grid_cell_offset
            sy, sx = torch.meshgrid(sy, sx, indexing="ij")
            anchor_points.append(torch.stack((sx, sy), -1).view(-1, 2))
            stride_tensor.append(torch.full((h * w, 1), stride, dtype=dtype))
        return torch.cat(anchor_points), torch.cat(stride_tensor)

    def dist2bbox(distance, anchor_points, xywh=True, dim=-1):
        lt, rb = distance.chunk(2, dim)
        x1y1 = anchor_points - lt
        x2y2 = anchor_points + rb
        if xywh:
            return torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), dim)
        return torch.cat((x1y1, x2y2), dim)

    tal.make_anchors = make_anchors
    tal.dist2bbox = dist2bbox
    utils_pkg = types.ModuleType("ultralytics.yolo.utils")
    utils_pkg.tal = tal
    yolo_pkg = types.ModuleType("ultralytics.yolo")
    yolo_pkg.utils = utils_pkg
    return {"ultralytics.yolo": yolo_pkg, "ultralytics.yolo.utils": utils_pkg,
            "ultralytics.yolo.utils.tal": tal}


def load_vendored(repo_rel: str, module_name: str, stub_mon: bool = False,
                  extra_stubs: dict | None = None):
    """Import ``module_name`` from a vendored repo under mon_extra.

    ``repo_rel``: path relative to ``src/mon_extra`` that is the repo root
    for the repo's absolute imports (e.g. ``vision/enhance/multitask/nafnet``).

    Parent packages are *stubbed* (empty modules whose ``__path__`` points at
    the real directories) so the repo's ``__init__.py`` chains — which pull
    in torchvision/cv2-heavy training machinery — never execute; only the
    requested leaf module and whatever it imports run.
    """
    root = REFERENCE_ROOT / "src" / "mon_extra" / repo_rel
    if not root.is_dir():
        raise FileNotFoundError(root)
    parts = module_name.split(".")
    top = parts[0]
    saved_path = list(sys.path)
    _purge(top)
    # purge every top-level module name this repo defines: a previously
    # loaded vendored repo may have left a same-named module cached (e.g.
    # llflow's `utils` package shadowing lime's `utils.py`)
    local_names = {p.stem if p.suffix == ".py" else p.name
                   for p in root.iterdir()
                   if p.suffix == ".py" or (p / "__init__.py").is_file()}
    for name in local_names:
        _purge(name)
    ext = _external_stubs()
    if stub_mon:
        ext.update(_build_stub_mon())
    if extra_stubs:
        ext.update(extra_stubs)
    saved_ext = {k: sys.modules.get(k) for k in ext}
    sys.modules.update(ext)
    sys.path.insert(0, str(root))
    try:
        # stub ancestor packages: basicsr, basicsr.models, basicsr.models.archs
        pkg_dir = root
        parent = None
        for i, part in enumerate(parts[:-1]):
            pkg_dir = pkg_dir / part
            pkg_name = ".".join(parts[: i + 1])
            stub = types.ModuleType(pkg_name)
            stub.__path__ = [str(pkg_dir)]
            stub.__package__ = pkg_name
            sys.modules[pkg_name] = stub
            if parent is not None:
                # pre-stubbed children never get attribute-bound by the
                # import system; link them so `pkg.sub.attr` access works
                setattr(parent, part, stub)
            parent = stub
        mod = importlib.import_module(module_name)
    finally:
        sys.path[:] = saved_path
        for k, v in saved_ext.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    # detach so the next same-named vendored package starts clean; the
    # returned module object stays alive via this reference
    _purge(top)
    for name in local_names:
        _purge(name)
    return mod


# ---------------------------------------------------------------------------
# Stub `mon` runtime for first-party model files
# ---------------------------------------------------------------------------

def _make_dummy_module_class(name: str):
    import torch

    class _Dummy(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            return torch.zeros(())

    _Dummy.__name__ = name
    return _Dummy


def _build_stub_mon():
    import torch

    mon = types.ModuleType("mon")
    core = types.ModuleType("mon.core")
    core.Path = pathlib.Path

    class _Console:
        def print(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

    core.console = _Console()
    mon.core = core
    mon.console = core.console
    mon.Path = pathlib.Path
    mon.get_image_size = lambda s: (s, s) if isinstance(s, int) else tuple(s)[:2]

    nn_mod = types.ModuleType("mon.nn")

    class Loss(torch.nn.Module):
        def __init__(self, *a, loss_weight: float = 1.0,
                     reduction: str = "mean", **k):
            super().__init__()
            self.loss_weight = loss_weight
            self.reduction = reduction

    class DSConv2d(torch.nn.Module):
        """Behavioral stub of mon.nn.DSConv2d (dsconv.py:106-150):
        depthwise (groups=in) then pointwise 1x1, names dw_conv/pw_conv."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, bias=True, **k):
            super().__init__()
            self.dw_conv = torch.nn.Conv2d(
                in_channels, in_channels, kernel_size, stride, padding,
                dilation, groups=in_channels, bias=bias)
            self.pw_conv = torch.nn.Conv2d(in_channels, out_channels, 1, bias=bias)

        def forward(self, x):
            return self.pw_conv(self.dw_conv(x))

    class RGBToHVI(torch.nn.Module):
        """Behavioral stub of mon.core.RGBToHVI (core/image/color.py:313):
        the HVI transform with a learnable density_k, transcribed so
        first-party HVI models execute with faithful color semantics."""

        def __init__(self, eps: float = 1e-8):
            super().__init__()
            self.eps = eps
            self.density_k = torch.nn.Parameter(torch.full([1], 0.2))
            self.gated = False
            self.gated2 = False
            self.alpha = 1.0
            self.this_k = 0

        def rgb_to_hvi(self, image):
            pi = 3.141592653589793
            eps = self.eps
            value = image.max(1)[0]
            img_min = image.min(1)[0]
            hue = torch.zeros_like(value)
            d = value - img_min + eps
            hue[image[:, 2] == value] = \
                (4.0 + (image[:, 0] - image[:, 1]) / d)[image[:, 2] == value]
            hue[image[:, 1] == value] = \
                (2.0 + (image[:, 2] - image[:, 0]) / d)[image[:, 1] == value]
            hue[image[:, 0] == value] = \
                ((0.0 + (image[:, 1] - image[:, 2]) / d) % 6)[image[:, 0] == value]
            hue[img_min == value] = 0.0
            hue = hue / 6.0
            sat = (value - img_min) / (value + eps)
            sat[value == 0] = 0
            hue, sat, value = (t.unsqueeze(1) for t in (hue, sat, value))
            self.this_k = self.density_k.item()
            cs = ((value * 0.5 * pi).sin() + eps).pow(self.density_k)
            return torch.cat([cs * sat * (2.0 * pi * hue).cos(),
                              cs * sat * (2.0 * pi * hue).sin(),
                              value], dim=1)

        def hvi_to_rgb(self, image):
            pi = 3.141592653589793
            eps = self.eps
            H, V, I = image[:, 0], image[:, 1], image[:, 2]
            H = torch.clamp(H, -1, 1)
            V = torch.clamp(V, -1, 1)
            I = torch.clamp(I, 0, 1)
            v = I
            cs = ((v * 0.5 * pi).sin() + eps).pow(self.this_k)
            H = torch.clamp(H / (cs + eps), -1, 1)
            V = torch.clamp(V / (cs + eps), -1, 1)
            h = (torch.atan2(V, H) / (2 * pi)) % 1
            s = torch.sqrt(H ** 2 + V ** 2)
            if self.gated:
                s = s * 1.3
            s = torch.clamp(s, 0, 1)
            v = torch.clamp(v, 0, 1)
            r = torch.clamp(torch.abs(h * 6 - 3) - 1, 0, 1)
            g = torch.clamp(2 - torch.abs(h * 6 - 2), 0, 1)
            b = torch.clamp(2 - torch.abs(h * 6 - 4), 0, 1)
            rgb = torch.stack([r, g, b], dim=1)
            rgb = v.unsqueeze(1) * (1 + s.unsqueeze(1) * (rgb - 1))
            if self.gated2:
                rgb = rgb * self.alpha
            return rgb

    class LayerNorm2d(torch.nn.LayerNorm):
        """Behavioral stub of mon.nn.LayerNorm2d (normalization.py:328):
        channels-last layer norm on NCHW tensors."""

        def forward(self, x):
            return torch.nn.functional.layer_norm(
                x.permute(0, 2, 3, 1), self.normalized_shape, self.weight,
                self.bias, self.eps).permute(0, 3, 1, 2)

    class LearnableInstanceNorm2d(torch.nn.InstanceNorm2d):
        """Behavioral stub of mon.nn.LearnableInstanceNorm2d
        (normalization.py:177-219): blend IN(x) and x with a learnable
        per-channel ratio r."""

        def __init__(self, num_features, r=0.5, eps=1e-5, momentum=0.1,
                     affine=True, track_running_stats=False, **k):
            super().__init__(num_features, eps=eps, momentum=momentum,
                             affine=affine,
                             track_running_stats=track_running_stats)
            self.r = torch.nn.Parameter(torch.full([num_features], r))

        def forward(self, x):
            xn = torch.nn.functional.instance_norm(
                x, self.running_mean, self.running_var, self.weight,
                self.bias, use_input_stats=self.training
                or not self.track_running_stats,
                momentum=self.momentum, eps=self.eps)
            r = self.r.reshape(-1, x.shape[1], 1, 1)
            return xn * r + x * (1 - r)

    class SimAM(torch.nn.Module):
        """Behavioral stub of mon.nn.SimAM (attention.py:1156-1181)."""

        def __init__(self, e_lambda: float = 1e-4):
            super().__init__()
            self.e_lambda = e_lambda

        def forward(self, x):
            b, c, h, w = x.size()
            n = w * h - 1
            d = (x - x.mean(dim=[2, 3], keepdim=True)).pow(2)
            v = d.sum(dim=[2, 3], keepdim=True) / n
            e_inv = d / (4 * (v + self.e_lambda)) + 0.5
            return x * torch.sigmoid(e_inv)

    class L2Loss(torch.nn.Module):
        """mon.nn.L2Loss (loss/base.py:182-194): MSE."""

        def __init__(self, loss_weight=1.0, reduction="mean", **k):
            super().__init__()
            self.loss_weight = loss_weight
            self.reduction = reduction

        def forward(self, input, target):
            return self.loss_weight * torch.nn.functional.mse_loss(
                input, target, reduction=self.reduction)

    def _local_stddev(image, patch_size=5, eps=1e-9):
        # core.image_local_stddev (core/image/utils.py:878-897)
        p = patch_size // 2
        x = torch.nn.functional.pad(image, (p, p, p, p), mode="reflect")
        patches = x.unfold(2, patch_size, 1).unfold(3, patch_size, 1)
        mean = patches.mean(dim=(4, 5), keepdim=True)
        return torch.sqrt(((patches - mean) ** 2).mean(dim=(4, 5)) + eps)

    class TextureDifferenceLoss(torch.nn.Module):
        """mon.nn.TextureDifferenceLoss (loss/image.py:1311-1353)."""

        def __init__(self, patch_size=5, constant_c=1e-5, threshold=0.975,
                     **k):
            super().__init__()
            self.patch_size = patch_size
            self.constant_c = constant_c
            self.threshold = threshold

        def forward(self, input, target):
            def gray(t):
                return (0.144 * t[:, 0] + 0.587 * t[:, 1]
                        + 0.299 * t[:, 2]).unsqueeze(1)
            s1 = _local_stddev(gray(input), self.patch_size)
            s2 = _local_stddev(gray(target), self.patch_size)
            diff = 2 * s1 * s2 / (s1 ** 2 + s2 ** 2 + self.constant_c)
            return torch.where(diff > self.threshold,
                               torch.tensor(1.0), torch.tensor(0.0))

    class ImageLocalMean(torch.nn.Module):
        """core.ImageLocalMean (core/image/utils.py:900-918)."""

        def __init__(self, patch_size=5):
            super().__init__()
            self.patch_size = patch_size

        def forward(self, image):
            p = self.patch_size // 2
            x = torch.nn.functional.pad(image, (p, p, p, p), mode="reflect")
            patches = x.unfold(2, self.patch_size, 1).unfold(
                3, self.patch_size, 1)
            return patches.mean(dim=(4, 5))

    class TotalVariationLoss(torch.nn.Module):
        """Behavioral stub of mon.nn.TotalVariationLoss (image.py:1357):
        zero-dce TV — squared forward diffs / per-axis element counts,
        x2, / batch."""

        def __init__(self, loss_weight=1.0, **k):
            super().__init__()
            self.loss_weight = loss_weight

        def forward(self, input, target=None):
            x = input
            b, c, h, w = x.shape
            h_tv = ((x[:, :, 1:] - x[:, :, :-1]) ** 2).sum()
            w_tv = ((x[:, :, :, 1:] - x[:, :, :, :-1]) ** 2).sum()
            return self.loss_weight * 2 * (h_tv / (c * (h - 1) * w)
                                           + w_tv / (c * h * (w - 1))) / b

    class ColorConstancyLoss(torch.nn.Module):
        """Behavioral stub of mon.nn.ColorConstancyLoss (image.py:192)."""

        def __init__(self, loss_weight=1.0, **k):
            super().__init__()
            self.loss_weight = loss_weight

        def forward(self, input, target=None):
            m = input.mean(dim=[2, 3], keepdim=True)
            mr, mg, mb = m[:, 0], m[:, 1], m[:, 2]
            loss = (((mr - mg) ** 2) ** 2 + ((mr - mb) ** 2) ** 2
                    + ((mb - mg) ** 2) ** 2) ** 0.5
            return self.loss_weight * loss.mean()

    class LinearProjection(torch.nn.Module):
        """Behavioral stub of mon.nn.LinearProjection (projection.py:88-124):
        separate q and kv linear projections for window attention."""

        def __init__(self, channels, heads=8, head_channels=64, dropout=0.0,
                     bias=True, *a, **k):
            super().__init__()
            inner = head_channels * heads
            self.heads = heads
            self.to_q = torch.nn.Linear(channels, inner, bias=bias)
            self.to_kv = torch.nn.Linear(channels, inner * 2, bias=bias)

        def forward(self, x, attn_kv=None):
            b, n, c = x.shape
            attn_kv = x if attn_kv is None else attn_kv.unsqueeze(0).repeat(b, 1, 1)
            nkv = attn_kv.size(1)
            q = self.to_q(x).reshape(b, n, 1, self.heads, c // self.heads
                                     ).permute(2, 0, 3, 1, 4)[0]
            kv = self.to_kv(attn_kv).reshape(b, nkv, 2, self.heads,
                                             c // self.heads
                                             ).permute(2, 0, 3, 1, 4)
            return q, kv[0], kv[1]

    class WindowAttention(torch.nn.Module):
        """Behavioral stub of mon.nn.WindowAttention (attention.py:924-1054):
        window MSA with relative position bias; ``if mask:`` upstream quirk
        replaced by an ``is not None`` check so shifted windows execute."""

        def __init__(self, channels, window_size, num_heads,
                     token_projection="linear", qkv_bias=True, qk_scale=None,
                     attn_drop=0.0, proj_drop=0.0):
            super().__init__()
            self.window_size = window_size
            self.num_heads = num_heads
            head_dim = channels // num_heads
            self.scale = qk_scale or head_dim ** -0.5
            self.relative_position_bias_table = torch.nn.Parameter(
                torch.zeros((2 * window_size[0] - 1) * (2 * window_size[1] - 1),
                            num_heads))
            ch = torch.arange(window_size[0])
            cw = torch.arange(window_size[1])
            coords = torch.stack(torch.meshgrid([ch, cw], indexing="ij"))
            flat = torch.flatten(coords, 1)
            rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
            rel[:, :, 0] += window_size[0] - 1
            rel[:, :, 1] += window_size[1] - 1
            rel[:, :, 0] *= 2 * window_size[1] - 1
            self.register_buffer("relative_position_index", rel.sum(-1))
            torch.nn.init.trunc_normal_(self.relative_position_bias_table,
                                        std=0.02)
            self.qkv = LinearProjection(channels, num_heads,
                                        channels // num_heads, bias=qkv_bias)
            self.proj = torch.nn.Linear(channels, channels)

        def forward(self, x, attn_kv=None, mask=None):
            b, n, c = x.shape
            q, k, v = self.qkv(x, attn_kv)
            attn = (q * self.scale) @ k.transpose(-2, -1)
            ws = self.window_size
            bias = self.relative_position_bias_table[
                self.relative_position_index.view(-1)].view(
                ws[0] * ws[1], ws[0] * ws[1], -1).permute(2, 0, 1).contiguous()
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(b // nw, nw, self.num_heads, n, n) \
                    + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, self.num_heads, n, n)
            attn = torch.softmax(attn, dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(x)

    class DownsampleConv2d(torch.nn.Module):
        """Behavioral stub of mon.nn.DownsampleConv2d (scale.py:118-135):
        token -> NCHW -> conv4x4 s2 -> tokens."""

        def __init__(self, in_channels, out_channels):
            super().__init__()
            self.conv = torch.nn.Sequential(
                torch.nn.Conv2d(in_channels, out_channels, 4, 2, 1))

        def forward(self, x):
            b, l, c = x.shape
            h = int(l ** 0.5)
            x = x.transpose(1, 2).contiguous().view(b, c, h, h)
            return self.conv(x).flatten(2).transpose(1, 2).contiguous()

    class UpsampleConv2d(torch.nn.Module):
        """Behavioral stub of mon.nn.UpsampleConv2d (scale.py:298-315):
        token -> NCHW -> deconv2x2 s2 -> tokens."""

        def __init__(self, in_channels, out_channels):
            super().__init__()
            self.deconv = torch.nn.Sequential(
                torch.nn.ConvTranspose2d(in_channels, out_channels, 2, 2))

        def forward(self, x):
            b, l, c = x.shape
            h = int(l ** 0.5)
            x = x.transpose(1, 2).contiguous().view(b, c, h, h)
            return self.deconv(x).flatten(2).transpose(1, 2).contiguous()

    class DropPath(torch.nn.Module):
        """Stochastic depth; identity in eval mode (all parity runs)."""

        def __init__(self, drop_prob=0.0, *a, **k):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1 - self.drop_prob
            m = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.dim() - 1),
                                           keep, device=x.device))
            return x / keep * m

    class DWConv2d(torch.nn.Module):
        """Behavioral stub of mon.nn.DWConv2d (dsconv.py:35-64 alias :227):
        depthwise conv, name dw_conv."""

        def __init__(self, in_channels, kernel_size, stride=1, padding=0,
                     dilation=1, bias=True, **k):
            super().__init__()
            self.dw_conv = torch.nn.Conv2d(
                in_channels, in_channels, kernel_size, stride, padding,
                dilation, groups=in_channels, bias=bias)

        def forward(self, x):
            return self.dw_conv(x)

    core.RGBToHVI = RGBToHVI
    core.to_2tuple = lambda v: tuple(v) if isinstance(v, (tuple, list)) \
        else (v, v)
    core._callable = typing.Callable   # annotation-only aliases
    core._size_2_t = typing.Any
    core.get_image_size = mon.get_image_size
    core.to_int_list = lambda v: [int(x) for x in v] \
        if isinstance(v, (tuple, list)) else [int(v)]
    nn_mod.LearnableInstanceNorm2d = LearnableInstanceNorm2d
    nn_mod.SimAM = SimAM
    nn_mod.LayerNorm2d = LayerNorm2d
    nn_mod.Loss = Loss
    nn_mod.DSConv2d = DSConv2d
    nn_mod.TotalVariationLoss = TotalVariationLoss
    nn_mod.ColorConstancyLoss = ColorConstancyLoss
    nn_mod.L2Loss = L2Loss
    nn_mod.TextureDifferenceLoss = TextureDifferenceLoss
    def _pair_downsample(image):
        # core.pair_downsample (transform.py:76): diagonal 2x2 averages
        c = image.shape[1]
        f1 = torch.tensor([[[[0.0, 0.5], [0.5, 0.0]]]],
                          dtype=image.dtype).repeat(c, 1, 1, 1)
        f2 = torch.tensor([[[[0.5, 0.0], [0.0, 0.5]]]],
                          dtype=image.dtype).repeat(c, 1, 1, 1)
        return (torch.nn.functional.conv2d(image, f1, stride=2, groups=c),
                torch.nn.functional.conv2d(image, f2, stride=2, groups=c))

    core.ImageLocalMean = ImageLocalMean
    core.image_local_stddev = _local_stddev
    core.pair_downsample = _pair_downsample

    class GoodLookingImageMetric(torch.nn.Module):
        """mon.nn.GoodLookingImageMetric (nn/metric/image.py:386-408)."""

        def __init__(self, exposed_level=0.5, pool_size=25):
            super().__init__()
            self.exposed_level = exposed_level
            self.pool = torch.nn.Sequential(
                torch.nn.ReflectionPad2d(pool_size // 2),
                torch.nn.AvgPool2d(pool_size, stride=1))

        def forward(self, images):
            eps = 1 / 255.0
            mx = images.max(dim=1, keepdim=True)[0]
            mn = images.min(dim=1, keepdim=True)[0]
            saturation = (mx - mn + eps) / (mx + eps)
            mean_rgb = self.pool(images).mean(dim=1, keepdim=True)
            exposedness = torch.abs(mean_rgb - self.exposed_level) + eps
            contrast = self.pool(images * images).mean(
                dim=1, keepdim=True) - mean_rgb ** 2
            return torch.mean(saturation * contrast / exposedness,
                              dim=[1], keepdim=True)

    nn_mod.GoodLookingImageMetric = GoodLookingImageMetric

    import numpy as _np

    class CustomConcat(torch.nn.Module):
        """mon.nn.CustomConcat (modules/misc.py:67-99): run branches on
        the same input, center-crop to the smallest, concat."""

        def __init__(self, dim, *branches, **k):
            super().__init__()
            self.dim = dim
            for idx, m in enumerate(branches):
                self.add_module(str(idx), m)

        def __len__(self):
            return len(self._modules)

        def forward(self, x):
            outs = [m(x) for m in self._modules.values()]
            h = min(o.shape[2] for o in outs)
            w = min(o.shape[3] for o in outs)
            crop = []
            for o in outs:
                dh = (o.shape[2] - h) // 2
                dw = (o.shape[3] - w) // 2
                crop.append(o[:, :, dh:dh + h, dw:dw + w])
            return torch.cat(crop, dim=self.dim)

    nn_mod.CustomConcat = CustomConcat

    class StdLoss(torch.nn.Module):
        """mon.nn.StdLoss (loss/image.py:1274-1307), CPU tensors."""

        def __init__(self, loss_weight=1.0, reduction="mean", **k):
            super().__init__()
            self.loss_weight = loss_weight
            blur = torch.full((1, 1, 5, 5), 1 / 25.0)
            delta = torch.zeros((1, 1, 5, 5))
            delta[0, 0, 2, 2] = 1
            self.register_buffer("blur", blur)
            self.register_buffer("image", delta)

        def forward(self, x, target=None):
            x = torch.mean(x, 1, keepdim=True)
            return self.loss_weight * torch.nn.functional.mse_loss(
                torch.nn.functional.conv2d(x, self.image),
                torch.nn.functional.conv2d(x, self.blur))

    nn_mod.StdLoss = StdLoss

    def _atmospheric_prior(image, kernel_size=15, p=0.0001):
        # prior/image.py:36-63 (CHW numpy input)
        image = image.transpose(1, 2, 0)
        m, n, _ = image.shape
        w = kernel_size
        padded = _np.pad(image, ((w // 2, w // 2), (w // 2, w // 2), (0, 0)),
                         "edge")
        dcp = _np.zeros((m, n))
        for i in range(m):
            for j in range(n):
                dcp[i, j] = _np.min(padded[i:i + w, j:j + w, :])
        flat_i = image.reshape(m * n, 3)
        # upstream uses default (unstable) argsort — tie order among equal
        # dark values is arbitrary there; stable sort picks the lowest
        # index, matching jax.lax.top_k
        idx = (-dcp.ravel()).argsort(kind="stable")[:max(int(m * n * p), 1)]
        return _np.max(flat_i.take(idx, axis=0), axis=0)

    nn_mod.atmospheric_prior = _atmospheric_prior

    class SIRENLayer(torch.nn.Module):
        """Behavioral stub for ``nn.SIRENLayer`` — referenced by colie.py
        but ABSENT from mon.nn (inr.py has only SineLayer/SIREN); semantics
        follow the official CoLIE SirenLayer (ctom2/colie) the port targets:
        sin(omega * Wx) with SIREN init, plain linear when is_last."""

        def __init__(self, in_f, out_f, w0=30.0, c=6.0, is_first=False,
                     is_last=False):
            super().__init__()
            self.w0 = w0
            self.is_last = is_last
            self.linear = torch.nn.Linear(in_f, out_f)
            with torch.no_grad():
                if is_first:
                    b = 1.0 / in_f
                else:
                    b = (c / in_f) ** 0.5 / w0
                self.linear.weight.uniform_(-b, b)

        def forward(self, x):
            x = self.linear(x)
            return x if self.is_last else torch.sin(self.w0 * x)

    nn_mod.SIRENLayer = SIRENLayer

    class _MonSineLayer(torch.nn.Module):
        """mon.nn SineLayer (inr.py:293-347)."""

        def __init__(self, in_f, out_f, bias=True, is_first=False,
                     omega_0=30.0, **k):
            super().__init__()
            self.omega_0 = omega_0
            self.linear = torch.nn.Linear(in_f, out_f, bias)
            with torch.no_grad():
                if is_first:
                    self.linear.weight.uniform_(-1 / in_f, 1 / in_f)
                else:
                    b = (6 / in_f) ** 0.5 / omega_0
                    self.linear.weight.uniform_(-b, b)

        def forward(self, x):
            return torch.sin(self.omega_0 * self.linear(x))

    class _MonSigmoidLayer(torch.nn.Module):
        """mon.nn SigmoidLayer (inr.py:264-290): linear + sigmoid."""

        def __init__(self, in_f, out_f, bias=True, **k):
            super().__init__()
            self.linear = torch.nn.Linear(in_f, out_f, bias)

        def forward(self, x):
            return torch.sigmoid(self.linear(x))

    class INRLayer(torch.nn.Module):
        """mon.nn.INRLayer (inr.py:379-477), sine/sigmoid paths."""

        def __init__(self, in_channels, out_channels, bias=True,
                     is_first=False, is_last=False, omega_0=30.0,
                     scale=10.0, first_bias_scale=None, nonlinear="sine",
                     dropout=0.0):
            super().__init__()
            if is_last:
                nonlinear = "sigmoid"
            if nonlinear == "sine":
                self.nonlinear = _MonSineLayer(in_channels, out_channels,
                                               bias, is_first, omega_0)
            elif nonlinear == "sigmoid":
                self.nonlinear = _MonSigmoidLayer(in_channels, out_channels,
                                                  bias)
            else:
                raise NotImplementedError(nonlinear)
            self.dropout = torch.nn.Dropout(dropout)

        def forward(self, x):
            return self.dropout(self.nonlinear(x))

    nn_mod.INRLayer = INRLayer

    def _get_coords(size):
        h, w = (size, size) if isinstance(size, int) else size
        coords = _np.dstack(_np.meshgrid(_np.linspace(0, 1, h),
                                         _np.linspace(0, 1, w)))
        return torch.from_numpy(coords).float()

    def _ff_embedding(x, B):
        """Gaussian Fourier features (inr.py:820-826): [sin, cos](2πx·Bᵀ)."""
        if B is None:
            return x
        x_proj = (2.0 * _np.pi * x) @ B.T
        return torch.cat([torch.sin(x_proj), torch.cos(x_proj)], dim=-1)

    class ContextImplicitFeatureEncoder(torch.nn.Module):
        """mon.nn.ContextImplicitFeatureEncoder (inr.py:752-828)."""

        def __init__(self, window_size=1, out_channels=256, down_size=256,
                     hidden_layers=2, omega_0=30.0, first_bias_scale=None,
                     nonlinear="sine", weight_decay=0.0001, use_ff=False,
                     ff_gaussian_scale=10, **k):
            super().__init__()
            self.window_size = window_size
            self.down_size = down_size
            in_ch = window_size ** 2
            net_in = in_ch
            if use_ff:
                self.register_buffer(
                    "B", torch.randn((out_channels, in_ch)) * ff_gaussian_scale)
                net_in = out_channels * 2
            else:
                self.B = None
            net = [INRLayer(net_in, out_channels, is_first=True,
                            omega_0=omega_0, nonlinear=nonlinear)]
            for _ in range(1, hidden_layers):
                net.append(INRLayer(out_channels, out_channels,
                                    omega_0=omega_0, nonlinear=nonlinear))
            net.append(INRLayer(out_channels, out_channels, omega_0=omega_0,
                                nonlinear=nonlinear))
            self.net = torch.nn.Sequential(*net)

        def forward(self, image):
            ds = self.down_size
            image_lr = torch.nn.functional.interpolate(
                image, size=(ds, ds), mode="bicubic")
            ws = self.window_size
            c = image_lr.shape[1]
            kernel = torch.zeros((ws ** 2, c, ws, ws))
            for i in range(ws):
                for j in range(ws):
                    kernel[int(torch.sum(kernel).item()), 0, i, j] = 1
            pad = torch.nn.ReflectionPad2d(ws // 2)
            patch = torch.nn.functional.conv2d(pad(image_lr), kernel).squeeze(0)
            patch = torch.movedim(patch, 0, -1)
            return image_lr, self.net(_ff_embedding(patch, self.B))

    class ContextImplicitCoordinatesEncoder(torch.nn.Module):
        """mon.nn.ContextImplicitCoordinatesEncoder (inr.py:829-885)."""

        def __init__(self, out_channels=256, down_size=256, hidden_layers=2,
                     omega_0=30.0, first_bias_scale=None, nonlinear="sine",
                     weight_decay=0.1, use_ff=False, ff_gaussian_scale=10,
                     **k):
            super().__init__()
            self.down_size = down_size
            net_in = 2
            if use_ff:
                self.register_buffer(
                    "B", torch.randn((out_channels, 2)) * ff_gaussian_scale)
                net_in = out_channels * 2
            else:
                self.B = None
            net = [INRLayer(net_in, out_channels, is_first=True,
                            omega_0=omega_0, nonlinear=nonlinear)]
            for _ in range(1, hidden_layers):
                net.append(INRLayer(out_channels, out_channels,
                                    omega_0=omega_0, nonlinear=nonlinear))
            net.append(INRLayer(out_channels, out_channels, omega_0=omega_0,
                                nonlinear=nonlinear))
            self.net = torch.nn.Sequential(*net)

        def forward(self, image):
            coords = _get_coords((self.down_size, self.down_size))
            return self.net(_ff_embedding(coords, self.B))

    class ContextImplicitDecoder(torch.nn.Module):
        """mon.nn.ContextImplicitDecoder (inr.py:886-925): sine hidden
        layers + a sigmoid-linear head (INRLayer is_last)."""

        def __init__(self, in_channels=256, out_channels=3, hidden_layers=1,
                     omega_0=30.0, nonlinear="sine", weight_decay=0.001,
                     **k):
            super().__init__()
            net = [INRLayer(in_channels, in_channels, omega_0=omega_0,
                            nonlinear=nonlinear)
                   for _ in range(hidden_layers)]
            net.append(INRLayer(in_channels, out_channels, is_last=True,
                                omega_0=omega_0))
            self.net = torch.nn.Sequential(*net)

        def forward(self, x):
            return self.net(x)

    nn_mod.ContextImplicitFeatureEncoder = ContextImplicitFeatureEncoder
    nn_mod.ContextImplicitCoordinatesEncoder = ContextImplicitCoordinatesEncoder
    nn_mod.ContextImplicitDecoder = ContextImplicitDecoder

    class BoundaryAwarePrior(torch.nn.Module):
        """mon.nn.BoundaryAwarePrior (prior/image.py:182-236): kornia
        sobel magnitude (replicate pad, eps inside sqrt), / max, > eps."""

        def __init__(self, eps=0.05, normalized=False):
            super().__init__()
            self.eps = eps
            self.normalized = normalized

        def forward(self, image):
            kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])
            if self.normalized:
                kx = kx / 8.0
            ky = kx.t()
            c = image.shape[1]
            xp = torch.nn.functional.pad(image, (1, 1, 1, 1),
                                         mode="replicate")
            gx = torch.nn.functional.conv2d(
                xp, kx.view(1, 1, 3, 3).repeat(c, 1, 1, 1), groups=c)
            gy = torch.nn.functional.conv2d(
                xp, ky.view(1, 1, 3, 3).repeat(c, 1, 1, 1), groups=c)
            g = torch.sqrt(gx * gx + gy * gy + 1e-6)
            g = g / g.max()
            return (g > self.eps).float()

    nn_mod.BoundaryAwarePrior = BoundaryAwarePrior

    class ExposureControlLoss(torch.nn.Module):
        """mon.nn.ExposureControlLoss (loss/image.py:535-569)."""

        def __init__(self, patch_size=16, mean_val=0.6, loss_weight=1.0,
                     reduction="mean", **k):
            super().__init__()
            self.pool = torch.nn.AvgPool2d(patch_size)
            self.mean_val = mean_val
            self.loss_weight = loss_weight

        def forward(self, input):
            x = torch.mean(input, 1, keepdim=True)
            mean = self.pool(x)
            return self.loss_weight * torch.mean(
                (mean - self.mean_val) ** 2)

    nn_mod.ExposureControlLoss = ExposureControlLoss

    class SpatialConsistencyLoss(torch.nn.Module):
        """mon.nn.SpatialConsistencyLoss (loss/image.py:905-1120),
        4/8-region variant."""

        def __init__(self, num_regions=4, patch_size=4, loss_weight=1.0,
                     reduction="mean", **k):
            super().__init__()
            self.loss_weight = loss_weight
            self.pool = torch.nn.AvgPool2d(patch_size)
            offs = [(0, -1), (0, 1), (-1, 0), (1, 0)]
            if num_regions in (8, 16):
                offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
            ks = []
            for dy, dx in offs:
                k3 = torch.zeros(1, 1, 3, 3)
                k3[0, 0, 1, 1] = 1
                k3[0, 0, 1 + dy, 1 + dx] = -1
                ks.append(k3)
            self.register_buffer("kernels", torch.cat(ks, 0))

        def forward(self, input, target):
            org = self.pool(torch.mean(input, 1, keepdim=True))
            enh = self.pool(torch.mean(target, 1, keepdim=True))
            loss = 0
            for i in range(self.kernels.shape[0]):
                k3 = self.kernels[i:i + 1]
                do = torch.nn.functional.conv2d(org, k3, padding=1)
                de = torch.nn.functional.conv2d(enh, k3, padding=1)
                loss = loss + (do - de) ** 2
            return self.loss_weight * torch.mean(loss)

    nn_mod.SpatialConsistencyLoss = SpatialConsistencyLoss

    class EdgeAwareDepthConsistencyLoss(torch.nn.Module):
        """mon.nn.EdgeAwareDepthConsistencyLoss (loss/image.py:367-400)."""

        def __init__(self, tau=0.1, loss_weight=1.0, reduction="mean", **k):
            super().__init__()
            self.tau = tau
            self.loss_weight = loss_weight

        @staticmethod
        def _sobel(x):
            kx = torch.tensor([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]]
                              ).view(1, 1, 3, 3)
            ky = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]
                              ).view(1, 1, 3, 3)
            chans = torch.chunk(x, chunks=x.shape[1], dim=1)
            gx = torch.cat([torch.nn.functional.conv2d(c, kx, padding=1)
                            for c in chans], 1)
            gy = torch.cat([torch.nn.functional.conv2d(c, ky, padding=1)
                            for c in chans], 1)
            return gx, gy

        def forward(self, input, depth):
            dx, dy = self._sobel(depth)
            mask = (torch.sqrt(dx ** 2 + dy ** 2) > self.tau).float()
            gx, gy = self._sobel(input)
            return self.loss_weight * (mask * (gx ** 2 + gy ** 2)).mean()

    nn_mod.EdgeAwareDepthConsistencyLoss = EdgeAwareDepthConsistencyLoss

    def _rgb_to_grayscale(image, rgb_weights=None):
        r, g, b = image.unbind(dim=-3)
        return (0.299 * r + 0.587 * g + 0.114 * b).unsqueeze(-3)

    core.rgb_to_grayscale = _rgb_to_grayscale
    core.is_color_image = lambda img: img.shape[1] == 3

    class BrightnessAttentionMap(torch.nn.Module):
        """mon.nn.BrightnessAttentionMap (prior/image.py:243-317):
        median denoise (kornia-style reflect padding), (1 - V_hsv)^g."""

        def __init__(self, gamma=2.5, denoise_ksize=None):
            super().__init__()
            self.gamma = gamma
            self.denoise_ksize = denoise_ksize

        def forward(self, image):
            x = image
            if self.denoise_ksize:
                k = self.denoise_ksize
                k = k if isinstance(k, int) else k[0]
                p = k // 2
                xp = torch.nn.functional.pad(x, (p, p, p, p), mode="reflect")
                patches = xp.unfold(2, k, 1).unfold(3, k, 1)
                x = patches.reshape(*patches.shape[:4], -1).median(-1)[0]
            v = x.max(dim=1, keepdim=True)[0]
            return (1 - v) ** self.gamma

    nn_mod.BrightnessAttentionMap = BrightnessAttentionMap

    class ExposureValueControlLoss(torch.nn.Module):
        """mon.nn.ExposureValueControlLoss (loss/image.py:572-607)."""

        def __init__(self, patch_size=16, mean_val=0.6, loss_weight=1.0,
                     **k):
            super().__init__()
            self.pool = torch.nn.AvgPool2d(patch_size)
            self.mean_val = mean_val
            self.loss_weight = loss_weight

        def forward(self, x):
            x = torch.mean(x, 1, keepdim=True)
            mean = self.pool(x) ** 0.5
            return self.loss_weight * torch.abs(
                torch.mean((mean - self.mean_val) ** 2))

    nn_mod.ExposureValueControlLoss = ExposureValueControlLoss

    class DepthWeightedSmoothnessLoss(torch.nn.Module):
        """mon.nn.DepthWeightedSmoothnessLoss (loss/image.py:291-330):
        illumination gradients weighted by exp(-alpha * |depth grads|)."""

        def __init__(self, alpha=1.0, loss_weight=1.0, **k):
            super().__init__()
            self.alpha = alpha
            self.loss_weight = loss_weight

        def forward(self, input, depth):
            l_dx = input[:, :, :, 1:] - input[:, :, :, :-1]
            l_dy = input[:, :, 1:, :] - input[:, :, :-1, :]
            d_dx = depth[:, :, :, 1:] - depth[:, :, :, :-1]
            d_dy = depth[:, :, 1:, :] - depth[:, :, :-1, :]
            loss = (torch.mean(torch.exp(-self.alpha * torch.abs(d_dx))
                               * torch.abs(l_dx))
                    + torch.mean(torch.exp(-self.alpha * torch.abs(d_dy))
                                 * torch.abs(l_dy)))
            return self.loss_weight * loss

    nn_mod.DepthWeightedSmoothnessLoss = DepthWeightedSmoothnessLoss

    class EdgeAwareLoss(torch.nn.Module):
        """mon.nn.EdgeAwareLoss (loss/image.py:334-365): illumination
        gradients weighted by exp(-|edge grads|)."""

        def __init__(self, loss_weight=1.0, **k):
            super().__init__()
            self.loss_weight = loss_weight

        def forward(self, input, edge):
            l_dx = input[:, :, :, 1:] - input[:, :, :, :-1]
            l_dy = input[:, :, 1:, :] - input[:, :, :-1, :]
            e_dx = edge[:, :, :, 1:] - edge[:, :, :, :-1]
            e_dy = edge[:, :, 1:, :] - edge[:, :, :-1, :]
            loss = (torch.mean(torch.exp(-torch.abs(e_dx)) * torch.abs(l_dx))
                    + torch.mean(torch.exp(-torch.abs(e_dy)) * torch.abs(l_dy)))
            return self.loss_weight * loss

    nn_mod.EdgeAwareLoss = EdgeAwareLoss

    def _rgb_to_hsv(image, eps=1e-8):
        # kornia.color.rgb_to_hsv: H in [0, 2pi]
        maxc, argmax = image.max(-3)
        minc = image.min(-3)[0]
        v = maxc
        deltac = maxc - minc
        s = deltac / (v + eps)
        dd = torch.where(deltac == 0, torch.ones_like(deltac), deltac)
        r, g, b = image.unbind(-3)
        h1 = (g - b) / dd
        h2 = (b - r) / dd + 2.0
        h3 = (r - g) / dd + 4.0
        h = torch.stack([h1, h2, h3], -3).gather(
            -3, argmax.unsqueeze(-3)).squeeze(-3)
        h = (h / 6.0) % 1.0 * (2.0 * 3.141592653589793)
        return torch.stack([h, s, v], -3)

    def _hsv_to_rgb(image):
        h = image[..., 0, :, :] / (2.0 * 3.141592653589793)
        s = image[..., 1, :, :]
        v = image[..., 2, :, :]
        hi = torch.floor(h * 6) % 6
        f = (h * 6) % 6 - hi
        one = torch.tensor(1.0, device=image.device, dtype=image.dtype)
        p = v * (one - s)
        q = v * (one - f * s)
        t = v * (one - (one - f) * s)
        hi = hi.long()
        idx = torch.stack([hi, hi + 6, hi + 12], dim=-3)
        out = torch.stack((v, q, p, p, t, v, t, v, v, q, p, p,
                           p, p, t, v, v, q), dim=-3)
        return torch.gather(out, -3, idx)

    core.rgb_to_hsv = _rgb_to_hsv
    core.hsv_to_rgb = _hsv_to_rgb
    core.rgb_to_v = lambda img, eps=1e-8: _rgb_to_hsv(img, eps)[:, 2:3]
    core.get_image_num_channels = lambda img: img.shape[-3]

    class PseudoGTGenerator:
        """Behavioral mirror of vision/enhance/utils.py:24-76."""

        def __init__(self, number_refs=1, gamma_upper=3.0, gamma_lower=-2.0,
                     exposed_level=0.5, pool_size=25):
            self.number_refs = number_refs
            self.gamma_upper = gamma_upper
            self.gamma_lower = gamma_lower
            self.iqa = GoodLookingImageMetric(exposed_level, pool_size)

        def __call__(self, image, prev_output=None):
            b, c, h, w = image.shape
            n = self.number_refs
            under = torch.linspace(0, self.gamma_upper, steps=n + 1)[:-1]
            step = self.gamma_upper / n
            ug = torch.exp(torch.rand([b, n]) * step + under[None, :])
            over = torch.linspace(self.gamma_lower, 0, steps=n + 1)[:-1]
            og = torch.exp(torch.rand([b, n]) * over[None, :])
            gammas = torch.cat([ug, og], dim=1)
            synth = 1 - (1 - image[:, None]) ** gammas[:, :, None, None, None]
            if prev_output is not None:
                refs = torch.cat([image[:, None],
                                  prev_output.detach()[:, None], synth], 1)
            else:
                refs = torch.cat([image[:, None], synth], 1)
            nref = refs.shape[1]
            scores = self.iqa(refs.view(b * nref, c, h, w)).view(b, nref, 1, h, w)
            idx = torch.argmax(scores, dim=1).repeat(1, c, 1, 1)[:, None]
            return torch.gather(refs, 1, idx).squeeze(1)
    nn_mod.LinearProjection = LinearProjection
    nn_mod.WindowAttention = WindowAttention
    nn_mod.DownsampleConv2d = DownsampleConv2d
    nn_mod.UpsampleConv2d = UpsampleConv2d
    nn_mod.DropPath = DropPath
    nn_mod.DWConv2d = DWConv2d
    nn_mod.functional = torch.nn.functional
    nn_mod.init = torch.nn.init

    def _nn_getattr(name):
        try:
            return getattr(torch.nn, name)
        except AttributeError:
            return _make_dummy_module_class(name)

    nn_mod.__getattr__ = _nn_getattr
    nn_model = types.ModuleType("mon.nn.model")
    nn_model.StepOutput = typing.Any
    nn_mod.model = nn_model
    mon.nn = nn_mod

    gl = types.ModuleType("mon.globals")

    class _Registry:
        def register(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    class _AnyEnum:
        def __getattr__(self, name):
            return name

    mon.ZOO_DIR = pathlib.Path("/tmp/zoo")
    gl.MODELS = _Registry()
    gl.DATASETS = _Registry()
    gl.LOSSES = _Registry()
    gl.METRICS = _Registry()
    gl.OPTIMIZERS = _Registry()
    gl.LR_SCHEDULERS = _Registry()
    gl.CALLBACKS = _Registry()
    gl.Task = _AnyEnum()
    gl.Scheme = _AnyEnum()
    gl.ZOO_DIR = pathlib.Path("/tmp/zoo")
    mon.globals = gl

    vision = types.ModuleType("mon.vision")
    enhance = types.ModuleType("mon.vision.enhance")
    base = types.ModuleType("mon.vision.enhance.base")

    class _StubModel(torch.nn.Module):
        predicting = False
        debug = True

        def __init__(self, *a, name=None, in_channels=3, out_channels=None,
                     num_classes=None, weights=None, **k):
            super().__init__()
            self.name = name
            self.in_channels = in_channels
            # reference nn/model.py:267
            self.out_channels = out_channels or num_classes or in_channels
            self.weights = weights

        def assert_datapoint(self, dp):
            pass

        def assert_outputs(self, o):
            pass

        def load_weights(self, *a, **k):
            pass

        def init_weights(self, m):
            pass

        def compute_efficiency_score(self, *a, **k):
            return 0, 0, 0

        @staticmethod
        def pair_downsampler(image):
            # behavioral mirror of core pair_downsample (transform.py:76):
            # diagonal 2x2 averages at stride 2
            c = image.shape[1]
            f1 = torch.tensor([[[[0.0, 0.5], [0.5, 0.0]]]],
                              dtype=image.dtype).repeat(c, 1, 1, 1)
            f2 = torch.tensor([[[[0.5, 0.0], [0.0, 0.5]]]],
                              dtype=image.dtype).repeat(c, 1, 1, 1)
            return (torch.nn.functional.conv2d(image, f1, stride=2, groups=c),
                    torch.nn.functional.conv2d(image, f2, stride=2, groups=c))

    base.ImageEnhancementModel = _StubModel
    base.MultimodalImageEnhancementModel = _StubModel
    base.MultiTaskImageEnhancementModel = _StubModel
    enhance.base = base

    multitask = types.ModuleType("mon.vision.enhance.multitask")
    multitask.base = base
    enhance.multitask = multitask

    enhance_utils = types.ModuleType("mon.vision.enhance.utils")
    enhance_utils.PseudoGTGenerator = PseudoGTGenerator
    enhance.utils = enhance_utils

    seg_base = types.ModuleType("mon.vision.segment.base")
    seg_base.SegmentationModel = _StubModel
    segment = types.ModuleType("mon.vision.segment")
    segment.base = seg_base
    vision.segment = segment

    filtering = types.ModuleType("mon.vision.filtering")
    filtering.__getattr__ = lambda name: _make_dummy_module_class(name)

    def _diff_x(src, r):
        return torch.cat([src[:, :, r:2 * r + 1],
                          src[:, :, 2 * r + 1:] - src[:, :, :-2 * r - 1],
                          src[:, :, -1:] - src[:, :, -2 * r - 1:-r - 1]], 2)

    def _diff_y(src, r):
        return torch.cat([src[:, :, :, r:2 * r + 1],
                          src[:, :, :, 2 * r + 1:] - src[:, :, :, :-2 * r - 1],
                          src[:, :, :, -1:] - src[:, :, :, -2 * r - 1:-r - 1]],
                         3)

    class FastGuidedFilter(torch.nn.Module):
        """Behavioral stub of mon.vision.filtering.FastGuidedFilter
        (guided_filter.py:150-203): cumsum box filter, A/b upsampled
        bicubic align_corners=True."""

        def __init__(self, radius, eps=1e-8, downscale=8):
            super().__init__()
            self.r = radius
            self.eps = eps

        def _box(self, x):
            return _diff_y(_diff_x(x.cumsum(dim=2), self.r).cumsum(dim=3),
                           self.r)

        def forward(self, x_lr, y_lr, x_hr):
            _, _, h, w = x_lr.shape
            n = self._box(x_lr.new_ones((1, 1, h, w)))
            mean_x = self._box(x_lr) / n
            mean_y = self._box(y_lr) / n
            cov_xy = self._box(x_lr * y_lr) / n - mean_x * mean_y
            var_x = self._box(x_lr * x_lr) / n - mean_x * mean_x
            a = cov_xy / (var_x + self.eps)
            b = mean_y - a * mean_x
            hs = (x_hr.shape[2], x_hr.shape[3])
            up = lambda t: torch.nn.functional.interpolate(  # noqa: E731
                t, hs, mode="bicubic", align_corners=True)
            return up(a) * x_hr + up(b)

    filtering.FastGuidedFilter = FastGuidedFilter

    class GuidedFilter(torch.nn.Module):
        """Behavioral stub of mon.vision.filtering.GuidedFilter
        (guided_filter.py:99-148): same-resolution cumsum-box variant."""

        def __init__(self, radius, eps=1e-8):
            super().__init__()
            self.r = radius
            self.eps = eps

        def _box(self, x):
            return _diff_y(_diff_x(x.cumsum(dim=2), self.r).cumsum(dim=3),
                           self.r)

        def forward(self, image, guide):
            x, y = image, guide
            _, _, h, w = x.shape
            n = self._box(x.new_ones((1, 1, h, w)))
            mean_x = self._box(x) / n
            mean_y = self._box(y) / n
            cov_xy = self._box(x * y) / n - mean_x * mean_y
            var_x = self._box(x * x) / n - mean_x * mean_x
            a = cov_xy / (var_x + self.eps)
            b = mean_y - a * mean_x
            return self._box(a) / n * x + self._box(b) / n

    filtering.GuidedFilter = GuidedFilter
    vision.enhance = enhance
    vision.filtering = filtering
    mon.vision = vision

    mods = {
        "mon": mon, "mon.core": core, "mon.nn": nn_mod, "mon.globals": gl,
        "mon.vision": vision, "mon.vision.enhance": enhance,
        "mon.vision.enhance.base": base,
        "mon.vision.enhance.multitask": multitask,
        "mon.vision.enhance.multitask.base": base,
        "mon.vision.enhance.utils": enhance_utils,
        "mon.vision.segment": segment,
        "mon.vision.segment.base": seg_base,
        "mon.vision.filtering": filtering,
        "mon.nn.functional": torch.nn.functional,
        "mon.nn.model": nn_model,
    }
    return mods


def load_first_party(model_rel: str, extra_stubs: dict | None = None):
    """Import a first-party reference model file under the stub mon runtime.

    ``model_rel``: path relative to ``src/mon`` (e.g.
    ``vision/enhance/llie/zero_dce/zero_dce.py``). Returns the module.
    """
    path = REFERENCE_ROOT / "src" / "mon" / model_rel
    if not path.is_file():
        raise FileNotFoundError(path)
    stubs = _external_stubs()
    stubs.update(_build_stub_mon())
    if extra_stubs:
        stubs.update(extra_stubs)
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        name = "refmod_" + path.stem
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        try:
            spec.loader.exec_module(mod)
        finally:
            del sys.modules[name]
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


class _RecordedTransform:
    """Albumentation stub used by :func:`load_reference_config` — records the
    transform class name and kwargs so config-fidelity tests can assert
    against e.g. ``A.Resize(height=..., width=...)`` without albumentations
    installed (reference configs build ``mon.albumentation`` pipelines,
    config/*.py:66-78)."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def __init_subclass__(cls, **k):
        super().__init_subclass__(**k)

    def __repr__(self):
        return f"{type(self).__name__}({self.args}, {self.kwargs})"


def load_reference_config(config_rel: str):
    """Execute a first-party reference CONFIG module (the importable Python
    recipes under ``src/mon/**/config/*.py``, e.g.
    ``vision/enhance/llie/zero_mie/config/zero_mie_ms_lol_v1.py``) with a
    minimal stub ``mon`` and return the module namespace.

    The real ``mon/config/default.py`` is executed verbatim (it is a pure
    dict module with no imports), so ``default.trainer | {...}`` merges in
    configs resolve to the reference's actual default values."""
    path = REFERENCE_ROOT / "src" / "mon" / config_rel
    if not path.is_file():
        raise FileNotFoundError(path)

    mon = types.ModuleType("mon")
    mon.Path = pathlib.Path
    mon.DATA_DIR = pathlib.Path("/data")
    mon.ZOO_DIR = pathlib.Path("/zoo")

    default_path = REFERENCE_ROOT / "src" / "mon" / "config" / "default.py"
    default = types.ModuleType("mon.config.default")
    exec(compile(default_path.read_text(), str(default_path), "exec"),
         default.__dict__)
    config_mod = types.ModuleType("mon.config")
    config_mod.default = default
    mon.config = config_mod

    alb = types.ModuleType("mon.albumentation")

    def _alb_getattr(name):
        return type(name, (_RecordedTransform,), {})

    alb.__getattr__ = _alb_getattr
    mon.albumentation = alb

    stubs = {
        "mon": mon,
        "mon.config": config_mod,
        "mon.config.default": default,
        "mon.albumentation": alb,
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        name = "refcfg_" + path.stem.replace("+", "p")
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        try:
            spec.loader.exec_module(mod)
        finally:
            del sys.modules[name]
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def reference_config_files() -> list:
    """All first-party reference config modules, as paths relative to
    ``src/mon`` (the 57 per-model recipes under ``**/config/``)."""
    root = REFERENCE_ROOT / "src" / "mon"
    if not root.is_dir():
        return []
    skip = {"config.py", "__init__.py", "default.py", "parse_args.py"}
    out = []
    for p in sorted(root.rglob("*/config/*.py")):
        if p.name in skip or p.parent == root / "config":
            continue
        out.append(str(p.relative_to(root)))
    return out


def neutralize_losses(module) -> None:
    """Replace module-level Loss classes with inert stubs so model __init__
    doesn't build perceptual/VGG losses (which would download weights)."""
    import torch

    for attr in dir(module):
        if "Loss" in attr and isinstance(getattr(module, attr), type):
            setattr(module, attr, _make_dummy_module_class(attr))
