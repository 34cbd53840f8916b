"""Reference-executed parity for the QuadPrior ControlNet-diffusion stack.

Three layers of ground truth against the vendored code
(mon_extra/vision/enhance/llie/quadprior/):
  1. PriorConv2d color-invariant priors (ciconv2d.py) — dynamic-kernel
     Gaussian color model vs enhax's fixed-support masked kernels.
  2. DPM-Solver++ multistep order-3 sampling (ldm/.../dpm_solver.py) with
     a shared analytic model function.
  3. The FULL pipeline at tiny dims: vendored SD UNetModel encoder/decoder
     + a ControlNet assembled from the vendored modules exactly per
     cldm/cldm.py:52-314 + the vendored skip-VAE (my_vae/models.py) +
     the vendored DPM sampler with classifier-free guidance — vs enhax's
     QuadPriorModule with converted weights and the same initial noise.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from enhax.constants import MODELS  # noqa: E402
from enhax.convert import refload  # noqa: E402
from enhax.convert.torch_weights import convert_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refload.reference_available(), reason="reference tree not present")


def _to_nhwc(t):
    a = t.detach().cpu().numpy()
    return a.transpose(0, 2, 3, 1) if a.ndim == 4 else a


def test_quadprior_priorconv_reference_parity():
    import jax
    from enhax.models.llie.quadprior import PriorConv2d

    mod = refload.load_vendored("vision/enhance/llie/quadprior", "ciconv2d")
    torch.manual_seed(0)
    net = mod.PriorConv2d("W", k=3, scale=0.0)
    net.eval()
    x = torch.rand(2, 3, 24, 24)
    with torch.no_grad():
        ref = _to_nhwc(net(x))
    fmod = PriorConv2d()
    xj = _to_nhwc(x)
    template = fmod.init(jax.random.PRNGKey(0), xj)
    name_map = {"conv.0.": "conv0.", "conv.2.": "conv1.",
                "conv.4.": "conv2.", "gcm": "gcm"}
    params, report = convert_state_dict(net.state_dict(), template,
                                        name_map=name_map, strict=True)
    assert not [r for r in report if r.startswith("unmatched")], report
    got = np.asarray(fmod.apply(params, xj))
    err = float(np.max(np.abs(ref - got)))
    assert err <= 1e-4, f"priorconv max err {err:.2e}"


def test_quadprior_dpm_solver_reference_parity():
    """Vendored DPM_Solver (multistep, order 3, predict_x0,
    lower_order_final) vs enhax dpm_solver_sample on an analytic model."""
    import jax.numpy as jnp
    from enhax.models.llie.quadprior import (dpm_solver_sample,
                                             make_noise_schedule)

    dpm = refload.load_vendored(
        "vision/enhance/llie/quadprior",
        "ldm.models.diffusion.dpm_solver.dpm_solver")
    betas = torch.linspace(0.00085 ** 0.5, 0.0120 ** 0.5, 1000,
                           dtype=torch.float64) ** 2
    acp = torch.cumprod(1.0 - betas, dim=0).float()
    ns = dpm.NoiseScheduleVP("discrete", alphas_cumprod=acp)

    w = torch.linspace(-0.3, 0.4, 4 * 6 * 6).reshape(1, 4, 6, 6)

    def model(x, t, cond=None):
        # analytic "noise prediction": mixes x and t nonlinearly
        tt = t.reshape(-1, 1, 1, 1).float() / 1000.0
        return 0.2 * x + torch.sin(x) * 0.1 + w * torch.cos(3.0 * tt)

    model_fn = dpm.model_wrapper(model, ns, model_type="noise",
                                 guidance_type="uncond")
    solver = dpm.DPM_Solver(model_fn, ns, predict_x0=True,
                            thresholding=False)
    torch.manual_seed(3)
    x0 = torch.randn(1, 4, 6, 6)
    with torch.no_grad():
        ref, _ = solver.sample(x0.clone(), steps=6, skip_type="time_uniform",
                               method="multistep", order=3,
                               lower_order_final=True)
    ref = ref.numpy()

    t_array, log_alphas = make_noise_schedule()
    wj = jnp.asarray(w.numpy())

    def jmodel(x, t_cont):
        t_in = (t_cont - 1e-3) * 1000.0
        tt = t_in / 1000.0
        return 0.2 * x + jnp.sin(x) * 0.1 + wj * jnp.cos(3.0 * tt)

    got = np.asarray(dpm_solver_sample(jmodel, jnp.asarray(x0.numpy()),
                                       t_array, log_alphas, steps=6,
                                       order=3))
    err = float(np.max(np.abs(ref - got)))
    assert err <= 1e-4, f"dpm solver max err {err:.2e}"


@pytest.mark.slow
def test_quadprior_pipeline_reference_parity():
    import jax
    import jax.numpy as jnp
    from enhax.convert.mappings import quadprior_name_map

    import types as _types
    omegaconf = _types.ModuleType("omegaconf")
    omegaconf.listconfig = _types.ModuleType("omegaconf.listconfig")

    class _ListConfig(list):
        pass

    omegaconf.listconfig.ListConfig = _ListConfig
    omegaconf.ListConfig = _ListConfig
    _oc_stubs = {"omegaconf": omegaconf,
                 "omegaconf.listconfig": omegaconf.listconfig}
    import sys as _sys
    # UNetModel.__init__ imports omegaconf lazily, after load_vendored has
    # restored sys.modules — keep the stub alive for the whole test
    _sys.modules.setdefault("omegaconf", omegaconf)
    _sys.modules.setdefault("omegaconf.listconfig", omegaconf.listconfig)
    oai = refload.load_vendored(
        "vision/enhance/llie/quadprior",
        "ldm.modules.diffusionmodules.openaimodel", extra_stubs=_oc_stubs)
    ci = refload.load_vendored("vision/enhance/llie/quadprior", "ciconv2d")
    vae = refload.load_vendored("vision/enhance/llie/quadprior",
                                "my_vae.models")
    dpm = refload.load_vendored(
        "vision/enhance/llie/quadprior",
        "ldm.models.diffusion.dpm_solver.dpm_solver")
    util = refload.load_vendored(
        "vision/enhance/llie/quadprior",
        "ldm.modules.diffusionmodules.util")

    MC, CTX, HEADS, NRES = 32, 16, 2, 2
    MULT = [1, 2, 4, 4]
    unet_kwargs = dict(image_size=8, in_channels=4, out_channels=4,
                       model_channels=MC, attention_resolutions=[4, 2, 1],
                       num_res_blocks=NRES, channel_mult=MULT,
                       num_heads=HEADS, use_spatial_transformer=True,
                       transformer_depth=1, context_dim=CTX,
                       use_checkpoint=False, legacy=False)
    torch.manual_seed(0)
    unet = oai.UNetModel(**unet_kwargs)

    # --- assemble the ControlNet exactly per cldm/cldm.py:52-314 ---------
    class TorchControlNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            base = oai.UNetModel(**unet_kwargs)
            self.time_embed = base.time_embed
            self.input_blocks = base.input_blocks
            self.middle_block = base.middle_block
            taps = [MC]
            ch = MC
            for level, mult in enumerate(MULT):
                for _ in range(NRES):
                    ch = mult * MC
                    taps.append(ch)
                if level != len(MULT) - 1:
                    taps.append(ch)
            self.zero_convs = torch.nn.ModuleList(
                [torch.nn.Sequential(torch.nn.Conv2d(c, c, 1))
                 for c in taps])
            self.middle_block_out = torch.nn.Sequential(
                torch.nn.Conv2d(ch, ch, 1))
            hint = []
            chans = [(6, 16), (16, 16), (16, 32), (32, 32), (32, 96),
                     (96, 96), (96, 256)]
            strides = [1, 1, 2, 1, 2, 1, 2]
            for (ci_, co), s in zip(chans, strides):
                hint.append(torch.nn.Conv2d(ci_, co, 3, padding=1, stride=s))
                hint.append(torch.nn.SiLU())
            hint.append(torch.nn.Conv2d(256, MC, 3, padding=1))
            self.input_hint_block = torch.nn.Sequential(*hint)
            self.prior_conv = ci.PriorConv2d("W", k=3, scale=0.0)

        def forward(self, x, hint, timesteps, context):
            t_emb = util.timestep_embedding(timesteps, MC, repeat_only=False)
            emb = self.time_embed(t_emb.to(x.dtype))
            hint = self.prior_conv(hint)
            guided = self.input_hint_block(hint)
            outs = []
            h = x
            for module, zc in zip(self.input_blocks, self.zero_convs):
                h = module(h, emb, context)
                if guided is not None:
                    h = h + guided
                    guided = None
                outs.append(zc(h))
            h = self.middle_block(h, emb, context)
            outs.append(self.middle_block_out(h))
            return outs

    torch.manual_seed(1)
    control = TorchControlNet()

    torch.manual_seed(2)
    vae_enc = vae.Encoder(ch=128, out_ch=3, ch_mult=[1, 2, 4, 4],
                          num_res_blocks=2, attn_resolutions=[],
                          in_channels=3, resolution=64, z_channels=4)
    vae_dec = vae.Decoder(ch=128, out_ch=3, ch_mult=[1, 2, 4, 4],
                          num_res_blocks=2, attn_resolutions=[],
                          in_channels=3, resolution=64, z_channels=4)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    ctx_empty = torch.randn(7, CTX) * 0.3

    # perturb every zero-initialized leaf so all paths carry signal
    with torch.no_grad():
        for net_ in (unet, control):
            for name, p in net_.named_parameters():
                if p.abs().sum() == 0:
                    p.add_(torch.randn_like(p) * 0.03)
    for m_ in (unet, control, vae_enc, vae_dec, post_quant):
        m_.eval()

    rng = np.random.default_rng(0)
    img = rng.uniform(0.05, 0.6, (1, 64, 64, 3)).astype(np.float32)
    x_t = torch.from_numpy(
        rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
    xt_torch = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())

    betas = torch.linspace(0.00085 ** 0.5, 0.0120 ** 0.5, 1000,
                           dtype=torch.float64) ** 2
    acp = torch.cumprod(1.0 - betas, dim=0).float()
    ns = dpm.NoiseScheduleVP("discrete", alphas_cumprod=acp)

    ctx_b = ctx_empty[None]

    def apply_model(x, t, cond):
        ctrl = control(x, torch.cat(cond["c_concat"], 1), t, ctx_b)
        # ControlledUnetModel.forward (cldm.py:25-49)
        t_emb = util.timestep_embedding(t, MC, repeat_only=False)
        emb = unet.time_embed(t_emb.to(x.dtype))
        hs = []
        h = x
        for module in unet.input_blocks:
            h = module(h, emb, ctx_b)
            hs.append(h)
        h = unet.middle_block(h, emb, ctx_b)
        ctrl = list(ctrl)
        h = h + ctrl.pop()
        for module in unet.output_blocks:
            h = torch.cat([h, hs.pop() + ctrl.pop()], dim=1)
            h = module(h, emb, ctx_b)
        return unet.out(h)

    cond = {"c_concat": [xt_torch], "c_crossattn": [ctx_b]}
    model_fn = dpm.model_wrapper(
        lambda x, t, c: apply_model(x, t, c), ns, model_type="noise",
        guidance_type="classifier-free", condition=cond,
        unconditional_condition=cond, guidance_scale=9.0)
    solver = dpm.DPM_Solver(model_fn, ns, predict_x0=True,
                            thresholding=False)
    with torch.no_grad():
        samples, _ = solver.sample(x_t.clone(), steps=4,
                                   skip_type="time_uniform",
                                   method="multistep", order=3,
                                   lower_order_final=True)
        _, hs_skips = vae_enc(xt_torch * 2 - 1)
        z = post_quant(samples / 0.18215)
        dec = vae_dec(z, list(hs_skips))
    ref = np.clip((_to_nhwc(dec) + 1.0) / 2.0, 0, 1)

    # ---- enhax side ------------------------------------------------------
    sd = {"cond_txt_empty": ctx_empty}
    for prefix, net_ in (("model.diffusion_model.", unet),
                         ("control_model.", control),
                         ("first_stage_model.encoder.", vae_enc),
                         ("first_stage_model.decoder.", vae_dec),
                         ("first_stage_model.post_quant_conv.", post_quant)):
        sd.update({prefix + k: v for k, v in net_.state_dict().items()})

    model = MODELS.build("quadprior", model_channels=MC, context_dim=CTX,
                         vae_ch=128, num_heads=HEADS, steps=4,
                         context_len=7)
    noise = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    dp = {"image": jnp.asarray(img), "noise": noise}
    template = model.init(jax.random.PRNGKey(0), dp)
    params, report = convert_state_dict(sd, template,
                                        name_map=quadprior_name_map(),
                                        strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, f"unconverted leaves: {unmatched[:12]}"
    got = np.asarray(model.apply(params, dp)["enhanced"])
    err = float(np.max(np.abs(ref - got)))
    assert err <= 5e-3, f"quadprior pipeline max err {err:.2e}"
