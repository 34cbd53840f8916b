"""Per-model torch->flax name maps for checkpoint conversion.

The generic token matcher (torch_weights.convert_state_dict) handles flat
models; deep nested models (two-stage HINet, UNet stacks) need explicit
prefix rewrites so stage-1/stage-2 twins don't cross-match. These builders
produce the ``name_map`` argument for the published checkpoints' naming.
"""

from __future__ import annotations


def zero_dce_name_map() -> dict:
    """Li-Chongyi/Zero-DCE released checkpoints: e_convN.* at top level."""
    return {f"e_conv{i}.": f"dce.e_conv{i}." for i in range(1, 8)}


def hinet_name_map(depth: int = 5) -> dict:
    """megvii HINet checkpoints (hinet.py naming) -> enhax module names."""
    m = {"conv_01.": "conv_01.", "conv_02.": "conv_02.",
         "sam12.": "sam12.", "cat12.": "cat12.", "last.": "last."}
    for i in range(depth):
        m[f"down_path_1.{i}."] = f"down1_{i}."
        m[f"down_path_2.{i}."] = f"down2_{i}."
    for i in range(depth - 1):
        m[f"up_path_1.{i}."] = f"up1_{i}."
        m[f"up_path_2.{i}."] = f"up2_{i}."
        m[f"skip_conv_1.{i}."] = f"skip1_{i}."
        m[f"skip_conv_2.{i}."] = f"skip2_{i}."
    # hinet_arch.py:157 names the strided conv "downsample"; enhax uses "down"
    m["*.downsample."] = ".down."
    return m


def nafnet_name_map(enc_blk_nums=(2, 2, 4, 8), middle_blk_num: int = 12,
                    dec_blk_nums=(2, 2, 2, 2)) -> dict:
    """NAFNet (megvii-research) checkpoints -> enhax module names."""
    m = {"intro.": "intro.", "ending.": "ending."}
    for i, n in enumerate(enc_blk_nums):
        for j in range(n):
            m[f"encoders.{i}.{j}."] = f"enc{i}_{j}."
        m[f"downs.{i}."] = f"down{i}."
    for j in range(middle_blk_num):
        m[f"middle_blks.{j}."] = f"mid_{j}."
    for i, n in enumerate(dec_blk_nums):
        m[f"ups.{i}.0."] = f"up{i}."
        for j in range(n):
            m[f"decoders.{i}.{j}."] = f"dec{i}_{j}."
    # NAFNet_arch.py:39 wraps the SCA conv in Sequential(pool, conv) -> "sca.1"
    m["*.sca.1."] = ".sca."
    return m


def zero_dcepp_name_map() -> dict:
    """Zero-DCE++ (DSConv2d dw_conv/pw_conv naming, zero_dcepp.py:140-146)."""
    m = zero_dce_name_map()
    m["*.dw_conv."] = ".depthwise."
    m["*.pw_conv."] = ".pointwise."
    return m


def restormer_name_map(num_blocks=(4, 6, 6, 8), num_refinement: int = 4) -> dict:
    """Restormer (restormer_arch.py:198-249) -> enhax module names."""
    m = {"patch_embed.proj.": "embed.", "output.": "output."}
    for lvl in range(3):
        for j in range(num_blocks[lvl]):
            m[f"encoder_level{lvl + 1}.{j}."] = f"enc{lvl}_{j}."
            m[f"decoder_level{lvl + 1}.{j}."] = f"dec{lvl}_{j}."
        m[f"down{lvl + 1}_{lvl + 2}.body.0."] = f"down{lvl}."
        m[f"up{lvl + 2}_{lvl + 1}.body.0."] = f"up{lvl}."
    for j in range(num_blocks[3]):
        m[f"latent.{j}."] = f"latent_{j}."
    m["reduce_chan_level3."] = "reduce2."
    m["reduce_chan_level2."] = "reduce1."
    for j in range(num_refinement):
        m[f"refinement.{j}."] = f"refine_{j}."
    # inner renames: LayerNorm body wrapper, qkv depthwise conv
    m["*.norm1.body."] = ".norm1."
    m["*.norm2.body."] = ".norm2."
    m["*.qkv_dwconv."] = ".qkv_dw."
    return m


def retinexformer_name_map(stage: int = 1, level: int = 2,
                           num_blocks=(1, 2, 2)) -> dict:
    """RetinexFormer (RetinexFormer_arch.py:323-358) -> enhax module names."""
    m = {}
    for s in range(stage):
        p = f"body.{s}."
        q = f"stage{s}_"
        m[p + "estimator."] = q + "estimator."
        m[p + "denoiser.embedding."] = q + "denoiser.embedding."
        m[p + "denoiser.bottleneck."] = q + "denoiser.bottleneck."
        m[p + "denoiser.mapping."] = q + "denoiser.mapping."
        for i in range(level):
            m[p + f"denoiser.encoder_layers.{i}.0."] = q + f"denoiser.enc{i}_igab."
            m[p + f"denoiser.encoder_layers.{i}.1."] = q + f"denoiser.enc{i}_down."
            m[p + f"denoiser.encoder_layers.{i}.2."] = q + f"denoiser.enc{i}_illu_down."
            m[p + f"denoiser.decoder_layers.{i}.0."] = q + f"denoiser.dec{i}_up."
            m[p + f"denoiser.decoder_layers.{i}.1."] = q + f"denoiser.dec{i}_fusion."
            m[p + f"denoiser.decoder_layers.{i}.2."] = q + f"denoiser.dec{i}_igab."
    # IGAB internals: blocks.{j}.0 = IG_MSA, blocks.{j}.1 = PreNorm(FFN)
    for j in range(max(num_blocks)):
        m[f"*.blocks.{j}.1.norm."] = f".ffnorm{j}."
        m[f"*.blocks.{j}.1.fn.net.0."] = f".ff{j}.fc1."
        m[f"*.blocks.{j}.1.fn.net.2."] = f".ff{j}.dw."
        m[f"*.blocks.{j}.1.fn.net.4."] = f".ff{j}.fc2."
        m[f"*.blocks.{j}.0."] = f".attn{j}."
    m["*.pos_emb.0."] = ".pos1."
    m["*.pos_emb.2."] = ".pos2."
    return m


def sci_name_map(enhance_layers: int = 1, calibrate_layers: int = 3) -> dict:
    """SCI (sci/model.py) -> enhax names. The torch ModuleList 'blocks' holds
    the SAME module repeatedly (shared weights), so every duplicate maps onto
    the one shared enhax block."""
    m = {
        "enhance.in_conv.0.": "enhance.in_conv.",
        "enhance.conv.0.": "enhance.block.conv.",
        "enhance.conv.1.": "enhance.block.bn.",
        "enhance.out_conv.0.": "enhance.out_conv.",
        "calibrate.in_conv.0.": "calibrate.in_conv.",
        "calibrate.in_conv.1.": "calibrate.in_bn.",
        "calibrate.convs.0.": "calibrate.block1.conv.",
        "calibrate.convs.1.": "calibrate.block1.bn.",
        "calibrate.convs.3.": "calibrate.block2.conv.",
        "calibrate.convs.4.": "calibrate.block2.bn.",
        "calibrate.out_conv.0.": "calibrate.out_conv.",
    }
    for i in range(enhance_layers):
        m[f"enhance.blocks.{i}.0."] = "enhance.block.conv."
        m[f"enhance.blocks.{i}.1."] = "enhance.block.bn."
    for i in range(calibrate_layers):
        m[f"calibrate.blocks.{i}.0."] = "calibrate.block1.conv."
        m[f"calibrate.blocks.{i}.1."] = "calibrate.block1.bn."
        m[f"calibrate.blocks.{i}.3."] = "calibrate.block2.conv."
        m[f"calibrate.blocks.{i}.4."] = "calibrate.block2.bn."
    return m


def ruas_name_map(iem_nums: int = 3, nrm_nums: int = 3) -> dict:
    """RUAS (ruas/model.py) -> enhax names. Handles both Network-level
    prefixes (enhance_net./denoise_net.) and the bare EnhanceNetwork/
    DenoiseNetwork state dicts the published enhance.pt/denoise.pt hold."""
    m = {}
    for i in range(iem_nums):
        m[f"enhance_net.iems.{i}."] = f"enhance_iem{i}."
        m[f"iems.{i}."] = f"enhance_iem{i}."
    for i in range(nrm_nums):
        m[f"denoise_net.nrms.{i}."] = f"denoise_nrm{i}."
        m[f"nrms.{i}."] = f"denoise_nrm{i}."
    m["denoise_net.stem."] = "denoise_stem."
    m["stem."] = "denoise_stem."
    m["denoise_net.activate.0."] = "denoise_out_conv."
    m["activate.0."] = "denoise_out_conv."
    # operations.py wraps each conv as .op
    m["*.op."] = ".conv."
    return m


def uretinexnet_name_map() -> dict:
    """URetinexNet (network/*.py) -> enhax names. Expects the caller to merge
    the three released checkpoints' dicts under decom./model_r./model_l./
    adjust. prefixes."""
    m = {}
    for seq_i, conv_j in ((0, 1), (2, 2), (4, 3), (6, 4)):
        m[f"decom.decom.{seq_i}."] = f"decom.conv{conv_j}."
    m["*.se_layer.fc.0."] = ".se.fc1."
    m["*.se_layer.fc.2."] = ".se.fc2."
    return m


def pairlie_name_map() -> dict:
    """PairLIE (net/net.py): Sequential conv indices 1,4,7,10,13."""
    m = {}
    for tname, fname in (("L_net", "l_net"), ("R_net", "r_net"),
                         ("N_net", "n_net")):
        for j, i in enumerate((1, 4, 7, 10, 13)):
            m[f"{tname}.{tname}.{i}."] = f"{fname}.c{j}.conv."
    return m


def snr_name_map(front_rbs: int = 5, back_rbs: int = 10, light_rbs: int = 6,
                 n_layers: int = 6) -> dict:
    """SNR (low_light_transformer.py) -> enhax names."""
    m = {"HRconv.": "hrconv."}
    for i in range(front_rbs):
        m[f"feature_extraction.{i}."] = f"feat_{i}."
    for i in range(back_rbs):
        m[f"recon_trunk.{i}."] = f"trunk_{i}."
    for i in range(light_rbs):
        m[f"recon_trunk_light.{i}."] = f"light_{i}."
    for i in range(n_layers):
        m[f"transformer.layer_stack.{i}.slf_attn."] = f"tl{i}_attn."
        m[f"transformer.layer_stack.{i}.pos_ffn."] = f"tl{i}_ffn."
    m["*.layer_norm."] = ".norm."
    return m


def yolov8_name_map() -> dict:
    """ultralytics DetectionModel state dicts (model.{i}. indices per
    models/v8/yolov8.yaml) -> enhax m{i} names."""
    m = {}
    for i in range(23):
        m[f"model.{i}."] = f"m{i}."
        m[f"{i}."] = f"m{i}."  # bare-ModuleList exports
    for i in range(3):
        for j in range(3):
            m[f"*.cv2.{i}.{j}."] = f".cv2_{i}_{j}."
            m[f"*.cv3.{i}.{j}."] = f".cv3_{i}_{j}."
    for k in range(9):  # C2f bottleneck lists (yolov8x: up to 9 repeats)
        m[f"*.m.{k}."] = f".m{k}."
    return m


def llflow_name_map(nb: int = 24, n_layers: int = 45) -> dict:
    """LLFlow (LLFlow_arch.py + FlowUpsamplerNet.py) -> enhax names."""
    m = {}
    for i in range(nb):
        m[f"RRDB.RRDB_trunk.{i}."] = f"rrdb.rrdb{i}."
    m["RRDB."] = "rrdb."
    for i in range(n_layers):
        m[f"flowUpsamplerNet.layers.{i}."] = f"step{i}."
    # coupling F nets: Sequential(Conv2d+actnorm, ReLU, Conv2d+actnorm,
    # ReLU, Conv2dZeros) -> c0/c0_an, c1/c1_an, czero(+czero_logs)
    for tname, fname in (("fAffine", "f_affine"), ("fFeatures", "f_features")):
        m[f"*.{tname}.0.actnorm."] = f".{fname}.c0_an."
        m[f"*.{tname}.0."] = f".{fname}.c0."
        m[f"*.{tname}.2.actnorm."] = f".{fname}.c1_an."
        m[f"*.{tname}.2."] = f".{fname}.c1."
        m[f"*.{tname}.4.logs"] = f".{fname}.czero_logs"
        m[f"*.{tname}.4."] = f".{fname}.czero."
    m["*.RDB1."] = ".rdb1."
    m["*.RDB2."] = ".rdb2."
    m["*.RDB3."] = ".rdb3."
    m["*.fine_tune_color_map.0."] = ".fine_tune_color_map."
    return m


def retinexnet_name_map() -> dict:
    """RetinexNet (retinexnet/model.py) -> enhax names (replicate-pad conv
    wrappers expose the inner conv as `.conv`)."""
    mm = {
        "decom.net1_conv0.": "decom.conv0.conv.",
        "decom.net1_recon.": "decom.recon.conv.",
        "relight.net2_conv0_1.": "relight.conv0_1.conv.",
        "relight.net2_fusion.": "relight.fusion.conv.",
        "relight.net2_output.": "relight.output.",
    }
    for j, i in enumerate((0, 2, 4, 6, 8)):
        mm[f"decom.net1_convs.{i}."] = f"decom.c{j}.conv."
    for i in (1, 2, 3):
        mm[f"relight.net2_conv1_{i}."] = f"relight.conv1_{i}.conv."
        mm[f"relight.net2_deconv1_{i}."] = f"relight.deconv1_{i}.conv."
    return mm


def sgz_name_map() -> dict:
    """SGZ checkpoints (sgz/modeling/model.py DSC depth_conv/point_conv;
    e_convN live at the module top level, unlike enhax zero_dce's dce.*)."""
    return {"*.depth_conv.": ".depthwise.", "*.point_conv.": ".pointwise."}


def dccnet_name_map() -> dict:
    """DCCNet (dccnet/src/model.py): flatten BasicConv Sequentials and the
    Encoder/Decoder/middle ModuleList indices into enhax's flat names."""
    m = {}
    for net in ("g_net", "r_net"):
        for i in range(9):
            m[f"{net}.Encoder.{i}."] = \
                f"{net}.enc{i}" + ("_" if i % 3 == 1 else ".")
        for i in range(9):
            m[f"{net}.Decoder.{i}."] = \
                f"{net}.dec{i}" + ("_" if i % 3 == 2 else ".")
        m[f"{net}.middle."] = f"{net}.mid"
    for i in range(8):
        m[f"c_net.Encoder.{i}."] = \
            f"c_net.enc{i}" + ("_" if i % 3 == 1 else ".")
    m["r_net.pce."] = "r_net."
    m["*.main.main.0."] = ".conv."   # Down_scale/Up_scale BasicConv
    m["*.main.0."] = ".conv."        # plain BasicConv
    m["*.conv.0."] = ".conv."        # cma Sequential conv
    return m


def utvnet_name_map() -> dict:
    """UTVNet (utvnet/models/network.py composition)."""
    m = {}
    for i, j in enumerate(range(0, 13, 2)):
        m[f"noiselevel.model.{j}."] = f"noiselevel.conv{i}."
        m[f"LIGHT.model.{j}."] = f"light.conv{i}."
    for i, j in enumerate((0, 2, 4)):
        m[f"a.hyp.mlp.{j}."] = f"a_hyp.c{i}."
    for seq, n in (("inc", 3), ("conv1", 2), ("conv2", 2), ("conv3", 2),
                   ("conv4", 2), ("convglo", 3), ("convglo1", 2),
                   ("convup1", 2), ("convup2", 2), ("convup3", 2),
                   ("convup4", 2)):
        for i in range(n):
            m[f"denoise.{seq}.{i}."] = f"denoise.{seq}_{i}."
    for g in ("glo", "glo1"):
        m[f"denoise.{g}.global_feature.0."] = f"denoise.{g}.fc1."
        m[f"denoise.{g}.global_feature_1.0."] = f"denoise.{g}.fc2."
    for i in range(1, 5):
        m[f"denoise.up{i}.up."] = f"denoise.up{i}."
    m["denoise.outc.conv."] = "denoise.outc."
    m["*.conv.0."] = "."  # single_conv Sequential flattening
    return m


def mtfe_name_map() -> dict:
    """MTFE (mtfe/model.py + unet_model.py Sequential flattening)."""
    m = {}
    for i in range(1, 5):
        m[f"histnet.stage{i}."] = f"hist_stage{i}."
    m["*.maxpool_conv.1."] = "."          # Down: [pool, DoubleConv]
    m["*.double_conv.0."] = ".conv1."
    m["*.double_conv.1."] = ".bn1."
    m["*.double_conv.3."] = ".conv2."
    m["*.double_conv.4."] = ".bn2."
    m["*.conv.conv1."] = ".conv1."        # Up.conv DoubleConv nesting
    m["*.conv.bn1."] = ".bn1."
    m["*.conv.conv2."] = ".conv2."
    m["*.conv.bn2."] = ".bn2."
    m["*.outc.conv."] = ".outc."
    return m


def fourllie_name_map() -> dict:
    """FourLLIE (FourLLIE.py + SFBlock.py Sequential flattening)."""
    m = {
        "AmpNet.0.conv0.0.": "amp.conv0_pre.",
        "AmpNet.0.conv0.1.": "amp.conv0.",
        "AmpNet.0.conv4.0.": "amp.conv4.",
        "AmpNet.0.conv4.1.": "amp.conv4_post.",
        "AmpNet.0.conv5.0.": "amp.conv5.",
        "AmpNet.0.conv5.1.": "amp.conv5_post.",
        "AmpNet.0.convout.0.": "amp.convout.",
        "AmpNet.0.convout.1.": "amp.convout_post.",
        "AmpNet.0.": "amp.",            # conv1..conv3 ProcessBlocks
        "feature_extraction.0.": "fe_0.",
        "recon_trunk.0.": "rt_0.",
    }
    for i in range(6):
        m[f"recon_trunk_light.{i}."] = f"rtl_{i}."
    for i in range(1, 6):
        m[f"transformer.conv{i}."] = f"sf_conv{i}."
    m["*.block.0."] = ".b0."
    m["*.block.2."] = ".b2."
    m["*.process1.0."] = ".p1a."
    m["*.process1.2."] = ".p1b."
    m["*.process2.0."] = ".p2a."
    m["*.process2.2."] = ".p2b."
    return m


def wakeup_darkness_name_map() -> dict:
    """Wakeup-Darkness (wakeup_darkness/model.py Network_woCalibrate)."""
    return {
        "enhance.in_conv.0.": "in_conv.",
        "enhance.conv.0.": "conv.",
        "enhance.conv.1.": "conv_bn.",
        "enhance.out_conv.0.": "out_conv.",
        "enhance.block.conv1.": "block_conv1.",
        "enhance.block.bn1.": "block_bn1.",
        "enhance.block.conv2.": "block_conv2.",
        "enhance.block.bn2.": "block_bn2.",
        "enhance.block.gate.0.": "block_gate.",
        "enhance.fusion.": "fusion.",
        "*.norm1.body.": ".norm1.",
        "*.norm2.body.": ".norm2.",
    }


def nerco_name_map(n_blocks: int = 9) -> dict:
    """NeRCo (nerco/models/networks.py Sequential indices; dropout
    variant: ResnetBlock convs at conv_block.1/.6)."""
    m = {}
    for net in ("netPre", "netG_A"):
        m[f"{net}.model.1."] = f"{net}.body.conv_in."
        m[f"{net}.model.4."] = f"{net}.body.down0."
        m[f"{net}.model.7."] = f"{net}.body.down1."
        for i in range(n_blocks):
            m[f"{net}.model.{10 + i}.conv_block.1."] = \
                f"{net}.body.block{i}.conv1."
            m[f"{net}.model.{10 + i}.conv_block.6."] = \
                f"{net}.body.block{i}.conv2."
        m[f"{net}.model.{10 + n_blocks}."] = f"{net}.body.up0."
        m[f"{net}.model.{13 + n_blocks}."] = f"{net}.body.up1."
    m[f"netG_A.model.{17 + n_blocks}."] = "netG_A.conv_out."
    for i in range(4):
        m[f"netPre.mlp.imnet.layers.{2 * i}."] = f"netPre.mlp.fc{i}."
    m["netH.model.1."] = "netH.conv_in."
    for i in range(3):
        m[f"netH.model.{4 + i}.conv_block.1."] = f"netH.block{i}.conv1."
        m[f"netH.model.{4 + i}.conv_block.6."] = f"netH.block{i}.conv2."
    return m


def airnet_name_map(n_groups: int = 5, n_blocks: int = 5) -> dict:
    """AirNet (airnet/net/{model,DGRN,encoder,deform_conv}.py)."""
    m = {"E.E.encoder_q.E_pre.": "E_pre.",
         "R.head.0.": "head.",
         f"R.body.{n_groups}.": "body_conv.",
         "R.tail.0.": "tail."}
    for g in range(n_groups):
        m[f"R.body.{g}.body.{n_blocks}."] = f"g{g}.conv."
        for b in range(n_blocks):
            m[f"R.body.{g}.body.{b}."] = f"g{g}.b{b}."
    m["*.backbone.0."] = ".bb0."
    m["*.backbone.1."] = ".bn0."
    m["*.backbone.3."] = ".bb1."
    m["*.backbone.4."] = ".bn1."
    m["*.shortcut.0."] = ".sc."
    m["*.shortcut.1."] = ".sc_bn."
    m["*.conv_gamma.0."] = ".gamma1."
    m["*.conv_gamma.2."] = ".gamma2."
    m["*.conv_beta.0."] = ".beta1."
    m["*.conv_beta.2."] = ".beta2."
    return m


def adair_name_map(num_blocks=(4, 6, 6, 8), num_refinement: int = 4) -> dict:
    """AdaIR (adair/net/model.py:372-475) = restormer map + FreModules."""
    m = restormer_name_map(num_blocks=num_blocks,
                           num_refinement=num_refinement)
    for i in (1, 2, 3):
        m[f"fre{i}.channel_cross_l."] = f"fre{i}.cross_l."
        m[f"fre{i}.channel_cross_h."] = f"fre{i}.cross_h."
        m[f"fre{i}.channel_cross_agg."] = f"fre{i}.cross_agg."
        m[f"fre{i}.frequency_refine.SpatialGate.spatial."] = \
            f"fre{i}.refine.sg_conv."
        m[f"fre{i}.frequency_refine.ChannelGate.mlp.0."] = \
            f"fre{i}.refine.cg1."
        m[f"fre{i}.frequency_refine.ChannelGate.mlp.2."] = \
            f"fre{i}.refine.cg2."
        m[f"fre{i}.frequency_refine.proj."] = f"fre{i}.refine.proj."
        m[f"fre{i}.rate_conv.0."] = f"fre{i}.rate1."
        m[f"fre{i}.rate_conv.2."] = f"fre{i}.rate2."
    m["*.q_dwconv."] = ".q_dw."
    m["*.kv_dwconv."] = ".kv_dw."
    return m


def quadprior_name_map(channel_mult=(1, 2, 4, 4), num_res: int = 2) -> dict:
    """QuadPrior ControlLDM checkpoints (cldm/cldm.py + openaimodel.py +
    my_vae/models.py naming) -> enhax module names.

    Torch prefixes: 'model.diffusion_model.' (UNet), 'control_model.'
    (ControlNet), 'first_stage_model.' (skip-VAE), 'cond_txt_empty'.
    """
    m = {}
    n_levels = len(channel_mult)

    def unet_enc(tp, fp):
        m[f"{tp}time_embed.0."] = f"{fp}time_fc1."
        m[f"{tp}time_embed.2."] = f"{fp}time_fc2."
        m[f"{tp}input_blocks.0.0."] = f"{fp}core.in0."
        i = 1
        for level in range(n_levels):
            for _ in range(num_res):
                m[f"{tp}input_blocks.{i}.0."] = f"{fp}core.ib{i}_res."
                if level < n_levels - 1:
                    m[f"{tp}input_blocks.{i}.1."] = f"{fp}core.ib{i}_t."
                i += 1
            if level != n_levels - 1:
                m[f"{tp}input_blocks.{i}.0.op."] = f"{fp}core.ib{i}_down."
                i += 1
        m[f"{tp}middle_block.0."] = f"{fp}core.mid_res1."
        m[f"{tp}middle_block.1."] = f"{fp}core.mid_t."
        m[f"{tp}middle_block.2."] = f"{fp}core.mid_res2."
        return i

    # UNet
    unet_enc("model.diffusion_model.", "unet.")
    i = 0
    for level in reversed(range(n_levels)):
        for r in range(num_res + 1):
            m[f"model.diffusion_model.output_blocks.{i}.0."] = \
                f"unet.ob{i}_res."
            j = 1
            if level < n_levels - 1:
                m[f"model.diffusion_model.output_blocks.{i}.1."] = \
                    f"unet.ob{i}_t."
                j = 2
            if level > 0 and r == num_res:
                m[f"model.diffusion_model.output_blocks.{i}.{j}.conv."] = \
                    f"unet.ob{i}_up."
            i += 1
    m["model.diffusion_model.out.0."] = "unet.out_gn."
    m["model.diffusion_model.out.2."] = "unet.out_conv."

    # ControlNet
    n_taps = unet_enc("control_model.", "control.")
    for z in range(n_taps):
        m[f"control_model.zero_convs.{z}.0."] = f"control.zero{z}."
    m["control_model.middle_block_out.0."] = "control.mid_out."
    for j, t in enumerate(range(0, 16, 2)):
        m[f"control_model.input_hint_block.{t}."] = f"control.hint{j}."
    for j, t in enumerate((0, 2, 4)):
        m[f"control_model.prior_conv.conv.{t}."] = \
            f"control.prior_conv.conv{j}."
    m["control_model.prior_conv.gcm"] = "control.prior_conv.gcm"

    # skip-VAE
    for l_ in range(n_levels):
        for b in range(num_res):
            m[f"first_stage_model.encoder.down.{l_}.block.{b}."] = \
                f"vae_enc.down{l_}_b{b}."
        m[f"first_stage_model.encoder.down.{l_}.downsample.conv."] = \
            f"vae_enc.down{l_}_ds."
        for b in range(num_res + 1):
            m[f"first_stage_model.decoder.up.{l_}.block.{b}."] = \
                f"vae_dec.up{l_}_b{b}."
        m[f"first_stage_model.decoder.up.{l_}.upsample.conv."] = \
            f"vae_dec.up{l_}_us."
        m[f"first_stage_model.decoder.up.{l_}.upsample.new_merge.conv."] = \
            f"vae_dec.up{l_}_merge."
    m["first_stage_model.decoder.new_last_procee.conv1."] = \
        "vae_dec.big_conv1."
    m["first_stage_model.decoder.new_last_procee.conv2."] = \
        "vae_dec.big_conv2."
    m["first_stage_model.encoder."] = "vae_enc."   # conv_in/mid/norm/conv_out
    m["first_stage_model.decoder."] = "vae_dec."
    m["first_stage_model.post_quant_conv."] = "post_quant_conv."
    # sub rules: ResBlock/Transformer/VAE-mid flattening
    m["*.in_layers.0."] = ".in_gn."
    m["*.in_layers.2."] = ".in_conv."
    m["*.emb_layers.1."] = ".emb_fc."
    m["*.out_layers.0."] = ".out_gn."
    m["*.out_layers.3."] = ".out_conv."
    m["*.skip_connection."] = ".skip."
    m["*.transformer_blocks.0."] = "."
    m["*.to_out.0."] = ".to_out."
    m["*.ff.net.0.proj."] = ".ff.geglu."
    m["*.ff.net.2."] = ".ff.out."
    m["*.mid.block_1."] = ".mid_block_1."
    m["*.mid.attn_1."] = ".mid_attn_1."
    m["*.mid.block_2."] = ".mid_block_2."
    return m


def tinyvit_name_map(depths=(2, 2, 6, 2), prefix: str = "",
                     flax_prefix: str = "") -> dict:
    """MobileSAM TinyViT image encoder (tiny_vit_sam.py:462-620)."""
    m = {f"{prefix}patch_embed.seq.0.": f"{flax_prefix}embed_c1.",
         f"{prefix}patch_embed.seq.2.": f"{flax_prefix}embed_c2."}
    for s, dep in enumerate(depths):
        for j in range(dep):
            m[f"{prefix}layers.{s}.blocks.{j}."] = f"{flax_prefix}s{s}_b{j}."
        if s < len(depths) - 1:
            m[f"{prefix}layers.{s}.downsample."] = f"{flax_prefix}s{s}_ds."
    for i, n in enumerate(("neck0", "neck1", "neck2", "neck3")):
        m[f"{prefix}neck.{i}."] = f"{flax_prefix}{n}."
    m["*.mlp.norm."] = ".mlp_norm."
    m["*.mlp.fc1."] = ".fc1."
    m["*.mlp.fc2."] = ".fc2."
    return m


def hvi_cidnet_name_map() -> dict:
    """HVI-CIDNet (hvi_cidnet.py:475-668 naming)."""
    m = {"trans.density_k": "density_k"}
    for blk in ("hve_block0", "ie_block0", "hvd_block0", "id_block0"):
        m[f"{blk}.1."] = f"{blk}."   # Sequential: [ReplicationPad, Conv]
    m["*.down.0."] = ".conv."        # DownsampleNorm
    m["*.up_scale.0."] = ".conv."    # UpsampleNorm
    m["*.up."] = ".fuse."
    m["*.q_dwconv."] = ".q_dw."
    m["*.kv_dwconv."] = ".kv_dw."
    m["*.prelu.weight"] = ".prelu.alpha"
    return m


def lyt_net_name_map() -> dict:
    """LYT-Net (lyt_net.py:275-388 naming)."""
    m = {}
    for blk in ("process_y", "process_cb", "process_cr"):
        m[f"{blk}.0."] = f"{blk}."
    m["*.query_dense."] = ".query."
    m["*.key_dense."] = ".key."
    m["*.value_dense."] = ".value."
    m["*.combine_heads."] = ".combine."
    m["*.layer_norm.norm."] = ".norm."
    m["*.depthwise_conv."] = ".dw."
    m["*.se_attn."] = ".se."
    return m


def llunetpp_name_map(levels: int = 5) -> dict:
    """LLUNet++ (llunetpp.py:160-245 conv{i}_{j} node names)."""
    m = {}
    for j in range(levels):
        for i in range(levels - j):
            m[f"conv{i}_{j}."] = f"x{i}{j}."
    return m


def lllinet_name_map(levels: int = 5) -> dict:
    """LLLiNet (lllinet.py conv{i}_{j} node names; trans.density_k for
    the HVI variant)."""
    m = {"trans.density_k": "density_k"}
    for j in range(levels):
        for i in range(levels - j):
            m[f"conv{i}_{j}."] = f"x{i}{j}."
    return m


def unet_name_map() -> dict:
    """UNet (unet.py:35-199): down{i}.conv / up{i}.conv wrappers."""
    m = {"inc.": "inc.", "outc.conv.": "outc."}
    for i in range(1, 5):
        m[f"down{i}.conv."] = f"down{i}."
        m[f"up{i}.conv."] = f"up{i}."
    return m


def sam_name_map(depth: int = 12) -> dict:
    """SAM (segment_anything/modeling): vit encoder + prompt encoder +
    two-way mask decoder."""
    m = {"image_encoder.patch_embed.proj.": "image_encoder.patch_embed.",
         "image_encoder.pos_embed": "image_encoder.pos_embed",
         "image_encoder.neck.0.": "image_encoder.neck_conv1.",
         "image_encoder.neck.1.": "image_encoder.neck_ln1.",
         "image_encoder.neck.2.": "image_encoder.neck_conv2.",
         "image_encoder.neck.3.": "image_encoder.neck_ln2."}
    for i in range(depth):
        m[f"image_encoder.blocks.{i}.mlp.lin1."] =             f"image_encoder.block{i}.lin1."
        m[f"image_encoder.blocks.{i}.mlp.lin2."] =             f"image_encoder.block{i}.lin2."
        m[f"image_encoder.blocks.{i}."] = f"image_encoder.block{i}."
    pe = "prompt_encoder."
    m[pe + "pe_layer.positional_encoding_gaussian_matrix"] = pe + "pe_gauss"
    for i in range(4):
        m[pe + f"point_embeddings.{i}.weight"] = pe + f"point_embed{i}"
    m[pe + "not_a_point_embed.weight"] = pe + "not_a_point"
    m[pe + "no_mask_embed.weight"] = pe + "no_mask"
    for t, f in ((0, "md_conv1"), (1, "md_ln1"), (3, "md_conv2"),
                 (4, "md_ln2"), (6, "md_conv3")):
        m[pe + f"mask_downscaling.{t}."] = pe + f"{f}."
    d = "mask_decoder."
    m[d + "iou_token.weight"] = d + "iou_token"
    m[d + "mask_tokens.weight"] = d + "mask_tokens"
    for i in range(2):
        m[d + f"transformer.layers.{i}."] = d + f"layer{i}."
    m[d + "transformer.final_attn_token_to_image."] = d + "final_t2i."
    m[d + "transformer.norm_final_attn."] = d + "norm_final."
    m[d + "output_upscaling.0."] = d + "up1."
    m[d + "output_upscaling.1."] = d + "up_ln."
    m[d + "output_upscaling.3."] = d + "up2."
    for i in range(4):
        for j in range(3):
            m[d + f"output_hypernetworks_mlps.{i}.layers.{j}."] =                 d + f"hyper{i}_l{j}."
        m[d + f"iou_prediction_head.layers.{i}."] = d + f"iou_l{i}."
    m["*.cross_attn_token_to_image."] = ".t2i."
    m["*.cross_attn_image_to_token."] = ".i2t."
    m["*.mlp.lin1."] = ".lin1."
    m["*.mlp.lin2."] = ".lin2."
    return m


def depth_anything_v2_name_map(depth: int = 12) -> dict:
    """Depth Anything V2 (dpt.py + dinov2.py timm-style keys)."""
    m = {"pretrained.patch_embed.proj.": "vit.patch_embed.",
         "pretrained.cls_token": "vit.cls_token",
         "pretrained.pos_embed": "vit.pos_embed",
         "pretrained.norm.": "vit.norm."}
    for i in range(depth):
        m[f"pretrained.blocks.{i}."] = f"vit.block{i}."
    for i in range(4):
        m[f"depth_head.projects.{i}."] = f"proj{i}."
        m[f"depth_head.resize_layers.{i}."] = f"resize{i}."
        m[f"depth_head.scratch.layer{i + 1}_rn."] = f"layer{i + 1}_rn."
        m[f"depth_head.scratch.refinenet{i + 1}.resConfUnit1."] =             f"refinenet{i + 1}.rcu1."
        m[f"depth_head.scratch.refinenet{i + 1}.resConfUnit2."] =             f"refinenet{i + 1}.rcu2."
        m[f"depth_head.scratch.refinenet{i + 1}.out_conv."] =             f"refinenet{i + 1}.out_conv."
    m["depth_head.scratch.output_conv1."] = "output_conv1."
    m["depth_head.scratch.output_conv2.0."] = "output_conv2a."
    m["depth_head.scratch.output_conv2.2."] = "output_conv2b."
    m["*.attn.qkv."] = ".qkv."
    m["*.attn.proj."] = ".proj."
    m["*.mlp.fc1."] = ".fc1."
    m["*.mlp.fc2."] = ".fc2."
    m["*.ls1.gamma"] = ".ls1"
    m["*.ls2.gamma"] = ".ls2"
    return m


def diinn_name_map(num_blocks: int = 16, num_convs: int = 8,
                   depth: int = 4) -> dict:
    """DIINN (diinn.py:7-188 + rdn.py config B)."""
    m = {"encoder.SFENet1.": "encoder.sfe1.",
         "encoder.SFENet2.": "encoder.sfe2.",
         "encoder.GFF.0.": "encoder.gff1.",
         "encoder.GFF.1.": "encoder.gff2.",
         "decoder.last_layer.": "last."}
    for i in range(num_blocks):
        for j in range(num_convs):
            m[f"encoder.RDBs.{i}.convs.{j}.conv.0."] = f"encoder.rdb{i}_c{j}."
        m[f"encoder.RDBs.{i}.LFF."] = f"encoder.rdb{i}_lff."
    for i in range(depth):
        m[f"decoder.K.{i}.0."] = f"K{i}."
        m[f"decoder.Q.{i}.0."] = f"Q{i}."
    return m


def srno_name_map(enc_blocks: int = 16) -> dict:
    """SRNO (sronet.py:12-95 + galerkin.py + edsr.py baseline)."""
    m = {"encoder.head.0.": "encoder.head."}
    for i in range(enc_blocks):
        m[f"encoder.body.{i}.body.0."] = f"encoder.b{i}_c1."
        m[f"encoder.body.{i}.body.2."] = f"encoder.b{i}_c2."
    m[f"encoder.body.{enc_blocks}."] = "encoder.tail."
    for t, f in (("conv0", "attn0"), ("conv1", "attn1")):
        m[f"{t}.qkv_proj."] = f"{f}.qkv."
        m[f"{t}.o_proj1."] = f"{f}.o1."
        m[f"{t}.o_proj2."] = f"{f}.o2."
        m[f"{t}.kln."] = f"{f}.kln."
        m[f"{t}.vln."] = f"{f}.vln."
    return m


def lama_name_map(n_blocks: int = 9, n_downs: int = 3) -> dict:
    """LaMa FFCResNetGenerator (ffc.py:305-369) Sequential indices ->
    enhax names (ffc_resnet_075 layout)."""
    m = {"model.1.ffc.convl2l.": "stem_conv.", "model.1.bn_l.": "stem_bn."}
    for i in range(n_downs):
        m[f"model.{2 + i}.ffc.convl2l."] = f"down{i}_l2l."
        m[f"model.{2 + i}.bn_l."] = f"down{i}_bn_l."
    last = n_downs - 1
    m[f"model.{2 + last}.ffc.convl2g."] = f"down{last}_l2g."
    m[f"model.{2 + last}.bn_g."] = f"down{last}_bn_g."
    for i in range(n_blocks):
        for c in (1, 2):
            m[f"model.{2 + n_downs + i}.conv{c}."] = f"block{i}.c{c}."
    up0 = 2 + n_downs + n_blocks + 1       # after ConcatTupleLayer
    for i in range(n_downs):
        m[f"model.{up0 + 3 * i}."] = f"up{i}_deconv."
        m[f"model.{up0 + 3 * i + 1}."] = f"up{i}_bn."
    m[f"model.{up0 + 3 * n_downs + 1}."] = "out_conv."
    m["*.ffc.convl2l."] = ".l2l."
    m["*.ffc.convl2g."] = ".l2g."
    m["*.ffc.convg2l."] = ".g2l."
    m["*.ffc.convg2g.conv1.0."] = ".g2g.conv1."
    m["*.ffc.convg2g.conv1.1."] = ".g2g.bn1."
    m["*.ffc.convg2g.fu.conv_layer."] = ".g2g.fu.conv."
    m["*.ffc.convg2g.fu.bn."] = ".g2g.fu.bn."
    m["*.ffc.convg2g.conv2."] = ".g2g.conv2."
    return m


def gcenet_name_map() -> dict:
    """GCENet (gcenet.py:203-233 DSConv blocks under ``en.``)."""
    return {
        "en.": "",
        "*.conv.dw_conv.": ".DSConv_0.depthwise.",
        "*.conv.pw_conv.": ".DSConv_0.pointwise.",
    }


def zero_mie_name_map(hidden_layers: int = 2, out_layers: int = 1) -> dict:
    """Zero-MIE (zero_mie.py:253-556 + inr.py:752-925 INR stacks). The
    decoder's last layer is a sigmoid-linear INRLayer."""
    m = {}
    for net in ("value_net", "depth_net", "edge_net", "coords_net"):
        for i in range(hidden_layers + 1):
            m[f"mlp.{net}.net.{i}.nonlinear.linear."] = \
                f"{net}_net{i}.Dense_0."
    for i in range(out_layers):
        m[f"mlp.output_net.net.{i}.nonlinear.linear."] = \
            f"output_net_net{i}.Dense_0."
    m[f"mlp.output_net.net.{out_layers}.nonlinear.linear."] = \
        f"output_net_net{out_layers}."
    return m


def zero_mie_ms_name_map(num_scales: int = 3, hidden_layers: int = 2,
                         out_layers: int = 1) -> dict:
    """ZeroMIE_MS (zero_mie_ms.py:234-607): per-scale value_nets ModuleList
    + depth/edge/coords encoders + decoder; the coords Fourier buffer B
    (inr.py:856-860) maps to the flax param ``B`` (exact rule FIRST — the
    prefix scan is first-match-wins)."""
    m = {"mlp.coords_net.B": "B"}
    for s in range(num_scales):
        for i in range(hidden_layers + 1):
            m[f"mlp.value_nets.{s}.net.{i}.nonlinear.linear."] = \
                f"value_net{s}_net{i}.Dense_0."
    for net in ("depth_net", "edge_net", "coords_net"):
        for i in range(hidden_layers + 1):
            m[f"mlp.{net}.net.{i}.nonlinear.linear."] = \
                f"{net}_net{i}.Dense_0."
    for i in range(out_layers):
        m[f"mlp.output_net.net.{i}.nonlinear.linear."] = \
            f"output_net_net{i}.Dense_0."
    m[f"mlp.output_net.net.{out_layers}.nonlinear.linear."] = \
        f"output_net_net{out_layers}."
    return m


def zid_name_map(skips=(0, 0, 0, 4, 4)) -> dict:
    """ZID (zid.py:79-189): the DIP hourglass is built with
    ``add_module(str(len+1))`` so container children are named 1..8 and
    each conv is a Sequential(pad, conv) -> ``.N.1``; this walks the
    construction recursion for both image_net and mask_net, plus the VAE
    (decoder conv1..conv4 are dead weights — drop before converting)."""
    m = {}
    for net in ("image_net", "mask_net"):
        path = ""
        for i in range(len(skips)):
            deeper = path + ("1.1." if skips[i] else "1.")
            if skips[i]:
                m[f"{net}.{path}1.0.1.1."] = f"{net}.l{i}_skip_conv."
                m[f"{net}.{path}1.0.2."] = f"{net}.l{i}_skip_bn."
            m[f"{net}.{path}2."] = f"{net}.l{i}_cat_bn."
            m[f"{net}.{path}3.1."] = f"{net}.l{i}_u1."
            m[f"{net}.{path}4."] = f"{net}.l{i}_u1_bn."
            m[f"{net}.{path}6.1."] = f"{net}.l{i}_u2."
            m[f"{net}.{path}7."] = f"{net}.l{i}_u2_bn."
            m[f"{net}.{deeper}1.1."] = f"{net}.l{i}_d1."
            m[f"{net}.{deeper}2."] = f"{net}.l{i}_d1_bn."
            m[f"{net}.{deeper}4.1."] = f"{net}.l{i}_d2."
            m[f"{net}.{deeper}5."] = f"{net}.l{i}_d2_bn."
            path = deeper + "7."
        m[f"{net}.9.1."] = f"{net}.out_conv."
    for i in range(1, 5):
        m[f"ambient_net.encoder.conv{i}.0."] = f"ambient_net.enc_conv{i}."
    m["ambient_net.encoder.fc1."] = "ambient_net.fc1."
    m["ambient_net.encoder.fc2."] = "ambient_net.fc2."
    m["ambient_net.decoder.linear0."] = "ambient_net.linear0."
    for i, (ci, bi) in enumerate(((1, 2), (5, 6), (9, 10))):
        m[f"ambient_net.decoder.de.{ci}."] = f"ambient_net.de_conv{i + 1}."
        m[f"ambient_net.decoder.de.{bi}."] = f"ambient_net.de_bn{i + 1}."
    m["ambient_net.decoder.de.13."] = "ambient_net.de_conv4."
    return m


def colie_name_map(num_layers: int = 4, add_layer: int = 2) -> dict:
    """CoLIE (colie.py:135-155 SIREN Sequential indices). The final
    output layer is plain linear (is_last)."""
    m = {"trans.density_k": "density_k"}
    n_branch = max(add_layer - 2, 0) + 2
    for net in ("patch_net", "patch_d_net", "patch_e_net", "spatial_net"):
        for i in range(n_branch):
            m[f"{net}.{i}.linear."] = f"{net}.sine{i}.Dense_0."
    n_out = (num_layers - 1 - add_layer) + 1
    for i in range(n_out - 1):
        m[f"output_net.{i}.linear."] = f"output_net.sine{i}.Dense_0."
    m[f"output_net.{n_out - 1}.linear."] = f"output_net.lin{n_out - 1}."
    return m


def rsfnet_name_map(factors: int = 5, num_iters: int = 3) -> dict:
    """RSFNet (rsfnet.py:90-249): scalar threshold ParameterLists +
    Fusion convs (e_conv4 is dead weight upstream — drop it before
    converting)."""
    m = {}
    for f in range(factors):
        for t in range(num_iters):
            for nm in ("lambda_a", "lambda_e", "step"):
                m[f"{nm}.{f}.{t}"] = f"factorization.{nm}_{f}_{t}"
    for i in (1, 2, 3):
        m[f"e_conv{i}."] = f"fusion.e_conv{i}."
    for i in (5, 6, 7):
        m[f"d_conv{i}."] = f"fusion.d_conv{i}."
    return m


def psenet_name_map() -> dict:
    """PSENet (psenet.py:116-218 MobileBottleneck Sequential indices)."""
    return {
        "model.": "",
        "*.conv.3.fc.0.": ".se.fc1.",
        "*.conv.3.fc.2.": ".se.fc2.",
        "*.conv.0.": ".pw.",
        "*.conv.2.": ".dw.",
        "*.conv.5.": ".pw_out.",
    }


def zero_ig_name_map() -> dict:
    """ZERO-IG (zero_ig.py:307-347): the Enhance residual block is ONE
    shared Conv+BN; drop the duplicate ``blocks.*`` keys before
    converting."""
    return {
        "enhance.in_conv.0.": "enhance.in_conv.",
        "enhance.conv.0.": "enhance.block_conv.",
        "enhance.conv.1.": "enhance.block_bn.",
        "enhance.out_conv.0.": "enhance.out_conv.",
    }


def zero_restore_name_map(variant: str = "llie") -> dict:
    """Zero-Restore (zero_restore_llie.py:196-224 / dehaze :159-181).
    The SKConv ModuleList shares ONE InConv across scales; drop the
    duplicate ``convs.1/2`` keys before converting."""
    m = {"estimation.in_conv.convs.0.": "estimation.in_conv.in_conv."}
    for i in range(3):
        m[f"*.fcs.{i}."] = f".fcs{i}."
    m["*.in_conv.conv.0."] = ".in_conv.conv.conv."
    m["*.in_conv.conv.1."] = ".in_conv.conv.gn."
    m["*.in_conv.convf.0."] = ".in_conv.convf.conv."
    m["*.in_conv.convf.1."] = ".in_conv.convf.gn."
    if variant == "llie":
        m["*.conv_a1.conv.0."] = ".conv_a1.conv."
        m["*.conv_a1.conv.1."] = ".conv_a1.gn."
    m["*.conv.0."] = ".c1.conv."
    m["*.conv.1."] = ".c1.gn."
    m["*.conv.3."] = ".c2.conv."
    m["*.conv.4."] = ".c2.gn."
    m["*.conv_t2."] = ".conv_t2.conv."
    m["*.conv_a3."] = ".conv_a3.conv."
    return m


def rrdnet_name_map() -> dict:
    """RRDNet (rrdnet.py:206-239 Sequential branch names)."""
    m = {}
    for net in ("illumination_net", "reflectance_net", "noise_net"):
        for i in range(4):
            m[f"{net}.{2 * i}."] = f"{net}.conv{i}."
        m[f"{net}.8."] = f"{net}.out."
    return m


def neurop_name_map() -> dict:
    """NeurOP (neurop.py:265-380 re / :153-262 init module names)."""
    m = {"image_encoder.": "encoder."}
    for k in ("ex", "bc", "vb"):
        m[f"{k}_renderer."] = f"{k}_block."
        m[f"{k}_predictor.fc3."] = f"predict_{k}."
        m[f"renderer.{k}_block."] = f"{k}_block."  # neurop_init
    return m


def uformer_name_map() -> dict:
    """Uformer (uformer.py:702-1104 module names). Reference decoder
    index i corresponds to enhax level 3-i."""
    m = {
        "input_proj.proj.0.": "input_proj.",
        "output_proj.proj.0.": "output_proj.",
        "conv.blocks.": "mid_",
    }
    for i in range(4):
        m[f"encoderlayer_{i}.blocks."] = f"enc{i}_"
        m[f"decoderlayer_{i}.blocks."] = f"dec{3 - i}_"
        m[f"downsample_{i}.conv.0."] = f"down{i}."
        m[f"upsample_{i}.deconv.0."] = f"up{3 - i}."
    m["*.attn.qkv.to_q."] = ".attn.to_q."
    m["*.attn.qkv.to_kv."] = ".attn.to_kv."
    m["*.relative_position_bias_table"] = ".rel_pos_bias"
    m["*.modulator.weight"] = ".attn.modulator"
    m["*.mlp.linear1.0."] = ".ffn.fc1."
    m["*.mlp.dwconv.0.dw_conv."] = ".ffn.dwconv."
    m["*.mlp.dwconv.0."] = ".ffn.dwconv."
    m["*.mlp.linear2.0."] = ".ffn.fc2."
    return m


def mprnet_name_map(num_cab: int = 8) -> dict:
    """MPRNet (mprnet.py:380-486 module names).

    Ordering matters: ORB body indices and encoder/decoder level indices
    must be rewritten BEFORE the generic CAB-inner ``body.{j}`` rules.
    """
    m = {}
    for i in (1, 2, 3):
        m[f"shallow_feat{i}.0."] = f"shallow{i}_conv."
        m[f"shallow_feat{i}.1."] = f"shallow{i}_cab."
    m["stage1_encoder."] = "enc1."
    m["stage2_encoder."] = "enc2."
    m["stage1_decoder."] = "dec1."
    m["stage2_decoder."] = "dec2."
    m["stage3_orsnet."] = "ors."
    for i in (1, 2, 3):
        m[f"*.orb{i}.body.{num_cab}."] = f".orb{i}_conv."
        for j in range(num_cab):
            m[f"*.orb{i}.body.{j}."] = f".orb{i}_{j}."
    for lvl in (1, 2, 3):
        for j in range(2):
            m[f"*.encoder_level{lvl}.{j}."] = f".lvl{lvl}_{j}."
            m[f"*.decoder_level{lvl}.{j}."] = f".lvl{lvl}_{j}."
    m["*.down12.down.1."] = ".down12."
    m["*.down23.down.1."] = ".down23."
    m["*.up21.up.1."] = ".up21."
    m["*.up32.up.1."] = ".up32."
    m["*.up_enc1.up.1."] = ".up_enc1."
    m["*.up_dec1.up.1."] = ".up_dec1."
    m["*.up_enc2.0.up.1."] = ".up_enc2a."
    m["*.up_enc2.1.up.1."] = ".up_enc2b."
    m["*.up_dec2.0.up.1."] = ".up_dec2a."
    m["*.up_dec2.1.up.1."] = ".up_dec2b."
    m["*.body.0."] = ".conv1."
    m["*.body.1.weight"] = ".prelu"
    m["*.body.2."] = ".conv2."
    m["*.CA.conv_du.0."] = ".ca1."
    m["*.CA.conv_du.2."] = ".ca2."
    return m


def sam2_hiera_name_map(depth: int = 12, trunk_prefix: str = "trunk.") -> dict:
    """SAM2 released checkpoints' image-encoder naming
    (sam2/modeling/backbones/hieradet.py + image_encoder.py FpnNeck) ->
    enhax Hiera/SAM2ImageEncoder module names. ``trunk_prefix=''`` maps a
    bare-trunk state dict onto the standalone Hiera module."""
    tp = trunk_prefix
    m = {f"{tp}patch_embed.proj.": f"{tp}patch_embed.",
         f"{tp}pos_embed_window": f"{tp}pos_embed_window",
         f"{tp}pos_embed": f"{tp}pos_embed"}
    for i in sorted(range(depth), reverse=True):  # two-digit indices first
        m[f"{tp}blocks.{i}."] = f"{tp}block{i}."
    for j in range(4):
        m[f"neck.convs.{j}.conv."] = f"neck.conv{j}."
    m["*.mlp.layers.0."] = ".mlp1."
    m["*.mlp.layers.1."] = ".mlp2."
    return m


def sam2_full_name_map(depth: int = 12) -> dict:
    """Full SAM2 released checkpoints (SAM2Base state dict naming,
    sam2_base.py) -> enhax SAM2Hiera module names. Image size must match
    the checkpoint's (1024). ``depth``: trunk block count (t: 12, s: 16,
    b+: 24, l: 48)."""
    m = {"image_encoder.trunk.patch_embed.proj.":
         "image_encoder.trunk.patch_embed.",
         "image_encoder.trunk.pos_embed_window":
         "image_encoder.trunk.pos_embed_window",
         "image_encoder.trunk.pos_embed": "image_encoder.trunk.pos_embed"}
    for i in sorted(range(depth), reverse=True):
        m[f"image_encoder.trunk.blocks.{i}."] = f"image_encoder.trunk.block{i}."
    for j in range(4):
        m[f"image_encoder.neck.convs.{j}.conv."] = f"image_encoder.neck.conv{j}."
    # memory attention
    for i in range(4):
        m[f"memory_attention.layers.{i}."] = f"memory_attention.layer{i}."
    m["memory_attention.norm."] = "memory_attention.norm."
    # memory encoder: mask_downsampler Sequential indices 0,1 / 3,4 / 6,7 /
    # 9,10 (conv, LN) + final conv 12; fuser CXBlocks
    me = "memory_encoder."
    for lyr in range(4):
        m[me + f"mask_downsampler.encoder.{3 * lyr}."] = me + f"down{lyr}."
        m[me + f"mask_downsampler.encoder.{3 * lyr + 1}."] = \
            me + f"down_norm{lyr}."
    m[me + "mask_downsampler.encoder.12."] = me + "down_out."
    m[me + "pix_feat_proj."] = me + "pix_feat_proj."
    for i in range(2):
        m[me + f"fuser.layers.{i}.dwconv."] = me + f"fuse{i}_dwconv."
        m[me + f"fuser.layers.{i}.norm."] = me + f"fuse{i}_norm."
        m[me + f"fuser.layers.{i}.pwconv1."] = me + f"fuse{i}_pwconv1."
        m[me + f"fuser.layers.{i}.pwconv2."] = me + f"fuse{i}_pwconv2."
        m[me + f"fuser.layers.{i}.gamma"] = me + f"fuse{i}_gamma"
    m[me + "out_proj."] = me + "out_proj."
    # prompt encoder (same naming as SAM)
    pe = "sam_prompt_encoder."
    m[pe + "pe_layer.positional_encoding_gaussian_matrix"] = pe + "pe_gauss"
    for i in range(4):
        m[pe + f"point_embeddings.{i}.weight"] = pe + f"point_embed{i}"
    m[pe + "not_a_point_embed.weight"] = pe + "not_a_point"
    m[pe + "no_mask_embed.weight"] = pe + "no_mask"
    for t, f in ((0, "md_conv1"), (1, "md_ln1"), (3, "md_conv2"),
                 (4, "md_ln2"), (6, "md_conv3")):
        m[pe + f"mask_downscaling.{t}."] = pe + f"{f}."
    # mask decoder (SAM naming + obj score + high-res convs)
    d = "sam_mask_decoder."
    m[d + "conv_s0."] = "conv_s0."
    m[d + "conv_s1."] = "conv_s1."
    m[d + "iou_token.weight"] = d + "iou_token"
    m[d + "mask_tokens.weight"] = d + "mask_tokens"
    m[d + "obj_score_token.weight"] = d + "obj_score_token"
    for i in range(2):
        # sam2's transformer MLP is sam2_utils.MLP (mlp.layers.{j}), not
        # SAM's MLPBlock (mlp.lin{j}); more-specific prefixes FIRST (prefix
        # rules break on first match)
        m[d + f"transformer.layers.{i}.mlp.layers.0."] = d + f"layer{i}.lin1."
        m[d + f"transformer.layers.{i}.mlp.layers.1."] = d + f"layer{i}.lin2."
        m[d + f"transformer.layers.{i}."] = d + f"layer{i}."
    m[d + "transformer.final_attn_token_to_image."] = d + "final_t2i."
    m[d + "transformer.norm_final_attn."] = d + "norm_final."
    m[d + "output_upscaling.0."] = d + "up1."
    m[d + "output_upscaling.1."] = d + "up_ln."
    m[d + "output_upscaling.3."] = d + "up2."
    for i in range(4):
        for j in range(3):
            m[d + f"output_hypernetworks_mlps.{i}.layers.{j}."] = \
                d + f"hyper{i}_l{j}."
    for j in range(3):
        m[d + f"iou_prediction_head.layers.{j}."] = d + f"iou_l{j}."
        m[d + f"pred_obj_score_head.layers.{j}."] = d + f"obj_l{j}."
        m[f"obj_ptr_proj.layers.{j}."] = f"obj_ptr_proj_l{j}."
    m["maskmem_tpos_enc"] = "maskmem_tpos_enc"
    m["no_mem_embed"] = "no_mem_embed"
    m["no_obj_ptr"] = "no_obj_ptr"
    m["*.cross_attn_token_to_image."] = ".t2i."
    m["*.cross_attn_image_to_token."] = ".i2t."
    m["*.mlp.lin1."] = ".lin1."
    m["*.mlp.lin2."] = ".lin2."
    m["*.mlp.layers.0."] = ".mlp1."
    m["*.mlp.layers.1."] = ".mlp2."
    return m


def resnet_name_map(layers=(2, 2, 2, 2)) -> dict:
    """torchvision ResNet/ResNeXt/WideResNet checkpoints
    (conv1/bn1/layer{1-4}.{j}/fc; reference resnet.py:44-474 wraps these)."""
    m = {"conv1.": "conv1.", "bn1.": "bn1.", "fc.": "fc."}
    for i, n in enumerate(layers):
        # descending j: prefix rules break on FIRST match, so "layer3.2."
        # must not shadow "layer3.22." (resnet101's 23-block stage)
        for j in sorted(range(n), reverse=True):
            m[f"layer{i + 1}.{j}."] = f"layer{i + 1}_{j}."
    m["*.downsample.0."] = ".downsample_conv."
    m["*.downsample.1."] = ".downsample_bn."
    return m


def mobilenet_v2_name_map() -> dict:
    """torchvision MobileNetV2 (features.{i}.conv.{j} ConvBNReLU nesting)."""
    m = {"features.0.0.": "stem.", "features.0.1.": "bn0.",
         "features.18.0.": "conv_last.", "features.18.1.": "bn_last.",
         "classifier.1.": "classifier."}
    cfg = [(1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1)]
    i = 1
    for bi, (t, n) in enumerate(cfg):
        for j in range(n):
            if t == 1:  # no expansion: conv.0=ConvBNReLU(dw), conv.1/2=pw
                m[f"features.{i}.conv.0.0."] = f"block{bi}_{j}.dw."
                m[f"features.{i}.conv.0.1."] = f"block{bi}_{j}.bn1."
                m[f"features.{i}.conv.1."] = f"block{bi}_{j}.project."
                m[f"features.{i}.conv.2."] = f"block{bi}_{j}.bn2."
            else:
                m[f"features.{i}.conv.0.0."] = f"block{bi}_{j}.expand."
                m[f"features.{i}.conv.0.1."] = f"block{bi}_{j}.bn0."
                m[f"features.{i}.conv.1.0."] = f"block{bi}_{j}.dw."
                m[f"features.{i}.conv.1.1."] = f"block{bi}_{j}.bn1."
                m[f"features.{i}.conv.2."] = f"block{bi}_{j}.project."
                m[f"features.{i}.conv.3."] = f"block{bi}_{j}.bn2."
            i += 1
    return m


def vit_name_map(depth: int = 12, flavor: str = "timm") -> dict:
    """ViT encoder checkpoints -> enhax classify ViT (fused qkv layout).

    ``flavor='timm'``: blocks.{i}.attn.qkv naming (timm/DeiT releases).
    ``flavor='torchvision'``: encoder.layers.encoder_layer_{i} naming with
    self_attention.in_proj_weight fused qkv.
    """
    if flavor == "timm":
        m = {"cls_token": "cls", "pos_embed": "pos_embed",
             "patch_embed.proj.": "embed.", "norm.": "norm.",
             "head.": "head."}
        for i in range(depth):
            m[f"blocks.{i}."] = f"block{i}."
        m["*.attn.qkv."] = ".qkv."
        m["*.attn.proj."] = ".proj."
        m["*.mlp.fc1."] = ".mlp1."
        m["*.mlp.fc2."] = ".mlp2."
        return m
    m = {"class_token": "cls", "encoder.pos_embedding": "pos_embed",
         "conv_proj.": "embed.", "encoder.ln.": "norm.",
         "heads.head.": "head."}
    for i in range(depth):
        m[f"encoder.layers.encoder_layer_{i}."] = f"block{i}."
    m["*.ln_1."] = ".norm1."
    m["*.ln_2."] = ".norm2."
    m["*.self_attention.in_proj_weight"] = ".qkv.weight"
    m["*.self_attention.in_proj_bias"] = ".qkv.bias"
    m["*.self_attention.out_proj."] = ".proj."
    m["*.mlp.linear_1."] = ".mlp1."
    m["*.mlp.linear_2."] = ".mlp2."
    return m


NAME_MAPS = {
    "zero_dce_re": zero_dce_name_map,
    "mprnet": mprnet_name_map,
    "uformer_re": uformer_name_map,
    "uformer_t": uformer_name_map,
    "uformer_s": uformer_name_map,
    "uformer_b": uformer_name_map,
    "uformer_noshift": uformer_name_map,
    "uformer_fastleff": uformer_name_map,
    "neurop_re": neurop_name_map,
    "neurop_init": neurop_name_map,
    "rrdnet_re": rrdnet_name_map,
    "zero_restore_llie": zero_restore_name_map,
    "zero_ig_re": zero_ig_name_map,
    "psenet": psenet_name_map,
    "rsfnet": rsfnet_name_map,
    "colie_re": colie_name_map,
    "colie_hvi": colie_name_map,
    "colie_hvid": colie_name_map,
    "zid": zid_name_map,
    "zero_mie": zero_mie_name_map,
    "gcenet": gcenet_name_map,
    "lama": lama_name_map,
    "srno": srno_name_map,
    "diinn": diinn_name_map,
    "depth_anything_v2_vits": depth_anything_v2_name_map,
    "depth_anything_v2_vitb": depth_anything_v2_name_map,
    "depth_anything_v2_vitl": depth_anything_v2_name_map,
    "sam_vit_b": sam_name_map,
    "sam_vit_l": sam_name_map,
    "sam_vit_h": sam_name_map,
    "unet": unet_name_map,
    "gcenet_zsn2n": gcenet_name_map,
    "gcenet_instance": gcenet_name_map,
    "zero_mie_hsv_d": zero_mie_name_map,
    "hvi_cidnet_re": hvi_cidnet_name_map,
    "lyt_net_re": lyt_net_name_map,
    "llunet++_re": llunetpp_name_map,
    "lllinet": lllinet_name_map,
    "lllinet_hvi": lllinet_name_map,
    "airnet": airnet_name_map,
    "adair": adair_name_map,
    "quadprior": quadprior_name_map,
    "mtfe": mtfe_name_map,
    "nerco": nerco_name_map,
    "fourllie": fourllie_name_map,
    "wakeup_darkness": wakeup_darkness_name_map,
    "sgz": sgz_name_map,
    "dccnet": dccnet_name_map,
    "utvnet": utvnet_name_map,
    "zero_dce++_re": zero_dcepp_name_map,
    "hinet_re": hinet_name_map,
    "nafnet": nafnet_name_map,
    "nafnet_local": nafnet_name_map,
    "restormer": restormer_name_map,
    "retinexformer": retinexformer_name_map,
    "sci": sci_name_map,
    "ruas": ruas_name_map,
    "uretinexnet": uretinexnet_name_map,
    "pairlie": pairlie_name_map,
    "snr": snr_name_map,
    "llflow": llflow_name_map,
    "retinexnet": retinexnet_name_map,
    "yolov8n": yolov8_name_map,
    "yolov8s": yolov8_name_map,
    "yolov8m": yolov8_name_map,
    "yolov8l": yolov8_name_map,
    "yolov8x": yolov8_name_map,
    "resnet18": resnet_name_map,
    "resnet34": lambda: resnet_name_map((3, 4, 6, 3)),
    "resnet50": lambda: resnet_name_map((3, 4, 6, 3)),
    "resnet101": lambda: resnet_name_map((3, 4, 23, 3)),
    "resnet152": lambda: resnet_name_map((3, 8, 36, 3)),
    "resnext50_32x4d": lambda: resnet_name_map((3, 4, 6, 3)),
    "resnext101_32x8d": lambda: resnet_name_map((3, 4, 23, 3)),
    "wide_resnet50_2": lambda: resnet_name_map((3, 4, 6, 3)),
    "wide_resnet101_2": lambda: resnet_name_map((3, 4, 23, 3)),
    "mobilenet_v2": mobilenet_v2_name_map,
    "vit_b_16": vit_name_map,
    "vit_b_32": vit_name_map,
    "vit_l_16": lambda: vit_name_map(24),
    "vit_l_32": lambda: vit_name_map(24),
    "vit_h_14": lambda: vit_name_map(32),
    "sam2_hiera_t": lambda: sam2_full_name_map(12),
    "sam2_hiera_s": lambda: sam2_full_name_map(16),
    "sam2_hiera_b+": lambda: sam2_full_name_map(24),
    "sam2_hiera_l": lambda: sam2_full_name_map(48),
}


def name_map_for(model_name: str, **kwargs) -> dict | None:
    builder = NAME_MAPS.get(model_name)
    return builder(**kwargs) if builder else None
