"""SAM2 Hiera encoder parity vs the reference's vendored sam2 code.

Executes mon_extra/vision/segment/sam2's own hieradet.Hiera and
image_encoder.FpnNeck at the RELEASED sam2_hiera_t hyperparameters
(sam2/configs/sam2/sam2_hiera_t.yaml: embed 96, heads 1, stages (1,2,7,2),
global (5,7,9), bkg 7x7, FPN d_model 256 top-down (2,3) nearest, scalp 1),
converts the state dict through enhax's converter, and asserts the FPN
feature maps + sine position encodings match.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from enhax.convert import refload  # noqa: E402
from enhax.convert.torch_weights import convert_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refload.reference_available(), reason="reference tree not present")


def _iopath_stubs():
    iopath = types.ModuleType("iopath")
    common = types.ModuleType("iopath.common")
    file_io = types.ModuleType("iopath.common.file_io")
    file_io.g_pathmgr = None
    iopath.common = common
    common.file_io = file_io
    return {"iopath": iopath, "iopath.common": common,
            "iopath.common.file_io": file_io}


def _load_sam2(module: str):
    return refload.load_vendored("vision/segment/sam2", module,
                                 extra_stubs=_iopath_stubs())


def test_hiera_trunk_reference_parity():
    """Hiera-t trunk: patch embed, windowed pos embed, q-pooled windowed
    attention, global blocks — per-stage features match <=2e-4."""
    import jax
    from enhax.convert.mappings import sam2_hiera_name_map
    from enhax.models.segment.hiera import Hiera

    hieradet = _load_sam2("sam2.modeling.backbones.hieradet")
    torch.manual_seed(0)
    trunk = hieradet.Hiera(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                           global_att_blocks=(5, 7, 9),
                           window_pos_embed_bkg_spatial_size=(7, 7))
    trunk.eval()
    torch.manual_seed(1)
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        feats = trunk(x)  # list of (B, C, H, W), high res first
    assert [f.shape[1] for f in feats] == [96, 192, 384, 768]

    mod = Hiera()
    xj = x.numpy().transpose(0, 2, 3, 1)
    template = mod.init(jax.random.PRNGKey(0), xj)
    params, report = convert_state_dict(
        trunk.state_dict(), template,
        name_map=sam2_hiera_name_map(depth=12, trunk_prefix=""), strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, f"hiera: {unmatched[:10]}"
    got = mod.apply(params, xj)
    for lvl, (ref, g) in enumerate(zip(feats, got)):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        g = np.asarray(g)
        assert ref.shape == g.shape, (lvl, ref.shape, g.shape)
        err = float(np.max(np.abs(ref - g)))
        assert err <= 2e-4, f"hiera level {lvl}: {err:.2e}"


def test_sam2_image_encoder_reference_parity():
    """Full image encoder (trunk + FPN neck + sine PE, scalp=1) at the
    released sam2_hiera_t config."""
    import jax
    from enhax.convert.mappings import sam2_hiera_name_map
    from enhax.models.segment.hiera import SAM2ImageEncoder

    hieradet = _load_sam2("sam2.modeling.backbones.hieradet")
    image_encoder = _load_sam2("sam2.modeling.backbones.image_encoder")
    position_encoding = _load_sam2("sam2.modeling.position_encoding")

    torch.manual_seed(0)
    trunk = hieradet.Hiera(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                           global_att_blocks=(5, 7, 9),
                           window_pos_embed_bkg_spatial_size=(7, 7))
    neck = image_encoder.FpnNeck(
        position_encoding=position_encoding.PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000),
        d_model=256, backbone_channel_list=[768, 384, 192, 96],
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    enc = image_encoder.ImageEncoder(trunk=trunk, neck=neck, scalp=1)
    enc.eval()
    torch.manual_seed(1)
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        ref = enc(x)

    mod = SAM2ImageEncoder()
    xj = x.numpy().transpose(0, 2, 3, 1)
    template = mod.init(jax.random.PRNGKey(0), xj)
    params, report = convert_state_dict(
        enc.state_dict(), template, name_map=sam2_hiera_name_map(depth=12),
        strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, f"sam2 encoder: {unmatched[:10]}"
    got = mod.apply(params, xj)

    assert len(got["backbone_fpn"]) == len(ref["backbone_fpn"])
    for lvl, (r, g) in enumerate(zip(ref["backbone_fpn"],
                                     got["backbone_fpn"])):
        r = r.numpy().transpose(0, 2, 3, 1)
        g = np.asarray(g)
        assert r.shape == g.shape, (lvl, r.shape, g.shape)
        err = float(np.max(np.abs(r - g)))
        assert err <= 2e-4, f"fpn level {lvl}: {err:.2e}"
    for lvl, (r, g) in enumerate(zip(ref["vision_pos_enc"],
                                     got["vision_pos_enc"])):
        r = r.numpy().transpose(0, 2, 3, 1)
        g = np.asarray(g)
        assert r.shape == g.shape
        err = float(np.max(np.abs(r - g)))
        assert err <= 1e-5, f"pos enc level {lvl}: {err:.2e}"


def _build_vendored_sam2_t(image_size=128):
    """Construct the vendored SAM2Base with the released config-t component
    stack (sam2_hiera_t.yaml) at a small image size."""
    hieradet = _load_sam2("sam2.modeling.backbones.hieradet")
    image_encoder_m = _load_sam2("sam2.modeling.backbones.image_encoder")
    pe_m = _load_sam2("sam2.modeling.position_encoding")
    mem_attn_m = _load_sam2("sam2.modeling.memory_attention")
    mem_enc_m = _load_sam2("sam2.modeling.memory_encoder")
    base_m = _load_sam2("sam2.modeling.sam2_base")
    # RoPEAttention MUST come from memory_attention's own import context:
    # its forward threads num_k_exclude_rope only when
    # isinstance(layer.cross_attn_image, RoPEAttention) holds for ITS class
    # object (memory_attention.py:152) — a separately loaded transformer
    # module is a different class object and silently breaks the exclusion
    transformer_m = mem_attn_m

    trunk = hieradet.Hiera(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                           global_att_blocks=(5, 7, 9),
                           window_pos_embed_bkg_spatial_size=(7, 7))
    neck = image_encoder_m.FpnNeck(
        position_encoding=pe_m.PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000),
        d_model=256, backbone_channel_list=[768, 384, 192, 96],
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    enc = image_encoder_m.ImageEncoder(trunk=trunk, neck=neck, scalp=1)

    def rope(**kw):
        return transformer_m.RoPEAttention(
            rope_theta=10000.0, feat_sizes=[32, 32], embedding_dim=256,
            num_heads=1, downsample_rate=1, dropout=0.1, **kw)

    layer = mem_attn_m.MemoryAttentionLayer(
        activation="relu", dim_feedforward=2048, dropout=0.1,
        pos_enc_at_attn=False, self_attention=rope(), d_model=256,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        cross_attention=rope(rope_k_repeat=True, kv_in_dim=64))
    mem_attn = mem_attn_m.MemoryAttention(
        d_model=256, pos_enc_at_input=True, layer=layer, num_layers=4)

    mem_enc = mem_enc_m.MemoryEncoder(
        out_dim=64,
        position_encoding=pe_m.PositionEmbeddingSine(
            num_pos_feats=64, normalize=True, scale=None, temperature=10000),
        mask_downsampler=mem_enc_m.MaskDownSampler(
            kernel_size=3, stride=2, padding=1),
        fuser=mem_enc_m.Fuser(
            mem_enc_m.CXBlock(dim=256, kernel_size=7, padding=3,
                              layer_scale_init_value=1e-6, use_dwconv=True),
            num_layers=2))

    model = base_m.SAM2Base(
        image_encoder=enc, memory_attention=mem_attn, memory_encoder=mem_enc,
        num_maskmem=7, image_size=image_size, backbone_stride=16,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, use_high_res_features_in_sam=True,
        multimask_output_in_sam=True, iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True, add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True, multimask_min_pt_num=0,
        multimask_max_pt_num=1, use_mlp_for_obj_ptr_proj=True)
    model.eval()
    return model


@pytest.mark.slow
def test_sam2_full_pipeline_reference_parity():
    """Full SAM2-t pipeline at released hyperparameters: conditioning frame
    (point prompt, multimask, obj ptr, memory encoding) + a tracked frame
    (RoPE memory attention over spatial memories + object pointers) — all
    executed by the vendored SAM2Base's own track_step."""
    import jax
    import jax.numpy as jnp
    from enhax.constants import MODELS
    from enhax.convert.mappings import sam2_full_name_map
    from enhax.models.segment.sam2_hiera import SAM2Hiera

    tmodel = _build_vendored_sam2_t(image_size=128)
    torch.manual_seed(1)
    frames = torch.rand(2, 3, 128, 128)
    pts = torch.tensor([[[40.0, 70.0]]])      # pixel (x, y)
    lbl = torch.ones(1, 1, dtype=torch.int32)

    with torch.no_grad():
        # frame 0: conditioning
        backbone_out = tmodel.forward_image(frames[0:1])
        (_, vision_feats, vision_pos, feat_sizes) = \
            tmodel._prepare_backbone_features(backbone_out)
        out0 = tmodel.track_step(
            frame_idx=0, is_init_cond_frame=True,
            current_vision_feats=vision_feats,
            current_vision_pos_embeds=vision_pos, feat_sizes=feat_sizes,
            point_inputs={"point_coords": pts, "point_labels": lbl},
            mask_inputs=None,
            output_dict={"cond_frame_outputs": {}, "non_cond_frame_outputs": {}},
            num_frames=2)
        output_dict = {"cond_frame_outputs": {0: out0},
                       "non_cond_frame_outputs": {}}
        # frame 1: tracked
        backbone_out1 = tmodel.forward_image(frames[1:2])
        (_, vf1, vp1, fs1) = tmodel._prepare_backbone_features(backbone_out1)
        out1 = tmodel.track_step(
            frame_idx=1, is_init_cond_frame=False,
            current_vision_feats=vf1, current_vision_pos_embeds=vp1,
            feat_sizes=fs1, point_inputs=None, mask_inputs=None,
            output_dict=output_dict, num_frames=2)

    # --- enhax side ---
    # max_obj_ptrs=2: with num_frames=2 the reference caps pointers at
    # min(num_frames, 16) == 2 (sam2_base.py:592)
    model = MODELS.build("sam2_hiera_t", image_size=128, max_obj_ptrs=2)
    module: SAM2Hiera = model.module
    f0 = frames[0:1].numpy().transpose(0, 2, 3, 1)
    f1 = frames[1:2].numpy().transpose(0, 2, 3, 1)
    # normalized (y, x) datapoint convention
    pts_n = np.stack([pts.numpy()[..., 1] / 128.0,
                      pts.numpy()[..., 0] / 128.0], axis=-1)
    dp0 = (jnp.asarray(f0), jnp.asarray(pts_n), jnp.asarray(lbl.numpy()))

    from enhax.models.segment.sam2_hiera import init_sam2_video_variables
    variables = init_sam2_video_variables(model, jax.random.PRNGKey(0),
                                          jnp.asarray(f0), dp0[1], dp0[2])
    params, report = convert_state_dict(
        tmodel.state_dict(), variables, name_map=sam2_full_name_map(12),
        strict=True)
    unmatched = [r for r in report if r.startswith("unmatched")]
    assert not unmatched, f"sam2 full: {unmatched[:12]}"

    e0 = module.apply(params, *dp0)
    # conditioning-frame outputs
    ref_mask0 = out0["pred_masks_high_res"].numpy()[:, 0]
    got_mask0 = np.asarray(e0["pred_mask"])
    assert ref_mask0.shape == got_mask0.shape
    err = np.max(np.abs(ref_mask0 - got_mask0))
    assert err <= 5e-3, f"frame0 mask logits: {err:.2e}"
    err = np.max(np.abs(out0["obj_ptr"].numpy() - np.asarray(e0["obj_ptr"])))
    assert err <= 1e-3, f"frame0 obj_ptr: {err:.2e}"
    ref_mem0 = out0["maskmem_features"].numpy().transpose(0, 2, 3, 1)
    err = np.max(np.abs(ref_mem0 - np.asarray(e0["memory"])))
    assert err <= 1e-3, f"frame0 memory: {err:.2e}"

    # tracked frame: at frame 1 the reference's memory list holds ONLY the
    # conditioning frame (out1 above ran with an empty non_cond dict).
    # enhax matches it exactly with an all-invalid FIFO — the key mask
    # excludes empty slots from the attention softmax, which is equivalent
    # to the reference never concatenating them.
    n_fifo = module.num_maskmem - 1
    n_ptr = module.max_obj_ptrs - 1
    cond_mem = e0["memory"]
    cond_ptr = e0["obj_ptr"]
    bank = jnp.zeros((1, n_fifo) + cond_mem.shape[1:], jnp.float32)
    ptrs = jnp.zeros((1, n_ptr, module.dim), jnp.float32)
    e1 = module.apply(params, jnp.asarray(f1), cond_mem, cond_ptr,
                      bank, jnp.zeros((1, n_fifo), bool), ptrs,
                      jnp.zeros((1, n_ptr), bool),
                      method=SAM2Hiera.track)
    ref_mask1 = out1["pred_masks_high_res"].numpy()[:, 0]
    got_mask1 = np.asarray(e1["pred_mask"])
    err = np.max(np.abs(ref_mask1 - got_mask1))
    assert err <= 1e-2, f"frame1 tracked mask logits: {err:.2e}"
    err = np.max(np.abs(out1["obj_ptr"].numpy()
                        - np.asarray(e1["obj_ptr"])))
    assert err <= 1e-3, f"frame1 obj_ptr: {err:.2e}"


@pytest.mark.slow
def test_sam2_video_propagation_fifo():
    """Video propagator: scanned fixed-size memory FIFO over 3 frames
    (faithful architecture at reduced trunk size for CPU speed)."""
    import jax
    import jax.numpy as jnp
    from enhax.constants import MODELS
    from enhax.models.segment.sam2_hiera import (
        init_sam2_video_variables, make_sam2_video_propagator)

    m = MODELS.build("sam2_hiera_t", image_size=64, max_obj_ptrs=3,
                     num_maskmem=3,
                     trunk_overrides=dict(embed_dim=32, num_heads=1,
                                          stages=(1, 1, 2, 1),
                                          global_att_blocks=(3,),
                                          window_pos_bkg=(7, 7)))
    frames = jnp.asarray(np.random.default_rng(0)
                         .uniform(0, 1, (3, 64, 64, 3)), jnp.float32)
    pts = jnp.asarray([[[0.5, 0.5]]], jnp.float32)
    lbl = jnp.asarray([[1]], jnp.int32)
    v = init_sam2_video_variables(m, jax.random.PRNGKey(0), frames[0:1],
                                  pts, lbl)
    fn = make_sam2_video_propagator(m)
    masks = fn(v, frames, pts, lbl)
    assert masks.shape == (3, 64, 64)
    assert bool(jnp.isfinite(masks).all())
