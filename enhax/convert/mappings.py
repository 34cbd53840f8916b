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


NAME_MAPS = {
    "zero_dce_re": zero_dce_name_map,
    "zero_dce++_re": zero_dcepp_name_map,
    "hinet_re": hinet_name_map,
    "nafnet": nafnet_name_map,
    "nafnet_local": nafnet_name_map,
    "restormer": restormer_name_map,
}


def name_map_for(model_name: str, **kwargs) -> dict | None:
    builder = NAME_MAPS.get(model_name)
    return builder(**kwargs) if builder else None
