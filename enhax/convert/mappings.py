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
    return m


NAME_MAPS = {
    "zero_dce_re": zero_dce_name_map,
    "zero_dce++_re": zero_dce_name_map,
    "hinet_re": hinet_name_map,
    "nafnet": nafnet_name_map,
    "nafnet_local": nafnet_name_map,
}


def name_map_for(model_name: str, **kwargs) -> dict | None:
    builder = NAME_MAPS.get(model_name)
    return builder(**kwargs) if builder else None
