"""Checkpoint conversion: torch state_dicts -> enhax (flax) param pytrees."""

from enhax.convert.mappings import name_map_for, NAME_MAPS
from enhax.convert.torch_weights import (
    convert_state_dict, load_torch_checkpoint, torch_to_flax_array,
)
