"""Host-side utilities: paths, file handlers, console, timing, config, coercion."""

from enhax.utils.pathlib import Path
from enhax.utils.fileio import FileHandler, load_file, dump_file
from enhax.utils.console import console, error_console, print_dict, print_table
from enhax.utils.timer import Timer
from enhax.utils.coerce import (
    to_list, to_int_list, to_float_list, to_pair, intersect_dicts,
)
from enhax.utils.config import load_config, parse_config_file, merge_configs
from enhax.utils.rand import set_random_seed, new_rng
