"""Config layer: defaults + arg parsing (reference src/mon/config/)."""

from enhax.config.defaults import (
    DEFAULT_TRAINER, DEFAULT_DATAMODULE, DEFAULT_PREDICTOR, default_save_dir,
)
