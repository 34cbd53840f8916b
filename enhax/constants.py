"""Global enums, constants and the registry singletons.

TPU-native rebuild of the reference's ``src/mon/globals.py`` (1,231 LoC):
``Task``/``Scheme``/``Split``/``RunMode`` enums (globals.py:649-700), bbox
format codes (globals.py:289-447), memory units (globals.py:577), file-format
whitelists (globals.py:705-710) and the global factory singletons
(globals.py:1210-1229).
"""

from __future__ import annotations

import enum
import os
from pathlib import Path as _P

from enhax.registry import ModelRegistry, Registry


# ---------------------------------------------------------------------------
# Directories (reference: globals.py:71-95)
# ---------------------------------------------------------------------------

ROOT_DIR = _P(__file__).resolve().parents[1]
SRC_DIR = _P(__file__).resolve().parents[0]
DATA_DIR = _P(os.environ.get("DATA_DIR", ROOT_DIR / "data"))
ZOO_DIR = _P(os.environ.get("ZOO_DIR", ROOT_DIR / "zoo"))
RUN_DIR = _P(os.environ.get("RUN_DIR", ROOT_DIR / "run"))


# ---------------------------------------------------------------------------
# Enums
# ---------------------------------------------------------------------------

class StrEnum(str, enum.Enum):
    """Enum whose members are strings, constructible from value or name."""

    def __str__(self) -> str:
        return self.value

    @classmethod
    def from_value(cls, value) -> "StrEnum":
        if isinstance(value, cls):
            return value
        if isinstance(value, str):
            v = value.strip().lower()
            for m in cls:
                if m.value == v or m.name.lower() == v:
                    return m
        raise ValueError(f"{cls.__name__}: unknown value {value!r}")


class Task(StrEnum):
    """Vision tasks (reference: globals.py:649-670, 17 tasks)."""
    CLASSIFY = "classify"
    DEBLUR = "deblur"
    DEHAZE = "dehaze"
    DENOISE = "denoise"
    DEPTH = "depth"
    DERAIN = "derain"
    DESNOW = "desnow"
    DETECT = "detect"
    INPAINT = "inpaint"
    LES = "les"           # light effect suppression
    LLIE = "llie"         # low-light image enhancement
    NIGHTTIME = "nighttime"
    POSE = "pose"
    RETOUCH = "retouch"
    SEGMENT = "segment"
    SR = "sr"
    TRACK = "track"


class Scheme(StrEnum):
    """Learning schemes (reference: globals.py:680-691)."""
    INFERENCE = "inference"
    INSTANCE = "instance"            # per-image test-time optimization
    SUPERVISED = "supervised"
    TRADITIONAL = "traditional"
    UNSUPERVISED = "unsupervised"
    ZERO_REFERENCE = "zero_reference"
    ZERO_SHOT = "zero_shot"


class Split(StrEnum):
    """Dataset splits (reference: globals.py:692-700)."""
    TRAIN = "train"
    VAL = "val"
    TEST = "test"
    PREDICT = "predict"


class RunMode(StrEnum):
    """Run modes (reference: globals.py:671-679)."""
    TRAIN = "train"
    PREDICT = "predict"
    METRIC = "metric"
    PLOT = "plot"
    INSTANCE = "instance"


class BBoxFormat(StrEnum):
    """Bounding-box coordinate formats (reference: globals.py:289-358)."""
    XYXY = "xyxy"           # pascal_voc
    XYWH = "xywh"           # coco
    CXCYWHN = "cxcywhn"     # yolo (normalized center)
    XYXYN = "xyxyn"         # albumentations-style normalized
    XYWHN = "xywhn"


class TrackState(enum.IntEnum):
    """Track lifecycle states (reference: globals.py:449-514)."""
    NEW = 0
    TRACKED = 1
    LOST = 2
    REMOVED = 3


class MovingState(enum.IntEnum):
    """Object moving states for roadside tracking (reference: globals.py:515-576)."""
    CANDIDATE = 0
    CONFIRMED = 1
    COUNTING = 2
    TO_BE_COUNTED = 3
    COUNTED = 4
    EXITING = 5


class MemoryUnit(StrEnum):
    """Memory units with conversion (reference: globals.py:577-648)."""
    B = "b"
    KB = "kb"
    MB = "mb"
    GB = "gb"
    TB = "tb"

    @classmethod
    def byte_factor(cls, unit: "MemoryUnit") -> int:
        return {cls.B: 1, cls.KB: 1024, cls.MB: 1024**2,
                cls.GB: 1024**3, cls.TB: 1024**4}[cls.from_value(unit)]

    @classmethod
    def convert(cls, value: float, src: "MemoryUnit", dst: "MemoryUnit") -> float:
        return value * cls.byte_factor(src) / cls.byte_factor(dst)


# ---------------------------------------------------------------------------
# File-format whitelists (reference: globals.py:705-710)
# ---------------------------------------------------------------------------

IMAGE_EXTS = (".arw", ".bmp", ".dng", ".jpg", ".jpeg", ".png", ".ppm", ".raf",
              ".tif", ".tiff", ".webp")
VIDEO_EXTS = (".avi", ".m4v", ".mkv", ".mov", ".mp4", ".mpeg", ".mpg", ".wmv")
CONFIG_EXTS = (".cfg", ".json", ".py", ".yaml", ".yml")
WEIGHTS_EXTS = (".ckpt", ".msgpack", ".npz", ".pkl", ".pt", ".pth", ".safetensors")
DEPTH_DATA_SOURCES = ("dav2_vitb_g", "dav2_vitb_c", "dav2_vitl_g", "dav2_vitl_c",
                      "dav2_vits_g", "dav2_vits_c", "dp_g", "dp_c")


# ---------------------------------------------------------------------------
# Registry singletons (reference: globals.py:1210-1229)
# ---------------------------------------------------------------------------

MODELS = ModelRegistry("models")
DATASETS = Registry("datasets")
DATAMODULES = Registry("datamodules")
LOSSES = Registry("losses")
METRICS = Registry("metrics")
OPTIMIZERS = Registry("optimizers")
LR_SCHEDULERS = Registry("lr_schedulers")
CALLBACKS = Registry("callbacks")
LOGGERS = Registry("loggers")
TRANSFORMS = Registry("transforms")
FILE_HANDLERS = Registry("file_handlers")
DETECTORS = Registry("detectors")
TRACKERS = Registry("trackers")
MOTIONS = Registry("motions")
OBJECTS = Registry("objects")
EMBEDDERS = Registry("embedders")
DISTANCES = Registry("distances")
STRATEGIES = Registry("strategies")   # sharding strategies (TPU-native analog)
