"""Python-module config loading + three-tier merge.

Rebuild of the reference's config system (core/utils.py:92-220 and
config/parse_args.py): a config *is a Python module* defining plain values at
module scope (model/data/trainer/predictor dicts); configs are discovered by
stem under ``config/`` dirs, imported with importlib, stripped of dunders and
merged with CLI flags (flags win).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path
from typing import Any

from enhax.utils.fileio import load_file


def load_config(path: str | Path) -> dict[str, Any]:
    """Load a config file (.py module / .yaml / .json) into a plain dict.

    Mirrors reference ``load_config`` (core/utils.py:186-220): a .py config is
    exec'd via importlib and its non-dunder module-level names become the
    config dict.
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"config not found: {path}")
    if path.suffix == ".py":
        spec = importlib.util.spec_from_file_location(f"_enhax_cfg_{path.stem}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        try:
            spec.loader.exec_module(mod)
        finally:
            sys.modules.pop(spec.name, None)
        return {
            k: v for k, v in vars(mod).items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(sys))
        }
    return load_file(path)


def parse_config_file(
    config: str | Path | None,
    search_dirs: list[str | Path] = (),
) -> Path | None:
    """Resolve a config name/stem to a file path.

    Mirrors reference ``parse_config_file`` (core/utils.py:139-185): absolute
    paths pass through; otherwise search each dir (and its ``config/`` child)
    for ``<stem>.py`` / ``<stem>.yaml``.
    """
    if config in (None, "", "none"):
        return None
    p = Path(config)
    if p.is_file():
        return p
    stem = p.stem
    candidates = []
    for d in search_dirs:
        d = Path(d)
        for base in (d, d / "config", d / "configs"):
            for ext in (".py", ".yaml", ".yml", ".json"):
                candidates.append(base / f"{stem}{ext}")
    for c in candidates:
        if c.is_file():
            return c
    raise FileNotFoundError(
        f"config {config!r} not found in {[str(s) for s in search_dirs]}"
    )


def merge_configs(base: dict, *overrides: dict) -> dict:
    """Deep-merge dicts; later values win; None override values are skipped.

    Mirrors the flags-beat-config precedence of reference train.py:113-131.
    """
    # copy nested dicts even when untouched: callers mutate the result
    # (e.g. opt_cfg["optimizer"]["lr"] = ...) and must never alias the
    # module-global defaults
    out = {k: (merge_configs(v) if isinstance(v, dict) else v)
           for k, v in base.items()}
    for ov in overrides:
        for k, v in (ov or {}).items():
            if v is None:
                continue
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge_configs(out[k], v)
            elif isinstance(v, dict):
                out[k] = merge_configs(v)
            else:
                out[k] = v
    return out
