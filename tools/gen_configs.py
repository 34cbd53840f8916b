#!/usr/bin/env python
"""Regenerate configs/*.py from refload-EXECUTED reference config modules.

For every enhax config citing a reference config, rewrite the translated
blocks (model_cfg / optimizer_cfg / data_cfg batch+shuffle / image_size /
seed / max_epochs) from the executed reference values, preserving
enhax-specific fields (model name, extra data_cfg keys, monitor, custom
top-level assignments like ``loss = "psnr_loss"``). Keeps the shipped
recipes byte-honest with the reference; tests/test_config_fidelity.py
asserts the result stays clean.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_configs.py
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from enhax.config.fidelity import (  # noqa: E402
    BOOKKEEPING_KEYS, _drop_reason, enhax_config_files, reference_rel_of,
)
from enhax.convert import refload  # noqa: E402
from enhax.utils.config import load_config  # noqa: E402

HANDLED = {"model", "model_cfg", "data", "data_cfg", "image_size",
           "optimizer_cfg", "trainer_cfg", "seed"}


def translate(cfg_path: Path, rel: str) -> str:
    cfg = load_config(cfg_path)
    ref = refload.load_reference_config(rel)
    stem = cfg_path.stem
    rmodel = ref.model

    model_cfg = {}
    for key, rv in rmodel.items():
        if key in BOOKKEEPING_KEYS or _drop_reason(stem, key) is not None:
            continue
        if isinstance(rv, tuple):
            rv = list(rv)
        model_cfg[key] = rv

    opt_cfg = None
    ropts = rmodel.get("optimizers") or []
    if ropts:
        ropt = dict(ropts[0]["optimizer"])
        if isinstance(ropt.get("betas"), list):
            ropt["betas"] = tuple(ropt["betas"])
        opt_cfg = {"optimizer": ropt}
        rsched = ropts[0].get("lr_scheduler")
        if rsched:
            opt_cfg["lr_scheduler"] = {"scheduler": rsched["scheduler"]}
    else:
        opt_cfg = cfg.get("optimizer_cfg")  # psenet: upstream has none;
        # enhax keeps its recipe-local optimizer (model.lr drop rule)

    rdata = getattr(ref, "data", None) or getattr(ref, "datamodule", None)
    rdata = rdata if isinstance(rdata, dict) else {}
    data_name = cfg.get("data")
    data_cfg = dict(cfg.get("data_cfg") or {})
    if rdata.get("name"):
        data_name = rdata["name"]
        data_cfg["batch_size"] = rdata.get("batch_size", 1)
        if "shuffle" in rdata:
            data_cfg["shuffle"] = rdata["shuffle"]

    trainer_cfg = dict(cfg.get("trainer_cfg") or {})
    rtrainer = getattr(ref, "trainer", None) or {}
    if rtrainer.get("max_epochs") is not None:
        trainer_cfg["max_epochs"] = rtrainer["max_epochs"]
    if rtrainer.get("max_steps") not in (None, -1):
        trainer_cfg["max_steps"] = rtrainer["max_steps"]

    imgsz = getattr(ref, "image_size", cfg.get("image_size"))
    if isinstance(imgsz, (list, tuple)):
        imgsz = imgsz[0] if len(set(imgsz)) == 1 else list(imgsz)

    # preserve the original docstring (first line = citation; keep extras)
    tree = ast.parse(cfg_path.read_text())
    doc = ast.get_docstring(tree) or ""
    lines = [ln for ln in doc.splitlines()]
    if lines and "refload-executed" not in doc:
        lines[0] = lines[0].rstrip(". ") + (
            " (refload-executed; see tests/test_config_fidelity.py).")
    body = "\n".join(lines).strip()

    out = [f'"""{body}\n"""\n']
    out.append(f"model = {cfg.get('model')!r}")
    out.append(f"model_cfg = {model_cfg!r}")
    out.append(f"data = {data_name!r}")
    out.append(f"data_cfg = {data_cfg!r}")
    out.append(f"image_size = {imgsz!r}")
    out.append(f"optimizer_cfg = {opt_cfg!r}")
    out.append(f"trainer_cfg = {trainer_cfg!r}")
    out.append(f"seed = {getattr(ref, 'seed', cfg.get('seed'))!r}")
    for key, val in cfg.items():
        if key not in HANDLED:
            out.append(f"{key} = {val!r}")
    return "\n".join(out) + "\n"


def main() -> int:
    for cfg_path in enhax_config_files():
        rel = reference_rel_of(cfg_path)
        if rel is None:
            continue
        cfg_path.write_text(translate(cfg_path, rel))
        print("rewrote", cfg_path.name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
