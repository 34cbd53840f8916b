#!/usr/bin/env python
"""Config-translation fidelity audit (VERDICT r4 task 3).

For every ``configs/X.py`` whose docstring names a reference config module,
refload-execute that reference config (the importable Python recipes under
``src/mon/**/config/*.py``) and diff the translated values key-for-key:
model kwargs, optimizer (lr/betas/weight_decay), scheduler, max_epochs,
batch_size, image_size, seed, data name.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/audit_configs.py
The same comparison runs in the fast suite (tests/test_config_fidelity.py);
this script is the verbose/report form used to drive translation fixes.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from enhax.config.fidelity import (  # noqa: E402
    DROPPED_KEYS, audit_config, enhax_config_files, reference_rel_of,
)


def main() -> int:
    bad = 0
    for cfg_path in enhax_config_files():
        rel = reference_rel_of(cfg_path)
        if rel is None:
            print(f"-- {cfg_path.name}: enhax-original recipe (no reference)")
            continue
        diffs, dropped = audit_config(cfg_path, rel)
        status = "OK" if not diffs else "MISMATCH"
        print(f"{status:8s} {cfg_path.name} <- src/mon/{rel}")
        for d in diffs:
            bad += 1
            print(f"    DIFF  {d}")
        for d in dropped:
            print(f"    drop  {d}")
    print(f"\n{bad} undocumented mismatches "
          f"({len(DROPPED_KEYS)} documented drop rules)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
