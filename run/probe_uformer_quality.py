"""Probe uformer_tiny quality-chain configs until SSIM clears the invariant.

The QUALITY.json invariant requires ssim > input_ssim - 0.05 (0.5066 on the
golden set). dim 16 @ 5e-4/120ep reached PSNR 23.1 but SSIM 0.451 (over-
smooth). Sweep capacity/lr/epochs to find a config that memorizes the
4-image golden set with structure intact.
"""

import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "run"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from make_quality import run_one  # noqa: E402

VARIANTS = [
    ("dim32_5e-4_120", {"dim": 32, "depths": (1, 1, 1, 1, 1, 1, 1, 1, 1)},
     120, 5e-4),
    ("dim16_5e-4_300", {"dim": 16, "depths": (1, 1, 1, 1, 1, 1, 1, 1, 1)},
     300, 5e-4),
    ("dim32_1e-3_120", {"dim": 32, "depths": (1, 1, 1, 1, 1, 1, 1, 1, 1)},
     120, 1e-3),
]

if __name__ == "__main__":
    out_root = Path(tempfile.mkdtemp(prefix="uformer_probe_"))
    for tag, cfg, epochs, lr in VARIANTS:
        import time
        t0 = time.time()
        r = run_one(f"uformer_{tag}", "uformer_re", cfg, True, epochs, lr,
                    out_root)
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({tag: r}), flush=True)
        if r["ssim"] > r["input_ssim"] - 0.045 and \
           r["psnr"] > r["input_psnr"] + 5.5:
            print(f"[probe] {tag} clears the invariant", flush=True)
            break
