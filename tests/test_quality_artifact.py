"""QUALITY.json — the committed end-to-end quality record (VERDICT r3 #7).

The artifact is produced by ``run/make_quality.py``: train at fixed seed on
the committed golden set (assets/golden), real predict CLI, real metric
CLI. The fast test validates the artifact's invariants; the slow test
re-runs the zero_dce chain and asserts the recorded numbers reproduce.
"""

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def test_quality_artifact_invariants():
    payload = json.loads((REPO / "QUALITY.json").read_text())
    results = payload["results"]
    assert set(results) >= {"zero_dce_re", "hinet_tiny", "nafnet_tiny"}
    for name, r in results.items():
        # every model must substantially beat the degraded input
        assert r["psnr"] > r["input_psnr"] + 5.0, (name, r)
        assert r["ssim"] > r["input_ssim"], (name, r)
        # GT-mean PSNR must not be lower (alignment can only help here)
        assert r["psnr_gt_mean"] >= r["psnr"] - 0.2, (name, r)
    # golden set actually committed
    for i in range(4):
        assert (REPO / "assets" / "golden" / "image" / f"{i:02d}.png").is_file()
        assert (REPO / "assets" / "golden" / "ref" / f"{i:02d}.png").is_file()


@pytest.mark.slow
def test_quality_zero_dce_chain_reproduces(tmp_path):
    """Re-run the full train->predict->metric chain for zero_dce_re and
    assert the committed QUALITY.json numbers reproduce (deterministic
    seeds; tolerance covers XLA:CPU version drift)."""
    import sys
    sys.path.insert(0, str(REPO / "run"))
    try:
        from make_quality import MODELS_UNDER_TEST, run_one
    finally:
        sys.path.pop(0)
    name, model_name, model_cfg, supervised, epochs, lr = MODELS_UNDER_TEST[0]
    assert name == "zero_dce_re"
    got = run_one(name, model_name, model_cfg, supervised, epochs, lr,
                  tmp_path)
    recorded = json.loads((REPO / "QUALITY.json").read_text())["results"][name]
    assert abs(got["psnr"] - recorded["psnr"]) < 0.5, (got, recorded)
    assert abs(got["ssim"] - recorded["ssim"]) < 0.02, (got, recorded)
    assert got["input_psnr"] == recorded["input_psnr"]  # same golden set
