"""Pallas TPU kernels for the hot inference paths.

These kernels exist where XLA's automatic fusion leaves HBM traffic on the
table (SURVEY.md §5.7, §7 step 6):

  * ``fused_curve_apply`` — the Zero-DCE curve loop (8 dependent elementwise
    iterations over per-iteration curve slices) in one VMEM-resident pass.
  * ``fused_curve_upsample_apply`` — Zero-DCE++/GCENet fast path: the curve
    is estimated at low resolution; this kernel bilinearly upsamples the
    curve tile-locally in VMEM and applies all iterations without ever
    materializing the full-res curve tensor in HBM.

``fused_curve_apply`` is TPU-validated (bit-exact vs the XLA path; compile
requires the flattened (H, W*C) VMEM layout — NHWC with C=3 pads lanes
3->128 and blows the 16 MB scoped-VMEM budget). The in-tile-upsample
variant currently runs under ``interpret=True`` (tests); its 4D layout
needs the same flattening before TPU compile. On this chip XLA's own
fusion of the curve loop is already within ~15% of the hand kernel, so the
XLA path remains the default.
"""

import os


def pallas_enabled() -> bool:
    """Platform gate for the production fast paths: Pallas kernels run on
    TPU backends only (XLA everywhere else). Set ENHAX_PALLAS=0 to force the
    XLA path on TPU (A/B benchmarking, debugging)."""
    if os.environ.get("ENHAX_PALLAS", "1") == "0":
        return False
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend not initialized / no devices
        return False


from enhax.kernels.dce_curve import fused_curve_apply, fused_curve_upsample_apply  # noqa: E402
