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
    """Platform gate for the Pallas curve kernels (zero_dce models).

    Default OFF: on v5e the measured end-to-end numbers favour XLA's own
    fusion for this op — XLA fuses the bilinear-resize producer into the
    8-iteration curve loop, while the hand kernel pays Mosaic relayout cost
    on the (rows, phases, W*C) layout (measured 1088x1920x48: XLA 32 ms vs
    Pallas 52 ms; three kernel layouts tried, best 0.61x). The kernels stay
    TPU-validated (bit-close, compile-tested) and can be A/B'd with
    ENHAX_PALLAS=1; they become the right tool on HBM-poorer parts or if a
    future XLA stops fusing the resize.
    """
    if os.environ.get("ENHAX_PALLAS", "0") != "1":
        return False
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend not initialized / no devices
        return False


from enhax.kernels.dce_curve import fused_curve_apply, fused_curve_upsample_apply  # noqa: E402
