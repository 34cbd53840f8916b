"""Pallas TPU kernels for the hot inference paths.

These kernels exist where XLA's automatic fusion leaves HBM traffic on the
table (SURVEY.md §5.7, §7 step 6):

  * ``fused_curve_apply`` — the Zero-DCE curve loop (8 dependent elementwise
    iterations over per-iteration curve slices) in one VMEM-resident pass.
  * ``fused_curve_upsample_apply`` — Zero-DCE++/GCENet fast path: the curve
    is estimated at low resolution; this kernel bilinearly upsamples the
    curve tile-locally in VMEM and applies all iterations without ever
    materializing the full-res curve tensor in HBM.

All kernels run under ``interpret=True`` on CPU (tests) and compile to
Mosaic on TPU.
"""

from enhax.kernels.dce_curve import fused_curve_apply, fused_curve_upsample_apply
