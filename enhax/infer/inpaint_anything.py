"""Inpaint-Anything: remove-anything pipeline (SAM -> dilate -> LaMa).

Native rebuild of the reference's vendored Inpaint-Anything
(mon_extra/vision/enhance/inpaint/inpaint_anything/remove_anything.py:
click a point, predict SAM masks, dilate them (cv2 15x15 ones kernel,
utils/utils.py:18-25), and inpaint each masked region with LaMa
(lama_inpaint.py:27-90: image padded to mod 8, cat(image, mask) in).

Composes enhax's native components: the promptable SAM
(``sam_lite``/``mobile_sam``) and the FFC LaMa inpainter. The fill/
replace variants upstream additionally call Stable Diffusion inpainting
with text prompts (pretrained SD weights; out of scope here, same
stance as quadprior training).
"""

from __future__ import annotations

import numpy as np


def dilate_mask(mask: np.ndarray, kernel_size: int = 15) -> np.ndarray:
    """cv2.dilate with a ones kernel (utils/utils.py:18-25)."""
    import cv2
    m = (np.asarray(mask) > 0).astype(np.uint8)
    return cv2.dilate(m, np.ones((kernel_size, kernel_size), np.uint8),
                      iterations=1)


def remove_anything(
    image: np.ndarray,
    point: tuple[float, float],
    sam_model=None,
    sam_variables=None,
    lama_model=None,
    lama_variables=None,
    dilate_kernel_size: int | None = 15,
    mask_index: int = 0,
    **model_kwargs,
) -> dict:
    """Click-to-remove: SAM point mask -> dilate -> LaMa inpaint.

    Args:
        image: (H, W, 3) float array in [0, 1].
        point: (x, y) click.
        sam_model/lama_model: enhax Models (built on demand when None —
            random weights unless variables are given).
        dilate_kernel_size: None disables dilation
            (remove_anything.py:96-98).
        mask_index: which of SAM's multimask outputs to use.

    Returns dict with "inpainted", "mask", "masks", "iou_predictions".
    """
    import jax
    import jax.numpy as jnp

    from enhax.models.base import build_model

    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    if sam_model is None:
        sam_model = build_model(model_kwargs.pop("sam_name", "sam_lite"),
                                **model_kwargs.pop("sam_kwargs", {}))
    if lama_model is None:
        lama_model = build_model("lama",
                                 **model_kwargs.pop("lama_kwargs", {}))

    # SAM needs size_divisor-aligned input
    div = max(sam_model.size_divisor, 1)
    ph = -h % div
    pw = -w % div
    sam_in = np.pad(image, [(0, ph), (0, pw), (0, 0)], mode="reflect")
    # the click arrives as pixel (x, y); every enhax SAM variant takes
    # NORMALIZED (y, x) over the image actually fed (here: padded)
    py = float(point[1]) / sam_in.shape[0]
    px = float(point[0]) / sam_in.shape[1]
    dp = {"image": jnp.asarray(sam_in[None]),
          "points": jnp.asarray([[[py, px]]], jnp.float32),
          "labels": jnp.asarray([[1]], jnp.int32)}
    if sam_variables is None:
        sam_variables = sam_model.init(jax.random.PRNGKey(0), dp)
    sam_out = sam_model.apply(sam_variables, dp)
    masks = np.asarray(sam_out["masks"])[0, :, :h, :w] > 0

    mask = masks[mask_index]
    if dilate_kernel_size:
        mask = dilate_mask(mask, dilate_kernel_size) > 0

    # LaMa: pad image+mask to mod 8 (lama_inpaint.py:76-80)
    mod = max(lama_model.size_divisor, 8)
    ph = -h % mod
    pw = -w % mod
    img_p = np.pad(image, [(0, ph), (0, pw), (0, 0)], mode="reflect")
    mask_p = np.pad(mask.astype(np.float32), [(0, ph), (0, pw)])
    ldp = {"image": jnp.asarray(img_p[None]),
           "mask": jnp.asarray(mask_p[None, :, :, None])}
    if lama_variables is None:
        lama_variables = lama_model.init(jax.random.PRNGKey(1), ldp)
    lama_out = lama_model.apply(lama_variables, ldp)
    inpainted = np.asarray(lama_out["enhanced"])[0, :h, :w]
    # keep the unmasked region from the source (LaMa convention)
    out = image * (1 - mask[..., None]) + inpainted * mask[..., None]
    return {"inpainted": np.clip(out, 0, 1), "mask": mask, "masks": masks,
            "iou_predictions": np.asarray(sam_out["iou_predictions"])[0]}
