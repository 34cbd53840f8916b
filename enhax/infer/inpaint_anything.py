"""Inpaint-Anything: remove / fill / replace pipelines.

Native rebuild of the reference's vendored Inpaint-Anything
(mon_extra/vision/enhance/inpaint/inpaint_anything/):

- remove_anything.py: click a point, predict SAM masks, dilate them
  (cv2 15x15 ones kernel, utils/utils.py:18-25), and inpaint each masked
  region with LaMa (lama_inpaint.py:27-90: image padded to mod 8,
  cat(image, mask) in).
- fill_anything.py / stable_diffusion_inpaint.py ``fill_img_with_sd``:
  crop a 512 square around the mask (utils/mask_processing.py
  crop_for_filling_pre/post), SD-inpaint the crop, paste back only the
  masked pixels.
- replace_anything.py / ``replace_img_with_sd``: resize-and-pad to 512
  (utils/crop_for_replacing.py), SD-inpaint with the mask INVERTED
  (regenerate the background, keep the clicked object), recover size,
  composite the original object back.

Composes enhax's native components: the promptable SAM
(``sam_lite``/``mobile_sam``), the FFC LaMa inpainter, and the native SD
inpainting stack (enhax/models/inpaint/sd_inpaint.py). SD weights are
user-supplied (same no-egress stance as quadprior); the pipelines run —
and are tested — end to end at random init.
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
    if lama_model is None:
        lama_model = build_model("lama",
                                 **model_kwargs.pop("lama_kwargs", {}))

    mask, masks, sam_out = _sam_point_mask(
        image, point, sam_model, sam_variables, dilate_kernel_size,
        mask_index, model_kwargs)

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


def _sam_point_mask(image, point, sam_model, sam_variables,
                    dilate_kernel_size, mask_index, model_kwargs):
    """Shared SAM click->mask step of remove/fill/replace."""
    import jax
    import jax.numpy as jnp

    from enhax.models.base import build_model

    h, w = image.shape[:2]
    if sam_model is None:
        sam_model = build_model(model_kwargs.pop("sam_name", "sam_lite"),
                                **model_kwargs.pop("sam_kwargs", {}))
    div = max(sam_model.size_divisor, 1)
    sam_in = np.pad(image, [(0, -h % div), (0, -w % div), (0, 0)],
                    mode="reflect")
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
    return mask, masks, sam_out


def crop_for_filling_pre(image, mask, crop_size: int = 512):
    """512-square crop around the mask bbox (mask_processing.py:7-56):
    upsample if the short side < 512, shrink (after square padding) if the
    bbox exceeds 512, then crop centred on the bbox (clamped in-bounds).
    Returns (cropped_image f32, cropped_mask bool)."""
    import cv2
    image = np.asarray(image, np.float32)
    mask = (np.asarray(mask) > 0).astype(np.uint8)
    h, w = image.shape[:2]
    ar = w / h
    if min(h, w) < crop_size:
        if h < w:
            nh, nw = crop_size, int(crop_size * ar)
        else:
            nw, nh = crop_size, int(crop_size / ar)
        image = cv2.resize(image, (nw, nh))
        mask = cv2.resize(mask, (nw, nh))
    x, y, bw, bh = cv2.boundingRect(mask)
    h, w = image.shape[:2]
    if bw > crop_size or bh > crop_size:
        if h < w:
            pad = w - h
            image = np.pad(image, ((pad // 2, pad - pad // 2), (0, 0),
                                   (0, 0)))
            mask = np.pad(mask, ((pad // 2, pad - pad // 2), (0, 0)))
        else:
            pad = h - w
            image = np.pad(image, ((0, 0), (pad // 2, pad - pad // 2),
                                   (0, 0)))
            mask = np.pad(mask, ((0, 0), (pad // 2, pad - pad // 2)))
        f = crop_size / max(bw, bh)
        image = cv2.resize(image, (0, 0), fx=f, fy=f)
        mask = cv2.resize(mask, (0, 0), fx=f, fy=f)
        x, y, bw, bh = cv2.boundingRect(mask)
        h, w = image.shape[:2]
    cx = min(max(x + bw // 2 - crop_size // 2, 0), w - crop_size)
    cy = min(max(y + bh // 2 - crop_size // 2, 0), h - crop_size)
    return (image[cy:cy + crop_size, cx:cx + crop_size],
            mask[cy:cy + crop_size, cx:cx + crop_size] > 0)


def crop_for_filling_post(image, mask, filled_crop, crop_size: int = 512):
    """Paste the SD-filled 512 crop back (mask_processing.py:59-130):
    redo the pre-crop geometry, insert the crop, undo pad/resize, and
    composite so only mask-true pixels change."""
    import cv2
    image = np.asarray(image, np.float32)
    mask_b = np.asarray(mask) > 0
    out = image.copy()
    h0, w0 = image.shape[:2]
    # copy: the no-resize branch below slice-assigns into img in place
    img, msk = image.copy(), mask_b.astype(np.uint8)
    ar = w0 / h0
    if min(h0, w0) < crop_size:
        if h0 < w0:
            nh, nw = crop_size, int(crop_size * ar)
        else:
            nw, nh = crop_size, int(crop_size / ar)
        img = cv2.resize(img, (nw, nh))
        msk = cv2.resize(msk, (nw, nh))
    x, y, bw, bh = cv2.boundingRect(msk)
    h, w = img.shape[:2]
    flag_padding = False
    pad = 0
    pad_side = "h"
    f = 1.0
    if bw > crop_size or bh > crop_size:
        flag_padding = True
        if h < w:
            pad, pad_side = w - h, "h"
            img = np.pad(img, ((pad // 2, pad - pad // 2), (0, 0), (0, 0)))
            msk = np.pad(msk, ((pad // 2, pad - pad // 2), (0, 0)))
        else:
            pad, pad_side = h - w, "w"
            img = np.pad(img, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
            msk = np.pad(msk, ((0, 0), (pad // 2, pad - pad // 2)))
        f = crop_size / max(bw, bh)
        img = cv2.resize(img, (0, 0), fx=f, fy=f)
        msk = cv2.resize(msk, (0, 0), fx=f, fy=f)
        x, y, bw, bh = cv2.boundingRect(msk)
        h, w = img.shape[:2]
    cx = min(max(x + bw // 2 - crop_size // 2, 0), w - crop_size)
    cy = min(max(y + bh // 2 - crop_size // 2, 0), h - crop_size)
    img[cy:cy + crop_size, cx:cx + crop_size] = np.asarray(
        filled_crop, np.float32)
    if flag_padding:
        img = cv2.resize(img, (0, 0), fx=1 / f, fy=1 / f)
        # upstream quirk reproduced as-is: the un-pad slice uses the
        # ORIGINAL h0/w0 even when the <crop_size branch upsampled first
        # (mask_processing.py:118-121 slices by height_ori/width_ori);
        # when both branches trigger, geometry deviates slightly from the
        # pre-crop — the final resize + mask-restricted composite below
        # bounds the effect, exactly as in the reference
        if pad_side == "h":
            img = img[pad // 2:pad // 2 + h0, :]
        else:
            img = img[:, pad // 2:pad // 2 + w0]
    img = cv2.resize(img, (w0, h0))
    out[mask_b] = img[mask_b]
    return out


def resize_and_pad(image, mask, target_size: int = 512):
    """Long side -> target_size, zero-pad to square
    (crop_for_replacing.py:5-33). Returns (image, mask, paddings)."""
    import cv2
    image = np.asarray(image, np.float32)
    mask = (np.asarray(mask) > 0).astype(np.float32)
    h, w = image.shape[:2]
    scale = target_size / max(h, w)
    nh, nw = int(h * scale), int(w * scale)
    img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    msk = cv2.resize(mask, (nw, nh), interpolation=cv2.INTER_LINEAR)
    tp, lp = (target_size - nh) // 2, (target_size - nw) // 2
    bp, rp = target_size - nh - tp, target_size - nw - lp
    img = np.pad(img, ((tp, bp), (lp, rp), (0, 0)))
    msk = np.pad(msk, ((tp, bp), (lp, rp)))
    return img, msk, (tp, bp, lp, rp)


def recover_size(image_padded, mask_padded, orig_hw, paddings):
    """Undo resize_and_pad (crop_for_replacing.py:35-53)."""
    import cv2
    tp, bp, lp, rp = paddings
    h, w = image_padded.shape[:2]
    img = image_padded[tp:h - bp, lp:w - rp]
    msk = mask_padded[tp:h - bp, lp:w - rp]
    img = cv2.resize(img, (orig_hw[1], orig_hw[0]),
                     interpolation=cv2.INTER_LINEAR)
    msk = cv2.resize(msk, (orig_hw[1], orig_hw[0]),
                     interpolation=cv2.INTER_LINEAR)
    return img, msk


def _sd_inpaint_apply(img, msk, sd_model, sd_variables, context, noise,
                      model_kwargs):
    """Run the native SD-inpainting model on one (H,W,3)/(H,W) pair."""
    import jax
    import jax.numpy as jnp

    from enhax.models.base import build_model

    if sd_model is None:
        sd_model = build_model("sd_inpaint",
                               **model_kwargs.pop("sd_kwargs", {}))
    dp = {"image": jnp.asarray(img[None]),
          "mask": jnp.asarray(msk[None, :, :, None], jnp.float32)}
    if noise is not None:
        dp["noise"] = jnp.asarray(noise)
    if context is not None:
        dp["context"] = jnp.asarray(context)
    if sd_variables is None:
        sd_variables = sd_model.init(jax.random.PRNGKey(2), dp)
    out = sd_model.apply(sd_variables, dp)
    return np.asarray(out["enhanced"])[0]


def fill_anything(
    image: np.ndarray,
    point: tuple[float, float],
    sam_model=None,
    sam_variables=None,
    sd_model=None,
    sd_variables=None,
    context: np.ndarray | None = None,
    noise: np.ndarray | None = None,
    dilate_kernel_size: int | None = 15,
    mask_index: int = 0,
    **model_kwargs,
) -> dict:
    """Click-to-fill: SAM point mask -> 512 crop -> SD inpaint -> paste
    (fill_anything.py:120-137 / fill_img_with_sd).

    ``context`` is the converted CLIP text embedding of the fill prompt,
    (1, 77, context_dim); None uses the model's empty-prompt param.
    Returns dict with "filled", "mask", "masks".
    """
    image = np.asarray(image, np.float32)
    mask, masks, _ = _sam_point_mask(image, point, sam_model, sam_variables,
                                     dilate_kernel_size, mask_index,
                                     model_kwargs)
    crop_size = int(model_kwargs.pop("crop_size", 512))
    img_c, msk_c = crop_for_filling_pre(image, mask, crop_size)
    filled_c = _sd_inpaint_apply(img_c, msk_c.astype(np.float32), sd_model,
                                 sd_variables, context, noise, model_kwargs)
    out = crop_for_filling_post(image, mask, filled_c, crop_size)
    return {"filled": np.clip(out, 0, 1), "mask": mask, "masks": masks}


def replace_anything(
    image: np.ndarray,
    point: tuple[float, float],
    sam_model=None,
    sam_variables=None,
    sd_model=None,
    sd_variables=None,
    context: np.ndarray | None = None,
    noise: np.ndarray | None = None,
    mask_index: int = 0,
    **model_kwargs,
) -> dict:
    """Click-to-replace-background: SAM mask kept, INVERTED mask
    SD-inpainted (replace_anything.py / replace_img_with_sd:35-58).

    Returns dict with "replaced", "mask", "masks".
    """
    image = np.asarray(image, np.float32)
    # upstream replace does not dilate (replace_anything.py)
    mask, masks, _ = _sam_point_mask(image, point, sam_model, sam_variables,
                                     None, mask_index, model_kwargs)
    target = int(model_kwargs.pop("target_size", 512))
    img_p, msk_p, pads = resize_and_pad(image, mask, target)
    filled_p = _sd_inpaint_apply(img_p, 1.0 - msk_p, sd_model, sd_variables,
                                 context, noise, model_kwargs)
    h, w = image.shape[:2]
    img_r, msk_r = recover_size(filled_p, msk_p, (h, w), pads)
    msk_r = msk_r[..., None]
    out = img_r * (1.0 - msk_r) + image * msk_r
    return {"replaced": np.clip(out, 0, 1), "mask": mask, "masks": masks}
