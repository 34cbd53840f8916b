"""Copy-image CLI: gather one image's predictions across model run dirs.

Rebuild of reference ``project/runml/copy_image.py`` (:52-70): given a
prediction tree laid out ``<input_dir>/<arch>/<model>/<data>/<image>.<ext>``
(the save layout of the predict CLI), find every model's copy of a named
image, optionally resize it (size / divisible-by / side), and write them
side by side as ``<output_dir>/<image_stem>/<model>.<ext>`` — the
paper-figure collation workflow.

Usage:
    python -m enhax.cli.copy_image --input-dir run/predict \
        --image-file lol_v1/0001.png --imgsz 512 --resize
"""

from __future__ import annotations

import argparse

import numpy as np

from enhax.utils.console import console, new_progress
from enhax.utils.pathlib import Path


def parse_copy_args(argv=None) -> dict:
    p = argparse.ArgumentParser("enhax-copy-image")
    p.add_argument("--input-dir", type=str, required=True)
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--image-file", type=str, required=True,
                   help="e.g. 'dataset/image_id.jpg' (extension ignored)")
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--divisible-by", type=int, default=32)
    p.add_argument("--side", choices=["short", "long", "vert", "horz"],
                   default="short")
    p.add_argument("--resize", action="store_true")
    p.add_argument("--verbose", action="store_true")
    return vars(p.parse_args(argv))


def _reference_resize_hw(h0: int, w0: int, imgsz: int, divisible_by: int,
                         side: str) -> tuple[int, int]:
    """The reference's mon.resize target-size arithmetic
    (core/image/geometry/transform.py:157-195): the base (imgsz, imgsz)
    is snapped to divisible_by, then 'short'/'long' scale the other side
    by aspect (unsnapped, as upstream). 'vert'/'horz' have no branch
    upstream and fall through to an exact square resize — reproduced
    as-is rather than reinterpreted."""
    from enhax.ops.layout import make_divisible
    base = make_divisible(imgsz, divisible_by) if divisible_by else imgsz
    if side == "short":
        if h0 < w0:
            return base, int(w0 * base / h0)
        if h0 > w0:
            return int(h0 * base / w0), base
    elif side == "long":
        if h0 > w0:
            return base, int(w0 * base / h0)
        if h0 < w0:
            return int(h0 * base / w0), base
    # vert / horz (upstream quirk) and square inputs: exact square output
    return base, base


def copy_image(args: dict) -> Path:
    import cv2

    input_dir = Path(args["input_dir"])
    if not input_dir.is_dir():
        raise SystemExit(f"--input-dir is not a directory: {input_dir}")
    image_file = Path(args["image_file"])
    image_file = image_file.parent / image_file.stem
    output_dir = Path(args.get("output_dir")
                      or input_dir.parent / f"{input_dir.stem}_copy")
    output_dir = output_dir / image_file

    files = sorted(p for p in input_dir.rglob(f"*/{image_file}.*")
                   if p.is_image_file())
    side = args.get("side", "short")
    with new_progress() as progress:
        task = progress.add_task("copy", total=len(files))
        for path in files:
            image = cv2.imread(str(path))
            if args.get("resize"):
                nh, nw = _reference_resize_hw(
                    image.shape[0], image.shape[1], args.get("imgsz", 512),
                    args.get("divisible_by", 32), side)
                image = cv2.resize(image, (nw, nh),
                                   interpolation=cv2.INTER_AREA)
            model_name = path.parents[1].name
            out = output_dir / f"{model_name}{path.suffix}"
            out.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(out), np.asarray(image))
            progress.advance(task)
    if args.get("verbose"):
        console.print(f"[copy-image] {len(files)} copies -> {output_dir}")
    return output_dir


def main(argv=None):
    copy_image(parse_copy_args(argv))


if __name__ == "__main__":
    main()
