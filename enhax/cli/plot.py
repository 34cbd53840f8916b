"""Visual comparison grids over benchmark result dirs.

Rebuild of reference ``project/runml/plot.py`` (520 LoC): for each image
stem, tile [input | method1 | ... | GT] into a labeled multi-row grid
(plot_cv2 :136), optionally as grayscale differences against a reference
column (plot_cv2_diff :238), with zoom insets (plot_matplotlib :354).

Usage:
    python -m enhax.cli.plot --input data/test/image --results run/p1 run/p2 \
        --target data/test/ref --save-dir plots --label --num-cols 4
    # difference maps vs the GT column:
    ... --mode diff --ref GT
    # zoom inset (normalized y x h w), magnified and stacked under each tile:
    ... --zoom 0.4 0.4 0.2 0.2
"""

from __future__ import annotations

import argparse
import math

import numpy as np

from enhax.utils.console import console
from enhax.utils.pathlib import Path


def parse_plot_args(argv=None) -> dict:
    p = argparse.ArgumentParser("enhax-plot")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--results", type=str, nargs="*", default=[])
    p.add_argument("--target", type=str, default=None)
    p.add_argument("--save-dir", type=str, required=True)
    p.add_argument("--max-items", type=int, default=50)
    p.add_argument("--label", action="store_true", help="draw column labels")
    p.add_argument("--num-cols", type=int, default=0,
                   help="columns per row (0 = all in one row)")
    p.add_argument("--mode", type=str, default="grid", choices=["grid", "diff"])
    p.add_argument("--ref", type=str, default="GT",
                   help="reference column name for --mode diff")
    p.add_argument("--image-size", type=int, default=0,
                   help="resize tiles to this size (0 = min common size)")
    p.add_argument("--zoom", type=float, nargs=4, default=None,
                   metavar=("Y", "X", "H", "W"),
                   help="normalized zoom crop appended under each tile")
    return vars(p.parse_args(argv))


def _label_image(img: np.ndarray, text: str) -> np.ndarray:
    """Bordered header label (plot_cv2_diff:308-320 style)."""
    import cv2
    out = (img * 255).astype(np.uint8).copy()
    out = cv2.copyMakeBorder(out, 24, 0, 0, 0, cv2.BORDER_CONSTANT,
                             value=(255, 255, 255))
    size = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)[0]
    x = max((out.shape[1] - size[0]) // 2, 2)
    cv2.putText(out, text, (x, 17), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                (0, 0, 0), 1, cv2.LINE_AA)
    return out.astype(np.float32) / 255.0


def _zoom_inset(img: np.ndarray, zoom) -> np.ndarray:
    """Crop (normalized y,x,h,w), magnify to tile width, stack below."""
    import cv2
    h, w = img.shape[:2]
    y0, x0 = int(zoom[0] * h), int(zoom[1] * w)
    ch, cw = max(int(zoom[2] * h), 4), max(int(zoom[3] * w), 4)
    crop = img[y0 : y0 + ch, x0 : x0 + cw]
    crop = cv2.resize(crop, (w, int(round(ch * w / max(cw, 1)))))
    marked = img.copy()
    cv2.rectangle(marked, (x0, y0), (x0 + cw, y0 + ch), (1.0, 0.0, 0.0), 2)
    return np.concatenate([marked, crop], axis=0)


def _to_rows(tiles, num_cols: int) -> np.ndarray:
    """hconcat per row, vconcat rows, white-pad the last row (ref :327-343)."""
    if num_cols <= 0 or num_cols >= len(tiles):
        return np.concatenate(tiles, axis=1)
    rows = []
    blank = np.ones_like(tiles[0])
    n_rows = math.ceil(len(tiles) / num_cols)
    for i in range(n_rows):
        row = list(tiles[i * num_cols : (i + 1) * num_cols])
        row += [blank] * (num_cols - len(row))
        rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


def plot(args: dict):
    import cv2
    from enhax.ops.io import read_image, write_image

    input_dir = Path(args["input"])
    result_dirs = [Path(r) for r in args.get("results", [])]
    target_dir = Path(args["target"]) if args.get("target") else None
    save_dir = Path(args["save_dir"])
    mode = args.get("mode", "grid")
    ref_name = args.get("ref", "GT")
    num_cols = args.get("num_cols", 0)
    zoom = args.get("zoom")

    n = 0
    for f in input_dir.image_files()[: args.get("max_items", 50)]:
        cols = [("input", read_image(f))]
        for rd in result_dirs:
            for ext in (".png", ".jpg", f.suffix):
                c = rd / f"{f.stem}{ext}"
                if c.is_file():
                    cols.append((rd.name, read_image(c)))
                    break
        if target_dir:
            for ext in (".png", ".jpg", f.suffix):
                c = target_dir / f"{f.stem}{ext}"
                if c.is_file():
                    cols.append(("GT", read_image(c)))
                    break
        if args.get("image_size"):
            h = w = int(args["image_size"])
        else:
            h = min(img.shape[0] for _, img in cols)
            w = min(img.shape[1] for _, img in cols)
        resized = []
        for name, img in cols:
            img = cv2.resize(img, (w, h))
            if img.ndim == 2:
                img = img[..., None].repeat(3, -1)
            resized.append((name, img))

        if mode == "diff":
            ref_img = dict(resized).get(ref_name)
            if ref_img is None:
                console.print(f"[plot] no {ref_name!r} column for {f.stem}; "
                              "skipping diff")
                continue
            ref_gray = ref_img.mean(-1, keepdims=True)
            diffed = []
            for name, img in resized:
                if name == ref_name:
                    diffed.append((name, img))
                else:
                    d = np.clip(np.abs(img.mean(-1, keepdims=True) - ref_gray),
                                0, 1).repeat(3, -1)
                    diffed.append((name, d))
            resized = diffed

        tiles = []
        for name, img in resized:
            if zoom:
                img = _zoom_inset(img, zoom)
            if args.get("label"):
                img = _label_image(img, name)
            tiles.append(img)
        grid = _to_rows(tiles, num_cols)
        suffix = "-diff" if mode == "diff" else ""
        write_image(save_dir / f"{f.stem}{suffix}.png", grid)
        n += 1
    console.print(f"[plot] wrote {n} comparison grids -> {save_dir}")
    return save_dir


def main(argv=None):
    plot(parse_plot_args(argv))


if __name__ == "__main__":
    main()
