"""Visual comparison grids over benchmark result dirs.

Rebuild of reference ``project/runml/plot.py`` (520 LoC): for each image
stem, tile [input | method1 | method2 | ... | GT] side by side into one
comparison image.

Usage:
    python -m enhax.cli.plot --input data/test/image --results run/p1 run/p2 \
        --target data/test/ref --save-dir plots
"""

from __future__ import annotations

import argparse

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
    return vars(p.parse_args(argv))


def _label_image(img: np.ndarray, text: str) -> np.ndarray:
    import cv2
    out = (img * 255).astype(np.uint8).copy()
    cv2.putText(out, text, (4, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                (255, 255, 255), 1, cv2.LINE_AA)
    return out.astype(np.float32) / 255.0


def plot(args: dict):
    import cv2
    from enhax.ops.io import read_image, write_image

    input_dir = Path(args["input"])
    result_dirs = [Path(r) for r in args.get("results", [])]
    target_dir = Path(args["target"]) if args.get("target") else None
    save_dir = Path(args["save_dir"])

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
        h = min(img.shape[0] for _, img in cols)
        w = min(img.shape[1] for _, img in cols)
        tiles = []
        for name, img in cols:
            img = cv2.resize(img, (w, h))
            if img.ndim == 2:
                img = img[..., None].repeat(3, -1)
            if args.get("label"):
                img = _label_image(img, name)
            tiles.append(img)
        grid = np.concatenate(tiles, axis=1)
        write_image(save_dir / f"{f.stem}.png", grid)
        n += 1
    console.print(f"[plot] wrote {n} comparison grids -> {save_dir}")
    return save_dir


def main(argv=None):
    plot(parse_plot_args(argv))


if __name__ == "__main__":
    main()
