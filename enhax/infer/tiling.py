"""Overlap-tiled full-resolution inference.

Rebuild of Restormer's tiled test path (my_predict.py:157-167: slide a tile
window, accumulate weighted patches, divide by weights) as a static-shape,
jit-friendly loop: tiles are gathered with lax.dynamic_slice on a precomputed
(host-side) tile grid, processed by the model, and blended with a raised-
cosine (Hann) window so seams cancel.

The grid is static per input shape, so one jit compilation serves any image
of that shape; different shapes re-trace (bucketed by the engine).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _tile_starts(full: int, tile: int, stride: int) -> list[int]:
    """Start offsets covering [0, full) with the last tile flush to the end."""
    if full <= tile:
        return [0]
    starts = list(range(0, full - tile + 1, stride))
    if starts[-1] != full - tile:
        starts.append(full - tile)
    return starts


def _hann_window(tile_h: int, tile_w: int):
    """2D raised-cosine blend weights (avoids seams; min weight epsilon)."""
    wy = np.hanning(tile_h + 2)[1:-1]
    wx = np.hanning(tile_w + 2)[1:-1]
    w = np.outer(wy, wx).astype(np.float32) + 1e-3
    return jnp.asarray(w)[None, :, :, None]


def _blend_window(tile_h: int, tile_w: int, blend: str):
    """``blend='hann'``: raised-cosine (seamless, enhax default).
    ``blend='uniform'``: ones — the reference contract, matching
    Restormer's unweighted accumulate / count divide EXACTLY
    (my_predict.py:157-167), for bit-close tiled parity runs."""
    if blend == "uniform":
        return jnp.ones((1, tile_h, tile_w, 1), jnp.float32)
    if blend == "hann":
        return _hann_window(tile_h, tile_w)
    raise ValueError(f"unknown blend mode: {blend!r}")


def tiled_apply(fn, image, tile: tuple[int, int] = (256, 256), overlap: int = 32,
                blend: str = "hann"):
    """Apply ``fn`` (NHWC -> NHWC) over overlapping tiles and blend.

    ``fn`` must be shape-preserving. Same contract as Restormer's --tile;
    ``blend='uniform'`` reproduces the reference's unweighted accumulation
    bit-for-bit (my_predict.py:157-167), ``'hann'`` (default) trades that
    for seam-free blending.
    """
    n, h, w, c = image.shape
    th = min(tile[0], h)
    tw = min(tile[1], w)
    stride_h = max(th - overlap, 1)
    stride_w = max(tw - overlap, 1)
    ys = _tile_starts(h, th, stride_h)
    xs = _tile_starts(w, tw, stride_w)
    win = _blend_window(th, tw, blend).astype(image.dtype)

    out = jnp.zeros_like(image)
    acc = jnp.zeros((1, h, w, 1), image.dtype)
    for y in ys:
        for x in xs:
            patch = jax.lax.dynamic_slice(image, (0, y, x, 0), (n, th, tw, c))
            pred = fn(patch)
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (0, y, x, 0), (n, th, tw, c))
                + pred * win, (0, y, x, 0))
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (0, y, x, 0), (1, th, tw, 1))
                + win, (0, y, x, 0))
    return out / acc


def _best_chunk(total: int, chunk: int) -> int:
    """Pick the dispatch chunk in [~2/3*chunk, chunk] minimizing padded
    tail waste (r4 VERDICT task 5: a 180-tile stream at chunk=16 wastes 12
    padded tiles, 6.7% of device work; chunk=15 wastes none). Larger chunk
    wins ties; the requested chunk is the memory bound, so only smaller
    values are considered."""
    best, best_pad = chunk, (-total) % chunk
    for c in range(chunk - 1, max(1, (2 * chunk + 2) // 3) - 1, -1):
        p = (-total) % c
        if p < best_pad:
            best, best_pad = c, p
            if p == 0:
                break
    return best


def tiled_apply_frames(fn, frames, tile: tuple[int, int] = (256, 256),
                       overlap: int = 32, chunk: int = 8,
                       blend: str = "hann"):
    """Multi-frame overlap-tiled apply: ALL frames' tiles through one
    chunked dispatch stream.

    The r4 Restormer serving path (VERDICT r3 #2): a single 1080p frame's
    tile grid leaves the tail chunk partially filled and re-dispatches the
    lax.map per frame; pipelining N frames' tiles through one call
    amortizes both, so the C=48 MDTA/GDFN matmuls see an MXU-filling batch
    continuously. Same blend contract as :func:`tiled_apply`
    (``'uniform'`` = Restormer's my_predict.py:157-167 exactly).

    ``frames``: (N, H, W, C); ``fn``: (B, th, tw, C) -> (B, th, tw, C).
    """
    n, h, w, c = frames.shape
    th = min(tile[0], h)
    tw = min(tile[1], w)
    stride_h = max(th - overlap, 1)
    stride_w = max(tw - overlap, 1)
    ys = _tile_starts(h, th, stride_h)
    xs = _tile_starts(w, tw, stride_w)
    coords = [(y, x) for y in ys for x in xs]
    n_tiles = len(coords)

    # frame-major tile stack: (N * T, th, tw, C)
    patches = jnp.stack([
        jax.lax.dynamic_slice(frames, (f, y, x, 0), (1, th, tw, c))[0]
        for f in range(n) for y, x in coords])
    total = n * n_tiles
    chunk = _best_chunk(total, max(chunk, 1))
    n_groups = -(-total // chunk)
    pad = n_groups * chunk - total
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.repeat(patches[-1:], pad, axis=0)], axis=0)
    groups = patches.reshape((n_groups, chunk) + patches.shape[1:])
    preds = jax.lax.map(fn, groups)
    preds = preds.reshape((n_groups * chunk,) + preds.shape[2:])[:total]
    preds = preds.reshape((n, n_tiles) + preds.shape[1:])

    win = _blend_window(th, tw, blend).astype(frames.dtype)
    out = jnp.zeros_like(frames)
    acc = jnp.zeros((1, h, w, 1), frames.dtype)
    for k, (y, x) in enumerate(coords):
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (0, y, x, 0), (n, th, tw, c))
            + preds[:, k] * win, (0, y, x, 0))
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, y, x, 0), (1, th, tw, 1))
            + win, (0, y, x, 0))
    return out / jnp.maximum(acc, 1e-8)


def tiled_apply_batched(fn, image, tile: tuple[int, int] = (256, 256),
                        overlap: int = 32, chunk: int = 8,
                        blend: str = "hann"):
    """Overlap-tiled apply with tiles BATCHED through ``fn``.

    TPU-friendly variant of :func:`tiled_apply`: instead of unrolling one
    model call per tile (which multiplies live buffers and compile time),
    all tiles are stacked into a batch and run through ``fn`` in chunks of
    ``chunk``, then Hann-blended back. ``fn`` maps (B, th, tw, C) ->
    (B, th, tw, C). Same contract as Restormer's tiled test path
    (my_predict.py:157-167); ``blend='uniform'`` matches its unweighted
    accumulate/divide exactly, ``'hann'`` (default) blends seam-free.
    """
    n, h, w, c = image.shape
    assert n == 1, "batched tiling operates on a single image"
    th = min(tile[0], h)
    tw = min(tile[1], w)
    stride_h = max(th - overlap, 1)
    stride_w = max(tw - overlap, 1)
    ys = _tile_starts(h, th, stride_h)
    xs = _tile_starts(w, tw, stride_w)
    coords = [(y, x) for y in ys for x in xs]

    patches = jnp.stack([
        jax.lax.dynamic_slice(image, (0, y, x, 0), (1, th, tw, c))[0]
        for y, x in coords])
    # lax.map over chunk groups: bounds live memory to ONE chunk's
    # activations (a Python loop unrolled under jit keeps every chunk's
    # buffers alive simultaneously and OOMs at 1080p/Restormer scale)
    n_tiles = len(coords)
    chunk = _best_chunk(n_tiles, max(chunk, 1))
    n_groups = -(-n_tiles // chunk)
    pad = n_groups * chunk - n_tiles
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.repeat(patches[-1:], pad, axis=0)], axis=0)
    groups = patches.reshape((n_groups, chunk) + patches.shape[1:])
    preds = jax.lax.map(fn, groups)
    preds = preds.reshape((n_groups * chunk,) + preds.shape[2:])[:n_tiles]

    win = _blend_window(th, tw, blend).astype(image.dtype)
    out = jnp.zeros_like(image)
    acc = jnp.zeros((1, h, w, 1), image.dtype)
    for k, (y, x) in enumerate(coords):
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (0, y, x, 0), (1, th, tw, c))
            + preds[k][None] * win, (0, y, x, 0))
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, y, x, 0), (1, th, tw, 1))
            + win, (0, y, x, 0))
    return out / jnp.maximum(acc, 1e-8)
