"""Torch checkpoint -> flax params conversion.

Rebuild of the reference's weight-adaptation machinery (nn/model.py:381-426
zoo/path/dict loading + core/dtype.py:121 shape-intersection partial load)
for the cross-framework case:

  * layout: torch Conv2d (O, I, kh, kw) -> flax Conv (kh, kw, I, O);
    depthwise (C, 1, kh, kw) groups=C -> (kh, kw, 1, C); Linear (O, I) ->
    Dense (I, O); norms map 1:1 (weight->scale, bias->bias).
  * matching: normalized name tokens (dots/slashes stripped, kind mapped)
    with shape verification; unmatched leaves keep their initialized values
    and are reported (the reference's "intersection" semantics).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def torch_to_flax_array(name: str, arr: np.ndarray, target_shape: tuple,
                        target_kind: str = "") -> np.ndarray | None:
    """Transpose a torch tensor into the flax layout matching target_shape.

    ``target_kind``: the flax leaf name ("kernel"/"scale"/...). A 2D torch
    ``weight`` mapping to a flax ``kernel`` is ALWAYS transposed (torch
    Linear stores (out, in)); the exact-shape shortcut would silently keep
    square matrices untransposed otherwise.
    """
    a = np.asarray(arr)
    if a.ndim == 2 and target_kind == "kernel":
        t = a.T
        return t if t.shape == tuple(target_shape) else None
    if a.ndim == 4 and target_kind == "kernel":
        # conv OIHW -> HWIO (also depthwise (C,1,kh,kw) -> (kh,kw,1,C) and
        # ConvTranspose (I,O,kh,kw) -> (kh,kw,O,I) w/ transpose_kernel=True).
        # MUST run before the exact-shape shortcut: a square conv (e.g.
        # 3->3ch 3x3) matches the target shape untransposed and would be
        # silently copied in torch layout.
        t = a.transpose(2, 3, 1, 0)
        if t.shape == tuple(target_shape):
            return t
        # 1x1 conv (O, I, 1, 1) -> Dense-lowered pointwise (I, O)
        # (enhax lowers 1x1 convs to channel matmuls; see layers.conv1x1)
        if a.shape[2] == a.shape[3] == 1 and len(target_shape) == 2:
            t = a[:, :, 0, 0].T
            if t.shape == tuple(target_shape):
                return t
    if a.ndim == 3 and target_kind == "kernel":
        # conv1d (O, I/g, k) -> (k, I/g, O)
        t = a.transpose(2, 1, 0)
        if t.shape == tuple(target_shape):
            return t
    if tuple(a.shape) == tuple(target_shape):
        return a
    if a.ndim == 4:
        t = a.transpose(2, 3, 1, 0)
        if t.shape == tuple(target_shape):
            return t
        # NCHW feature-map param (e.g. SAM2's (1, C, h, w) pos embeds)
        # -> NHWC
        t = a.transpose(0, 2, 3, 1)
        if t.shape == tuple(target_shape):
            return t
    if a.ndim == 2:
        t = a.T
        if t.shape == tuple(target_shape):
            return t
    if a.ndim == 1 and tuple(a.shape) == tuple(target_shape):
        return a
    # broadcast-style params: same elements, both effectively 1D after
    # squeezing (e.g. torch (1,C,1,1) beta -> flax (1,1,1,C))
    if a.size == int(np.prod(target_shape)):
        nonsingleton_a = [d for d in a.shape if d != 1]
        nonsingleton_t = [d for d in target_shape if d != 1]
        if len(nonsingleton_a) <= 1 and len(nonsingleton_t) <= 1:
            return a.reshape(target_shape)
    return None


_KIND_MAP = {
    "weight": ("kernel", "scale", "weight"),
    "bias": ("bias",),
    "running_mean": ("mean",),
    "running_var": ("var",),
}


def _tokens(name: str) -> list[str]:
    parts = re.split(r"[./]", name)
    return [p.lower() for p in parts if p not in ("", "params", "batch_stats", "module", "model")]


def _flat_torch(state_dict: dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def convert_state_dict(state_dict: dict, template, name_map: dict | None = None,
                       verbose: bool = False, strict: bool = False) -> tuple[Any, list[str]]:
    """Fill a flax params ``template`` pytree from a torch ``state_dict``.

    ``name_map``: optional {torch_prefix: flax_prefix} rewrites applied first.
    ``strict=True`` disables the shape-based fallback pairing — on deep
    models with many same-shaped layers the fallback can silently mis-pair;
    strict mode leaves unmatched leaves initialized and reports them instead.
    Returns (params, unmatched_report).
    """
    import jax

    torch_flat = _flat_torch(state_dict)
    if name_map:
        # two rule kinds: plain keys are prefix rewrites (first match wins);
        # keys starting with "*" are substring rewrites (all applied) — used
        # for inner-module renames like ".dw_conv." -> ".depthwise."
        prefix_rules = {k: v for k, v in name_map.items() if not k.startswith("*")}
        sub_rules = {k[1:]: v for k, v in name_map.items() if k.startswith("*")}
        renamed = {}
        for k, v in torch_flat.items():
            nk = k
            for old, new in prefix_rules.items():
                if nk.startswith(old):
                    nk = new + nk[len(old):]
                    break
            for old, new in sub_rules.items():
                nk = nk.replace(old, new)
            renamed[nk] = v
        torch_flat = renamed

    # index torch entries by (tail token signature)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)

    used = set()
    new_leaves = []
    report = []

    for kp, leaf in leaves_with_paths:
        flax_name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        ftoks = _tokens(flax_name)
        fkind = ftoks[-1] if ftoks else ""
        fbase = ftoks[:-1]

        best = None
        for tname, arr in torch_flat.items():
            if tname in used:
                continue
            ttoks = _tokens(tname)
            tkind = ttoks[-1] if ttoks else ""
            tbase = ttoks[:-1]
            if fkind not in _KIND_MAP.get(tkind, (tkind,)):
                continue
            # base-name match: exact token-tail overlap (top-level params
            # like a bare "gcm" have empty bases and match on kind alone)
            if (not tbase and not fbase) or (
                    tbase and fbase and
                    tbase[-min(len(tbase), len(fbase)):] ==
                    fbase[-min(len(tbase), len(fbase)):]):
                conv = torch_to_flax_array(tname, arr, leaf.shape, fkind)
                if conv is not None:
                    best = (tname, conv)
                    break
        if best is None and not strict:
            # fallback: any unused entry with convertible shape + matching kind
            for tname, arr in torch_flat.items():
                if tname in used:
                    continue
                ttoks = _tokens(tname)
                tkind = ttoks[-1] if ttoks else ""
                if fkind not in _KIND_MAP.get(tkind, (tkind,)):
                    continue
                conv = torch_to_flax_array(tname, arr, leaf.shape, fkind)
                if conv is not None:
                    best = (tname, conv)
                    break
        if best is not None:
            used.add(best[0])
            new_leaves.append(best[1].astype(np.asarray(leaf).dtype))
        else:
            new_leaves.append(leaf)
            report.append(f"unmatched flax leaf: {flax_name} {tuple(leaf.shape)}")

    for tname in torch_flat:
        if tname not in used:
            report.append(f"unused torch entry: {tname} {tuple(torch_flat[tname].shape)}")

    if verbose and report:
        from enhax.utils.console import console
        for r in report:
            console.print(f"[convert] {r}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves), report


def unwrap_state_dict(ckpt) -> dict:
    """Unwrap released-checkpoint nestings into a flat {name: tensor} dict.

    Handles the layouts the reference's zoo actually ships (nn/model.py:381-426
    loads dicts with 'state_dict'; BasicSR releases nest under 'params' /
    'params_ema'; lightning under 'state_dict'; DataParallel prefixes
    'module.'). Prefers 'params_ema' over 'params' (BasicSR convention: EMA
    weights are the released inference weights).
    """
    sd = ckpt
    if isinstance(sd, dict):
        for key in ("state_dict", "params_ema", "params", "model", "model_state_dict", "net"):
            inner = sd.get(key)
            if isinstance(inner, dict) and inner and all(
                    hasattr(v, "shape") or isinstance(v, np.ndarray)
                    for v in inner.values()):
                sd = inner
                break
    if not isinstance(sd, dict):
        raise ValueError(f"cannot interpret checkpoint of type {type(sd)} as a state dict")
    # strip DataParallel / torch.compile prefixes
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "_orig_mod."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def load_torch_checkpoint(model, path, name_map: dict | None = None,
                          image_size: int = 64, verbose: bool = False,
                          strict: bool = False):
    """Load a torch .pt/.pth/.ckpt into params for an enhax Model.

    Tries ``weights_only=True`` first (safe unpickle); falls back to full
    pickle with a loud warning for trusted legacy files. Unmatched flax
    leaves are always reported on the console; ``strict=True`` additionally
    raises if any leaf stayed at its initialized value.
    """
    import jax
    import torch
    from enhax.utils.console import console

    try:
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        console.print(f"[convert] WARNING: {path} is not weights-only; "
                      "falling back to full pickle load (trusted files only)")
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    state_dict = unwrap_state_dict(ckpt)
    if name_map is None:
        from enhax.convert.mappings import name_map_for
        name_map = name_map_for(model.name)

    dp = {k: np.zeros((1, image_size, image_size, 3 if k == "image" else 1), np.float32)
          for k in model.required_inputs}
    template = model.init(jax.random.PRNGKey(0), dp)
    params, report = convert_state_dict(state_dict, template, name_map=name_map,
                                        verbose=verbose)
    unmatched = [r for r in report if r.startswith("unmatched flax leaf")]
    if unmatched:
        console.print(f"[convert] WARNING: {len(unmatched)} flax leaves kept "
                      f"initialized values (first: {unmatched[0]})")
        if strict:
            raise ValueError(
                f"strict conversion failed: {len(unmatched)} unmatched leaves\n"
                + "\n".join(unmatched[:20]))
    return params
