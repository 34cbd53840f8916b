"""Numerical-parity tooling: per-layer activation diffs torch vs enhax.

SURVEY.md §4/§7: the reference has no test suite, so "parity against the
converted checkpoint" is the only ground truth. This module provides the
activation-diff harness: capture intermediate outputs on both sides, align
by name, report max/mean abs error per layer — the tool used to debug
NCHW->NHWC / resize-semantics drift.
"""

from __future__ import annotations

import numpy as np


def torch_activations(module, x_nchw, leaf_types=None) -> dict[str, np.ndarray]:
    """Run a torch module with forward hooks; returns {qualified_name: out}."""
    import torch
    acts: dict[str, np.ndarray] = {}
    hooks = []

    def make_hook(name):
        def hook(_m, _inp, out):
            if hasattr(out, "detach"):
                acts[name] = out.detach().cpu().numpy()
        return hook

    for name, m in module.named_modules():
        if name and (leaf_types is None or isinstance(m, leaf_types)):
            if len(list(m.children())) == 0:
                hooks.append(m.register_forward_hook(make_hook(name)))
    with torch.no_grad():
        module(torch.from_numpy(x_nchw))
    for h in hooks:
        h.remove()
    return acts


def flax_activations(module, variables, x_nhwc, filter_fn=None) -> dict[str, np.ndarray]:
    """Run a flax module capturing every submodule output via capture_intermediates."""
    out, state = module.apply(variables, x_nhwc,
                              capture_intermediates=filter_fn or True,
                              mutable=["intermediates"])
    acts = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if k == "__call__":
                val = v[0] if isinstance(v, tuple) else v
                if hasattr(val, "shape"):
                    acts[prefix] = np.asarray(val)
            elif isinstance(v, dict):
                walk(v, name if prefix else k)

    walk(state["intermediates"])
    return acts


def compare_activations(torch_acts: dict, flax_acts: dict,
                        name_map: dict | None = None,
                        nchw_to_nhwc: bool = True) -> list[dict]:
    """Align activation dicts and report per-layer errors.

    ``name_map``: {torch_name: flax_name}; unmapped names match on equality.
    Returns rows sorted by max_abs_err descending.
    """
    rows = []
    for tname, ta in torch_acts.items():
        fname = (name_map or {}).get(tname, tname)
        if fname not in flax_acts:
            continue
        fa = flax_acts[fname]
        t = ta
        if nchw_to_nhwc and t.ndim == 4:
            t = t.transpose(0, 2, 3, 1)
        if t.shape != fa.shape:
            rows.append({"layer": tname, "status": "shape_mismatch",
                         "torch": t.shape, "flax": fa.shape})
            continue
        diff = np.abs(t - fa)
        rows.append({"layer": tname, "status": "ok",
                     "max_abs_err": float(diff.max()),
                     "mean_abs_err": float(diff.mean())})
    rows.sort(key=lambda r: -(r["max_abs_err"] if "max_abs_err" in r
                              else 1e9))
    return rows


def assert_parity(rows: list[dict], atol: float = 1e-4) -> None:
    bad = [r for r in rows
           if r["status"] != "ok" or r["max_abs_err"] > atol]
    if bad:
        lines = "\n".join(str(r) for r in bad[:10])
        raise AssertionError(f"parity failures (atol={atol}):\n{lines}")
