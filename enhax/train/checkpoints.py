"""Checkpoint save/restore (orbax) + latest-checkpoint discovery.

Rebuild of reference checkpointing (nn/model.py:45-131 torch .ckpt with
state_dict/epoch/global_step; latest by mtime nn/model.py:79-92) as pytree
checkpoints via orbax with msgpack fallback.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_checkpoint(ckpt_dir, state, epoch: int, name: str = "last") -> Path:
    """Save a TrainState under ckpt_dir/<name>/ (atomic orbax dir)."""
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / name
    payload = {
        "step": int(state.step),
        "epoch": int(epoch),
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    if state.ema is not None:
        # EMA shadow weights (reference BasicSR saves net_g_ema as
        # params_ema next to params; image_restoration_model.py:81-88)
        payload["ema"] = jax.tree.map(np.asarray, state.ema)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(path, state):
    """Restore (TrainState, epoch) from an orbax dir, using ``state`` as the
    structure/sharding template.

    Layout reconciliation (EMA present/absent, optimizer-state layout
    drift) is decided by inspecting the checkpoint METADATA (structure
    only — no tensor I/O, so large/FSDP-sharded checkpoints are read once,
    not twice), never by swallowing arbitrary errors. A missing/unreadable
    structure raises immediately; tensor-level corruption surfaces from the
    single templated restore.
    """
    import orbax.checkpoint as ocp
    from enhax.train.trainer import TrainState

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    # Structure-only read: raises on missing/unreadable checkpoints — those
    # must propagate, not silently reset optimizer state. The stored tree
    # lives under StepMetadata.item_metadata.tree (metadata leaves, no
    # tensor data).
    meta = ckptr.metadata(path).item_metadata.tree
    has_ema = "ema" in meta
    want_ema = state.ema is not None

    template = {
        "step": int(state.step),
        "epoch": 0,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if has_ema:
        # the template must mirror the stored tree even when the trainer has
        # no EMA (the shadow is dropped after restore) — a missing key would
        # surface as a structure error and wrongly reset the optimizer
        template["ema"] = state.ema if want_ema else jax.tree.map(
            np.asarray, state.params)

    # The checkpoint's params must structurally match the live model — a
    # wrong-model resume is an error, not a fallback case. Metadata leaves
    # mirror the stored tree structure 1:1.
    raw_pstruct = jax.tree_util.tree_structure(meta["params"])
    tpl_pstruct = jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, state.params))
    if raw_pstruct != tpl_pstruct:
        raise ValueError(
            f"checkpoint params tree at {path} does not match the model: "
            f"stored {raw_pstruct} vs expected {tpl_pstruct}")

    try:
        restored = ckptr.restore(path, item=template)
    except Exception:
        # Params verified identical above, so the only remaining mismatch is
        # the optimizer-state layout (e.g. a checkpoint from before
        # batch_stats were excluded from the optimizer tree): recover
        # params/step from a raw (templateless) read — only this legacy
        # path pays the second read — and reset the optimizer.
        raw = ckptr.restore(path)
        restored = {"step": raw["step"], "epoch": raw["epoch"],
                    "params": raw["params"],
                    "opt_state": state.opt_state}
        if has_ema:
            restored["ema"] = raw["ema"]
        from enhax.utils.console import console
        console.print("[ckpt] optimizer state layout incompatible — "
                      "params restored, optimizer reset")
    if want_ema and not has_ema:
        # pre-EMA checkpoint resumed by an EMA-enabled trainer: re-seed the
        # shadow from the restored params
        restored["ema"] = jax.tree.map(
            lambda p: np.array(p, copy=True), restored["params"])
    if not want_ema:
        # EMA checkpoint resumed by a trainer without ema_decay
        restored.pop("ema", None)
    new_state = TrainState(step=int(restored["step"]), params=restored["params"],
                           opt_state=restored["opt_state"],
                           ema=restored.get("ema"))
    return new_state, int(restored["epoch"]) + 1


def latest_checkpoint(ckpt_dir) -> Path | None:
    """Newest checkpoint dir by mtime (reference get_latest_checkpoint,
    nn/model.py:79). Prefers 'last' if present."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    cands = [d for d in ckpt_dir.iterdir() if d.is_dir()]
    if not cands:
        return None
    last = ckpt_dir / "last"
    if last in cands:
        return last
    return max(cands, key=lambda d: d.stat().st_mtime)


def save_params_npz(path, params) -> None:
    """Flat-key .npz export of a params pytree (portable weights)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path, template):
    """Restore a params pytree from a flat .npz using ``template`` structure."""
    data = np.load(path)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for kp, leaf in leaves_with_paths:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
